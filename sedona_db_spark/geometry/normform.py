"""Orientation + normal-form kernels (PostGIS names: ST_IsPolygonCW/CCW,
ST_ForcePolygonCW/CCW/ST_ForceRHR, ST_Normalize, ST_Multi,
ST_RemoveRepeatedPoints, ST_Expand, ST_BoundingDiagonal,
ST_OrderingEquals, ST_PointOnSurface, ST_Simplify, ST_SimplifyVW,
ST_GeometricMedian).

The reference engine (SedonaDB) covers the accessor/predicate core; these
complete the normal-form surface a PostGIS/Sedona user expects.  All pure
numpy over the WKB Geometry model — None-propagating, loud on domain
errors (silent NULLs hide pipeline bugs at 10^12 rows).

Semantics notes (documented, deterministic — pinned by tests):

* ``normalize`` follows the JTS canonical form: polygon shells CW, holes
  CCW, every ring rotated so its minimum coordinate comes first, and
  multi-part/collection elements sorted by their normalized WKB bytes
  (JTS sorts by compareTo; byte order over the canonical encoding is the
  same total order for same-type parts and stays deterministic across
  partitions).
* ``point_on_surface`` follows the JTS InteriorPoint family: points →
  the part closest to the centroid; lines → the vertex closest to the
  centroid; areal → horizontal-scanline bisector (the classic
  InteriorPointArea "safe bisector": the midpoint of the widest
  even-odd crossing interval at a y that avoids vertex ordinates).
* ``geometric_median`` is Weiszfeld iteration with the standard
  vertex-hit guard, run to a fixed tolerance — deterministic because the
  iteration is data-only (no RNG, no partition order).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from . import wkb
from .algos import _ring_area, area as _area, centroid as _centroid
from .wkb import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
)


# ---------------------------------------------------------------------------
# ring orientation
# ---------------------------------------------------------------------------

def _ring_is_ccw(ring: np.ndarray) -> bool:
    return _ring_area(ring[:, :2]) > 0.0


def _orient_polygon(g: Geometry, shell_ccw: bool) -> Geometry:
    rings = []
    for i, r in enumerate(g.coords):
        if len(r) == 0:
            rings.append(r.copy())
            continue
        want_ccw = shell_ccw if i == 0 else (not shell_ccw)
        if _ring_is_ccw(r) != want_ccw:
            rings.append(r[::-1].copy())
        else:
            rings.append(r.copy())
    return Geometry(POLYGON, rings, g.has_z, g.has_m)


def _walk_polygons(g: Geometry, fn) -> Geometry:
    if g.type_id == POLYGON:
        return fn(g)
    if g.type_id in (MULTIPOLYGON, GEOMETRYCOLLECTION):
        return Geometry(g.type_id, [_walk_polygons(s, fn) for s in g.coords],
                        g.has_z, g.has_m)
    return g


def force_polygon_cw(g: Optional[Geometry]) -> Optional[Geometry]:
    """Shells CW, holes CCW (PostGIS ST_ForcePolygonCW == ST_ForceRHR);
    non-areal parts pass through unchanged."""
    if g is None:
        return None
    return _walk_polygons(g, lambda p: _orient_polygon(p, shell_ccw=False))


def force_polygon_ccw(g: Optional[Geometry]) -> Optional[Geometry]:
    """Shells CCW, holes CW (PostGIS ST_ForcePolygonCCW)."""
    if g is None:
        return None
    return _walk_polygons(g, lambda p: _orient_polygon(p, shell_ccw=True))


def _poly_is(g: Geometry, shell_ccw: bool) -> bool:
    for i, r in enumerate(g.coords):
        if len(r) < 4:
            continue
        want_ccw = shell_ccw if i == 0 else (not shell_ccw)
        if _ring_is_ccw(r) != want_ccw:
            return False
    return True


def _all_polys(g: Geometry, shell_ccw: bool) -> bool:
    if g.type_id == POLYGON:
        return _poly_is(g, shell_ccw)
    if g.type_id in (MULTIPOLYGON, GEOMETRYCOLLECTION):
        return all(_all_polys(s, shell_ccw) for s in g.coords)
    return True  # PostGIS: true for non-polygonal geometry


def is_polygon_cw(g: Optional[Geometry]) -> Optional[bool]:
    """True when every shell is CW and every hole CCW; true for
    non-polygonal input (PostGIS ST_IsPolygonCW)."""
    if g is None:
        return None
    return _all_polys(g, shell_ccw=False)


def is_polygon_ccw(g: Optional[Geometry]) -> Optional[bool]:
    if g is None:
        return None
    return _all_polys(g, shell_ccw=True)


# ---------------------------------------------------------------------------
# normal forms
# ---------------------------------------------------------------------------

_MULTI_OF = {POINT: MULTIPOINT, LINESTRING: MULTILINESTRING,
             POLYGON: MULTIPOLYGON}


def multi(g: Optional[Geometry]) -> Optional[Geometry]:
    """Wrap a simple geometry in its MULTI* type; multis and collections
    pass through (PostGIS ST_Multi)."""
    if g is None:
        return None
    mt = _MULTI_OF.get(g.type_id)
    if mt is None:
        return g
    if g.is_empty:
        return Geometry(mt, [], g.has_z, g.has_m)
    return Geometry(mt, [g], g.has_z, g.has_m)


def _rotate_ring_min_first(ring: np.ndarray) -> np.ndarray:
    """Closed ring rotated so the lexicographically-minimum vertex leads
    (JTS Polygon.normalize ring form); closing vertex re-appended."""
    if len(ring) < 2:
        return ring.copy()
    body = ring[:-1]
    # lexicographic min over (x, y[, z, m])
    order = np.lexsort(tuple(body[:, k] for k in range(body.shape[1] - 1, -1, -1)))
    i = int(order[0])
    rot = np.vstack([body[i:], body[:i], body[i:i + 1]])
    return rot


def normalize(g: Optional[Geometry]) -> Optional[Geometry]:
    """JTS canonical form (PostGIS ST_Normalize): polygon shells CW /
    holes CCW, rings rotated to start at their minimum coordinate, holes
    and multi-part elements sorted by canonical WKB bytes."""
    if g is None:
        return None
    t = g.type_id
    if t == POINT:
        return g
    if t == LINESTRING:
        return g
    if t == POLYGON:
        p = _orient_polygon(g, shell_ccw=False)
        rings = [_rotate_ring_min_first(r) if len(r) else r.copy()
                 for r in p.coords]
        if len(rings) > 2:
            shell, holes = rings[0], rings[1:]
            holes.sort(key=lambda r: wkb.encode(
                Geometry(LINESTRING, r, g.has_z, g.has_m)))
            rings = [shell] + holes
        return Geometry(POLYGON, rings, g.has_z, g.has_m)
    if t in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        parts = [normalize(s) for s in g.coords]
        parts.sort(key=wkb.encode)
        return Geometry(t, parts, g.has_z, g.has_m)
    return g


def remove_repeated_points(g: Optional[Geometry],
                           tol: float = 0.0) -> Optional[Geometry]:
    """Drop consecutive vertices within ``tol`` of their predecessor
    (PostGIS ST_RemoveRepeatedPoints).  Ring closure is preserved; a
    line keeps >= 2 vertices and a ring >= 4 (first kept vertices win),
    matching the GEOS guard against collapsing valid structure."""
    if g is None:
        return None
    t = g.type_id

    def dedup(arr: np.ndarray, is_ring: bool) -> np.ndarray:
        n = len(arr)
        if n == 0:
            return arr.copy()
        d = np.hypot(np.diff(arr[:, 0]), np.diff(arr[:, 1]))
        keep = np.concatenate([[True], d > tol])
        if is_ring:
            keep[-1] = True  # closing vertex always kept
            body = arr[keep][:-1]
            if len(body) < 3:  # refuse to collapse a valid ring
                return arr.copy()
            return np.vstack([body, body[:1]])
        out = arr[keep]
        if len(out) < 2 and n >= 2:
            return arr[[0, -1]].copy()
        return out

    if t == POINT:
        return g
    if t == LINESTRING:
        return Geometry(t, dedup(g.coords, False), g.has_z, g.has_m)
    if t == POLYGON:
        return Geometry(t, [dedup(r, True) for r in g.coords],
                        g.has_z, g.has_m)
    if t == MULTIPOINT:
        # PostGIS collapses duplicate points regardless of adjacency
        seen, parts = set(), []
        for p in g.coords:
            k = tuple(np.round(p.coords[0], 15)) if len(p.coords) else ()
            if k in seen:
                continue
            seen.add(k)
            parts.append(p)
        return Geometry(t, parts, g.has_z, g.has_m)
    return Geometry(t, [remove_repeated_points(s, tol) for s in g.coords],
                    g.has_z, g.has_m)


def expand(g: Optional[Geometry], dx: float,
           dy: Optional[float] = None) -> Optional[Geometry]:
    """Envelope expanded by dx/dy as a POLYGON box (PostGIS ST_Expand).
    Negative deltas that invert the box raise (PostGIS returns a
    degenerate box; failing loud is safer at pipeline scale)."""
    if g is None or g.is_empty:
        return None
    if dy is None:
        dy = dx
    c = g.all_coords()
    x0, x1 = float(np.min(c[:, 0])) - dx, float(np.max(c[:, 0])) + dx
    y0, y1 = float(np.min(c[:, 1])) - dy, float(np.max(c[:, 1])) + dy
    if x1 < x0 or y1 < y0:
        raise ValueError(
            f"ST_Expand by ({dx}, {dy}) inverts the envelope "
            f"[{x0 + dx}, {x1 - dx}] x [{y0 + dy}, {y1 - dy}]"
        )
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]],
                    dtype=np.float64)
    return Geometry(POLYGON, [ring])


def bounding_diagonal(g: Optional[Geometry]) -> Optional[Geometry]:
    """LINESTRING(min corner, max corner) of the envelope (PostGIS
    ST_BoundingDiagonal); degenerate envelopes still yield the 2-point
    line, matching PostGIS."""
    if g is None or g.is_empty:
        return None
    c = g.all_coords()
    lo = [float(np.min(c[:, 0])), float(np.min(c[:, 1]))]
    hi = [float(np.max(c[:, 0])), float(np.max(c[:, 1]))]
    return Geometry(LINESTRING, np.array([lo, hi], dtype=np.float64))


def ordering_equals(a: Optional[Geometry],
                    b: Optional[Geometry]) -> Optional[bool]:
    """Same type, same coordinates in the same order (PostGIS
    ST_OrderingEquals — stricter than ST_Equals)."""
    if a is None or b is None:
        return None
    return wkb.encode(a) == wkb.encode(b)


# ---------------------------------------------------------------------------
# interior point (JTS InteriorPoint family)
# ---------------------------------------------------------------------------

def _interior_point_areal(g: Geometry) -> Optional[Tuple[float, float]]:
    polys = [g] if g.type_id == POLYGON else [s for s in g.coords
                                              if s.type_id == POLYGON]
    best = None  # (width, x, y) widest interval across parts wins (JTS)
    for p in polys:
        if not p.coords or len(p.coords[0]) < 4:
            continue
        ys = np.concatenate([r[:, 1] for r in p.coords if len(r)])
        y0, y1 = float(np.min(ys)), float(np.max(ys))
        mid = (y0 + y1) / 2.0
        # JTS SafeBisectorFinder: bisect between the distinct vertex
        # ordinates bracketing the envelope midpoint, so the scanline
        # avoids vertices (no degenerate crossings).
        uniq = np.unique(ys)
        if len(uniq) > 1:
            below = uniq[uniq < mid]
            above = uniq[uniq > mid]
            lo = float(below[-1]) if len(below) else float(uniq[0])
            hi = float(above[0]) if len(above) else float(uniq[-1])
            y = (lo + hi) / 2.0 if lo < hi else mid
        else:
            y = mid
        xs: List[float] = []
        for r in p.coords:
            if len(r) < 2:
                continue
            xa, ya = r[:-1, 0], r[:-1, 1]
            xb, yb = r[1:, 0], r[1:, 1]
            crosses = (ya <= y) != (yb <= y)
            if not np.any(crosses):
                continue
            tpar = (y - ya[crosses]) / (yb[crosses] - ya[crosses])
            xs.extend((xa[crosses] + tpar * (xb[crosses] - xa[crosses])).tolist())
        xs.sort()
        for i in range(0, len(xs) - 1, 2):
            w = xs[i + 1] - xs[i]
            if best is None or w > best[0]:
                best = (w, (xs[i] + xs[i + 1]) / 2.0, y)
    if best is None:
        return None
    return best[1], best[2]


def point_on_surface(g: Optional[Geometry]) -> Optional[Geometry]:
    """A point guaranteed on the geometry (PostGIS ST_PointOnSurface,
    JTS InteriorPoint semantics): areal → widest-interval midpoint on the
    safe horizontal bisector; lineal → vertex closest to the centroid;
    puntal → part closest to the centroid."""
    if g is None or g.is_empty:
        return None
    t = g.type_id
    if t == POINT:
        return Geometry(POINT, g.coords[:, :2].copy())
    dim_areal = t in (POLYGON, MULTIPOLYGON)
    if t == GEOMETRYCOLLECTION:
        dim_areal = any(s.type_id in (POLYGON, MULTIPOLYGON)
                        for s in g.coords)
    if dim_areal:
        xy = _interior_point_areal(g)
        if xy is None:
            return None
        return Geometry(POINT, np.array([[xy[0], xy[1]]], dtype=np.float64))
    cen = _centroid(g)
    cx, cy = (float(cen.coords[0, 0]), float(cen.coords[0, 1])) if cen is not None \
        else (0.0, 0.0)
    if t in (LINESTRING, MULTILINESTRING) or (
            t == GEOMETRYCOLLECTION and any(
                s.type_id in (LINESTRING, MULTILINESTRING) for s in g.coords)):
        lines = [g] if t == LINESTRING else [s for s in g.coords
                                             if s.type_id == LINESTRING]
        vs = np.vstack([ln.coords[:, :2] for ln in lines if len(ln.coords)])
        d = np.hypot(vs[:, 0] - cx, vs[:, 1] - cy)
        i = int(np.argmin(d))
        return Geometry(POINT, vs[i:i + 1].copy())
    pts = [s for s in g.coords if s.type_id == POINT and len(s.coords)]
    if not pts:
        return None
    arr = np.vstack([p.coords[:1, :2] for p in pts])
    d = np.hypot(arr[:, 0] - cx, arr[:, 1] - cy)
    i = int(np.argmin(d))
    return Geometry(POINT, arr[i:i + 1].copy())


# ---------------------------------------------------------------------------
# simplification (VW) — DP lives in algos.simplify_dp
# ---------------------------------------------------------------------------

def _vw_line(arr: np.ndarray, area_tol: float, min_pts: int) -> np.ndarray:
    """Visvalingam–Whyatt: repeatedly drop the interior vertex whose
    effective triangle area is smallest, while it is < area_tol."""
    pts = arr.copy()
    while len(pts) > min_pts:
        x, y = pts[:, 0], pts[:, 1]
        ax, ay = x[:-2], y[:-2]
        bx, by = x[1:-1], y[1:-1]
        cx, cy = x[2:], y[2:]
        tri = 0.5 * np.abs((bx - ax) * (cy - ay) - (cx - ax) * (by - ay))
        i = int(np.argmin(tri))
        if tri[i] >= area_tol:
            break
        pts = np.delete(pts, i + 1, axis=0)
    return pts


def simplify_vw(g: Optional[Geometry], area_tol: float) -> Optional[Geometry]:
    """Visvalingam–Whyatt simplification (PostGIS ST_SimplifyVW; the
    tolerance is an AREA).  Rings keep >= 4 points, lines >= 2."""
    if g is None:
        return None
    t = g.type_id
    if t in (POINT, MULTIPOINT):
        return g
    if t == LINESTRING:
        return Geometry(t, _vw_line(g.coords, area_tol, 2), g.has_z, g.has_m)
    if t == POLYGON:
        rings = []
        for r in g.coords:
            if len(r) == 0:
                rings.append(r.copy())
                continue
            body = _vw_line(r, area_tol, 4)
            body[-1] = body[0]
            rings.append(body)
        return Geometry(t, rings, g.has_z, g.has_m)
    return Geometry(t, [simplify_vw(s, area_tol) for s in g.coords],
                    g.has_z, g.has_m)


# ---------------------------------------------------------------------------
# geometric median (Weiszfeld)
# ---------------------------------------------------------------------------

def geometric_median(g: Optional[Geometry], tol: float = 1e-9,
                     max_iter: int = 200) -> Optional[Geometry]:
    """Weiszfeld iteration over the geometry's vertices (PostGIS
    ST_GeometricMedian accepts [multi]points; we accept any geometry and
    use its vertex set, documented deviation).  Deterministic: starts at
    the vertex mean, standard vertex-hit guard (Vardi & Zhang 2000)."""
    if g is None or g.is_empty:
        return None
    pts = np.unique(g.all_coords()[:, :2], axis=0)
    if len(pts) == 1:
        return Geometry(POINT, pts.copy())
    cur = pts.mean(axis=0)
    for _ in range(max_iter):
        d = np.hypot(pts[:, 0] - cur[0], pts[:, 1] - cur[1])
        hit = d < 1e-300
        if np.any(hit):
            # Vardi–Zhang: stay unless the pull of the others exceeds
            # the multiplicity of the coincident vertex
            others = ~hit
            if not np.any(others):
                break
            w = 1.0 / d[others]
            r_vec = ((pts[others] - cur) * w[:, None]).sum(axis=0)
            r = float(np.hypot(*r_vec))
            k = float(np.count_nonzero(hit))
            if r <= k:
                break
            step = max(0.0, 1.0 - k / r)
            nxt = cur + step * r_vec / (w.sum())
        else:
            w = 1.0 / d
            nxt = (pts * w[:, None]).sum(axis=0) / w.sum()
        if float(np.hypot(*(nxt - cur))) < tol:
            cur = nxt
            break
        cur = nxt
    return Geometry(POINT, np.array([cur], dtype=np.float64))


# ---------------------------------------------------------------------------
# longitude wrapping (Sedona ST_ShiftLongitude, PostGIS ST_WrapX)
# ---------------------------------------------------------------------------

def shift_longitude(g: Optional[Geometry]) -> Optional[Geometry]:
    """Map x in [-180, 0) to [180, 360) and back, vertex-wise (Apache
    Sedona ST_ShiftLongitude — the standard anti-meridian crossing fix:
    applying it twice is the identity)."""
    if g is None:
        return None

    def conv(arr: np.ndarray) -> np.ndarray:
        out = arr.copy()
        x = out[:, 0]
        out[:, 0] = np.where(x < 0, x + 360.0, np.where(x > 180.0, x - 360.0, x))
        return out

    def walk(geom: Geometry) -> Geometry:
        t = geom.type_id
        if t in (POINT, LINESTRING):
            return Geometry(t, conv(geom.coords), geom.has_z, geom.has_m)
        if t == POLYGON:
            return Geometry(t, [conv(r) for r in geom.coords],
                            geom.has_z, geom.has_m)
        return Geometry(t, [walk(s) for s in geom.coords],
                        geom.has_z, geom.has_m)

    return walk(g)


def wrap_x(g: Optional[Geometry], wrap: float, move: float) -> Optional[Geometry]:
    """Translate whole COMPONENTS by (move, 0) when they lie on the wrap
    side of the line x = wrap (PostGIS ST_WrapX): with move > 0,
    components entirely LEFT of the line move right; with move < 0,
    components entirely RIGHT move left.  Components crossing the line
    stay (PostGIS splits them only in the topology variant; documented
    deviation: we never split)."""
    if g is None:
        return None

    def component_moves(geom: Geometry) -> bool:
        c = geom.all_coords()
        if len(c) == 0:
            return False
        if move > 0:
            return float(np.max(c[:, 0])) < wrap
        return float(np.min(c[:, 0])) > wrap

    def shift(geom: Geometry) -> Geometry:
        def conv(arr: np.ndarray) -> np.ndarray:
            out = arr.copy()
            out[:, 0] = out[:, 0] + move
            return out

        t = geom.type_id
        if t in (POINT, LINESTRING):
            return Geometry(t, conv(geom.coords), geom.has_z, geom.has_m)
        if t == POLYGON:
            return Geometry(t, [conv(r) for r in geom.coords],
                            geom.has_z, geom.has_m)
        return Geometry(t, [shift(s) for s in geom.coords],
                        geom.has_z, geom.has_m)

    t = g.type_id
    if t in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        parts = [shift(s) if component_moves(s) else s for s in g.coords]
        return Geometry(t, parts, g.has_z, g.has_m)
    return shift(g) if component_moves(g) else g


# ---------------------------------------------------------------------------
# minimum clearance (GEOS/PostGIS ST_MinimumClearance)
# ---------------------------------------------------------------------------

def minimum_clearance(g: Optional[Geometry], want_line: bool = False):
    """The smallest distance any vertex can move before the geometry
    becomes invalid (PostGIS ST_MinimumClearance): the minimum over
    (a) distances between distinct vertices and (b) distances from each
    vertex to each non-incident segment.  ``want_line`` returns the
    realizing 2-point LINESTRING instead (ST_MinimumClearanceLine).
    Geometries with fewer than 2 distinct vertices have infinite
    clearance (PostGIS returns Infinity / LINESTRING EMPTY)."""
    if g is None:
        return None
    pts = np.unique(g.all_coords()[:, :2], axis=0)
    if len(pts) < 2:
        return (Geometry(LINESTRING, np.empty((0, 2))) if want_line
                else math.inf)
    best = math.inf
    best_pair = None
    # (a) vertex-vertex
    d = np.hypot(pts[:, None, 0] - pts[None, :, 0],
                 pts[:, None, 1] - pts[None, :, 1])
    np.fill_diagonal(d, np.inf)
    i, j = np.unravel_index(int(np.argmin(d)), d.shape)
    best, best_pair = float(d[i, j]), (pts[i], pts[j])
    # (b) vertex to non-incident segment (interior projection only —
    # endpoint distances are already covered by (a))
    segs = []

    def walk(geom: Geometry):
        t = geom.type_id
        if t == LINESTRING:
            c = geom.coords[:, :2]
            segs.extend((c[k], c[k + 1]) for k in range(len(c) - 1))
        elif t == POLYGON:
            for r in geom.coords:
                c = r[:, :2]
                segs.extend((c[k], c[k + 1]) for k in range(len(c) - 1))
        elif t not in (POINT,):
            for s in geom.coords:
                walk(s)

    walk(g)
    for a, b in segs:
        ab = b - a
        L2 = float(ab @ ab)
        if L2 == 0:
            continue
        t = ((pts - a) @ ab) / L2
        q = a[None, :] + t[:, None] * ab[None, :]
        dd = np.hypot(pts[:, 0] - q[:, 0], pts[:, 1] - q[:, 1])
        # strict interior projections, and exclude the segment's own
        # endpoints (dd == 0 there only when the vertex IS an endpoint)
        mask = (t > 1e-12) & (t < 1 - 1e-12) & (dd > 0)
        if np.any(mask):
            k = int(np.argmin(np.where(mask, dd, np.inf)))
            if float(dd[k]) < best:
                best = float(dd[k])
                best_pair = (pts[k], q[k])
    if want_line:
        return Geometry(LINESTRING,
                        np.array([best_pair[0], best_pair[1]],
                                 dtype=np.float64))
    return best
