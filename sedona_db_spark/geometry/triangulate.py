"""Polygon triangulation + vertex snapping + shared-path extraction
(PostGIS names ST_TriangulatePolygon, ST_Snap, ST_SharedPaths).

From-scratch kernels over the WKB Geometry model:

* ``triangulate_polygon`` — ear clipping (Meister's two-ears theorem)
  with Eberly-style hole bridging (rightmost-vertex visibility splice).
  PostGIS computes the CONSTRAINED DELAUNAY triangulation; ear clipping
  returns *a* valid triangulation of the same polygon — identical
  triangle COUNT (n + 2h - 2 fan size) and total area, but not the
  Delaunay-optimal diagonals (documented deviation; the oracle pins the
  count/area/containment laws, tests pin containment + disjoint
  interiors).
* ``snap`` — GEOS LineStringSnapper semantics: source vertices within
  ``tol`` of a snap-geometry vertex move onto it, then snap-geometry
  vertices within ``tol`` of a source segment are inserted into it.
* ``shared_paths`` — GEOMETRYCOLLECTION(MULTILINESTRING same-direction,
  MULTILINESTRING opposite-direction) of collinear overlaps, computed by
  exact pairwise segment interval intersection (pieces are emitted in
  input order, not re-chained — documented deviation from GEOS's merged
  paths; lengths and coverage are identical).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from .normform import force_polygon_ccw
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
# ear clipping
# ---------------------------------------------------------------------------

def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _point_in_tri(p, a, b, c) -> bool:
    d1 = _cross(a, b, p)
    d2 = _cross(b, c, p)
    d3 = _cross(c, a, p)
    has_neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
    has_pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
    return not (has_neg and has_pos)


def _ear_clip(poly: List[Tuple[float, float]]) -> List[Tuple]:
    """Triangles of a simple CCW polygon (no closing vertex)."""
    idx = list(range(len(poly)))
    tris = []
    guard = 0
    while len(idx) > 3 and guard < 4 * len(poly) * len(poly):
        guard += 1
        n = len(idx)
        clipped = False
        for k in range(n):
            i0, i1, i2 = idx[(k - 1) % n], idx[k], idx[(k + 1) % n]
            a, b, c = poly[i0], poly[i1], poly[i2]
            if _cross(a, b, c) <= 0:
                continue  # reflex or degenerate corner
            ok = True
            for j in idx:
                if j in (i0, i1, i2):
                    continue
                p = poly[j]
                if p == a or p == b or p == c:
                    continue  # bridge duplicates sit on corners
                if _point_in_tri(p, a, b, c):
                    ok = False
                    break
            if ok:
                tris.append((a, b, c))
                del idx[k]
                clipped = True
                break
        if not clipped:
            # numerically stuck (collinear run): drop the flattest corner
            n = len(idx)
            flat = min(range(n), key=lambda k: abs(_cross(
                poly[idx[(k - 1) % n]], poly[idx[k]], poly[idx[(k + 1) % n]])))
            del idx[flat]
    if len(idx) == 3:
        a, b, c = (poly[i] for i in idx)
        if abs(_cross(a, b, c)) > 0:
            tris.append((a, b, c))
    return tris


def _bridge_hole(shell: List[Tuple[float, float]],
                 hole: List[Tuple[float, float]]) -> List[Tuple[float, float]]:
    """Splice a CW hole into a CCW shell via the rightmost-vertex
    visibility bridge (Eberly, 'Triangulation by Ear Clipping' §5)."""
    mi = max(range(len(hole)), key=lambda i: (hole[i][0], hole[i][1]))
    mx, my = hole[mi]
    # nearest intersection of the +x ray with shell edges strictly right of M
    best_t, best_edge = math.inf, None
    n = len(shell)
    for i in range(n):
        (x1, y1), (x2, y2) = shell[i], shell[(i + 1) % n]
        if (y1 > my) == (y2 > my):
            continue
        t = x1 + (my - y1) / (y2 - y1) * (x2 - x1)
        if t >= mx and t < best_t:
            best_t, best_edge = t, i
    if best_edge is None:
        raise ValueError("hole outside shell (invalid polygon)")
    ix, iy = best_t, my
    (x1, y1), (x2, y2) = shell[best_edge], shell[(best_edge + 1) % n]
    # candidate visible vertex: the intersected edge's endpoint with max x
    p_idx = best_edge if x1 > x2 else (best_edge + 1) % n
    p = shell[p_idx]
    # reflex shell vertices inside triangle (M, I, P) block visibility;
    # take the one minimizing the angle to the +x axis (Eberly's rule)
    best = (p_idx, math.inf)
    for j in range(n):
        q = shell[j]
        a, b, c = shell[(j - 1) % n], q, shell[(j + 1) % n]
        if _cross(a, b, c) > 0:
            continue  # convex vertex can't block
        if q == p or not _point_in_tri(q, (mx, my), (ix, iy), p):
            continue
        ang = abs(math.atan2(q[1] - my, q[0] - mx))
        if ang < best[1] or (ang == best[1] and
                             math.hypot(q[0] - mx, q[1] - my) <
                             math.hypot(shell[best[0]][0] - mx,
                                        shell[best[0]][1] - my)):
            best = (j, ang)
    v = best[0]
    rot = hole[mi:] + hole[:mi]
    # ... shell[v] -> M -> around the hole -> M -> shell[v] -> ...
    return shell[:v + 1] + rot + [rot[0]] + shell[v:]


def triangulate_polygon(g: Optional[Geometry]) -> Optional[Geometry]:
    """GEOMETRYCOLLECTION of triangle POLYGONs covering the input areal
    geometry (PostGIS ST_TriangulatePolygon; ear-clip triangulation, not
    constrained-Delaunay — see module docstring)."""
    if g is None:
        return None
    if g.type_id not in (POLYGON, MULTIPOLYGON, GEOMETRYCOLLECTION):
        raise ValueError(
            "ST_TriangulatePolygon expects areal input "
            f"(got type id {g.type_id})"
        )
    g = force_polygon_ccw(g)  # shells CCW, holes CW — what the clipper wants
    polys = [g] if g.type_id == POLYGON else [
        s for s in g.coords if s.type_id == POLYGON]
    if g.type_id == GEOMETRYCOLLECTION:
        polys = []

        def walk(x):
            if x.type_id == POLYGON:
                polys.append(x)
            elif x.type_id in (MULTIPOLYGON, GEOMETRYCOLLECTION):
                for s in x.coords:
                    walk(s)

        walk(g)
    tris: List[Geometry] = []
    for p in polys:
        if not p.coords or len(p.coords[0]) < 4:
            continue
        shell = [tuple(v) for v in p.coords[0][:-1, :2]]
        holes = [[tuple(v) for v in r[:-1, :2]] for r in p.coords[1:]
                 if len(r) >= 4]
        # splice holes right-to-left so earlier bridges stay valid
        for hole in sorted(holes, key=lambda h: -max(q[0] for q in h)):
            shell = _bridge_hole(shell, hole)
        for a, b, c in _ear_clip(shell):
            ring = np.array([a, b, c, a], dtype=np.float64)
            tris.append(Geometry(POLYGON, [ring]))
    return Geometry(GEOMETRYCOLLECTION, tris)


# ---------------------------------------------------------------------------
# snap
# ---------------------------------------------------------------------------

def snap(src: Optional[Geometry], ref: Optional[Geometry],
         tol: float) -> Optional[Geometry]:
    """GEOS-style snapping of ``src`` to ``ref``'s vertices (PostGIS
    ST_Snap): (1) every source vertex within ``tol`` of a reference
    vertex moves onto the nearest one; (2) reference vertices within
    ``tol`` of a source segment (and not already a segment endpoint) are
    inserted into it."""
    if src is None or ref is None:
        return None
    rv = np.unique(ref.all_coords()[:, :2], axis=0)
    if len(rv) == 0 or tol < 0:
        return src

    def snap_arr(arr: np.ndarray, is_ring: bool) -> np.ndarray:
        if len(arr) == 0:
            return arr.copy()
        pts = arr[:, :2].copy()
        # phase 1: vertex snap
        d = np.hypot(pts[:, None, 0] - rv[None, :, 0],
                     pts[:, None, 1] - rv[None, :, 1])
        j = np.argmin(d, axis=1)
        hit = d[np.arange(len(pts)), j] <= tol
        pts[hit] = rv[j[hit]]
        if is_ring:
            pts[-1] = pts[0]
        # phase 2: insert reference vertices lying on segments
        out = [pts[0]]
        for i in range(len(pts) - 1):
            a, b = pts[i], pts[i + 1]
            ab = b - a
            L2 = float(ab @ ab)
            inserts = []
            if L2 > 0:
                t = ((rv - a) @ ab) / L2
                q = a + t[:, None] * ab
                dd = np.hypot(rv[:, 0] - q[:, 0], rv[:, 1] - q[:, 1])
                mask = (t > 1e-12) & (t < 1 - 1e-12) & (dd <= tol)
                cand = rv[mask]
                order = np.argsort(t[mask])
                for v in cand[order]:
                    if not (np.allclose(v, a) or np.allclose(v, b)):
                        inserts.append(v)
            out.extend(inserts)
            out.append(b)
        res = np.array(out, dtype=np.float64)
        # drop consecutive duplicates created by snapping
        keep = np.concatenate([[True], np.any(np.diff(res, axis=0) != 0,
                                              axis=1)])
        res = res[keep]
        if is_ring and (len(res) < 2 or not np.all(res[0] == res[-1])):
            res = np.vstack([res, res[:1]])
        return res

    def walk(geom: Geometry) -> Geometry:
        t = geom.type_id
        if t == POINT:
            return Geometry(t, snap_arr(geom.coords, False)[:1])
        if t == LINESTRING:
            return Geometry(t, snap_arr(geom.coords, False))
        if t == POLYGON:
            return Geometry(t, [snap_arr(r, True) for r in geom.coords])
        return Geometry(t, [walk(s) for s in geom.coords])

    return walk(src)


# ---------------------------------------------------------------------------
# shared paths
# ---------------------------------------------------------------------------

def _collinear_overlap(a0, a1, b0, b1):
    """Overlap of collinear segments as (p, q, same_direction) or None."""
    da = (a1[0] - a0[0], a1[1] - a0[1])
    db = (b1[0] - b0[0], b1[1] - b0[1])
    cr = da[0] * db[1] - da[1] * db[0]
    if abs(cr) > 1e-12 * (math.hypot(*da) * math.hypot(*db)):
        return None
    # b0 must lie on the a-line
    if abs(_cross(a0, a1, b0)) > 1e-9 * max(1.0, math.hypot(*da)):
        return None
    L2 = da[0] ** 2 + da[1] ** 2
    if L2 == 0:
        return None
    t0 = ((b0[0] - a0[0]) * da[0] + (b0[1] - a0[1]) * da[1]) / L2
    t1 = ((b1[0] - a0[0]) * da[0] + (b1[1] - a0[1]) * da[1]) / L2
    same = t1 >= t0
    lo, hi = (t0, t1) if same else (t1, t0)
    lo, hi = max(0.0, lo), min(1.0, hi)
    if hi - lo <= 1e-12:
        return None
    p = (a0[0] + lo * da[0], a0[1] + lo * da[1])
    q = (a0[0] + hi * da[0], a0[1] + hi * da[1])
    return p, q, same


def _all_segments(g: Geometry) -> List[Tuple]:
    segs: List[Tuple] = []

    def walk(x: Geometry):
        t = x.type_id
        if t == LINESTRING:
            c = x.coords
            for i in range(len(c) - 1):
                segs.append((tuple(c[i, :2]), tuple(c[i + 1, :2])))
        elif t in (MULTILINESTRING, GEOMETRYCOLLECTION):
            for s in x.coords:
                walk(s)
        elif t in (POINT, MULTIPOINT, POLYGON, MULTIPOLYGON):
            raise ValueError("ST_SharedPaths expects lineal input")

    walk(g)
    return segs


def shared_paths(a: Optional[Geometry],
                 b: Optional[Geometry]) -> Optional[Geometry]:
    """GEOMETRYCOLLECTION(MULTILINESTRING shared-same-direction,
    MULTILINESTRING shared-opposite-direction) — PostGIS ST_SharedPaths
    argument order (paths oriented along ``a``)."""
    if a is None or b is None:
        return None
    same: List[Geometry] = []
    opp: List[Geometry] = []
    seen = set()
    for a0, a1 in _all_segments(a):
        for b0, b1 in _all_segments(b):
            ov = _collinear_overlap(a0, a1, b0, b1)
            if ov is None:
                continue
            p, q, is_same = ov
            key = (tuple(np.round(p, 12)), tuple(np.round(q, 12)), is_same)
            if key in seen:
                continue
            seen.add(key)
            seg = Geometry(LINESTRING, np.array([p, q], dtype=np.float64))
            (same if is_same else opp).append(seg)
    return Geometry(GEOMETRYCOLLECTION, [
        Geometry(MULTILINESTRING, same),
        Geometry(MULTILINESTRING, opp),
    ])
