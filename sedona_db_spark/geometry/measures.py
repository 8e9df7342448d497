"""Linear-referencing (M) and 3D measure kernels (PostGIS names:
ST_InterpolatePoint, ST_LocateAlong, ST_LocateBetween, ST_3DDistance,
ST_3DLength, ST_3DMaxDistance, ST_Force3DM, ST_Force4D).

The reference engine carries Z/M through its WKB model but stops at the
accessor surface (ST_Z/ST_M/ST_HasZ/ST_HasM/ST_ZMFlag); these complete
the measure-aware family a PostGIS user expects.  Pure numpy over the
WKB Geometry model — None-propagating, loud on domain errors.

Deviations (documented, pinned by tests):
* ``locate_along`` ignores PostGIS's rarely-used ``offset`` argument.
* M interpolation is linear within each segment (the PostGIS/GEOS rule);
  no monotonicity requirement is imposed — every segment whose M range
  brackets the target yields a point.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

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


def _m_col(g: Geometry) -> int:
    """Column index of the M ordinate; raises when the geometry has none
    (PostGIS errors the same way)."""
    if not g.has_m:
        raise ValueError(
            "geometry has no M ordinate; build one with ST_PointM/ST_PointZM "
            "or 'LINESTRING M (...)' WKT"
        )
    return 2 + int(g.has_z)


def _lines_of(g: Geometry) -> List[Geometry]:
    if g.type_id == LINESTRING:
        return [g]
    if g.type_id in (MULTILINESTRING, GEOMETRYCOLLECTION):
        out: List[Geometry] = []
        for s in g.coords:
            out.extend(_lines_of(s))
        return out
    raise ValueError(
        f"expected a lineal geometry, got type id {g.type_id}"
    )


# ---------------------------------------------------------------------------
# ST_InterpolatePoint
# ---------------------------------------------------------------------------

def interpolate_point(line: Optional[Geometry],
                      pt: Optional[Geometry]) -> Optional[float]:
    """M value at the point on ``line`` closest to ``pt`` (PostGIS
    ST_InterpolatePoint): locate the nearest point over every segment,
    then linearly interpolate that segment's M."""
    if line is None or pt is None:
        return None
    if pt.type_id != POINT or len(pt.coords) == 0:
        raise ValueError("ST_InterpolatePoint: second argument must be a POINT")
    mc = _m_col(line)
    px, py = float(pt.coords[0, 0]), float(pt.coords[0, 1])
    best_d, best_m = math.inf, None
    for ln in _lines_of(line):
        c = ln.coords
        if len(c) == 0:
            continue
        if len(c) == 1:
            d = math.hypot(px - c[0, 0], py - c[0, 1])
            if d < best_d:
                best_d, best_m = d, float(c[0, mc])
            continue
        ax, ay = c[:-1, 0], c[:-1, 1]
        bx, by = c[1:, 0], c[1:, 1]
        dx, dy = bx - ax, by - ay
        L2 = dx * dx + dy * dy
        with np.errstate(invalid="ignore", divide="ignore"):
            t = np.where(L2 > 0, ((px - ax) * dx + (py - ay) * dy) / L2, 0.0)
        t = np.clip(t, 0.0, 1.0)
        qx, qy = ax + t * dx, ay + t * dy
        d = np.hypot(px - qx, py - qy)
        i = int(np.argmin(d))
        if float(d[i]) < best_d:
            best_d = float(d[i])
            m0, m1 = float(c[i, mc]), float(c[i + 1, mc])
            best_m = m0 + float(t[i]) * (m1 - m0)
    return best_m


# ---------------------------------------------------------------------------
# ST_LocateAlong / ST_LocateBetween
# ---------------------------------------------------------------------------

def locate_along(g: Optional[Geometry], m: float) -> Optional[Geometry]:
    """Points on the (lineal or puntal) geometry where the measure equals
    ``m`` — linear interpolation inside each bracketing segment
    (PostGIS ST_LocateAlong, offset unsupported).  Returns MULTIPOINT."""
    if g is None:
        return None
    if g.type_id in (POINT, MULTIPOINT):
        mc = _m_col(g)
        pts = [g] if g.type_id == POINT else list(g.coords)
        hits = [p for p in pts if len(p.coords) and float(p.coords[0, mc]) == m]
        return Geometry(MULTIPOINT,
                        [Geometry(POINT, p.coords.copy(), g.has_z, g.has_m)
                         for p in hits], g.has_z, g.has_m)
    mc = _m_col(g)
    out: List[Geometry] = []
    seen = set()
    for ln in _lines_of(g):
        c = ln.coords
        for i in range(len(c) - 1):
            m0, m1 = float(c[i, mc]), float(c[i + 1, mc])
            lo, hi = (m0, m1) if m0 <= m1 else (m1, m0)
            if not (lo <= m <= hi):
                continue
            t = 0.0 if m1 == m0 else (m - m0) / (m1 - m0)
            p = c[i] + t * (c[i + 1] - c[i])
            key = tuple(np.round(p, 12))
            if key in seen:
                continue
            seen.add(key)
            out.append(Geometry(POINT, p[None, :].copy(), g.has_z, g.has_m))
    return Geometry(MULTIPOINT, out, g.has_z, g.has_m)


def locate_between(g: Optional[Geometry], m0: float,
                   m1: float) -> Optional[Geometry]:
    """The parts of a lineal geometry whose measure lies in [m0, m1],
    segments clipped by linear M interpolation (PostGIS ST_LocateBetween).
    Returns MULTILINESTRING (degenerate clips are dropped, matching the
    GEOS dimension-collapse rule for lineal input)."""
    if g is None:
        return None
    if m1 < m0:
        raise ValueError(f"ST_LocateBetween: empty measure range [{m0}, {m1}]")
    mc = _m_col(g)
    parts: List[Geometry] = []
    for ln in _lines_of(g):
        c = ln.coords
        run: List[np.ndarray] = []

        def flush():
            if len(run) >= 2:
                parts.append(Geometry(LINESTRING,
                                      np.vstack(run), g.has_z, g.has_m))
            run.clear()

        for i in range(len(c) - 1):
            a, b = c[i], c[i + 1]
            ma, mb = float(a[mc]), float(b[mc])
            lo, hi = (ma, mb) if ma <= mb else (mb, ma)
            if hi < m0 or lo > m1:
                flush()
                continue
            # entry/exit fractions of the [m0, m1] window along the segment
            ta, tb = 0.0, 1.0
            if mb != ma:
                t_at_m0 = (m0 - ma) / (mb - ma)
                t_at_m1 = (m1 - ma) / (mb - ma)
                t_lo, t_hi = sorted((t_at_m0, t_at_m1))
                ta, tb = max(0.0, t_lo), min(1.0, t_hi)
            pa = a + ta * (b - a)
            pb = a + tb * (b - a)
            if not run or not np.allclose(run[-1], pa, atol=1e-12):
                flush()
                run.append(pa)
            run.append(pb)
        flush()
    return Geometry(MULTILINESTRING, parts, g.has_z, g.has_m)


# ---------------------------------------------------------------------------
# 3D measures
# ---------------------------------------------------------------------------

def _xyz(g: Geometry) -> np.ndarray:
    """(n, 3) vertex array; Z = 0 for 2D input (the PostGIS convention
    for mixed-dimension 3D distance)."""
    c = g.all_coords()
    if g.has_z:
        return c[:, :3].astype(np.float64)
    out = np.zeros((len(c), 3), dtype=np.float64)
    out[:, :2] = c[:, :2]
    return out


def _segments_xyz(g: Geometry) -> np.ndarray:
    """(k, 2, 3) 3D segment array over every line/ring."""
    segs: List[np.ndarray] = []

    def walk(geom: Geometry):
        t = geom.type_id
        if t == LINESTRING:
            c = geom.coords
            xyz = np.zeros((len(c), 3))
            xyz[:, :2] = c[:, :2]
            if geom.has_z:
                xyz[:, 2] = c[:, 2]
            if len(c) >= 2:
                segs.append(np.stack([xyz[:-1], xyz[1:]], axis=1))
        elif t == POLYGON:
            for r in geom.coords:
                xyz = np.zeros((len(r), 3))
                xyz[:, :2] = r[:, :2]
                if geom.has_z:
                    xyz[:, 2] = r[:, 2]
                if len(r) >= 2:
                    segs.append(np.stack([xyz[:-1], xyz[1:]], axis=1))
        elif t in (MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION,
                   MULTIPOINT):
            for s in geom.coords:
                walk(s)

    walk(g)
    if not segs:
        return np.empty((0, 2, 3))
    return np.concatenate(segs, axis=0)


def length_3d(g: Optional[Geometry]) -> Optional[float]:
    """Sum of 3D segment lengths over lineal parts (PostGIS ST_3DLength);
    2D input degrades to ST_Length."""
    if g is None:
        return None
    total = 0.0
    if g.type_id in (POINT, MULTIPOINT, POLYGON, MULTIPOLYGON):
        return 0.0
    for ln in _lines_of(g):
        c = ln.coords
        if len(c) < 2:
            continue
        d2 = (np.diff(c[:, 0]) ** 2 + np.diff(c[:, 1]) ** 2)
        if ln.has_z:
            d2 = d2 + np.diff(c[:, 2]) ** 2
        total += float(np.sum(np.sqrt(d2)))
    return total


def _pt_seg_dist_3d(p: np.ndarray, segs: np.ndarray) -> float:
    a, b = segs[:, 0], segs[:, 1]
    ab = b - a
    L2 = np.einsum("ij,ij->i", ab, ab)
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.where(L2 > 0, np.einsum("ij,ij->i", p - a, ab) / L2, 0.0)
    t = np.clip(t, 0.0, 1.0)
    q = a + t[:, None] * ab
    return float(np.min(np.linalg.norm(p - q, axis=1)))


def _seg_seg_dist_3d(s1: np.ndarray, s2: np.ndarray) -> float:
    """Min distance between two 3D segments (Eberly's clamped closed
    form)."""
    p1, q1 = s1
    p2, q2 = s2
    d1, d2 = q1 - p1, q2 - p2
    r = p1 - p2
    a = float(d1 @ d1)
    e = float(d2 @ d2)
    f = float(d2 @ r)
    if a <= 1e-300 and e <= 1e-300:
        return float(np.linalg.norm(r))
    if a <= 1e-300:
        s, t = 0.0, min(max(f / e, 0.0), 1.0)
    else:
        c = float(d1 @ r)
        if e <= 1e-300:
            t, s = 0.0, min(max(-c / a, 0.0), 1.0)
        else:
            b = float(d1 @ d2)
            den = a * e - b * b
            s = min(max((b * f - c * e) / den, 0.0), 1.0) if den > 0 else 0.0
            t = (b * s + f) / e
            if t < 0.0:
                t, s = 0.0, min(max(-c / a, 0.0), 1.0)
            elif t > 1.0:
                t, s = 1.0, min(max((b - c) / a, 0.0), 1.0)
    return float(np.linalg.norm((p1 + s * d1) - (p2 + t * d2)))


def distance_3d(a: Optional[Geometry],
                b: Optional[Geometry]) -> Optional[float]:
    """Minimum 3D distance (PostGIS ST_3DDistance): exact over vertex and
    segment sets (points/lines/ring boundaries); 2D input is treated as
    Z = 0.  Areal interiors are not probed (boundary distance; a point
    INSIDE a flat polygon at the same Z still reports its boundary
    distance — documented deviation from the PostGIS solid model)."""
    if a is None or b is None:
        return None
    if a.is_empty or b.is_empty:
        return None
    pa, pb = _xyz(a), _xyz(b)
    sa, sb = _segments_xyz(a), _segments_xyz(b)
    best = math.inf
    if len(pa) and len(pb):
        d = np.linalg.norm(pa[:, None, :] - pb[None, :, :], axis=2)
        best = min(best, float(np.min(d)))
    if len(sb):
        for p in pa:
            best = min(best, _pt_seg_dist_3d(p, sb))
    if len(sa):
        for p in pb:
            best = min(best, _pt_seg_dist_3d(p, sa))
    if len(sa) and len(sb) and best > 0:
        for s1 in sa:
            for s2 in sb:
                best = min(best, _seg_seg_dist_3d(s1, s2))
                if best == 0.0:
                    return 0.0
    return best


def max_distance_3d(a: Optional[Geometry],
                    b: Optional[Geometry]) -> Optional[float]:
    """Max vertex-pair 3D distance (PostGIS ST_3DMaxDistance — realized
    at vertices for piecewise-linear geometry)."""
    if a is None or b is None or a.is_empty or b.is_empty:
        return None
    pa, pb = _xyz(a), _xyz(b)
    d = np.linalg.norm(pa[:, None, :] - pb[None, :, :], axis=2)
    return float(np.max(d))


# ---------------------------------------------------------------------------
# dimension forcing
# ---------------------------------------------------------------------------

def _map_zm(g: Geometry, has_z: bool, has_m: bool,
            zfill: float, mfill: float) -> Geometry:
    src_z, src_m = g.has_z, g.has_m

    def conv(arr: np.ndarray) -> np.ndarray:
        n = len(arr)
        cols = [arr[:, 0], arr[:, 1]]
        if has_z:
            cols.append(arr[:, 2] if src_z else np.full(n, zfill))
        if has_m:
            mi = 2 + int(src_z)
            cols.append(arr[:, mi] if src_m else np.full(n, mfill))
        return np.column_stack(cols) if n else np.empty(
            (0, 2 + int(has_z) + int(has_m)))

    t = g.type_id
    if t in (POINT, LINESTRING):
        return Geometry(t, conv(g.coords), has_z, has_m)
    if t == POLYGON:
        return Geometry(t, [conv(r) for r in g.coords], has_z, has_m)
    return Geometry(t, [_map_zm(s, has_z, has_m, zfill, mfill)
                        for s in g.coords], has_z, has_m)


def force_3dm(g: Optional[Geometry], m: float = 0.0) -> Optional[Geometry]:
    """XYM layout, filling missing M (PostGIS ST_Force3DM drops Z)."""
    if g is None:
        return None
    return _map_zm(g, False, True, 0.0, m)


def force_4d(g: Optional[Geometry], z: float = 0.0,
             m: float = 0.0) -> Optional[Geometry]:
    """XYZM layout, filling missing Z/M (PostGIS ST_Force4D)."""
    if g is None:
        return None
    return _map_zm(g, True, True, z, m)
