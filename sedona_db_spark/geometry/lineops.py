"""Line / ring structure kernels (PostGIS-named; the reference engine
stops at ST_PointN/ST_Points — these complete the structural-editing
surface a PostGIS user expects).

All pure numpy over the WKB Geometry model; every function is
None-propagating and loud on domain errors (wrong geometry type, index
out of range) — silent NULLs hide pipeline bugs at 10^12 rows.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from . import wkb
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
# structure accessors
# ---------------------------------------------------------------------------

def boundary(g: Optional[Geometry]) -> Optional[Geometry]:
    """Topological boundary (PostGIS ST_Boundary):
    point/multipoint -> GEOMETRYCOLLECTION EMPTY, linestring -> MULTIPOINT
    of its endpoints (closed -> MULTIPOINT EMPTY), polygon -> its rings as
    LINESTRING/MULTILINESTRING, multis distribute over parts."""
    if g is None:
        return None
    t = g.type_id
    if t in (POINT, MULTIPOINT):
        return Geometry(GEOMETRYCOLLECTION, [], g.has_z, g.has_m)
    if t == LINESTRING:
        if len(g.coords) == 0 or bool(np.all(g.coords[0] == g.coords[-1])):
            return Geometry(MULTIPOINT, [], g.has_z, g.has_m)
        pts = [Geometry(POINT, g.coords[:1].copy(), g.has_z, g.has_m),
               Geometry(POINT, g.coords[-1:].copy(), g.has_z, g.has_m)]
        return Geometry(MULTIPOINT, pts, g.has_z, g.has_m)
    if t == POLYGON:
        rings = [Geometry(LINESTRING, r.copy(), g.has_z, g.has_m)
                 for r in g.coords if len(r)]
        if len(rings) == 1:
            return rings[0]
        return Geometry(MULTILINESTRING, rings, g.has_z, g.has_m)
    if t == MULTILINESTRING:
        # mod-2 rule: points appearing an odd number of times as endpoints
        ends: dict = {}
        for sub in g.coords:
            if len(sub.coords) == 0:
                continue
            if bool(np.all(sub.coords[0] == sub.coords[-1])):
                continue
            for row in (sub.coords[0], sub.coords[-1]):
                k = tuple(row[:2])
                ends[k] = ends.get(k, 0) + 1
        pts = [Geometry(POINT, np.array([[x, y]], dtype=np.float64), False, False)
               for (x, y), c in sorted(ends.items()) if c % 2 == 1]
        return Geometry(MULTIPOINT, pts, False, False)
    if t == MULTIPOLYGON:
        rings: List[Geometry] = []
        for sub in g.coords:
            rings.extend(Geometry(LINESTRING, r.copy(), g.has_z, g.has_m)
                         for r in sub.coords if len(r))
        return Geometry(MULTILINESTRING, rings, g.has_z, g.has_m)
    raise ValueError(
        "ST_Boundary of a GEOMETRYCOLLECTION is undefined (PostGIS raises "
        "the same way); extract typed parts with ST_CollectionExtract first"
    )


def reverse(g: Optional[Geometry]) -> Optional[Geometry]:
    """Vertex order reversed in every ring/line (PostGIS ST_Reverse)."""
    if g is None:
        return None
    t = g.type_id
    if t in (POINT, LINESTRING):
        return Geometry(t, g.coords[::-1].copy(), g.has_z, g.has_m)
    if t == POLYGON:
        return Geometry(POLYGON, [r[::-1].copy() for r in g.coords],
                        g.has_z, g.has_m)
    return Geometry(t, [reverse(s) for s in g.coords], g.has_z, g.has_m)


def exterior_ring(g: Optional[Geometry]) -> Optional[Geometry]:
    """Polygon shell as a LINESTRING; NULL for non-polygons (PostGIS)."""
    if g is None or g.type_id != POLYGON:
        return None
    if not g.coords:
        return Geometry(LINESTRING, np.empty((0, g.ndim)), g.has_z, g.has_m)
    return Geometry(LINESTRING, g.coords[0].copy(), g.has_z, g.has_m)


def num_interior_rings(g: Optional[Geometry]) -> Optional[int]:
    if g is None or g.type_id != POLYGON:
        return None
    return max(0, len(g.coords) - 1)


def interior_ring_n(g: Optional[Geometry], n: int) -> Optional[Geometry]:
    """1-based interior ring accessor; NULL when out of range (PostGIS)."""
    if g is None or g.type_id != POLYGON:
        return None
    if n < 1 or n > len(g.coords) - 1:
        return None
    return Geometry(LINESTRING, g.coords[n].copy(), g.has_z, g.has_m)


def geometry_n(g: Optional[Geometry], n: int) -> Optional[Geometry]:
    """1-based part accessor over multi/collections; a simple geometry is
    its own part 1 (PostGIS ST_GeometryN)."""
    if g is None:
        return None
    parts = g.geometries()
    if n < 1 or n > len(parts):
        return None
    return parts[n - 1]


def collection_extract(g: Optional[Geometry], dim: int) -> Optional[Geometry]:
    """Parts of the requested dimension (1=points, 2=lines, 3=polygons)
    as the matching MULTI type (PostGIS ST_CollectionExtract)."""
    if g is None:
        return None
    if dim not in (1, 2, 3):
        raise ValueError(f"ST_CollectionExtract type must be 1, 2 or 3, got {dim}")
    want = {1: POINT, 2: LINESTRING, 3: POLYGON}[dim]
    multi = {1: MULTIPOINT, 2: MULTILINESTRING, 3: MULTIPOLYGON}[dim]

    out: List[Geometry] = []

    def walk(geom: Geometry):
        if geom.type_id == want:
            out.append(geom)
        elif geom.type_id in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON,
                              GEOMETRYCOLLECTION):
            for s in geom.coords:
                walk(s)

    walk(g)
    return Geometry(multi, out, any(s.has_z for s in out), any(s.has_m for s in out))


def force_2d(g: Optional[Geometry]) -> Optional[Geometry]:
    if g is None:
        return None
    if not g.has_z and not g.has_m:
        return g

    def strip(geom: Geometry) -> Geometry:
        if geom.type_id in (POINT, LINESTRING):
            return Geometry(geom.type_id, geom.coords[:, :2].copy(), False, False)
        if geom.type_id == POLYGON:
            return Geometry(POLYGON, [r[:, :2].copy() for r in geom.coords],
                            False, False)
        return Geometry(geom.type_id, [strip(s) for s in geom.coords], False, False)

    return strip(g)


def force_3d(g: Optional[Geometry], z: float = 0.0) -> Optional[Geometry]:
    """Add Z (default 0) where missing; existing Z is kept, M is kept."""
    if g is None or g.has_z:
        return g

    def widen(arr: np.ndarray) -> np.ndarray:
        # columns are x, y[, m] -> x, y, z[, m]
        n = len(arr)
        cols = [arr[:, 0], arr[:, 1], np.full(n, float(z))]
        if g.has_m and arr.shape[1] > 2:
            cols.append(arr[:, 2])
        return np.column_stack(cols) if n else np.empty((0, 3 + int(g.has_m)))

    def walk(geom: Geometry) -> Geometry:
        if geom.type_id in (POINT, LINESTRING):
            return Geometry(geom.type_id, widen(geom.coords), True, g.has_m)
        if geom.type_id == POLYGON:
            return Geometry(POLYGON, [widen(r) for r in geom.coords], True, g.has_m)
        return Geometry(geom.type_id, [walk(s) for s in geom.coords], True, g.has_m)

    return walk(g)


# ---------------------------------------------------------------------------
# vertex editing
# ---------------------------------------------------------------------------

def _require_line(g: Geometry, fn: str) -> None:
    if g.type_id != LINESTRING:
        raise ValueError(f"{fn} requires a LINESTRING, got {wkb.WKT_NAMES.get(g.type_id, g.type_id)}")


def add_point(line: Optional[Geometry], pt: Optional[Geometry],
              position: int = -1) -> Optional[Geometry]:
    """Insert `pt` at 0-based `position` (-1 = append; PostGIS ST_AddPoint)."""
    if line is None or pt is None:
        return None
    _require_line(line, "ST_AddPoint")
    if pt.type_id != POINT or len(pt.coords) == 0:
        raise ValueError("ST_AddPoint second argument must be a non-empty POINT")
    n = len(line.coords)
    if position == -1:
        position = n
    if position < 0 or position > n:
        raise ValueError(f"ST_AddPoint position {position} out of range [0, {n}]")
    row = np.zeros((1, line.ndim))
    row[0, :2] = pt.coords[0, :2]
    if line.has_z and pt.has_z:
        row[0, 2] = pt.coords[0, 2]
    arr = np.concatenate([line.coords[:position], row, line.coords[position:]])
    return Geometry(LINESTRING, arr, line.has_z, line.has_m)


def remove_point(line: Optional[Geometry], offset: int) -> Optional[Geometry]:
    """Drop the vertex at 0-based `offset` (PostGIS ST_RemovePoint)."""
    if line is None:
        return None
    _require_line(line, "ST_RemovePoint")
    n = len(line.coords)
    if offset < 0 or offset >= n:
        raise ValueError(f"ST_RemovePoint offset {offset} out of range [0, {n})")
    if n <= 2:
        raise ValueError("ST_RemovePoint would leave fewer than 2 vertices")
    arr = np.delete(line.coords, offset, axis=0)
    return Geometry(LINESTRING, arr, line.has_z, line.has_m)


def set_point(line: Optional[Geometry], index: int,
              pt: Optional[Geometry]) -> Optional[Geometry]:
    """Replace the vertex at `index` (0-based; negative counts from the
    end, PostGIS ST_SetPoint)."""
    if line is None or pt is None:
        return None
    _require_line(line, "ST_SetPoint")
    if pt.type_id != POINT or len(pt.coords) == 0:
        raise ValueError("ST_SetPoint third argument must be a non-empty POINT")
    n = len(line.coords)
    if index < 0:
        index += n
    if index < 0 or index >= n:
        raise ValueError(f"ST_SetPoint index out of range [{-n}, {n})")
    arr = line.coords.copy()
    arr[index, :2] = pt.coords[0, :2]
    if line.has_z and pt.has_z:
        arr[index, 2] = pt.coords[0, 2]
    return Geometry(LINESTRING, arr, line.has_z, line.has_m)


# ---------------------------------------------------------------------------
# metric line ops
# ---------------------------------------------------------------------------

def segmentize(g: Optional[Geometry], max_len: float) -> Optional[Geometry]:
    """Insert evenly spaced vertices so no segment exceeds `max_len`
    (PostGIS ST_Segmentize): a segment of length L splits into
    ceil(L / max_len) equal pieces. Z/M interpolate linearly."""
    if g is None:
        return None
    if max_len <= 0:
        raise ValueError(f"ST_Segmentize max length must be > 0, got {max_len}")

    def densify(arr: np.ndarray) -> np.ndarray:
        if len(arr) < 2:
            return arr
        pieces = [arr[:1]]
        for i in range(len(arr) - 1):
            a, b = arr[i], arr[i + 1]
            L = float(np.hypot(b[0] - a[0], b[1] - a[1]))
            k = max(1, int(np.ceil(L / max_len - 1e-12))) if L > 0 else 1
            ts = np.arange(1, k + 1, dtype=np.float64) / k
            pieces.append(a[None, :] + ts[:, None] * (b - a)[None, :])
        return np.concatenate(pieces)

    def walk(geom: Geometry) -> Geometry:
        if geom.type_id == POINT:
            return geom
        if geom.type_id == LINESTRING:
            return Geometry(LINESTRING, densify(geom.coords), geom.has_z, geom.has_m)
        if geom.type_id == POLYGON:
            return Geometry(POLYGON, [densify(r) for r in geom.coords],
                            geom.has_z, geom.has_m)
        return Geometry(geom.type_id, [walk(s) for s in geom.coords],
                        geom.has_z, geom.has_m)

    return walk(g)


def line_substring(line: Optional[Geometry], start: float,
                   end: float) -> Optional[Geometry]:
    """The part of the line between length fractions [start, end]
    (PostGIS ST_LineSubstring). start == end collapses to a POINT."""
    if line is None:
        return None
    _require_line(line, "ST_LineSubstring")
    if not (0.0 <= start <= 1.0 and 0.0 <= end <= 1.0):
        raise ValueError("ST_LineSubstring fractions must be within [0, 1]")
    if start > end:
        raise ValueError("ST_LineSubstring start fraction exceeds end fraction")
    arr = line.coords
    if len(arr) < 2:
        return line
    seg = np.diff(arr[:, :2], axis=0)
    lens = np.hypot(seg[:, 0], seg[:, 1])
    total = float(lens.sum())
    if total == 0.0:
        return Geometry(POINT, arr[:1].copy(), line.has_z, line.has_m) \
            if start == end else line
    cum = np.concatenate([[0.0], np.cumsum(lens)])

    def locate(frac: float) -> np.ndarray:
        d = frac * total
        i = int(np.searchsorted(cum, d, side="right") - 1)
        i = min(i, len(arr) - 2)
        t = 0.0 if lens[i] == 0 else (d - cum[i]) / lens[i]
        return arr[i] + t * (arr[i + 1] - arr[i])

    if start == end:
        return Geometry(POINT, locate(start)[None, :].copy(),
                        line.has_z, line.has_m)
    d0, d1 = start * total, end * total
    inner = (cum > d0 + 1e-12) & (cum < d1 - 1e-12)
    rows = [locate(start)[None, :], arr[inner], locate(end)[None, :]]
    return Geometry(LINESTRING, np.concatenate(rows), line.has_z, line.has_m)


def line_merge(g: Optional[Geometry]) -> Optional[Geometry]:
    """Stitch the lines of a (MULTI)LINESTRING wherever exactly two ends
    meet (PostGIS ST_LineMerge). Junction points of degree != 2 stay
    breaks. Returns LINESTRING when one path remains, else
    MULTILINESTRING; non-lineal input raises."""
    if g is None:
        return None
    if g.type_id == LINESTRING:
        return g
    if g.type_id != MULTILINESTRING:
        raise ValueError("ST_LineMerge requires a (MULTI)LINESTRING")
    lines = [s.coords.copy() for s in g.coords if len(s.coords) >= 2]
    if not lines:
        return Geometry(MULTILINESTRING, [], g.has_z, g.has_m)

    def key(row) -> tuple:
        return tuple(np.round(row[:2], 12))

    # endpoint -> list of (line index, which end)
    ends: dict = {}
    for i, arr in enumerate(lines):
        for e, row in ((0, arr[0]), (1, arr[-1])):
            ends.setdefault(key(row), []).append((i, e))

    used = [False] * len(lines)
    merged: List[np.ndarray] = []
    for i in range(len(lines)):
        if used[i]:
            continue
        used[i] = True
        path = lines[i]
        # extend forward then backward; only through degree-2 junctions
        for direction in (1, 0):
            while True:
                endpoint = path[-1] if direction == 1 else path[0]
                cands = [c for c in ends.get(key(endpoint), ())
                         if not used[c[0]]]
                if len(ends.get(key(endpoint), ())) != 2 or len(cands) != 1:
                    break
                j, e = cands[0]
                used[j] = True
                nxt = lines[j] if e == 0 else lines[j][::-1]
                if direction == 1:
                    path = np.concatenate([path, nxt[1:]])
                else:
                    path = np.concatenate([nxt[::-1][:-1], path])
        merged.append(path)
    if len(merged) == 1:
        return Geometry(LINESTRING, merged[0], g.has_z, g.has_m)
    return Geometry(
        MULTILINESTRING,
        [Geometry(LINESTRING, m, g.has_z, g.has_m) for m in merged],
        g.has_z, g.has_m,
    )


def line_crossing_direction(l1: Optional[Geometry],
                            l2: Optional[Geometry]) -> Optional[int]:
    """PostGIS ST_LineCrossingDirection value set over proper crossings
    of ``l2`` across ``l1``:

    * 0  — no crossing
    * -1 / 1 — single crossing, l2 passes to the LEFT / RIGHT of l1's
      direction of travel
    * -2 / 2 — multiple crossings, LAST crossing left / right
    * -3 / 3 — multiple crossings ending on the SAME side as the first

    Touch-only contacts (l2 meets l1 without passing through) do not
    count — the PostGIS rule.  Crossings are ordered along l1."""
    if l1 is None or l2 is None:
        return None
    if l1.type_id != LINESTRING or l2.type_id != LINESTRING:
        raise ValueError("ST_LineCrossingDirection expects two LINESTRINGs")
    a, b = l1.coords[:, :2], l2.coords[:, :2]

    def cross(o, p, q):
        return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])

    hits = []  # (position along l1, sign)
    for i in range(len(a) - 1):
        p0, p1 = a[i], a[i + 1]
        for j in range(len(b) - 1):
            q0, q1 = b[j], b[j + 1]
            d1 = cross(p0, p1, q0)
            d2 = cross(p0, p1, q1)
            d3 = cross(q0, q1, p0)
            d4 = cross(q0, q1, p1)
            if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)) \
                    and d1 != 0 and d2 != 0 and d3 != 0 and d4 != 0:
                # proper crossing; parametric position along l1's segment
                t = d3 / (d3 - d4)
                # l2 ends up on the side of sign(d2): d2 > 0 => q1 left
                hits.append((i + t, -1 if d2 > 0 else 1))
    if not hits:
        return 0
    hits.sort(key=lambda h: h[0])
    if len(hits) == 1:
        return hits[0][1]
    first, last = hits[0][1], hits[-1][1]
    if first == last:
        return 3 if last > 0 else -3
    return 2 if last > 0 else -2
