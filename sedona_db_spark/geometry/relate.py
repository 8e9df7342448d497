"""ST_Relate — the full DE-9IM intersection matrix, from scratch.

PostGIS/Sedona name; the reference registers only the 9 boolean
relation predicates (rust/sedona-geos/src/register.rs), so the full
matrix extends the surface the same way the other round-4 PostGIS
families do. The 9 predicates are each a PATTERN over this matrix, which
gives the differential test: matrix-derived predicates must agree with
the independent `geometry/algos.py` kernels on random mixed-type pairs.

Algorithm (exact, on the overlay engine's snap-rounded integer grid):

  1. collect the LINEWORK of both geometries (polygon rings, linestring
     paths) plus standalone puntal members, quantized to the shared grid,
  2. node every segment against every other (exact big-int orientation
     tests, `overlay._node_segments`) — after noding, every piece's
     relative interior lies in exactly one of {Interior, Boundary,
     Exterior} of each geometry, and every intersection point is a piece
     endpoint,
  3. classify each PIECE (dim-1 evidence) and each NODE POINT (dim-0
     evidence) against both geometries' I/B/E:
       - on-linework membership is set arithmetic on noded pieces (a
         piece collinear with the other geometry appears in both piece
         sets; a point on a linework is always a piece endpoint there),
       - areal side-of: exact integer crossing-parity PIP (doubled grid,
         so segment midpoints stay integral),
       - lineal boundary: the OGC mod-2 rule on path endpoints,
  4. areal-interior cells that pieces can't witness come from the exact
     predicate kernels: interiors-overlap => II=2, NOT covered_by(A,B)
     => IE=2 (and symmetrically EI), exterior-exterior is always 2,
  5. each cell is the MAX dimension over its evidence, F when none.

Heterogeneous GEOMETRYCOLLECTIONs raise NotImplementedError (GEOS < 3.9
rejected collections in relate entirely; homogeneous multis are fine).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from . import algos
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
from .overlay import (
    Pt,
    _node_segments,
    _pick_quantum,
    _quantize_open,
    _quantize_ring,
    _Seg,
    _subdivide,
)

_I, _B, _E = 0, 1, 2


def _class_of(g: Geometry) -> str:
    """'A' (areal), 'L' (lineal), 'P' (puntal) or '' (empty). Raises on
    heterogeneous collections."""
    kinds = set()
    if g.polygons():
        kinds.add("A")
    for ln in g.lines():
        if len(ln.coords):
            kinds.add("L")
    if _has_points(g):
        kinds.add("P")
    if len(kinds) > 1:
        raise NotImplementedError(
            "ST_Relate on heterogeneous GeometryCollections is not supported; "
            "relate homogeneous parts separately"
        )
    return kinds.pop() if kinds else ""


def _has_points(g: Geometry) -> bool:
    t = g.type_id
    if t == POINT:
        return len(g.coords) > 0
    if t in (MULTIPOINT, GEOMETRYCOLLECTION):
        return any(_has_points(p) for p in g.coords)
    return False


def _point_members(g: Geometry, q: float) -> Set[Pt]:
    out: Set[Pt] = set()
    t = g.type_id
    if t == POINT and len(g.coords):
        out.add((int(round(g.coords[0, 0] / q)), int(round(g.coords[0, 1] / q))))
    elif t in (MULTIPOINT, GEOMETRYCOLLECTION):
        for p in g.coords:
            out |= _point_members(p, q)
    return out


def _linework_paths(g: Geometry, q: float) -> List[List[Pt]]:
    """Quantized paths: polygon rings (closed, re-closed explicitly) and
    linestring paths (open)."""
    paths: List[List[Pt]] = []
    for poly in g.polygons():
        for ring in poly.coords:
            if len(ring) >= 2:
                pts = _quantize_ring(np.asarray(ring, float)[:, :2], q)
                if len(pts) >= 2:
                    paths.append(pts + [pts[0]])
    for ln in g.lines():
        if len(ln.coords) >= 2:
            pts = _quantize_open(np.asarray(ln.coords, float)[:, :2], q)
            if len(pts) >= 2:
                paths.append(pts)
    return paths


def _mod2_endpoints(g: Geometry, q: float) -> Set[Pt]:
    """OGC boundary of a lineal geometry: points that are an endpoint of
    an ODD number of paths (closed paths contribute none)."""
    count: Dict[Pt, int] = {}
    for ln in g.lines():
        if len(ln.coords) < 2:
            continue
        pts = _quantize_open(np.asarray(ln.coords, float)[:, :2], q)
        if len(pts) < 2 or pts[0] == pts[-1]:
            continue
        for p in (pts[0], pts[-1]):
            count[p] = count.get(p, 0) + 1
    return {p for p, c in count.items() if c % 2 == 1}


def _pip_parity_doubled(px2: int, py2: int, rings2: List[List[Pt]]) -> bool:
    """Exact even-odd point-in-polygon on the DOUBLED integer grid
    (coordinates x2 so piece midpoints stay integral). The probe is
    guaranteed off every ring edge by the caller."""
    inside = False
    for ring in rings2:
        n = len(ring)
        for i in range(n):
            x0, y0 = ring[i]
            x1, y1 = ring[(i + 1) % n]
            if (y0 <= py2 < y1) or (y1 <= py2 < y0):
                # x at crossing: x0 + (py2-y0)*(x1-x0)/(y1-y0) > px2, exact
                lhs = (x0 - px2) * (y1 - y0) + (py2 - y0) * (x1 - x0)
                if (lhs > 0) == (y1 > y0):
                    inside = not inside
    return inside


class _Side:
    """One geometry's classified structure on the shared grid."""

    def __init__(self, g: Geometry, q: float):
        self.g = g
        self.cls = _class_of(g)
        self.paths = _linework_paths(g, q)
        self.points = _point_members(g, q)
        self.line_boundary = _mod2_endpoints(g, q) if self.cls == "L" else set()
        # doubled-grid rings for exact PIP (areal only)
        self.rings2: List[List[Pt]] = []
        if self.cls == "A":
            for poly in g.polygons():
                for ring in poly.coords:
                    pts = _quantize_ring(np.asarray(ring, float)[:, :2], q)
                    if len(pts) >= 3:
                        self.rings2.append([(2 * x, 2 * y) for x, y in pts])
        self.piece_set: Set[Tuple[Pt, Pt]] = set()  # filled after noding
        self.node_pts: Set[Pt] = set()

    def locate_point(self, p: Pt) -> int:
        """I/B/E of a grid point w.r.t. this geometry (exact)."""
        if self.cls == "":
            return _E
        if self.cls == "P":
            return _I if (p in self.points) else _E
        if p in self.node_pts:
            if self.cls == "A":
                return _B
            return _B if p in self.line_boundary else _I
        if self.cls == "A":
            return _I if _pip_parity_doubled(2 * p[0], 2 * p[1], self.rings2) else _E
        return _E

    def locate_piece_mid(self, lo: Pt, hi: Pt) -> int:
        """I/B/E of the (off-linework) open piece (lo,hi) w.r.t. this
        geometry, via its exact doubled-grid midpoint."""
        if self.cls == "A":
            mx2, my2 = lo[0] + hi[0], lo[1] + hi[1]
            return _I if _pip_parity_doubled(mx2, my2, self.rings2) else _E
        return _E  # lineal/puntal have measure-zero closure


def relate(a: Optional[Geometry], b: Optional[Geometry]) -> Optional[str]:
    """The 9-character DE-9IM matrix of (a, b), row-major
    II IB IE / BI BB BE / EI EB EE with values in {F,0,1,2}."""
    if a is None or b is None:
        return None
    coords = []
    for g in (a, b):
        c = g.all_coords()
        if len(c):
            coords.append(float(np.max(np.abs(c[:, :2]))))
    q = _pick_quantum(max(coords) if coords else 1.0)

    A, B = _Side(a, q), _Side(b, q)

    # ---- joint noding of both lineworks -----------------------------------
    segs: List[_Seg] = []
    for side_tag, side in ((1, A), (2, B)):
        for path in side.paths:
            for u, v in zip(path[:-1], path[1:]):
                if u != v:
                    segs.append(_Seg(u, v, side_tag, 0))
    _node_segments(segs)
    # standalone puntal members must become arrangement nodes too, so a
    # point mid-edge is witnessed as an endpoint of the split pieces
    from .overlay import _on_segment

    for p in A.points | B.points:
        for s in segs:
            if _on_segment(p, s.p, s.q):
                s.cuts.append(p)
    pieces_a: Set[Tuple[Pt, Pt]] = set()
    pieces_b: Set[Tuple[Pt, Pt]] = set()
    node_points: Set[Pt] = set()
    for s in segs:
        for u, v, tag, _ in _subdivide(s):
            lo, hi = (u, v) if u < v else (v, u)
            (pieces_a if tag == 1 else pieces_b).add((lo, hi))
            node_points.add(u)
            node_points.add(v)
    A.piece_set, B.piece_set = pieces_a, pieces_b
    A.node_pts = {p for e in pieces_a for p in e}
    B.node_pts = {p for e in pieces_b for p in e}
    node_points |= A.points | B.points

    mat = [[-1, -1, -1], [-1, -1, -1], [-1, -1, 2]]  # EE always 2

    def bump(r: int, c: int, d: int) -> None:
        if d > mat[r][c]:
            mat[r][c] = d

    # ---- areal-interior cells (pieces can't witness open regions) ---------
    if A.cls == "A":
        if B.cls == "A":
            if algos._areal_interiors_overlap(a, b):
                bump(_I, _I, 2)
            if not algos.covered_by(a, b):
                bump(_I, _E, 2)
            if not algos.covered_by(b, a):
                bump(_E, _I, 2)
        else:
            bump(_I, _E, 2)  # closure of a lineal/puntal/empty B is measure-zero
    elif B.cls == "A":
        bump(_E, _I, 2)

    # ---- dim-1 evidence: noded pieces --------------------------------------
    row_a = _B if A.cls == "A" else _I  # a piece's relative interior class on its own side
    row_b = _B if B.cls == "A" else _I
    for lo, hi in pieces_a:
        loc = _onwork_or(B, (lo, hi))
        bump(row_a, loc, 1)
    for lo, hi in pieces_b:
        loc = _onwork_or(A, (lo, hi))
        bump(loc, row_b, 1)

    # ---- dim-0 evidence: node points + puntal members ----------------------
    for p in node_points:
        bump(A.locate_point(p), B.locate_point(p), 0)

    return "".join(
        "F" if mat[r][c] < 0 else str(mat[r][c]) for r in range(3) for c in range(3)
    )


def _onwork_or(other: _Side, edge: Tuple[Pt, Pt]) -> int:
    """Class of a piece's relative interior w.r.t. the OTHER geometry."""
    if edge in other.piece_set:
        # collinear with the other linework: boundary of an areal other,
        # interior of a lineal other (its mod-2 boundary is finite)
        return _B if other.cls == "A" else _I
    return other.locate_piece_mid(*edge)


def relate_match(matrix: Optional[str], pattern: Optional[str]) -> Optional[bool]:
    """DE-9IM pattern match (PostGIS ST_RelateMatch): 'T' = any of 0/1/2,
    'F' = F, '0'/'1'/'2' exact, '*' = anything."""
    if matrix is None or pattern is None:
        return None
    if len(matrix) != 9 or len(pattern) != 9:
        raise ValueError("DE-9IM matrix and pattern must be 9 characters")
    for m, p in zip(matrix.upper(), pattern.upper()):
        if p == "*":
            continue
        if p == "T":
            if m not in "012":
                return False
        elif m != p:
            return False
    return True
