"""ST_MakeValid — repair invalid geometries, from scratch (no GEOS here).

PostGIS/Sedona name; not in the reference's register
(`rust/sedona-functions/src/register.rs` has no st_makevalid), so this
extends the surface the same way the round-4 PostGIS families do. The
semantics implemented are GEOS MakeValid **method=structure** (the PostGIS
``ST_MakeValid(geom, 'method=structure')`` option, and the default in
GEOS >= 3.10's MakeValidStructureOp):

  * every RING is made valid on its own under the ENCLOSED-BY-ANY-LOOP
    (union) fill rule: the ring's closed walk is noded against itself,
    split into simple sub-loops at the self-intersection points, and the
    enclosed area is the union of those loops. A bowtie yields both
    triangles, a doubly-traced ring yields its region once, and — unlike
    the even-odd ('linework') rule — overlapping opposite-winding lobes
    do NOT cancel: every region the linework encloses is kept, which is
    the structure method's defining property,
  * all shell fills are unioned together, all hole fills are unioned
    together, and the result is ``union(shells) - union(holes)`` (holes
    that fall outside every shell subtract nothing; nested/overlapping
    sibling shells dissolve),
  * lineal parts collapse repeated consecutive vertices and degrade to
    typed EMPTY when fewer than 2 distinct points remain; puntal parts
    are always valid and pass through.

Everything runs on the overlay engine's snap-rounded integer grid
(`overlay._pick_quantum`, 2^-40 relative resolution) with exact big-int
orientation tests, so the noding/splitting decisions are never subject to
floating-point misclassification.

Deviation (documented): Z/M ordinates are dropped on the repair path (the
planar overlay engine is 2-D); geometries that are ALREADY valid are
returned unchanged, Z/M intact.
"""

from __future__ import annotations

from typing import List

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
from .overlay import (
    Pt,
    _node_segments,
    _pick_quantum,
    _quantize_ring,
    _ring_area2_int,
    _rings_to_geometry,
    _Seg,
    _subdivide,
    polygon_overlay,
    union_all,
)


def _noded_walk(ring_pts: List[Pt]) -> List[Pt]:
    """Close the open ring, node every edge against every other edge of the
    SAME ring (exact predicates), and return the closed walk with all
    intersection points inserted in traversal order."""
    segs: List[_Seg] = []
    n = len(ring_pts)
    for i in range(n):
        p, q = ring_pts[i], ring_pts[(i + 1) % n]
        if p != q:
            segs.append(_Seg(p, q, 0, 0))
    if not segs:
        return []
    _node_segments(segs)
    walk: List[Pt] = []
    for s in segs:
        for u, _v, _sa, _sb in _subdivide(s):
            walk.append(u)
    walk.append(segs[0].p)  # close
    return walk


def _simple_loops(walk: List[Pt]) -> List[List[Pt]]:
    """Split a closed walk into simple loops at repeated vertices (the
    standard stack/last-seen decomposition: every time a vertex reappears,
    the cycle since its first appearance is popped as one loop). Loops
    with fewer than 3 vertices or zero signed area (spikes, doubled
    edges) are dropped."""
    stack: List[Pt] = []
    pos = {}
    loops: List[List[Pt]] = []
    for p in walk:
        if p in pos:
            i = pos[p]
            cyc = stack[i:]
            for v in stack[i + 1:]:
                pos.pop(v, None)
            del stack[i + 1:]
            if len(cyc) >= 3 and _ring_area2_int(cyc) != 0:
                loops.append(cyc)
        else:
            pos[p] = len(stack)
            stack.append(p)
    return loops


def _ring_fill(ring: np.ndarray, quantum: float) -> List[Geometry]:
    """The ring's enclosed region under NONZERO winding, as simple-shell
    polygons (possibly overlapping — the caller unions them)."""
    pts = _quantize_ring(np.asarray(ring, dtype=np.float64)[:, :2], quantum)
    if len(pts) < 3:
        return []
    out = []
    for lp in _simple_loops(_noded_walk(pts)):
        arr = np.array(
            [(x * quantum, y * quantum) for (x, y) in lp + [lp[0]]],
            dtype=np.float64,
        )
        out.append(Geometry(POLYGON, [arr]))
    return out


def _split_pinches(region: Geometry, quantum: float) -> Geometry:
    """OGC forbids a ring visiting the same vertex twice; the union trace
    can emit one "pinched" ring through a self-touch point (figure-8).
    Split every pinched ring into its simple loops and reassemble —
    `_rings_to_geometry` re-classifies shells/holes by signed area and
    re-nests holes, so a pinched shell becomes two touching polygons."""
    rings_q: List[List[Pt]] = []
    changed = False
    for poly in region.polygons():
        for ring in poly.coords:
            pts = _quantize_ring(np.asarray(ring, dtype=np.float64)[:, :2], quantum)
            if len(pts) < 3:
                continue
            if len(set(pts)) == len(pts):
                rings_q.append(pts)
            else:
                changed = True
                rings_q.extend(_simple_loops(pts + [pts[0]]))
    if not changed:
        return region
    return _rings_to_geometry(rings_q, quantum)


def _valid_fastpath(g: Geometry) -> bool:
    from ..functions.st import _is_valid  # late: st.py imports this module

    try:
        return bool(_is_valid(g))
    except Exception:
        return False


def _fix_line(line: Geometry) -> Geometry:
    arr = line.coords
    if len(arr) == 0:
        return line
    keep = [0]
    for i in range(1, len(arr)):
        if not np.array_equal(arr[i, :2], arr[keep[-1], :2]):
            keep.append(i)
    if len(keep) < 2:
        return Geometry(LINESTRING, np.empty((0, line.ndim)), line.has_z, line.has_m)
    return Geometry(LINESTRING, arr[keep], line.has_z, line.has_m)


def make_valid(g: Geometry) -> Geometry:
    """Repair ``g`` to an OGC-valid geometry (structure semantics above).
    Valid inputs are returned unchanged (bit-stable, Z/M preserved)."""
    if g is None or g.is_empty:
        return g
    t = g.type_id
    if t in (POINT, MULTIPOINT):
        return g
    if t == LINESTRING:
        return _fix_line(g)
    if t == MULTILINESTRING:
        parts = [_fix_line(p) for p in g.coords]
        parts = [p for p in parts if not p.is_empty]
        if not parts:
            return Geometry(MULTILINESTRING, [])
        return Geometry(MULTILINESTRING, parts) if len(parts) > 1 else parts[0]
    if t == GEOMETRYCOLLECTION:
        parts = [make_valid(p) for p in g.coords]
        parts = [p for p in parts if p is not None and not p.is_empty]
        return Geometry(GEOMETRYCOLLECTION, parts)
    if t not in (POLYGON, MULTIPOLYGON):
        return g
    if _valid_fastpath(g):
        return g

    c = g.all_coords()
    if len(c) == 0:
        return Geometry(POLYGON, [])
    quantum = _pick_quantum(float(np.max(np.abs(c[:, :2]))))
    shells: List[Geometry] = []
    holes: List[Geometry] = []
    for poly in g.polygons():
        rings = poly.coords
        if not rings or len(rings[0]) == 0:
            continue
        shells.extend(_ring_fill(rings[0], quantum))
        for h in rings[1:]:
            if len(h):
                holes.extend(_ring_fill(h, quantum))
    if not shells:
        return Geometry(POLYGON, [])
    region = union_all(shells)
    if holes:
        region = polygon_overlay(region, union_all(holes), "difference")
    if region.is_empty or not region.polygons():
        return Geometry(POLYGON, [])
    return _split_pinches(region, quantum)
