"""ST_Polygonize — assemble polygons from the faces of noded linework.

PostGIS/Sedona name (GEOS Polygonizer); not in the reference's register,
extending the surface like the other PostGIS families. Input is any
lineal geometry / collection (users aggregate rows with ST_Collect
first, matching the PostGIS aggregate's collect-then-polygonize shape).

Algorithm, on the overlay engine's exact integer grid:

  1. NODE all input segments against each other (exact big-int tests),
  2. DROP DANGLES — iteratively remove edges with a degree-1 endpoint
     (GEOS polygonizer's dangle removal; a dangling edge can never bound
     a face),
  3. FACE WALK — every undirected edge contributes two half-edges; the
     angular-next rule (`overlay._trace_rings`) walks each face's
     boundary with the interior on the left, so bounded faces come out
     CCW and the unbounded face's contours come out CW,
  4. BRIDGES — an edge separating nothing (same face both sides) is
     traversed twice in one cycle and shows up as a pinch; the cycle is
     split into simple loops (`makevalid._simple_loops`) and zero-area
     spurs vanish,
  5. ASSEMBLE — CCW loops are shells, CW loops are hole boundaries of
     the face that surrounds them; `overlay._rings_to_geometry` nests
     each hole into its smallest containing shell (nested-squares input
     therefore yields a donut plus the inner square, the pinned GEOS
     behavior).

Returns a GEOMETRYCOLLECTION of polygons (PostGIS contract), empty when
the linework encloses nothing.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from .wkb import GEOMETRYCOLLECTION, Geometry, MULTIPOLYGON, POLYGON
from .makevalid import _simple_loops
from .overlay import (
    Pt,
    _node_segments,
    _on_segment,
    _pick_quantum,
    _quantize_open,
    _quantize_ring,
    _ring_area2_int,
    _Seg,
    _subdivide,
    _trace_rings,
)
from .relate import _pip_parity_doubled


def _collect_paths(g: Geometry, q: float) -> List[List[Pt]]:
    paths: List[List[Pt]] = []
    for ln in g.lines():
        if len(ln.coords) >= 2:
            pts = _quantize_open(np.asarray(ln.coords, float)[:, :2], q)
            if len(pts) >= 2:
                paths.append(pts)
    for poly in g.polygons():
        for ring in poly.coords:
            if len(ring) >= 2:
                pts = _quantize_ring(np.asarray(ring, float)[:, :2], q)
                if len(pts) >= 2:
                    paths.append(pts + [pts[0]])
    return paths


def polygonize(g: Optional[Geometry]) -> Optional[Geometry]:
    """Polygons formed by the faces the linework of ``g`` encloses."""
    if g is None:
        return None
    c = g.all_coords()
    if len(c) == 0:
        return Geometry(GEOMETRYCOLLECTION, [])
    q = _pick_quantum(float(np.max(np.abs(c[:, :2]))))

    segs: List[_Seg] = []
    for path in _collect_paths(g, q):
        for u, v in zip(path[:-1], path[1:]):
            if u != v:
                segs.append(_Seg(u, v, 0, 0))
    if not segs:
        return Geometry(GEOMETRYCOLLECTION, [])
    _node_segments(segs)

    edges: Set[Tuple[Pt, Pt]] = set()
    for s in segs:
        for u, v, _sa, _sb in _subdivide(s):
            edges.add((u, v) if u < v else (v, u))

    # iterative dangle removal (degree-1 endpoints can't bound a face)
    while True:
        deg: Dict[Pt, int] = {}
        for lo, hi in edges:
            deg[lo] = deg.get(lo, 0) + 1
            deg[hi] = deg.get(hi, 0) + 1
        dangling = {e for e in edges if deg[e[0]] == 1 or deg[e[1]] == 1}
        if not dangling:
            break
        edges -= dangling
    if not edges:
        return Geometry(GEOMETRYCOLLECTION, [])

    # face walk over BOTH half-edges of every remaining edge
    half = [(lo, hi) for lo, hi in edges] + [(hi, lo) for lo, hi in edges]
    cycles = _trace_rings(half)

    rings: List[List[Pt]] = []
    for cyc in cycles:
        if len(set(cyc)) == len(cyc):
            rings.append(cyc)
        else:  # bridge pinch: split into simple loops, spurs drop out
            rings.extend(_simple_loops(cyc + [cyc[0]]))

    # assembly with the GEOS EdgeRing rule: CCW cycles are shells; a CW
    # cycle is a hole ONLY if it sits STRICTLY inside some shell (its
    # twin contour and the unbounded face's outer contours have every
    # vertex AND edge midpoint on a shell boundary and are discarded)
    shells = [r for r in rings if _ring_area2_int(r) > 0]
    holes = [r for r in rings if _ring_area2_int(r) < 0]
    shells.sort(key=lambda r: _ring_area2_int(r))  # smallest first
    shell2 = [[(2 * x, 2 * y) for x, y in r] for r in shells]
    shell_holes: List[List[List[Pt]]] = [[] for _ in shells]

    def _strict_in_shell(p2: Tuple[int, int], k: int) -> bool:
        ring2 = shell2[k]
        n = len(ring2)
        for i in range(n):
            if _on_segment(p2, ring2[i], ring2[(i + 1) % n]):
                return False
        return _pip_parity_doubled(p2[0], p2[1], [ring2])

    for h in holes:
        probes = [(2 * x, 2 * y) for x, y in h]
        probes += [
            (h[i][0] + h[(i + 1) % len(h)][0], h[i][1] + h[(i + 1) % len(h)][1])
            for i in range(len(h))
        ]
        for k in range(len(shells)):
            if any(_strict_in_shell(p2, k) for p2 in probes):
                shell_holes[k].append(h)
                break

    def _close(r: List[Pt]) -> np.ndarray:
        return np.array(r + [r[0]], dtype=np.float64) * q

    polys = [
        Geometry(POLYGON, [_close(shells[k])] + [_close(h) for h in shell_holes[k]])
        for k in range(len(shells))
    ]
    return Geometry(GEOMETRYCOLLECTION, polys)
