"""ST_Node + ST_Split — noding-family operations on the exact grid.

PostGIS/Sedona names; not in the reference's register (its linework
surface stops at the overlay kernels), extending the same way the other
round-4 PostGIS families do.

ST_Node: fully node the input linework (every segment split at every
crossing/touch, exact big-int predicates), dissolve duplicate pieces,
and re-chain maximal paths BETWEEN topology nodes — a path continues
only through degree-2 vertices, so every intersection point stays a
breakpoint (GEOS noding semantics; the greedy overlay chainer would merge
straight through a crossing).

ST_Split: splitting is polygonization of the combined linework —
  * areal by lineal: faces of polygonize(rings(g) + blade) whose
    representative interior point is INSIDE g (faces the blade carves
    outside g, and the interiors of g's holes, are discarded),
  * lineal by anything: g's noded pieces re-chained with EXTRA breaks at
    every vertex on the blade,
  * puntal: points pass through (a point can't be split).
Returns a GEOMETRYCOLLECTION (PostGIS contract); a blade that misses g
returns the single original part.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from . import algos
from .wkb import GEOMETRYCOLLECTION, Geometry, LINESTRING, MULTILINESTRING, POLYGON
from .overlay import (
    Pt,
    _interior_sample,
    _node_segments,
    _pick_quantum,
    _quantize_open,
    _quantize_ring,
    _Seg,
    _subdivide,
)
from .polygonize import polygonize


def _paths_of(g: Geometry, q: float) -> List[List[Pt]]:
    out: List[List[Pt]] = []
    for ln in g.lines():
        if len(ln.coords) >= 2:
            pts = _quantize_open(np.asarray(ln.coords, float)[:, :2], q)
            if len(pts) >= 2:
                out.append(pts)
    for poly in g.polygons():
        for ring in poly.coords:
            if len(ring) >= 2:
                pts = _quantize_ring(np.asarray(ring, float)[:, :2], q)
                if len(pts) >= 2:
                    out.append(pts + [pts[0]])
    return out


def _noded_pieces(paths_a: List[List[Pt]], paths_b: List[List[Pt]],
                  cut_points: Optional[Set[Pt]] = None):
    """Jointly node two path sets; returns (pieces_a, pieces_b) as sets of
    undirected grid-point edges (duplicates dissolved). ``cut_points``
    additionally split any segment they lie on (puntal blades)."""
    from .overlay import _on_segment

    segs: List[_Seg] = []
    for tag, paths in ((1, paths_a), (2, paths_b)):
        for path in paths:
            for u, v in zip(path[:-1], path[1:]):
                if u != v:
                    segs.append(_Seg(u, v, tag, 0))
    if not segs:
        return set(), set()
    _node_segments(segs)
    for p in cut_points or ():
        for s in segs:
            if _on_segment(p, s.p, s.q):
                s.cuts.append(p)
    pa: Set[Tuple[Pt, Pt]] = set()
    pb: Set[Tuple[Pt, Pt]] = set()
    for s in segs:
        for u, v, tag, _ in _subdivide(s):
            e = (u, v) if u < v else (v, u)
            (pa if tag == 1 else pb).add(e)
    return pa, pb


def _chain_between_nodes(pieces: Set[Tuple[Pt, Pt]], breakpoints: Set[Pt],
                         q: float) -> List[Geometry]:
    """Maximal paths through degree-2 vertices only; ``breakpoints`` force
    additional breaks. Deterministic: seeds iterate in sorted edge order."""
    adj: Dict[Pt, List[Pt]] = {}
    for lo, hi in pieces:
        adj.setdefault(lo, []).append(hi)
        adj.setdefault(hi, []).append(lo)
    is_node = {
        p: (len(nbrs) != 2 or p in breakpoints) for p, nbrs in adj.items()
    }
    unused = set(pieces)

    def walk(start: Pt, nxt: Pt) -> List[Pt]:
        path = [start, nxt]
        while not is_node[path[-1]]:
            a, b = adj[path[-1]]
            step = a if a != path[-2] else b
            e = (path[-1], step) if path[-1] < step else (step, path[-1])
            if e not in unused:
                break
            unused.discard(e)
            path.append(step)
        return path

    out: List[Geometry] = []
    # paths seeded at topology nodes
    for lo, hi in sorted(pieces):
        for s, t in ((lo, hi), (hi, lo)):
            if is_node[s]:
                e = (lo, hi)
                if e in unused:
                    unused.discard(e)
                    out.append(walk(s, t))
    # leftover pure cycles (no node on them): break at the smallest vertex
    while unused:
        lo, hi = min(unused)
        unused.discard((lo, hi))
        path = [lo, hi]
        while path[-1] != lo:
            a, b = adj[path[-1]]
            step = a if a != path[-2] else b
            e = (path[-1], step) if path[-1] < step else (step, path[-1])
            unused.discard(e)
            path.append(step)
        out.append(path)
    return [
        Geometry(LINESTRING, np.array(p, dtype=np.float64) * q) for p in out
    ]


def node_linework(g: Optional[Geometry]) -> Optional[Geometry]:
    """ST_Node: fully noded, duplicate-dissolved linework."""
    if g is None:
        return None
    c = g.all_coords()
    if len(c) == 0:
        return Geometry(MULTILINESTRING, [])
    q = _pick_quantum(float(np.max(np.abs(c[:, :2]))))
    pieces, _ = _noded_pieces(_paths_of(g, q), [])
    if not pieces:
        return Geometry(MULTILINESTRING, [])
    lines = _chain_between_nodes(pieces, set(), q)
    return lines[0] if len(lines) == 1 else Geometry(MULTILINESTRING, lines)


def split_geometry(g: Optional[Geometry], blade: Optional[Geometry]) -> Optional[Geometry]:
    """ST_Split: parts of ``g`` cut by ``blade``, as a GeometryCollection."""
    if g is None or blade is None:
        return None
    if g.polygons():
        combined = Geometry(GEOMETRYCOLLECTION, [g, _lineal_only(blade)])
        faces = polygonize(combined)
        c = combined.all_coords()
        q = _pick_quantum(float(np.max(np.abs(c[:, :2]))) if len(c) else 1.0)
        kept = []
        for p in faces.polygons():
            shell = _quantize_ring(np.asarray(p.coords[0], float)[:, :2], q)
            if len(shell) < 3:
                continue
            sx, sy = _interior_sample(shell)
            loc = algos.locate_points_in_geometry(
                np.array([sx * q]), np.array([sy * q]), g
            )[0]
            if loc == algos.INTERIOR:
                kept.append(p)
        return Geometry(GEOMETRYCOLLECTION, kept)
    if g.lines():
        c = g.all_coords()
        bl = blade.all_coords()
        m = max(
            float(np.max(np.abs(c[:, :2]))) if len(c) else 1.0,
            float(np.max(np.abs(bl[:, :2]))) if len(bl) else 1.0,
        )
        q = _pick_quantum(m)
        # puntal blade members cut too (PostGIS: split line by point)
        blade_pts: Set[Pt] = set()
        for pt in blade.points():
            if len(pt.coords):
                blade_pts.add((
                    int(round(pt.coords[0, 0] / q)),
                    int(round(pt.coords[0, 1] / q)),
                ))
        pg, pb = _noded_pieces(_paths_of(g, q), _paths_of(blade, q), blade_pts)
        cut_pts: Set[Pt] = {p for e in pb for p in e} | blade_pts
        lines = _chain_between_nodes(pg, cut_pts, q)
        return Geometry(GEOMETRYCOLLECTION, lines)
    return Geometry(GEOMETRYCOLLECTION, list(g.geometries()))


def _lineal_only(blade: Geometry) -> Geometry:
    lines = [ln for ln in blade.lines() if len(ln.coords) >= 2]
    for poly in blade.polygons():
        for ring in poly.coords:
            if len(ring) >= 2:
                lines.append(Geometry(LINESTRING, np.asarray(ring, float)))
    return Geometry(MULTILINESTRING, lines)
