"""Delaunay triangulation, Voronoi diagram, and chi-shape concave hull
— from scratch (Bowyer-Watson), numpy inside.

PostGIS/Apache Sedona expose these as per-geometry scalar functions
(``ST_DelaunayTriangles``, ``ST_VoronoiPolygons``, ``ST_ConcaveHull``);
the reference engine has none of them (beyond-reference ops).  Per-row
compute keeps the distribution trivial: one geometry in, one collection
out, embarrassingly parallel across the corpus.

* Triangulation: Bowyer-Watson incremental insertion with a
  super-triangle; the incircle predicate is the standard 3x3 lifted
  determinant with a relative epsilon — near-cocircular quads (e.g.
  integer grids) resolve to an arbitrary but deterministic diagonal,
  which changes the triangle list but never the triangulation
  invariants (2i + h - 2 triangles, areas summing to the hull).
* Voronoi: each site's cell is the intersection of bisector half-planes
  against its Delaunay neighbors (sufficient by duality), clipped to a
  caller-supplied envelope — Sutherland-Hodgman convex clipping, exact
  on the typical .5-exact bisector coordinates.
* Concave hull: the chi-shape (Duckham et al. 2008) — start from the
  Delaunay triangulation and erode boundary edges longer than
  ``length_ratio`` x (longest boundary edge), preserving regularity
  (never disconnecting, never exposing an interior point twice).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["delaunay", "voronoi_cells", "chi_concave_hull"]


def _orient(pts, t):
    """Return t reordered CCW (by signed area)."""
    a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
    if (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]) < 0:
        return (t[0], t[2], t[1])
    return t


def _incircle(pts, t, d, eps):
    """> 0 if point d lies inside the circumcircle of CCW triangle t."""
    ax, ay = pts[t[0]]
    bx, by = pts[t[1]]
    cx, cy = pts[t[2]]
    dx, dy = d
    adx, ady = ax - dx, ay - dy
    bdx, bdy = bx - dx, by - dy
    cdx, cdy = cx - dx, cy - dy
    ad = adx * adx + ady * ady
    bd = bdx * bdx + bdy * bdy
    cd = cdx * cdx + cdy * cdy
    det = (adx * (bdy * cd - bd * cdy)
           - ady * (bdx * cd - bd * cdx)
           + ad * (bdx * cdy - bdy * cdx))
    return det > eps


def delaunay(points: np.ndarray) -> list:
    """Delaunay triangulation of (n, 2) points -> list of CCW index
    triples into the DEDUPED input (duplicates are collapsed first;
    returned indices refer to the original array's first occurrence).

    All-collinear (or n < 3) inputs return []."""
    pts = np.asarray(points, dtype=np.float64)
    if pts.ndim != 2 or pts.shape[1] != 2:
        raise ValueError("points must be an (n, 2) array")
    # dedupe, keeping first-occurrence original indices
    _, first = np.unique(pts, axis=0, return_index=True)
    keep = np.sort(first)
    uniq = pts[keep]
    n = len(uniq)
    if n < 3:
        return []

    # The super-triangle must be FAR outside the data: at ~16x the span
    # its circumcircles still curve through the hull region and boundary
    # triangles get lost (measured: 8/20 random-seed failures). At 1e6x
    # every super-circumcircle degenerates to a half-plane and the hull
    # closes; a structural check (every boundary edge must be a convex
    # hull edge) guards the remaining degenerate configs with a farther
    # retry.
    for mult in (1e6, 1e9):
        tris = _bowyer_watson(uniq, mult)
        if _boundary_is_hull(uniq, tris):
            break
    return [(int(keep[a]), int(keep[b]), int(keep[c])) for a, b, c in tris]


def _boundary_is_hull(pts, tris) -> bool:
    """True iff each once-used edge has every point on one side."""
    cnt: dict = {}
    for t in tris:
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            k = (min(e), max(e))
            cnt[k] = cnt.get(k, 0) + 1
    if any(c > 2 for c in cnt.values()):
        return False
    for (u, v), c in cnt.items():
        if c != 1:
            continue
        ux, uy = pts[u]
        vx, vy = pts[v]
        cr = (vx - ux) * (pts[:, 1] - uy) - (vy - uy) * (pts[:, 0] - ux)
        if (cr > 1e-9).any() and (cr < -1e-9).any():
            return False
    return True


def _bowyer_watson(uniq: np.ndarray, mult: float) -> list:
    n = len(uniq)
    span = max(float(np.ptp(uniq[:, 0])), float(np.ptp(uniq[:, 1])), 1.0)
    eps = 1e-12 * span * span * span * span  # det scales like length^4
    cx = float(np.mean(uniq[:, 0]))
    cy = float(np.mean(uniq[:, 1]))
    big = mult * span
    # super-triangle vertices appended after the real points
    allp = np.vstack([uniq, [[cx - 2 * big, cy - big],
                             [cx + 2 * big, cy - big],
                             [cx, cy + 2 * big]]])
    s0, s1, s2 = n, n + 1, n + 2
    tris = [_orient(allp, (s0, s1, s2))]

    order = np.argsort(allp[:n, 0], kind="stable")  # insertion sweep
    for ip in order:
        d = allp[ip]
        bad, good = [], []
        for t in tris:
            (bad if _incircle(allp, t, d, eps) else good).append(t)
        if not bad:
            # on/outside every circumcircle within eps — force-insert by
            # treating the containing triangle as bad (degenerate ties)
            for t in tris:
                if _point_in_tri(allp, t, d):
                    bad, good = [t], [x for x in tris if x != t]
                    break
            else:
                continue  # duplicate-ish point; already deduped, skip
        # cavity boundary = edges used exactly once among bad triangles
        edges = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edges[k] = edges.get(k, 0) + 1
        tris = good
        for (u, v), cnt in edges.items():
            if cnt == 1:
                tris.append(_orient(allp, (u, v, int(ip))))

    out = []
    for t in tris:
        if s0 in t or s1 in t or s2 in t:
            continue
        # drop zero-area slivers (fully collinear triples)
        a, b, c = allp[t[0]], allp[t[1]], allp[t[2]]
        if abs((b[0] - a[0]) * (c[1] - a[1])
               - (b[1] - a[1]) * (c[0] - a[0])) <= 0.0:
            continue
        out.append((int(t[0]), int(t[1]), int(t[2])))
    return out


def _point_in_tri(pts, t, d):
    a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
    s1 = (b[0] - a[0]) * (d[1] - a[1]) - (b[1] - a[1]) * (d[0] - a[0])
    s2 = (c[0] - b[0]) * (d[1] - b[1]) - (c[1] - b[1]) * (d[0] - b[0])
    s3 = (a[0] - c[0]) * (d[1] - c[1]) - (a[1] - c[1]) * (d[0] - c[0])
    return (s1 >= 0 and s2 >= 0 and s3 >= 0) or (s1 <= 0 and s2 <= 0 and s3 <= 0)


def _clip_halfplane(poly, nx, ny, d):
    """Sutherland-Hodgman: keep the side where nx*x + ny*y <= d.

    poly: list of (x, y); returns the clipped list (possibly empty)."""
    out = []
    m = len(poly)
    for i in range(m):
        cur, nxt = poly[i], poly[(i + 1) % m]
        c_in = nx * cur[0] + ny * cur[1] <= d
        n_in = nx * nxt[0] + ny * nxt[1] <= d
        if c_in:
            out.append(cur)
        if c_in != n_in:
            fc = nx * cur[0] + ny * cur[1] - d
            fn = nx * nxt[0] + ny * nxt[1] - d
            t = fc / (fc - fn)
            out.append((cur[0] + t * (nxt[0] - cur[0]),
                        cur[1] + t * (nxt[1] - cur[1])))
    return out


def voronoi_cells(points: np.ndarray, envelope=None) -> list:
    """Voronoi cell polygon per input point, clipped to ``envelope``
    (xmin, ymin, xmax, ymax; default: the points' bbox expanded by 50%
    of its span on every side, PostGIS-style).

    Returns a list aligned with the input: each entry is a list of
    (x, y) CCW vertices, or None for duplicate points (the first
    occurrence owns the cell)."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n == 0:
        return []
    if envelope is None:
        xmin, ymin = pts.min(axis=0)
        xmax, ymax = pts.max(axis=0)
        ex = max(xmax - xmin, 1.0) * 0.5
        ey = max(ymax - ymin, 1.0) * 0.5
        envelope = (xmin - ex, ymin - ey, xmax + ex, ymax + ey)
    xmin, ymin, xmax, ymax = map(float, envelope)
    box = [(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)]

    tris = delaunay(pts)
    neighbors: dict = {}
    for a, b, c in tris:
        for u, v in ((a, b), (b, c), (c, a)):
            neighbors.setdefault(u, set()).add(v)
            neighbors.setdefault(v, set()).add(u)
    # collinear / tiny inputs: every distinct point neighbors every other
    if not tris:
        uniq_idx = {}
        for i in range(n):
            uniq_idx.setdefault((pts[i, 0], pts[i, 1]), i)
        firsts = list(uniq_idx.values())
        for i in firsts:
            neighbors[i] = set(j for j in firsts if j != i)

    seen = set()
    cells: list = [None] * n
    for i in range(n):
        key = (pts[i, 0], pts[i, 1])
        if key in seen:
            continue
        seen.add(key)
        cell = list(box)
        px, py = pts[i]
        for j in neighbors.get(i, ()):  # isolated single point: whole box
            qx, qy = pts[j]
            nx, ny = qx - px, qy - py  # keep the side nearer to p
            d = (nx * (px + qx) + ny * (py + qy)) / 2.0
            cell = _clip_halfplane(cell, nx, ny, d)
            if not cell:
                break
        cells[i] = cell if cell else None
    return cells


def _tri_edges(t):
    return (((t[0], t[1]), t[2]), ((t[1], t[2]), t[0]), ((t[2], t[0]), t[1]))


def chi_concave_hull(points: np.ndarray, length_ratio: float = 0.3) -> list:
    """Chi-shape concave hull: boundary of the Delaunay triangulation
    after eroding boundary edges longer than
    ``length_ratio * longest_boundary_edge`` (regularity-preserving:
    a triangle is only removed while its opposite vertex is interior).

    Returns the hull as a list of (x, y) vertices (closed ring implied),
    or [] when no triangulation exists (collinear / < 3 points).
    ``length_ratio=1.0`` is exactly the convex hull."""
    if not 0.0 < length_ratio <= 1.0:
        raise ValueError(f"length_ratio must be in (0, 1], got {length_ratio}")
    pts = np.asarray(points, dtype=np.float64)
    tris = set(delaunay(pts))
    if not tris:
        return []

    def edge_key(u, v):
        return (min(u, v), max(u, v))

    def boundary_edges(tris):
        cnt = {}
        for t in tris:
            for (u, v), _w in _tri_edges(t):
                k = edge_key(u, v)
                cnt[k] = cnt.get(k, 0) + 1
        return {k for k, c in cnt.items() if c == 1}

    def elen(k):
        return math.hypot(pts[k[0], 0] - pts[k[1], 0],
                          pts[k[0], 1] - pts[k[1], 1])

    bnd = boundary_edges(tris)
    if not bnd:
        return []
    cutoff = length_ratio * max(elen(k) for k in bnd)

    changed = True
    while changed:
        changed = False
        bnd = boundary_edges(tris)
        bnd_pts = set()
        for u, v in bnd:
            bnd_pts.add(u)
            bnd_pts.add(v)
        # longest eligible boundary edge first (chi-shape order)
        for k in sorted(bnd, key=elen, reverse=True):
            if elen(k) <= cutoff:
                break
            # the unique triangle carrying this boundary edge
            owner = None
            for t in tris:
                for (u, v), w in _tri_edges(t):
                    if edge_key(u, v) == k:
                        owner = (t, w)
                        break
                if owner:
                    break
            if owner is None:
                continue
            t, w = owner
            if w in bnd_pts:
                continue  # regularity: opposite vertex already on boundary
            tris.remove(t)
            changed = True
            break

    # stitch the boundary edges into a ring
    bnd = boundary_edges(tris)
    adj = {}
    for u, v in bnd:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    start = next(iter(adj))
    ring = [start]
    prev, cur = None, start
    while True:
        nxts = [x for x in adj[cur] if x != prev]
        if not nxts:
            break
        prev, cur = cur, nxts[0]
        if cur == start:
            break
        ring.append(cur)
    return [(float(pts[i, 0]), float(pts[i, 1])) for i in ring]
