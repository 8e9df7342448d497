"""Distributed DBSCAN (operators/dbscan.py) vs an independent
brute-force implementation with fixpoint label propagation."""

import numpy as np
import pytest

from sedona_db_spark.geometry import wkb
from sedona_db_spark.operators.dbscan import dbscan


def _brute(xy, eps, min_pts):
    n = len(xy)
    D = np.sqrt(((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1))
    nbr = [set(np.nonzero(D[i] <= eps)[0]) for i in range(n)]
    core = {i for i in range(n) if len(nbr[i]) >= min_pts}
    # fixpoint min-label propagation over core-core edges (guaranteed
    # convergence to the component minimum, unlike one-pass union-find)
    label = {i: i for i in core}
    changed = True
    while changed:
        changed = False
        for i in core:
            for j in nbr[i]:
                if j in core and label[j] < label[i]:
                    label[i] = label[j]
                    changed = True
    out = {}
    for i in range(n):
        if i in core:
            out[i] = (label[i], True)
        else:
            ncs = sorted(label[j] for j in nbr[i] if j in core)
            out[i] = (ncs[0] if ncs else None, False)
    return out


def _df(spark, xy):
    rows = [(i, wkb.encode(wkb.point(float(x), float(y))))
            for i, (x, y) in enumerate(xy)]
    return spark.createDataFrame(rows, "id LONG, geometry BINARY")


def test_blobs_with_noise(spark):
    rng = np.random.default_rng(5)
    blobs = [rng.normal(loc, 0.3, (40, 2)) for loc in [(0, 0), (10, 0), (5, 8)]]
    noise = rng.uniform(-5, 15, (15, 2))
    xy = np.vstack(blobs + [noise])
    got = {r.id: (r.cluster, r.is_core)
           for r in dbscan(_df(spark, xy), 1.0, 4).collect()}
    want = _brute(xy, 1.0, 4)
    assert got == want
    clusters = {c for c, _ in got.values() if c is not None}
    assert len(clusters) == 3
    assert any(c is None for c, _ in got.values())  # noise exists


def test_border_min_cluster_rule(spark):
    # two dense quads whose facing cores sit 1.2 apart (> eps, so the
    # clusters do NOT merge); one mid point within eps of exactly one
    # core from each side and nothing else -> deg 3 < min_pts 4 ->
    # border of BOTH clusters, assigned the minimum cluster id
    eps = 0.7
    left = [(0.0, 0.0), (0.4, 0.0), (0.0, 0.4), (0.4, 0.4)]   # min id 0
    right = [(1.6, 0.0), (2.0, 0.0), (1.6, 0.4), (2.0, 0.4)]  # min id 4
    mid = [(1.0, 0.0)]  # 0.6 from (0.4,0) and (1.6,0) only
    xy = np.array(left + right + mid)
    got = {r.id: (r.cluster, r.is_core)
           for r in dbscan(_df(spark, xy), eps, 4).collect()}
    want = _brute(xy, eps, 4)
    assert got == want
    assert got[8] == (0, False)       # border of both, min cluster wins
    assert got[0][1] and got[4][1]    # both quads are core
    assert got[0][0] != got[4][0]     # and stay separate clusters


def test_isolated_core_is_own_cluster(spark):
    # a star: one center with 4 border satellites, no other cores
    xy = np.array([(0.0, 0.0), (0.9, 0.0), (-0.9, 0.0), (0.0, 0.9), (0.0, -0.9),
                   (50.0, 50.0)])
    got = {r.id: (r.cluster, r.is_core)
           for r in dbscan(_df(spark, xy), 1.0, 5).collect()}
    want = _brute(xy, 1.0, 5)
    assert got == want
    assert got[0] == (0, True)       # core with no core neighbour
    assert got[1] == (0, False)      # satellites are border of cluster 0
    assert got[5] == (None, False)   # far point is noise


def test_partitioning_invariance(spark):
    rng = np.random.default_rng(9)
    xy = rng.uniform(0, 20, (120, 2))
    df = _df(spark, xy)
    a = sorted((r.id, r.cluster, r.is_core)
               for r in dbscan(df.repartition(1), 1.5, 3).collect())
    b = sorted((r.id, r.cluster, r.is_core)
               for r in dbscan(df.repartition(11), 1.5, 3).collect())
    assert a == b


def test_eps_boundary_inclusive(spark):
    # distance exactly eps counts (<=), matching the dwithin refine
    xy = np.array([(0.0, 0.0), (1.0, 0.0), (2.0, 0.0)])
    got = {r.id: (r.cluster, r.is_core)
           for r in dbscan(_df(spark, xy), 1.0, 3).collect()}
    want = _brute(xy, 1.0, 3)
    assert got == want
    assert got[1] == (1, True)  # middle point has exactly 3 in-radius


def test_cluster_within_matches_union_find(spark):
    """ST_ClusterWithin semantics: transitive eps-closure, min-id label,
    singletons keep themselves — differential vs a driver union-find."""
    import numpy as np

    from sedona_db_spark.geometry import wkb
    from sedona_db_spark.operators.dbscan import cluster_within

    rng = np.random.default_rng(11)
    # three blobs + two isolated points
    pts = np.vstack([
        rng.normal([0, 0], 0.4, (30, 2)),
        rng.normal([10, 0], 0.4, (25, 2)),
        rng.normal([0, 10], 0.4, (20, 2)),
        [[50.0, 50.0], [-50.0, -50.0]],
    ])
    rows = [(i, wkb.encode(wkb.point(float(x), float(y))))
            for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, geometry binary")
    got = {r["id"]: r["cluster"]
           for r in cluster_within(df, 2.0, grid_level=5).collect()}

    # union-find ground truth
    n = len(pts)
    parent = list(range(n))
    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a
    for i in range(n):
        for j in range(i + 1, n):
            if np.hypot(*(pts[i] - pts[j])) <= 2.0:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {i: min(k for k in range(n) if find(k) == find(i)) for i in range(n)}
    assert got == want
    # exactly 5 clusters: 3 blobs + 2 singletons
    assert len(set(got.values())) == 5
