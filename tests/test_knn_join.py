"""Grid kNN join differential tests.

Mirrors the reference (`python/sedonadb/tests/test_knnjoin.py:24-100`):
|result| = |probe| * k, per-probe distances ascend, and the neighbor sets
match a brute-force oracle exactly — including the ring-termination bound
at cell borders (the part the reference gets free from its global R-tree)."""

import numpy as np
import pytest

from pyspark.sql.types import BinaryType, DoubleType, LongType, StructField, StructType

from sedona_db_spark.geometry import algos, wkb
from sedona_db_spark.operators.knn_join import knn_join

SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("geometry", BinaryType()),
])


def make_points(n, seed, bounds=(0, 0, 100, 100)):
    rng = np.random.default_rng(seed)
    x = rng.uniform(bounds[0], bounds[2], n)
    y = rng.uniform(bounds[1], bounds[3], n)
    return [(int(i), bytes(b)) for i, b in enumerate(wkb.encode_points_xy(x, y))], x, y


def brute_knn(px, py, bx, by, k):
    """Oracle: exact k nearest by (distance, build_id)."""
    out = {}
    for i in range(len(px)):
        d = np.hypot(bx - px[i], by - py[i])
        order = np.lexsort((np.arange(len(bx)), d))
        out[i] = [(int(j), float(d[j])) for j in order[:k]]
    return out


@pytest.mark.parametrize("k", [1, 3, 5])
@pytest.mark.parametrize("bt", [0, 200_000])  # 0 forces the grid path
def test_knn_matches_bruteforce(spark, k, bt):
    probe_rows, px, py = make_points(60, 42)
    build_rows, bx, by = make_points(150, 43)
    P = spark.createDataFrame(probe_rows, SCHEMA).withColumnRenamed("id", "pid")
    B = spark.createDataFrame(build_rows, SCHEMA).withColumnRenamed("id", "bid")
    res = knn_join(P, B, k=k, build_id="bid", grid_level=5, broadcast_threshold=bt)
    rows = res.select("pid", "bid", "knn_distance", "knn_rank").collect()
    assert len(rows) == 60 * k
    want = brute_knn(px, py, bx, by, k)
    got = {}
    for r in rows:
        got.setdefault(r["pid"], []).append((r["knn_rank"], r["bid"], r["knn_distance"]))
    for pid, lst in got.items():
        lst.sort()
        ids = [b for _, b, _ in lst]
        dists = [d for _, _, d in lst]
        assert dists == sorted(dists), f"probe {pid}: distances not ascending"
        want_ids = [j for j, _ in want[pid]]
        assert ids == want_ids, f"probe {pid}"
        for d, (_, wd) in zip(dists, want[pid]):
            assert abs(d - wd) < 1e-9


def test_knn_sparse_build_forces_ring_escalation(spark):
    """Tiny build side clustered in one corner: most probes' k-th neighbor is
    far outside the initial guard ring — exercises the escalation loop."""
    probe_rows, px, py = make_points(40, 1)
    rng = np.random.default_rng(2)
    bx = rng.uniform(0, 5, 8)
    by = rng.uniform(0, 5, 8)
    build_rows = [(int(i), bytes(b)) for i, b in enumerate(wkb.encode_points_xy(bx, by))]
    P = spark.createDataFrame(probe_rows, SCHEMA).withColumnRenamed("id", "pid")
    B = spark.createDataFrame(build_rows, SCHEMA).withColumnRenamed("id", "bid")
    res = knn_join(P, B, k=3, build_id="bid", grid_level=6, broadcast_threshold=0)
    rows = res.select("pid", "bid", "knn_rank").collect()
    assert len(rows) == 40 * 3
    want = brute_knn(px, py, bx, by, 3)
    got = {}
    for r in rows:
        got.setdefault(r["pid"], set()).add(r["bid"])
    for pid in got:
        assert got[pid] == {j for j, _ in want[pid]}, f"probe {pid}"


def test_knn_k_exceeds_build_size(spark):
    probe_rows, px, py = make_points(10, 5)
    build_rows, bx, by = make_points(4, 6)
    P = spark.createDataFrame(probe_rows, SCHEMA).withColumnRenamed("id", "pid")
    B = spark.createDataFrame(build_rows, SCHEMA).withColumnRenamed("id", "bid")
    res = knn_join(P, B, k=9, build_id="bid", grid_level=4)
    assert res.count() == 10 * 4
    res = knn_join(P, B, k=9, build_id="bid", grid_level=4, broadcast_threshold=0)
    assert res.count() == 10 * 4


def test_knn_include_ties(spark):
    # 4 equidistant neighbors, k=2 with ties -> all 4 returned
    probe_rows = [(0, bytes(wkb.encode_points_xy(np.array([50.0]), np.array([50.0]))[0]))]
    off = np.array([[1, 0], [-1, 0], [0, 1], [0, -1]], dtype=float)
    bx, by = 50 + off[:, 0], 50 + off[:, 1]
    build_rows = [(int(i), bytes(b)) for i, b in enumerate(wkb.encode_points_xy(bx, by))]
    P = spark.createDataFrame(probe_rows, SCHEMA).withColumnRenamed("id", "pid")
    B = spark.createDataFrame(build_rows, SCHEMA).withColumnRenamed("id", "bid")
    for bt in (0, 200_000):
        res = knn_join(P, B, k=2, build_id="bid", include_ties=True, grid_level=5,
                       broadcast_threshold=bt)
        assert res.count() == 4, f"bt={bt}"
        res2 = knn_join(P, B, k=2, build_id="bid", include_ties=False, grid_level=5,
                        broadcast_threshold=bt)
        assert res2.count() == 2, f"bt={bt}"


def test_knn_spheroid_metric(spark):
    # haversine: nearest in meters differs from planar degrees at high lat
    probe_rows = [(0, bytes(wkb.encode_points_xy(np.array([0.0]), np.array([80.0]))[0]))]
    # candidate A: 5 deg east at lat 80 (short in meters); B: 4 deg south (long)
    bx = np.array([5.0, 0.0])
    by = np.array([80.0, 75.5])
    build_rows = [(int(i), bytes(b)) for i, b in enumerate(wkb.encode_points_xy(bx, by))]
    P = spark.createDataFrame(probe_rows, SCHEMA).withColumnRenamed("id", "pid")
    B = spark.createDataFrame(build_rows, SCHEMA).withColumnRenamed("id", "bid")
    planar = knn_join(P, B, k=1, build_id="bid", grid_level=4).collect()[0]["bid"]
    sphere = knn_join(P, B, k=1, build_id="bid", use_spheroid=True, grid_level=4).collect()[0]["bid"]
    assert knn_join(P, B, k=1, build_id="bid", grid_level=4,
                    broadcast_threshold=0).collect()[0]["bid"] == planar
    assert planar == 1  # 4.5 deg < 5 deg planar
    assert sphere == 0  # 5 deg lon at lat 80 ≈ 97 km < 500 km


def test_spheroid_rect_build(spark):
    """Spheroid kNN with a rect build side (round-2 VERDICT item 9):
    matches a brute-force exact spherical point->rect computation."""
    import numpy as np

    from sedona_db_spark.geometry import sphere, wkb as _wkb
    from sedona_db_spark.operators.knn_join import knn_join

    rng = np.random.default_rng(23)
    px = rng.uniform(-179, 179, 120)
    py = rng.uniform(-85, 85, 120)
    pts = spark.createDataFrame(
        [(int(i), bytes(w)) for i, w in enumerate(_wkb.encode_points_xy(px, py))],
        "pid LONG, geom BINARY",
    )
    boxes, bb = [], []
    for i in range(12):
        x0 = -170.0 + i * 28.0
        y0 = -60.0 + (i % 4) * 30.0
        boxes.append((i, _wkb.encode(_wkb.box(x0, y0, x0 + 20.0, y0 + 25.0))))
        bb.append((x0, y0, x0 + 20.0, y0 + 25.0))
    B = spark.createDataFrame(boxes, "bid INT, geom BINARY")
    j = knn_join(pts, B, k=2, probe_geom="geom", build_geom="geom",
                 build_id="bid", use_spheroid=True)
    got = {(r["pid"], r["bid"], r["knn_rank"]) for r in
           j.select("pid", "bid", "knn_rank").collect()}
    bb = np.array(bb)
    D = sphere.points_to_latlon_rect_distance_m(
        px, py, bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3])
    want = set()
    for i in range(len(px)):
        order = np.lexsort((np.arange(12), D[i]))
        for r, jbox in enumerate(order[:2]):
            want.add((i, int(jbox), r + 1))
    assert got == want


def test_spheroid_general_build(spark):
    """Spheroid kNN with a general (triangle) build side uses exact
    great-circle point->geometry distances."""
    import numpy as np

    from sedona_db_spark.geometry import sphere, wkb as _wkb
    from sedona_db_spark.operators.knn_join import knn_join

    rng = np.random.default_rng(29)
    px = rng.uniform(-60, 60, 60)
    py = rng.uniform(-50, 50, 60)
    pts = spark.createDataFrame(
        [(int(i), bytes(w)) for i, w in enumerate(_wkb.encode_points_xy(px, py))],
        "pid LONG, geom BINARY",
    )
    tris = []
    for i in range(6):
        cx, cy = -50.0 + i * 20.0, -30.0 + (i % 3) * 25.0
        tris.append((i, _wkb.encode(_wkb.from_wkt(
            f"POLYGON(({cx} {cy}, {cx+8} {cy}, {cx+4} {cy+7}, {cx} {cy}))"))))
    B = spark.createDataFrame(tris, "bid INT, geom BINARY")
    j = knn_join(pts, B, k=2, probe_geom="geom", build_geom="geom",
                 build_id="bid", use_spheroid=True)
    got = {(r["pid"], r["bid"], r["knn_rank"]) for r in
           j.select("pid", "bid", "knn_rank").collect()}
    D = np.column_stack([
        sphere.points_to_geography_distance_m(px, py, _wkb.parse(t[1]))
        for t in tris
    ])
    want = set()
    for i in range(len(px)):
        order = np.lexsort((np.arange(6), D[i]))
        for r, jt in enumerate(order[:2]):
            want.add((i, int(jt), r + 1))
    assert got == want


def test_spherical_tagged_columns_force_haversine(spark):
    """knn_join on geography-tagged columns must rank by great-circle
    meters even when the caller forgets use_spheroid=True."""
    import numpy as np

    from sedona_db_spark.geometry import wkb
    from sedona_db_spark.types import with_geom_meta

    # at lat 60, 1 degree of lon is half as long as 1 degree of lat —
    # planar-degree ranking inverts this pair
    probe = spark.createDataFrame(
        [(0, bytes(wkb.encode_points_xy(np.array([0.0]), np.array([60.0]))[0]))],
        "pid LONG, geom BINARY",
    )
    build = spark.createDataFrame(
        [
            (1, bytes(wkb.encode_points_xy(np.array([1.8]), np.array([60.0]))[0])),
            (2, bytes(wkb.encode_points_xy(np.array([0.0]), np.array([61.0]))[0])),
        ],
        "bid LONG, geom BINARY",
    )
    gp = with_geom_meta(probe, "geom", crs="EPSG:4326", edges="spherical")
    gb = with_geom_meta(build, "geom", crs="EPSG:4326", edges="spherical")
    got = knn_join(gp, gb, k=1, probe_geom="geom", build_geom="geom").collect()
    assert got[0]["bid"] == 1  # 1.8 deg lon at lat 60 ≈ 100 km < 111 km
    planar = knn_join(probe, build, k=1, probe_geom="geom", build_geom="geom").collect()
    assert planar[0]["bid"] == 2  # planar degrees rank the other way
    import pytest as _pt
    with _pt.raises(ValueError, match="edges"):
        knn_join(gp, build, k=1, probe_geom="geom", build_geom="geom")


def test_knn_probe_order_preserved(spark):
    """Round-4: knn_join_ordered emits probe rows in arrival order with
    each row's k neighbors adjacent and rank-sorted."""
    import numpy as np

    from sedona_db_spark.geometry import wkb as W
    from sedona_db_spark.operators.spatial_join import knn_join_ordered

    rng = np.random.default_rng(13)
    perm = rng.permutation(120)
    xs = rng.uniform(-50, 50, 120)
    ys = rng.uniform(-50, 50, 120)
    probe = spark.createDataFrame(
        [(int(perm[i]), bytes(b)) for i, b in enumerate(W.encode_points_xy(xs, ys))],
        "pid LONG, geom BINARY")
    probe_order = [r["pid"] for r in probe.select("pid").collect()]
    bx = rng.uniform(-50, 50, 40)
    by = rng.uniform(-50, 50, 40)
    build = spark.createDataFrame(
        [(int(i), bytes(b)) for i, b in enumerate(W.encode_points_xy(bx, by))],
        "bid LONG, geometry BINARY")
    out = knn_join_ordered(probe, build, k=3, probe_geom="geom",
                           build_geom="geometry", build_id="bid")
    rows = out.select("pid", "knn_rank").collect()
    assert [r["pid"] for r in rows] == [p for p in probe_order for _ in range(3)]
    assert [r["knn_rank"] for r in rows] == [1, 2, 3] * 120


def test_spheroid_chord_prune_differential(spark):
    """Chord-prune broadcast spheroid kNN (round 5): the GEMM candidate
    cut must reproduce the full-haversine-matrix ranking bit-exactly,
    including exact E/W mirror ties (broken by build tie order)."""
    rng = np.random.default_rng(31)
    px = rng.uniform(-179, 179, 150)
    py = rng.uniform(-85, 85, 150)
    # exact-tie probes: 0 lon, mirrored build pairs at +-dlon added below
    px[:5] = 0.0
    py[:5] = np.array([0.0, 20.0, -40.0, 60.0, 80.0])
    bx = rng.uniform(-179, 179, 300)
    by = rng.uniform(-85, 85, 300)
    # mirrored pairs around lon 0 at the tie-probes' latitudes: exact
    # haversine ties (same |dlon|, same lats)
    bx[:10] = np.array([3.0, -3.0, 2.0, -2.0, 5.0, -5.0, 1.5, -1.5, 4.0, -4.0])
    by[:10] = np.repeat(py[:5], 2)
    P = spark.createDataFrame(
        [(int(i), bytes(b)) for i, b in enumerate(wkb.encode_points_xy(px, py))],
        SCHEMA).withColumnRenamed("id", "pid")
    B = spark.createDataFrame(
        [(int(i), bytes(b)) for i, b in enumerate(wkb.encode_points_xy(bx, by))],
        SCHEMA).withColumnRenamed("id", "bid")
    for k in (1, 3):
        j = knn_join(P, B, k=k, build_id="bid", use_spheroid=True)
        got = {}
        for r in j.select("pid", "bid", "knn_rank", "knn_distance").collect():
            got.setdefault(r["pid"], []).append(
                (r["knn_rank"], r["bid"], r["knn_distance"]))
        assert len(got) == len(px)
        for i in range(len(px)):
            d = algos.haversine_m(px[i], py[i], bx, by)
            order = np.lexsort((np.arange(len(bx)), d))
            want = [(rk + 1, int(j_), float(d[j_]))
                    for rk, j_ in enumerate(order[:k])]
            assert sorted(got[i]) == want, f"probe {i} k={k}"


def test_planar_eucl_prune_mirror_ties(spark):
    """Planar GEMM prune (round 5): exact mirror-pair ties must break by
    build tie order, identical to the full-matrix path."""
    rng = np.random.default_rng(47)
    px = rng.uniform(0, 100, 80)
    py = rng.uniform(0, 100, 80)
    px[:3] = 50.0
    py[:3] = np.array([10.0, 50.0, 90.0])
    bx = rng.uniform(0, 100, 200)
    by = rng.uniform(0, 100, 200)
    bx[:6] = np.array([53.0, 47.0, 52.0, 48.0, 51.0, 49.0])
    by[:6] = np.repeat(py[:3], 2)
    P = spark.createDataFrame(
        [(int(i), bytes(b)) for i, b in enumerate(wkb.encode_points_xy(px, py))],
        SCHEMA).withColumnRenamed("id", "pid")
    B = spark.createDataFrame(
        [(int(i), bytes(b)) for i, b in enumerate(wkb.encode_points_xy(bx, by))],
        SCHEMA).withColumnRenamed("id", "bid")
    res = knn_join(P, B, k=3, build_id="bid")
    got = {}
    for r in res.select("pid", "bid", "knn_rank").collect():
        got.setdefault(r["pid"], []).append((r["knn_rank"], r["bid"]))
    want = brute_knn(px, py, bx, by, 3)
    for i in range(len(px)):
        assert sorted(got[i]) == [(rk + 1, j) for rk, (j, _) in
                                  enumerate(want[i])], i
