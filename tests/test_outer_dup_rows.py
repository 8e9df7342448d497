"""Round-3 regression tests for the round-2 advisor findings.

1. HIGH — outer spatial joins with EXACT-DUPLICATE input rows: content-
   derived row ids give identical rows the same id, so an id-keyed payload
   rejoin multiplies their matches k-fold. The fix emits matched pairs
   directly (they already carry both payloads) and uses ids only for
   left_anti unmatched detection. A dedup-oriented corpus routinely
   contains duplicate rows, so this is row-count-visible.
2. MEDIUM — spherical ring area must wrap each edge's delta-longitude into
   (-pi, pi]: antimeridian-straddling rings were ~180x too large.
3. knn_join duplicate rows: duplicate probes must each get k result rows;
   duplicate build rows must occupy distinct neighbor ranks.
4. overlay _interior_sample must return a point INSIDE a concave ring
   (the raw ear centroid can fall in a notch).
"""

import numpy as np
import pytest

from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from sedona_db_spark.geometry import algos, wkb
from sedona_db_spark.operators.spatial_join import (
    geography_dwithin_join,
    geography_pip_join,
    spatial_join,
)
from sedona_db_spark.operators.knn_join import knn_join


SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("geometry", BinaryType()),
])


def pt(x, y):
    return bytes(wkb.encode_points_xy(np.array([x]), np.array([y]))[0])


def box(x0, y0, x1, y1):
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)
    return wkb.encode(wkb.Geometry(wkb.POLYGON, [ring]))


@pytest.fixture(scope="module")
def dup_tables(spark):
    # two IDENTICAL left points inside the box, one distinct point outside,
    # and two IDENTICAL boxes + one far box on the right
    L = spark.createDataFrame(
        [(1, pt(5.0, 5.0)), (1, pt(5.0, 5.0)), (2, pt(50.0, 50.0))], SCHEMA
    )
    R = spark.createDataFrame(
        [(10, box(0, 0, 10, 10)), (10, box(0, 0, 10, 10)), (11, box(90, 90, 99, 99))],
        SCHEMA,
    )
    return L, R


def test_left_outer_duplicate_rows(dup_tables):
    L, R = dup_tables
    out = spatial_join(L, R, predicate="intersects", how="left").collect()
    # 2 dup left rows x 2 dup boxes = 4 matched + 1 unmatched-left = 5
    assert len(out) == 5
    matched = [r for r in out if r[2] is not None]
    assert len(matched) == 4
    unmatched = [r for r in out if r[2] is None]
    assert len(unmatched) == 1 and unmatched[0][0] == 2


def test_right_outer_duplicate_rows(dup_tables):
    L, R = dup_tables
    out = spatial_join(L, R, predicate="intersects", how="right").collect()
    # 4 matched + 1 unmatched-right (far box) = 5
    assert len(out) == 5
    unmatched = [r for r in out if r[0] is None]
    assert len(unmatched) == 1 and unmatched[0][2] == 11


def test_full_outer_duplicate_rows(dup_tables):
    L, R = dup_tables
    out = spatial_join(L, R, predicate="intersects", how="full").collect()
    # 4 matched + 1 unmatched-left + 1 unmatched-right = 6
    assert len(out) == 6


def test_semi_anti_duplicate_rows(dup_tables):
    L, R = dup_tables
    semi = spatial_join(L, R, predicate="intersects", how="left_semi").collect()
    assert len(semi) == 2 and all(r[0] == 1 for r in semi)
    anti = spatial_join(L, R, predicate="intersects", how="left_anti").collect()
    assert len(anti) == 1 and anti[0][0] == 2


def test_geography_dwithin_outer_duplicate_rows(spark):
    L = spark.createDataFrame(
        [(1, pt(10.0, 10.0)), (1, pt(10.0, 10.0)), (2, pt(-120.0, -60.0))], SCHEMA
    )
    R = spark.createDataFrame(
        [(10, pt(10.001, 10.0)), (10, pt(10.001, 10.0)), (11, pt(60.0, 60.0))], SCHEMA
    )
    out = geography_dwithin_join(L, R, distance_m=1000.0, how="left").collect()
    assert len(out) == 5  # 4 matched + 1 unmatched-left
    assert sum(1 for r in out if r[2] is None) == 1
    out_r = geography_dwithin_join(L, R, distance_m=1000.0, how="right").collect()
    assert len(out_r) == 5  # 4 matched + 1 unmatched-right
    assert sum(1 for r in out_r if r[0] is None) == 1


def test_geography_pip_left_duplicate_rows(spark):
    L = spark.createDataFrame(
        [(1, pt(5.0, 5.0)), (1, pt(5.0, 5.0)), (2, pt(-120.0, -60.0))], SCHEMA
    )
    R = spark.createDataFrame([(10, box(0, 0, 10, 10)), (10, box(0, 0, 10, 10))], SCHEMA)
    out = geography_pip_join(L, R, predicate="within", how="left").collect()
    assert len(out) == 5  # 4 matched + 1 unmatched
    assert sum(1 for r in out if r[2] is None) == 1


def test_geography_pip_shuffled_fallback(spark, monkeypatch):
    """Above the broadcast byte cap the band join must shuffle, not OOM the
    driver (round-2 VERDICT 'What's wrong' #1) — same rows either way."""
    import sedona_db_spark.operators.spatial_join as sj

    L = spark.createDataFrame([(i, pt(1.0 + i, 1.0 + i)) for i in range(8)], SCHEMA)
    R = spark.createDataFrame([(10, box(0, 0, 20, 20))], SCHEMA)
    expect = sorted(
        (r[0], r[2]) for r in geography_pip_join(L, R, predicate="within").collect()
    )
    monkeypatch.setattr(sj, "BROADCAST_BYTES_CAP", 0)
    got = sorted(
        (r[0], r[2]) for r in geography_pip_join(L, R, predicate="within").collect()
    )
    assert got == expect and len(got) == 8


def test_knn_duplicate_probe_and_build_rows(spark):
    # 2 identical probes; build has 2 identical nearest points -> for k=2
    # each probe row must get BOTH duplicate build rows (ranks 1 and 2)
    P = spark.createDataFrame([(1, pt(0.0, 0.0)), (1, pt(0.0, 0.0))], SCHEMA)
    B = spark.createDataFrame(
        [(10, pt(0.0, 1.0)), (10, pt(0.0, 1.0)), (11, pt(0.0, 5.0))], SCHEMA
    )
    for kwargs in ({}, {"broadcast_threshold": 0}):  # broadcast + ring paths
        out = knn_join(P, B, k=2, **kwargs).collect()
        assert len(out) == 4, kwargs
        for r in out:
            assert r[2] == 10 and abs(r["knn_distance"] - 1.0) < 1e-12
        assert sorted(r["knn_rank"] for r in out) == [1, 1, 2, 2]


def test_knn_duplicate_probe_multiplicity_k1(spark):
    P = spark.createDataFrame(
        [(1, pt(0.0, 0.0)), (1, pt(0.0, 0.0)), (2, pt(3.0, 3.0))], SCHEMA
    )
    B = spark.createDataFrame([(10, pt(1.0, 0.0)), (11, pt(4.0, 3.0))], SCHEMA)
    out = knn_join(P, B, k=1).collect()
    assert len(out) == 3
    assert sorted(r[0] for r in out) == [1, 1, 2]


def test_spherical_area_antimeridian():
    """An antimeridian-straddling 2 deg x 1 deg ring near the equator is
    ~0.000609 sr, not 0.109 sr (round-2 advisor medium finding)."""
    from sedona_db_spark.functions.geography import geog_area_m2, EARTH_RADIUS_M

    ring = np.array(
        [[179.0, 0.0], [-179.0, 0.0], [-179.0, 1.0], [179.0, 1.0], [179.0, 0.0]]
    )
    g = wkb.Geometry(wkb.POLYGON, [ring])
    area_sr = geog_area_m2(g) / (EARTH_RADIUS_M ** 2)
    expect = np.radians(2.0) * (np.sin(np.radians(1.0)) - 0.0)
    assert abs(area_sr - expect) / expect < 1e-9
    # a non-straddling control ring of the same size must be unchanged
    ring2 = ring.copy()
    ring2[:, 0] = [1.0, 3.0, 3.0, 1.0, 1.0]
    g2 = wkb.Geometry(wkb.POLYGON, [ring2])
    assert abs(geog_area_m2(g2) / EARTH_RADIUS_M ** 2 - expect) / expect < 1e-9


def test_interior_sample_concave_ring():
    """C-shaped ring whose lowest-leftmost ear centroid lands in the notch:
    the verified shrink must return a point strictly inside."""
    from sedona_db_spark.geometry.overlay import _interior_sample

    ring = [(0, 0), (10, 0), (10, 1), (1, 1), (1, 9), (10, 9), (10, 10), (0, 10)]
    px, py = _interior_sample(ring)
    arr = np.array(ring + [ring[0]], dtype=np.float64)
    ins, onb = algos.locate_points_in_ring(np.array([px]), np.array([py]), arr)
    assert ins[0] and not onb[0]
