"""Geography join tests — the antimeridian case from the reference's
test_sjoin.py geography suite (FIXTURES.md §4): two point sets straddling
the antimeridian join on the sphere but not on the plane."""

import numpy as np
import pytest

from sedona_db_spark.geometry import wkb
from sedona_db_spark.operators.spatial_join import geography_dwithin_join, spatial_join


def _pts(spark, xs, ys, name):
    rows = [(int(i), bytes(b)) for i, b in enumerate(wkb.encode_points_xy(np.array(xs), np.array(ys)))]
    return spark.createDataFrame(rows, f"{name} LONG, geometry BINARY")


def test_antimeridian_geography_join(spark):
    # west of the antimeridian expressed as lon < -180 vs east side ~ +175
    A = _pts(spark, [-185.0, -179.0, -175.5], [0.0, 5.0, -5.0], "aid")
    B = _pts(spark, [175.0, 181.0, 184.5], [0.0, 5.0, -5.0], "bid")
    geo = geography_dwithin_join(A, B, distance_m=100_000.0)
    rows = {(r["aid"], r["bid"]) for r in geo.collect()}
    # -185 == 175 on the sphere; -179 ~ 181; -175.5 ~ 184.5
    assert rows == {(0, 0), (1, 1), (2, 2)}

    # the planar join at the same tolerance-in-degrees finds nothing
    planar = spatial_join(A, B, predicate="dwithin", distance=1.0)
    assert planar.count() == 0


def test_geography_close_pairs_only(spark):
    A = _pts(spark, [0.0, 10.0], [0.0, 10.0], "aid")
    B = _pts(spark, [0.1, 120.0], [0.0, 40.0], "bid")
    geo = geography_dwithin_join(A, B, distance_m=50_000.0)
    rows = {(r["aid"], r["bid"]) for r in geo.collect()}
    assert rows == {(0, 0)}  # ~11 km apart; everything else is far


def test_banded_strategy_matches_broadcast(spark):
    """The latitude-band equi-join prefilter (scale path) returns exactly
    the broadcast nested-loop result."""
    rng = np.random.default_rng(7)
    ax = rng.uniform(-179, 179, 300); ay = rng.uniform(-85, 85, 300)
    bx = rng.uniform(-179, 179, 300); by = rng.uniform(-85, 85, 300)
    A = _pts(spark, ax, ay, "aid")
    B = _pts(spark, bx, by, "bid")
    d = 750_000.0
    got_b = {(r["aid"], r["bid"]) for r in
             geography_dwithin_join(A, B, d, strategy="broadcast").collect()}
    got_band = {(r["aid"], r["bid"]) for r in
                geography_dwithin_join(A, B, d, strategy="banded").collect()}
    assert got_band == got_b
    assert len(got_b) > 0


def test_banded_antimeridian(spark):
    A = _pts(spark, [-185.0, 179.5], [0.0, 10.0], "aid")
    B = _pts(spark, [175.0, -179.5], [0.0, 10.0], "bid")
    got = {(r["aid"], r["bid"]) for r in
           geography_dwithin_join(A, B, 150_000.0, strategy="banded").collect()}
    assert got == {(0, 0), (1, 1)}


def test_geography_scalars_spherical(spark):
    """Spherical area/length kernels (functions/geography.py): a 1-degree
    box at the equator vs at 60N — the 60N box has ~half the area."""
    from pyspark.sql import functions as F

    from sedona_db_spark.functions import geography as G

    eq = wkb.encode(wkb.box(0, 0, 1, 1))
    hi = wkb.encode(wkb.box(0, 59.5, 1, 60.5))
    df = spark.createDataFrame([(0, eq), (1, hi)], "id LONG, geometry BINARY")
    out = {r["id"]: r for r in df.select(
        "id",
        G.ST_Area_Spherical(F.col("geometry")).alias("a"),
        G.ST_Perimeter_Spherical(F.col("geometry")).alias("p"),
    ).collect()}
    deg_m = 111194.9266
    assert out[0]["a"] == pytest.approx(deg_m * deg_m, rel=1e-4)
    import math
    assert out[1]["a"] == pytest.approx(out[0]["a"] * math.cos(math.radians(60.0)), rel=1e-3)
    # perimeter of the equator box: ~2 lat edges + 2 lon edges (lon edge at
    # lat 0/1 is ~cos-weighted); all four ≈ 111.19 km here
    assert out[0]["p"] == pytest.approx(4 * deg_m, rel=1e-3)


def test_geography_distance_vs_haversine(spark):
    from pyspark.sql import functions as F

    from sedona_db_spark.functions import geography as G
    from sedona_db_spark.geometry import algos

    a = wkb.encode(wkb.point(2.35, 48.85))   # Paris
    b = wkb.encode(wkb.point(-0.13, 51.51))  # London
    df = spark.createDataFrame([(a, b)], "g1 BINARY, g2 BINARY")
    got = df.select(G.ST_Distance_Spherical(F.col("g1"), F.col("g2")).alias("d")).collect()[0]["d"]
    want = float(algos.haversine_m(2.35, 48.85, -0.13, 51.51))
    assert got == want
    assert 330_000 < got < 360_000


def test_geography_outer_joins(spark):
    """INNER/LEFT/RIGHT geography joins (reference: test_sjoin.py
    test_spatial_join_geography parametrizes the same three types)."""
    A = _pts(spark, [0.0, 50.0], [0.0, 50.0], "aid")
    B = _pts(spark, [0.1, -120.0, 0.2], [0.0, -40.0, 0.1], "bid")
    d = 50_000.0
    inner = {(r["aid"], r["bid"]) for r in geography_dwithin_join(A, B, d).collect()}
    assert inner == {(0, 0), (0, 2)}
    left = [(r["aid"], r["bid"]) for r in
            geography_dwithin_join(A, B, d, how="left").collect()]
    assert set(left) == {(0, 0), (0, 2), (1, None)}
    assert len(left) == 3
    right = [(r["aid"], r["bid"]) for r in
             geography_dwithin_join(A, B, d, how="right").collect()]
    assert set(right) == {(0, 0), (0, 2), (None, 1)}
    assert len(right) == 3


def test_spherical_pip_kernel():
    """Gnomonic spherical point-in-polygon: great-circle edge semantics,
    verified against known geometry (equatorial box + polar cap +
    antimeridian ring)."""
    import numpy as np

    from sedona_db_spark.functions.geography import locate_points_in_spherical_polygon
    from sedona_db_spark.geometry import wkb as W

    # antimeridian-straddling ring lon 170..190 (i.e. 170..-170)
    ring = np.array([[170.0, -10], [190.0, -10], [190.0, 10], [170.0, 10], [170.0, -10]])
    g = W.Geometry(W.POLYGON, [ring])
    loc = locate_points_in_spherical_polygon(
        np.array([180.0, -175.0, 150.0, 0.0]), np.array([0.0, 5.0, 0.0, 0.0]), g)
    assert list(loc) == [2, 2, 0, 0]

    # polar cap: ring at lat 80 all around -> contains the pole
    lons = np.arange(0, 360, 30, dtype=float)
    cap = np.column_stack([lons, np.full_like(lons, 80.0)])
    cap = np.vstack([cap, cap[:1]])
    gcap = W.Geometry(W.POLYGON, [cap])
    loc2 = locate_points_in_spherical_polygon(
        np.array([13.0, 0.0]), np.array([89.0, 0.0]), gcap)
    assert list(loc2) == [2, 0]

    # great-circle edge bulge: edge from (0,45) to (90,45) passes NORTH of
    # lat 45 midway (planar semantics would put (45,46) outside)
    tri = np.array([[0.0, 45.0], [90.0, 45.0], [45.0, 80.0], [0.0, 45.0]])
    gt = W.Geometry(W.POLYGON, [tri])
    # the great circle between the two lat-45 vertices reaches ~54.7N at
    # lon 45, so points BELOW that (even above planar lat 45) are OUTSIDE
    # — exactly the spherical-vs-planar edge difference
    loc3 = locate_points_in_spherical_polygon(
        np.array([45.0, 45.0, 45.0]), np.array([46.0, 50.0, 60.0]), gt)
    assert list(loc3) == [0, 0, 2]


def test_geography_pip_join_antimeridian(spark):
    import numpy as np

    from sedona_db_spark.geometry import wkb as W
    from sedona_db_spark.operators.spatial_join import geography_pip_join

    ring = np.array([[170.0, -10], [190.0, -10], [190.0, 10], [170.0, 10], [170.0, -10]])
    zones = spark.createDataFrame(
        [(0, W.encode(W.Geometry(W.POLYGON, [ring])))], "zone_id LONG, geometry BINARY")
    pts = _pts(spark, [180.0, -175.0, 150.0, 0.0], [0.0, 5.0, 0.0, 0.0], "pid")
    got = {(r["pid"], r["zone_id"]) for r in
           geography_pip_join(pts, zones, predicate="within").collect()}
    assert got == {(0, 0), (1, 0)}
    # left join keeps unmatched points
    left = geography_pip_join(pts, zones, predicate="within", how="left").collect()
    assert len(left) == 4
    assert {r["pid"] for r in left if r["zone_id"] is None} == {2, 3}


# ---------------------------------------------------------------------------
# Round-4 regressions: geography fast paths must be sample-DECIDED +
# full-scan CONFIRMED / strict-decoded (ADVICE r3 medium) — the same
# silent-drop family the planar paths were hardened against in round 3.
# ---------------------------------------------------------------------------


def _tag_spherical(df):
    from sedona_db_spark.types import SPHERICAL, with_geom_meta

    return with_geom_meta(df, "geometry", edges=SPHERICAL)


def test_geography_pip_hidden_polygon_raises(spark):
    """A polygon hidden past the 200-row sampled prefix of the left side
    must fail at PLAN time (full-scan confirm), never drop silently."""
    import numpy as np

    from sedona_db_spark.geometry import wkb as W
    from sedona_db_spark.operators.spatial_join import spatial_join

    n = 300
    xs = np.linspace(-30, 30, n)
    ys = np.linspace(-10, 10, n)
    ring = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]])
    rows = [
        (int(i), bytes(b))
        for i, b in enumerate(W.encode_points_xy(xs, ys))
    ] + [(999, bytes(W.encode(W.Geometry(W.POLYGON, [ring]))))]
    left = _tag_spherical(
        spark.createDataFrame(rows, "pid LONG, geometry BINARY"))
    zone = np.array([[-40.0, -20], [40.0, -20], [40.0, 20], [-40.0, 20], [-40.0, -20]])
    right = _tag_spherical(spark.createDataFrame(
        [(0, bytes(W.encode(W.Geometry(W.POLYGON, [zone]))))],
        "zone_id LONG, geometry BINARY"))
    with pytest.raises(NotImplementedError, match="POINT left side"):
        spatial_join(left, right, predicate="within")


def test_geography_pip_bigendian_point_not_false_rejected(spark):
    """Big-endian point WKB fails the LE header confirm but IS a point —
    the dispatch must re-check through the exact parser, not reject."""
    import struct

    import numpy as np

    from sedona_db_spark.geometry import wkb as W
    from sedona_db_spark.operators.spatial_join import spatial_join

    be_pt = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 0.5, 0.3)
    rows = [(0, bytes(W.encode_points_xy(np.array([0.4]), np.array([0.4]))[0])),
            (1, be_pt)]
    left = _tag_spherical(spark.createDataFrame(rows, "pid LONG, geometry BINARY"))
    zone = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0]])
    right = _tag_spherical(spark.createDataFrame(
        [(0, bytes(W.encode(W.Geometry(W.POLYGON, [zone]))))],
        "zone_id LONG, geometry BINARY"))
    got = {(r["pid"], r["zone_id"]) for r in
           spatial_join(left, right, predicate="within").collect()}
    assert got == {(0, 0), (1, 0)}


def test_geography_dwithin_nonpoint_raises(spark):
    """geography_dwithin_join is a point-only kernel: a non-point row on
    either side raises loudly instead of silently vanishing in the mask."""
    import numpy as np

    from sedona_db_spark.geometry import wkb as W
    from sedona_db_spark.operators.spatial_join import geography_dwithin_join

    ring = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]])
    A = _pts(spark, [0.0, 1.0], [0.0, 1.0], "aid")
    B = spark.createDataFrame(
        [(0, bytes(W.encode_points_xy(np.array([0.0]), np.array([0.0]))[0])),
         (1, bytes(W.encode(W.Geometry(W.POLYGON, [ring]))))],
        "bid LONG, geometry BINARY")
    with pytest.raises(Exception, match="point geometries"):
        geography_dwithin_join(A, B, distance_m=10_000.0).collect()


def test_geography_pip_nonareal_right_raises(spark):
    """The spherical PIP refine reads polygon rings only — a lineal right
    row must raise, not test as 'outside'."""
    import numpy as np

    from sedona_db_spark.geometry import wkb as W
    from sedona_db_spark.operators.spatial_join import geography_pip_join

    line = np.array([[0.0, 0.0], [1.0, 1.0]])
    pts = _pts(spark, [0.5], [0.5], "pid")
    right = spark.createDataFrame(
        [(0, bytes(W.encode(W.Geometry(W.LINESTRING, line))))],
        "zone_id LONG, geometry BINARY")
    with pytest.raises(Exception, match="polygonal"):
        geography_pip_join(pts, right, predicate="within").collect()


def test_geography_join_type_parity(spark):
    """Round-4: geography joins expose the same how= surface as the
    planar spatial_join (inner/left/right/full/left_semi/left_anti)."""
    import numpy as np

    from sedona_db_spark.geometry import wkb as W
    from sedona_db_spark.operators.spatial_join import (
        geography_dwithin_join,
        geography_pip_join,
    )

    pts = _pts(spark, [0.5, 50.0, -120.0], [0.5, 10.0, 40.0], "pid")
    ring = np.array([[-1.0, -1.0], [2.0, -1.0], [2.0, 2.0], [-1.0, 2.0], [-1.0, -1.0]])
    far = np.array([[100.0, -60.0], [102.0, -60.0], [102.0, -58.0], [100.0, -60.0]])
    zones = spark.createDataFrame(
        [(0, bytes(W.encode(W.Geometry(W.POLYGON, [ring])))),
         (1, bytes(W.encode(W.Geometry(W.POLYGON, [far]))))],
        "zid LONG, geometry BINARY")

    def _k(t):
        return tuple((v is None, v if v is not None else 0) for v in t)

    def pairs(how):
        return sorted(
            ((r["pid"], r["zid"])
             for r in geography_pip_join(pts, zones, predicate="within",
                                         how=how).collect()),
            key=_k,
        )

    assert pairs("inner") == [(0, 0)]
    assert pairs("left") == sorted([(0, 0), (1, None), (2, None)], key=_k)
    assert pairs("right") == sorted([(0, 0), (None, 1)], key=_k)
    assert pairs("full") == sorted([(0, 0), (1, None), (2, None), (None, 1)], key=_k)
    semi = geography_pip_join(pts, zones, predicate="within", how="left_semi")
    assert [r["pid"] for r in semi.collect()] == [0]
    assert semi.columns == ["pid", "geometry"]
    anti = geography_pip_join(pts, zones, predicate="within", how="left_anti")
    assert sorted(r["pid"] for r in anti.collect()) == [1, 2]

    B = _pts(spark, [0.6, 179.0], [0.6, 0.0], "bid")
    dw = lambda how: sorted(
        ((r["pid"], r["bid"])
         for r in geography_dwithin_join(pts, B, 50_000.0, how=how).collect()),
        key=_k)
    assert dw("inner") == [(0, 0)]
    assert dw("full") == sorted([(0, 0), (1, None), (2, None), (None, 1)], key=_k)
    assert sorted(r["pid"] for r in geography_dwithin_join(
        pts, B, 50_000.0, how="left_anti").collect()) == [1, 2]


def test_cell_banded_polar_and_dup_free(spark):
    """Round-5 lat-lon CELL prefilter: near-pole latitude bands collapse
    to a single longitude bucket (no finite dlon bound there), and the
    build-side 9-cell explode is array_distinct'ed so each qualifying
    pair is emitted exactly once."""
    # polar cluster: all within ~200 km of the pole -> any lon matches
    ax = [0.0, 90.0, -90.0, 179.0]
    ay = [89.5, 89.6, 89.7, 89.4]
    bx = [45.0, -135.0]
    by = [89.5, 89.8]
    A = _pts(spark, ax, ay, "aid")
    B = _pts(spark, bx, by, "bid")
    d = 300_000.0
    bc = {(r["aid"], r["bid"]) for r in
          geography_dwithin_join(A, B, d, strategy="broadcast").collect()}
    banded_rows = [(r["aid"], r["bid"]) for r in
                   geography_dwithin_join(A, B, d, strategy="banded").collect()]
    assert set(banded_rows) == bc and len(bc) > 0
    assert len(banded_rows) == len(set(banded_rows))  # no dup emissions


def test_cell_banded_parity_small_distance(spark):
    """Small distance -> many lon bands; equal-width ring keeps
    antimeridian-adjacent cells circularly neighboring."""
    rng = np.random.default_rng(11)
    n = 250
    ax = rng.uniform(170, 190, n)  # straddle the antimeridian
    ay = rng.uniform(-80, 80, n)
    bx = rng.uniform(170, 190, n)
    by = rng.uniform(-80, 80, n)
    ax = np.where(ax > 180, ax - 360, ax)
    bx = np.where(bx > 180, bx - 360, bx)
    A = _pts(spark, ax, ay, "aid")
    B = _pts(spark, bx, by, "bid")
    d = 120_000.0
    bc = {(r["aid"], r["bid"]) for r in
          geography_dwithin_join(A, B, d, strategy="broadcast").collect()}
    banded = [(r["aid"], r["bid"]) for r in
              geography_dwithin_join(A, B, d, strategy="banded").collect()]
    assert set(banded) == bc
    assert len(banded) == len(set(banded))
