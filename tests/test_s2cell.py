"""S2 cell ids: kernel invariants, an independent per-row Hilbert
reimplementation as differential oracle, and the Spark column surface
(pandas-UDF encode + pure-JVM bit algebra for parent/level/range/token).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sedona_db_spark.geometry import s2cell as s2
from sedona_db_spark.functions import s2 as s2f


def _rand(n=500, seed=11):
    rng = np.random.default_rng(seed)
    return rng.uniform(-89.9, 89.9, n), rng.uniform(-180.0, 180.0, n)


def _u(a):
    return np.asarray(a, np.int64).view(np.uint64)


# --- kernel ---------------------------------------------------------------

def test_level_and_parent_consistency():
    lat, lng = _rand()
    leaf = s2.cell_id_from_latlng(lat, lng, 30)
    assert (s2.cell_level(leaf) == 30).all()
    for lev in (0, 5, 12, 29):
        c = s2.cell_id_from_latlng(lat, lng, lev)
        assert (s2.cell_level(c) == lev).all()
        assert (s2.cell_parent(leaf, lev) == c).all()
        assert (_u(s2.range_min(c)) <= _u(leaf)).all()
        assert (_u(leaf) <= _u(s2.range_max(c))).all()


def test_center_roundtrip_every_level():
    lat, lng = _rand(200)
    for lev in (0, 3, 12, 22, 30):
        c = s2.cell_id_from_latlng(lat, lng, lev)
        cl, cg = s2.cell_center_latlng(c)
        assert (s2.cell_id_from_latlng(cl, cg, lev) == c).all()


def test_faces_of_axis_points():
    pts = [  # (lat, lng, expected face)
        (0.0, 0.0, 0), (0.0, 90.0, 1), (90.0, 0.0, 2),
        (0.0, 180.0, 3), (0.0, -90.0, 4), (-90.0, 0.0, 5),
    ]
    lat = np.array([p[0] for p in pts])
    lng = np.array([p[1] for p in pts])
    face, _, _ = s2._face_uv(*s2._latlng_to_xyz(lat, lng))
    assert face.tolist() == [p[2] for p in pts]


def test_differential_vs_per_row_hilbert():
    # independent bit-by-bit reimplementation straight from the published
    # table constants — catches any vectorization bug in _from_face_ij
    POS_TO_IJ = [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]]
    IJ_TO_POS = [{ij: p for p, ij in enumerate(row)} for row in POS_TO_IJ]
    POS_ORIENT = [1, 0, 0, 3]

    def slow(face, i, j):
        o, pos = face & 1, 0
        for k in range(29, -1, -1):
            ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
            p = IJ_TO_POS[o][ij]
            pos = (pos << 2) | p
            o ^= POS_ORIENT[p]
        v = (face << 61) | (pos << 1) | 1
        return v - (1 << 64) if v >= (1 << 63) else v

    lat, lng = _rand(120, seed=3)
    leaf = s2.cell_id_from_latlng(lat, lng, 30)
    x, y, z = s2._latlng_to_xyz(lat, lng)
    face, u, v = s2._face_uv(x, y, z)
    i = s2._st_to_ij(s2._uv_to_st(u))
    j = s2._st_to_ij(s2._uv_to_st(v))
    for n in range(len(lat)):
        assert slow(int(face[n]), int(i[n]), int(j[n])) == int(leaf[n])


def test_hilbert_locality():
    # nearby points at level 12 share the level-8 ancestor cell
    base_lat, base_lng = 41.5, -72.25
    eps = 1e-4
    lat = np.array([base_lat, base_lat + eps])
    lng = np.array([base_lng, base_lng + eps])
    c = s2.cell_id_from_latlng(lat, lng, 12)
    assert s2.cell_parent(c[:1], 8)[0] == s2.cell_parent(c[1:], 8)[0]


def test_token_format():
    lat, lng = _rand(20)
    c = s2.cell_id_from_latlng(lat, lng, 12)
    toks = s2.cell_token(c)
    for t, v in zip(toks, _u(c).tolist()):
        assert t == format(v, "016x").rstrip("0")
        assert not t.endswith("0") and 1 <= len(t) <= 16


def test_level_validation():
    with pytest.raises(ValueError):
        s2.cell_id_from_latlng([0.0], [0.0], 31)


# --- Spark surface ---------------------------------------------------------

def test_spark_columns_match_numpy(spark):
    lat, lng = _rand(300, seed=5)
    df = spark.createDataFrame(
        [(i, float(lat[i]), float(lng[i])) for i in range(len(lat))],
        "id int, lat double, lng double",
    )
    out = (
        df.select(
            "id",
            s2f.s2_cell_id("lat", "lng", 12).alias("c"),
        )
        .select(
            "id", "c",
            s2f.s2_parent("c", 8).alias("p"),
            s2f.s2_level("c").alias("lev"),
            s2f.s2_range_min("c").alias("rmin"),
            s2f.s2_range_max("c").alias("rmax"),
            s2f.s2_token("c").alias("tok"),
        )
        .orderBy("id")
        .collect()
    )
    c_np = s2.cell_id_from_latlng(lat, lng, 12)
    p_np = s2.cell_parent(c_np, 8)
    t_np = s2.cell_token(c_np)
    for r in out:
        i = r["id"]
        assert r["c"] == int(c_np[i])
        assert r["p"] == int(p_np[i])
        assert r["lev"] == 12
        assert r["rmin"] == int(s2.range_min(c_np[i : i + 1])[0])
        assert r["rmax"] == int(s2.range_max(c_np[i : i + 1])[0])
        assert r["tok"] == t_np[i]


def test_spark_nulls_and_sql_registration(spark):
    s2f.register_s2(spark)
    df = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, None, 20.0), (3, 10.0, None)],
        "id int, lat double, lng double",
    )
    df.createOrReplaceTempView("s2pts")
    rows = spark.sql(
        "SELECT id, S2_CellID(lat, lng, 12) AS c FROM s2pts ORDER BY id"
    ).collect()
    assert rows[0]["c"] == int(s2.cell_id_from_latlng([10.0], [20.0], 12)[0])
    assert rows[1]["c"] is None and rows[2]["c"] is None


def test_spark_geom_variant(spark):
    from sedona_db_spark.geometry import wkb

    s2f.register_s2(spark)
    pts = [(1, wkb.encode(wkb.point(20.0, 10.0))), (2, None)]  # x=lon, y=lat
    df = spark.createDataFrame(pts, "id int, geom binary")
    df.createOrReplaceTempView("s2geom")
    rows = spark.sql(
        "SELECT id, ST_S2CellID(geom, 12) AS c FROM s2geom ORDER BY id"
    ).collect()
    assert rows[0]["c"] == int(s2.cell_id_from_latlng([10.0], [20.0], 12)[0])
    assert rows[1]["c"] is None


def test_cell_id_geom_nonpoint_raises(spark):
    from pyspark.sql import functions as F

    from sedona_db_spark.functions import s2 as s2f
    from sedona_db_spark.geometry import wkb as W

    df = spark.createDataFrame(
        [(1, W.encode(W.box(0.0, 0.0, 1.0, 1.0)))], "id int, geom binary")
    with pytest.raises(Exception, match="point"):
        df.select(s2f.s2_cell_id_geom(F.col("geom"), 12)).collect()


def test_register_all_includes_s2(spark):
    from sedona_db_spark.functions import st as _st

    _st.register_all(spark)
    row = spark.sql(
        "SELECT S2_CellID(37.7749, -122.4194, 12) AS c").collect()[0]
    expect = int(s2.cell_parent(
        s2.cell_id_from_latlng(np.array([37.7749]),
                               np.array([-122.4194])), 12)[0])
    assert row["c"] == expect
