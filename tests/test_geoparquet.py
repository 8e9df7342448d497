"""GeoParquet round-trip + bbox pruning tests."""

import numpy as np

from pyspark.sql import functions as F

from sedona_db_spark.geometry import wkb
from sedona_db_spark.sources import geoparquet as GP
from sedona_db_spark.types import get_geom_meta


def _pts_df(spark, n=200, seed=0):
    rng = np.random.default_rng(seed)
    x, y = rng.uniform(-170, 170, n), rng.uniform(-80, 80, n)
    rows = [(int(i), bytes(b)) for i, b in enumerate(wkb.encode_points_xy(x, y))]
    return spark.createDataFrame(rows, "id LONG, geometry BINARY"), x, y


def test_write_read_roundtrip(spark, tmp_path):
    df, x, y = _pts_df(spark, 100)
    path = str(tmp_path / "gp")
    meta = GP.write_geoparquet(df, path, ["geometry"])
    assert meta["version"].startswith("1.1")
    assert meta["primary_column"] == "geometry"
    col = meta["columns"]["geometry"]
    assert col["encoding"] == "WKB"
    bb = col["bbox"]
    assert bb[0] == float(x.min()) and bb[3] == float(y.max())

    back = GP.read_geoparquet(spark, path)
    assert back.count() == 100
    # geometry metadata re-attached
    gm = get_geom_meta(back, "geometry")
    assert gm and gm["crs"] == "OGC:CRS84"
    # footer key readable
    assert GP.read_geo_metadata(path)["columns"]["geometry"]["covering"]["bbox"]["xmin"] == [
        "geometry_bbox", "xmin"
    ]


def test_bbox_filter_prunes_rowgroups(spark, tmp_path):
    df, x, y = _pts_df(spark, 2000, seed=1)
    path = str(tmp_path / "gp2")
    # sort by x so row groups have tight disjoint bbox stats
    from sedona_db_spark.functions import st

    df = df.withColumn("px", st.ST_X(F.col("geometry"))).orderBy("px").drop("px")
    GP.write_geoparquet(df.repartitionByRange(8, F.lit(1)), path, ["geometry"])
    back = GP.read_geoparquet(spark, path)
    got = GP.filter_bbox(back, "geometry", -10, -90, 10, 90)
    want = int(((x >= -10) & (x <= 10)).sum())
    assert got.count() == want
    # the filter is on plain struct fields -> shows up as pushed filters
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan or "bbox" in plan


def test_write_refuses_null_crs(spark, tmp_path):
    df, _, _ = _pts_df(spark, 5)
    import pytest

    with pytest.raises(ValueError):
        GP.write_geoparquet(df, str(tmp_path / "x"), ["geometry"], crs=None)


def test_every_part_has_geo_footer_and_projjson(spark, tmp_path):
    """The writer emits the `geo` key in the SAME pass that writes the data
    (no post-write stamp/rewrite), with PROJJSON crs per GeoParquet 1.1."""
    import glob
    import json

    import pyarrow.parquet as pq

    df, _, _ = _pts_df(spark, 64)
    path = str(tmp_path / "gp3")
    meta = GP.write_geoparquet(df.repartition(4), path, ["geometry"])
    parts = glob.glob(path + "/*.parquet")
    assert len(parts) >= 1
    for part in parts:
        md = pq.ParquetFile(part).schema_arrow.metadata or {}
        assert GP.GEO_KEY in md
        entry = json.loads(md[GP.GEO_KEY])["columns"]["geometry"]
        crs = entry["crs"]
        assert isinstance(crs, dict)  # PROJJSON object, not a bare string
        assert crs["id"] == {"authority": "OGC", "code": "CRS84"}
        # per-file bbox present and self-consistent
        bb = entry["bbox"]
        assert bb[0] <= bb[2] and bb[1] <= bb[3]
    # dataset-level bbox is the envelope of the per-file bboxes
    assert meta["columns"]["geometry"]["bbox"][0] == min(
        json.loads((pq.ParquetFile(p).schema_arrow.metadata or {})[GP.GEO_KEY])[
            "columns"]["geometry"]["bbox"][0]
        for p in parts
    )


def test_native_point_encoding_read(spark, tmp_path):
    """GeoParquet 1.1 native point encoding (GeoArrow separated struct) is
    decoded to the engine's WKB convention on read — mirrors the
    reference's GeoParquetColumnEncoding handling (metadata.rs:44-63)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = tmp_path / "native"
    path.mkdir()
    xs = [1.5, 2.5, -3.0]
    ys = [10.0, -20.0, 30.5]
    tbl = pa.table({
        "id": pa.array([0, 1, 2], pa.int64()),
        "geometry": pa.StructArray.from_arrays(
            [pa.array(xs, pa.float64()), pa.array(ys, pa.float64())], ["x", "y"]
        ),
    })
    geo = {
        "version": "1.1.0",
        "primary_column": "geometry",
        "columns": {"geometry": {"encoding": "point", "geometry_types": ["Point"]}},
    }
    tbl = tbl.replace_schema_metadata({b"geo": json.dumps(geo).encode()})
    pq.write_table(tbl, str(path / "part-0.parquet"))

    back = GP.read_geoparquet(spark, str(path))
    from pyspark.sql import functions as F

    from sedona_db_spark.functions import st

    rows = {r["id"]: (r["px"], r["py"]) for r in back.select(
        "id", st.ST_X(F.col("geometry")).alias("px"), st.ST_Y(F.col("geometry")).alias("py")
    ).collect()}
    for i in range(3):
        assert rows[i] == (xs[i], ys[i])


def test_write_refuses_bbox_overwrite_and_bad_version(spark, tmp_path):
    """Reference parity (io/test_parquet.py): rewriting a frame that
    already carries the v1.1 bbox covering column fails unless opted in;
    unknown version strings are rejected."""
    import pytest

    df, _, _ = _pts_df(spark, 20)
    p1 = str(tmp_path / "a")
    GP.write_geoparquet(df, p1, ["geometry"])
    back = GP.read_geoparquet(spark, p1)  # carries geometry_bbox
    assert "geometry_bbox" in back.columns
    with pytest.raises(ValueError, match="Can't overwrite GeoParquet 1.1 bbox"):
        GP.write_geoparquet(back, str(tmp_path / "b"), ["geometry"])
    # opt-in succeeds and round-trips
    GP.write_geoparquet(back, str(tmp_path / "b"), ["geometry"], overwrite_bbox_columns=True)
    assert GP.read_geoparquet(spark, str(tmp_path / "b")).count() == 20
    with pytest.raises(ValueError, match="Unexpected GeoParquet version"):
        GP.write_geoparquet(df, str(tmp_path / "c"), ["geometry"], version="not supported")


def test_geography_edges_roundtrip(spark, tmp_path):
    """Geography (spherical edges) round-trips through the GeoParquet
    footer like the reference (io/test_parquet.py::test_write_geoparquet_
    geography): writer propagates the column's edges metadata into the
    `geo` key, reader re-tags, and fn_for_edges dispatches the spherical
    kernel after the round trip."""
    from sedona_db_spark.functions.geography import fn_for_edges
    from sedona_db_spark.types import with_geom_meta

    path = str(tmp_path / "geog")
    df, _x, _y = _pts_df(spark, 40)
    geog = with_geom_meta(df, "geometry", crs="EPSG:4326", edges="spherical")
    meta = GP.write_geoparquet(geog, path, ["geometry"])
    assert meta["columns"]["geometry"]["edges"] == "spherical"

    back = GP.read_geoparquet(spark, path)
    md = get_geom_meta(back, "geometry")
    assert md["edges"] == "spherical"
    fn = fn_for_edges(back, "geometry", "st_area")
    from sedona_db_spark.functions.geography import ST_Area_Spherical

    assert fn is ST_Area_Spherical

    # planar write stays implicit (spec default: no edges key)
    p2 = str(tmp_path / "planar")
    meta2 = GP.write_geoparquet(df, p2, ["geometry"])
    assert "edges" not in meta2["columns"]["geometry"]
    back2 = GP.read_geoparquet(spark, p2)
    assert get_geom_meta(back2, "geometry")["edges"] == "planar"
