"""END-TO-END north-rule pipeline: Common-Crawl-style pages → byte-exact
text extraction → geotag → cell-range partition → point-in-polygon join
vs an admin layer → per-zone rollup — every stage materialized through
`plans.manifests.run_stage` with per-partition lineage, and RESUMED from
checkpoint after a simulated crash (only downstream stages recompute).

This is the pipeline BASELINE.json's north_rule describes, demonstrated
end-to-end at test scale."""

import json
import os

import pytest

from pyspark.sql import functions as F

from sedona_db_spark.geometry import wkb
from sedona_db_spark.operators.spatial_join import spatial_join
from sedona_db_spark.plans import manifests as M
from sedona_db_spark.sources import pages as P


def _zones(spark):
    rows = [
        (i, wkb.encode(wkb.box(-180 + (i % 6) * 60.0, -90 + (i // 6) * 60.0,
                               -180 + (i % 6 + 1) * 60.0, -90 + (i // 6 + 1) * 60.0)))
        for i in range(18)
    ]
    return spark.createDataFrame(rows, "zone_id LONG, geometry BINARY")


def _build_pipeline(spark, root, src, zones):
    """Define the 3 materialized stages; returns the final rollup frame."""

    def s_extract(s):
        return P.geotag_pages(s.read.parquet(src), grid_level=4)

    tagged = M.run_stage(
        spark, root, "extract", s_extract,
        geom_bounds_cols=None, cell_col="cell_id",
    )

    def s_partition(s):
        return P.partition_by_cell(
            s.read.parquet(os.path.join(root, "extract", "data")), 8
        )

    part = M.run_stage(
        spark, root, "partition", s_partition, inputs=["extract"], cell_col="cell_id",
    )

    def s_join(s):
        pts = s.read.parquet(os.path.join(root, "partition", "data")).where(
            F.col("lat").isNotNull()
        )
        j = spatial_join(
            pts, zones, predicate="within", left_geom="__unused__",
            right_geom="geometry", left_xy=("lon", "lat"),
            broadcast_right=True, grid_level=4,
        )
        return j.groupBy("zone_id").agg(F.count("*").alias("n_pages"))

    return M.run_stage(spark, root, "pip_rollup", s_join, inputs=["partition"])


def test_pipeline_end_to_end_with_resume(spark, tmp_path):
    src = str(tmp_path / "pages")
    P.synthesize_pages(spark, 1000, partitions=4).write.mode("overwrite").parquet(src)
    zones = _zones(spark)
    root = str(tmp_path / "stages")

    out = _build_pipeline(spark, root, src, zones)
    got = {r["zone_id"]: r["n_pages"] for r in out.collect()}

    # ground truth computed directly (no staging)
    tagged = P.geotag_pages(spark.read.parquet(src), grid_level=4).where(
        F.col("lat").isNotNull()
    )
    want_df = spatial_join(
        tagged, zones, predicate="within", left_geom="__unused__",
        right_geom="geometry", left_xy=("lon", "lat"),
        broadcast_right=True, grid_level=4,
    ).groupBy("zone_id").agg(F.count("*").alias("n_pages"))
    want = {r["zone_id"]: r["n_pages"] for r in want_df.collect()}
    assert got == want and sum(got.values()) > 0

    # manifests carry lineage + per-partition rows + cell range
    m_extract = M.load_manifest(root, "extract")
    m_part = M.load_manifest(root, "partition")
    m_join = M.load_manifest(root, "pip_rollup")
    assert m_extract.rows == 1000
    assert sum(m_extract.partition_rows.values()) == 1000
    assert m_part.inputs == {"extract": m_extract.fingerprint}
    assert m_join.inputs == {"partition": m_part.fingerprint}
    assert m_part.cell_range is not None and m_part.cell_range[0] <= m_part.cell_range[1]

    # byte-identity invariant of the extraction (north-rule input_hint)
    sample = spark.read.parquet(src).limit(20).collect()
    ext = {r["url"]: r for r in
           spark.read.parquet(os.path.join(root, "extract", "data")).collect()}
    for r in sample:
        assert bytes(ext[r["url"]]["text"].encode()) == P.extract_text_bytes(bytes(r["html"]))

    # RESUME: re-running recomputes nothing (fingerprints unchanged)
    fp_before = (m_extract.fingerprint, m_part.fingerprint, m_join.fingerprint)
    out2 = _build_pipeline(spark, root, src, zones)
    got2 = {r["zone_id"]: r["n_pages"] for r in out2.collect()}
    assert got2 == got
    fp_after = (
        M.load_manifest(root, "extract").fingerprint,
        M.load_manifest(root, "partition").fingerprint,
        M.load_manifest(root, "pip_rollup").fingerprint,
    )
    assert fp_after == fp_before

    # CRASH SIMULATION: wipe the final stage only; upstream stages are
    # reused (their manifests untouched), the final stage recomputes
    import shutil

    shutil.rmtree(os.path.join(root, "pip_rollup"))
    extract_mtime = os.path.getmtime(M._manifest_path(root, "extract"))
    out3 = _build_pipeline(spark, root, src, zones)
    got3 = {r["zone_id"]: r["n_pages"] for r in out3.collect()}
    assert got3 == got
    assert os.path.getmtime(M._manifest_path(root, "extract")) == extract_mtime
    assert M.load_manifest(root, "pip_rollup").inputs == {"partition": m_part.fingerprint}
