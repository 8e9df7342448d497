"""Checkpoint-resume manifests + multimodal plumbing tests."""

import json
import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from sedona_db_spark.plans import manifests as M
from sedona_db_spark.sources import multimodal as MM


def test_run_stage_writes_manifest_and_resumes(spark, tmp_path):
    root = str(tmp_path / "pipe")
    calls = {"n": 0}

    def build(s):
        calls["n"] += 1
        return s.range(100).select(
            F.col("id"),
            (F.col("id") % 10).cast("double").alias("xmin"),
            (F.col("id") % 5).cast("double").alias("ymin"),
            (F.col("id") % 10 + 1).cast("double").alias("xmax"),
            (F.col("id") % 5 + 1).cast("double").alias("ymax"),
            (F.col("id") % 50).alias("cell_id"),
        )

    out = M.run_stage(spark, root, "stage1", build,
                      geom_bounds_cols=["xmin", "ymin", "xmax", "ymax"],
                      cell_col="cell_id")
    assert out.count() == 100
    assert calls["n"] == 1

    m = M.load_manifest(root, "stage1")
    assert m.rows == 100
    assert sum(m.partition_rows.values()) == 100
    assert m.bbox == [0.0, 0.0, 10.0, 5.0]
    assert m.cell_range == [0, 49]
    assert m.wall_sec > 0

    # resume: build NOT called again
    out2 = M.run_stage(spark, root, "stage1", build,
                       geom_bounds_cols=["xmin", "ymin", "xmax", "ymax"],
                       cell_col="cell_id")
    assert out2.count() == 100
    assert calls["n"] == 1


def test_run_stage_recomputes_on_lineage_change(spark, tmp_path):
    root = str(tmp_path / "pipe2")

    def build_a1(s):
        return s.range(10).select(F.col("id"))

    def build_a2(s):
        return s.range(20).select(F.col("id"))

    def build_b(s):
        return spark.read.parquet(os.path.join(root, "a", "data")).where(F.col("id") < 5)

    M.run_stage(spark, root, "a", build_a1)
    M.run_stage(spark, root, "b", build_b, inputs=["a"])
    fp_b1 = M.load_manifest(root, "b").fingerprint

    # upstream changes -> b's lineage fingerprint mismatches -> recompute
    M.run_stage(spark, root, "a", build_a2, force=True)
    out = M.run_stage(spark, root, "b", build_b, inputs=["a"])
    assert out.count() == 5
    m_b = M.load_manifest(root, "b")
    assert m_b.inputs["a"] == M.load_manifest(root, "a").fingerprint


def test_spatial_filter_stats_prunes(spark, tmp_path):
    root = str(tmp_path / "pipe3")

    def build(s):
        return s.range(10).select(
            F.lit(10.0).alias("xmin"), F.lit(10.0).alias("ymin"),
            F.lit(20.0).alias("xmax"), F.lit(20.0).alias("ymax"),
        )

    M.run_stage(spark, root, "s", build, geom_bounds_cols=["xmin", "ymin", "xmax", "ymax"])
    st = M.SpatialFilterStats(M.load_manifest(root, "s"))
    assert st.may_intersect(15, 15, 25, 25)
    assert not st.may_intersect(30, 30, 40, 40)  # pruned from manifest alone


def test_multimodal_features(spark):
    media = MM.synthesize_media(spark, 30)
    assert media.count() == 30
    feats = MM.extract_features(media, decode="fake")
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == MM.FEATURE_DIM for r in rows)
    # deterministic: same id -> same feature across runs
    again = {r["media_id"]: r["feature"] for r in MM.extract_features(
        MM.synthesize_media(spark, 30), decode="fake").collect()}
    for r in rows:
        assert again[r["media_id"]] == r["feature"]


def test_multimodal_strict_decode_raises(spark):
    media = MM.synthesize_media(spark, 3)
    with pytest.raises(Exception):
        MM.extract_features(media, decode="strict").collect()


def test_video_frame_sampling(spark):
    media = MM.synthesize_media(spark, 30)
    frames = MM.sample_video_frames(media, every_ms=1000)
    rows = frames.collect()
    n_video = media.where(F.col("kind") == "video").count()
    assert len(rows) == n_video * 5  # 5000 ms / 1000 ms
    assert all(r["frame"] is not None for r in rows)


def test_real_pnm_wav_decode_pipeline(spark):
    """The codec-free REAL decode path: P6 PPM images decode->resize->
    re-encode, PCM16 WAV audio decodes to float PCM — no fake mode."""
    import numpy as np

    from sedona_db_spark.sources import multimodal as M

    media = M.synthesize_media(spark, 30, payload_format="pnm_wav")
    # real image pipeline
    thumbs = M.decode_resize_images(media, out_w=8, out_h=6).collect()
    assert len(thumbs) == 10  # every 3rd row is an image
    for t in thumbs:
        arr, w, h, ch = M.decode_pnm(bytes(t["thumb"]))
        assert (w, h, ch) == (8, 6, 3)
        assert t["width"] == 16 and t["height"] == 12
    # strict (real) feature extraction works for PPM + WAV rows
    feats = M.extract_features(
        media.where(media.kind != "video"), decode="strict"
    ).collect()
    assert len(feats) == 20
    for f in feats:
        v = np.array(f["feature"])
        assert len(v) == M.FEATURE_DIM and np.isfinite(v).all()
    # round-trip exactness of the PNM codec itself
    img = np.arange(12 * 16 * 3, dtype=np.uint8).reshape(12, 16, 3)
    arr, w, h, ch = M.decode_pnm(M.encode_ppm(img))
    assert (arr == img).all()


def test_y4m_roundtrip_unit():
    rng = np.random.default_rng(3)
    vid = rng.integers(0, 256, (4, 6, 8, 3), dtype=np.uint8)
    payload = MM.encode_y4m(vid, fps_num=10, fps_den=1)
    back, w, h, fn, fd = MM.decode_y4m(payload)
    assert (w, h, fn, fd) == (8, 6, 10, 1)
    np.testing.assert_array_equal(back, vid)


def test_ycbcr_to_rgb_known_values():
    # Y=128, Cb=Cr=128 (neutral) -> mid gray; Y=255 neutral -> white
    g = MM.ycbcr_to_rgb(np.array([[[128, 128, 128]]], dtype=np.uint8))
    np.testing.assert_array_equal(g[0, 0], [128, 128, 128])
    w = MM.ycbcr_to_rgb(np.array([[[255, 128, 128]]], dtype=np.uint8))
    np.testing.assert_array_equal(w[0, 0], [255, 255, 255])


def test_real_video_frame_sampling(spark):
    """y4m payloads decode natively: 5 frames at 10 fps = 500 ms, sampled
    every 100 ms -> 5 PPM frames per video, pixel-exact vs the container."""
    media = MM.synthesize_media(spark, 9, payload_format="pnm_wav")
    out = MM.sample_video_frames(media, every_ms=100, decode="real")
    rows = out.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(len(v) for v in by_id.values()) == {5}
    # pixel-exact check against an independent re-synthesis of one video
    mid = sorted(by_id)[0]
    rng = np.random.default_rng(42 * 1_000_003 + int(mid))
    vid = rng.integers(0, 256, (5, 12, 16, 3), dtype=np.uint8)
    first = sorted(by_id[mid], key=lambda r: r["frame_idx"])[0]
    arr, w, h, ch = MM.decode_pnm(bytes(first["frame"]))
    assert (w, h, ch) == (16, 12, 3)
    np.testing.assert_array_equal(arr, MM.ycbcr_to_rgb(vid[0]))


def test_real_video_requires_y4m(spark):
    media = MM.synthesize_media(spark, 9, payload_format="hash")
    import pytest as _pt
    with _pt.raises(Exception, match="YUV4MPEG2|PythonException"):
        MM.sample_video_frames(media, every_ms=100, decode="real").collect()
