"""Multimodal (image/audio/video) column handling.

The model: payloads are opaque `binary` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-
batched `mapInPandas` transforms. The image/audio codec libraries are NOT
in this container, so the decode kernels are STUBS — `decode=strict`
raises NotImplementedError, `decode=fake` substitutes a deterministic
hash-derived decode so the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is fully real and tested.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),      # image | audio | video
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),   # opaque encoded bytes
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 64

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def synthesize_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = hash-derived bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        mimes = {"image": "image/jpeg", "audio": "audio/mpeg", "video": "video/mp4"}
        for b in batches:
            ids = b["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(seed * 1_000_003 + int(i))
                kind = kinds[int(i) % 3]
                payload = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "mime": mimes[kind],
                        "payload": payload,
                        "meta": {
                            "width": 640 if kind != "audio" else None,
                            "height": 480 if kind != "audio" else None,
                            "duration_ms": 5000 if kind != "image" else None,
                            "sample_rate": 16000 if kind == "audio" else None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, max(1, n // 1000 + 1)).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_real(kind: str, payload: bytes, meta) -> np.ndarray:
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg/librosa, not present in this "
        "container — run with decode='fake' or install codecs at deploy time"
    )


def _decode_fake(kind: str, payload: bytes, meta) -> np.ndarray:
    """Deterministic stand-in decode: payload bytes -> pseudo-signal."""
    raw = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    return (raw - 127.5) / 127.5


def extract_features(media: DataFrame, decode: str = "fake",
                     batch_note: str = "arrow") -> DataFrame:
    """media table -> (media_id, kind, feature[FEATURE_DIM]).

    The plumbing (mapInPandas over Arrow batches, fixed-dim float features,
    per-kind branches) is exactly what a real CLIP/wav2vec extractor uses;
    only the decode kernel is stubbed."""
    decode_fn = _decode_fake if decode == "fake" else _decode_real

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            for _, row in b.iterrows():
                sig = decode_fn(row["kind"], bytes(row["payload"]), row["meta"])
                # fold the signal into FEATURE_DIM bins (mean pooling)
                pad = (-len(sig)) % FEATURE_DIM
                if pad:
                    sig = np.pad(sig, (0, pad))
                feat = sig.reshape(FEATURE_DIM, -1).mean(axis=1)
                feats.append(feat.astype(np.float32).tolist())
            yield pd.DataFrame(
                {"media_id": b["media_id"], "kind": b["kind"], "feature": feats}
            )

    return media.mapInPandas(extract, FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000,
                        decode: str = "fake") -> DataFrame:
    """video rows -> one row per sampled frame (frame_idx, frame binary).

    Real frame decode is stubbed like extract_features; the explode shape
    (one input row -> duration/every_ms output rows) is real."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), False),
        ]
    )
    if decode != "fake":
        raise NotImplementedError("real video decode unavailable in this container")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, row in b.iterrows():
                dur = row["meta"]["duration_ms"] or 0
                n = max(1, int(dur) // every_ms)
                payload = bytes(row["payload"])
                for f in range(n):
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": f,
                            # deterministic fake frame: offset slice of payload
                            "frame": payload[f % 16 :] + struct.pack("<I", f),
                        }
                    )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {"media_id": [], "frame_idx": [], "frame": []}
            )

    return media.where(F.col("kind") == "video").mapInPandas(frames, out_schema)
