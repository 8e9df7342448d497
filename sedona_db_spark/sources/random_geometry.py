"""Random-geometry table generator — parity with the reference UDTF
`sd_random_geometry` (/root/reference:
`rust/sedona/src/random_geometry_provider.rs:49-196`, generator
`rust/sedona-testing/src/datagen.rs:92-360`).

Accepts exactly the reference's options keys; emits
`(id: long, geometry: WKB binary, dist: double)`. Partitioned + per-
partition seeded like the reference (`seed + partition_id`,
random_geometry_provider.rs:277), so any target_rows splits across
workers deterministically.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional, Union

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..geometry import wkb

SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("geometry", BinaryType(), True),
        StructField("dist", DoubleType(), False),
    ]
)

DEFAULTS = {
    "geom_type": "Point",
    "target_rows": 100,
    "seed": 42,
    "bounds": [0.0, 0.0, 100.0, 100.0],
    "size_range": [1.0, 10.0],
    "vertices_per_linestring_range": [2, 10],
    "num_parts_range": [1, 4],
    "polygon_hole_rate": 0.0,
    "null_rate": 0.0,
    "empty_rate": 0.0,
}


def _gen_one(rng: np.random.Generator, opts: dict) -> Optional[bytes]:
    if rng.uniform() < opts["null_rate"]:
        return None
    gt = opts["geom_type"].lower()
    if rng.uniform() < opts["empty_rate"]:
        empty = {
            "point": wkb.Geometry(wkb.POINT, np.empty((0, 2))),
            "linestring": wkb.Geometry(wkb.LINESTRING, np.empty((0, 2))),
            "polygon": wkb.Geometry(wkb.POLYGON, []),
            "geometrycollection": wkb.Geometry(wkb.GEOMETRYCOLLECTION, []),
        }[gt]
        return wkb.encode(empty)
    b = opts["bounds"]
    if gt == "point":
        return wkb.encode(
            wkb.point(float(rng.uniform(b[0], b[2])), float(rng.uniform(b[1], b[3])))
        )
    if gt == "linestring":
        return wkb.encode(_linestring(rng, opts))
    if gt == "polygon":
        return wkb.encode(_polygon(rng, opts))
    if gt == "geometrycollection":
        lo, hi = opts["num_parts_range"]
        n = int(rng.integers(lo, hi + 1))
        parts = []
        for _ in range(n):
            kind = rng.integers(0, 3)
            if kind == 0:
                parts.append(
                    wkb.point(float(rng.uniform(b[0], b[2])), float(rng.uniform(b[1], b[3])))
                )
            elif kind == 1:
                parts.append(_linestring(rng, opts))
            else:
                parts.append(_polygon(rng, opts))
        return wkb.encode(wkb.Geometry(wkb.GEOMETRYCOLLECTION, parts))
    raise ValueError(f"unsupported geom_type {opts['geom_type']!r}")


def _linestring(rng, opts):
    b = opts["bounds"]
    size = rng.uniform(*opts["size_range"])
    lo, hi = opts["vertices_per_linestring_range"]
    nv = int(rng.integers(lo, hi + 1))
    cx = rng.uniform(b[0], b[2])
    cy = rng.uniform(b[1], b[3])
    pts = np.column_stack(
        [cx + rng.uniform(-size / 2, size / 2, nv), cy + rng.uniform(-size / 2, size / 2, nv)]
    )
    return wkb.Geometry(wkb.LINESTRING, pts)


def _polygon(rng, opts):
    b = opts["bounds"]
    size = rng.uniform(*opts["size_range"])
    r = size / 2
    cx = rng.uniform(b[0], b[2])
    cy = rng.uniform(b[1], b[3])
    nv = int(rng.integers(4, 10))
    theta = np.sort(rng.uniform(0, 2 * np.pi, nv))
    ring = np.column_stack([cx + r * np.cos(theta), cy + r * np.sin(theta)])
    ring = np.vstack([ring, ring[:1]])
    rings = [ring]
    if rng.uniform() < opts["polygon_hole_rate"]:
        ht = np.linspace(0, 2 * np.pi, 6)
        hr = r * 0.3
        rings.append(np.column_stack([cx + hr * np.cos(ht), cy + hr * np.sin(ht)]))
    return wkb.Geometry(wkb.POLYGON, rings)


def random_geometry(spark: SparkSession, options: Union[str, dict],
                    partitions: int = 4) -> DataFrame:
    """`sd_random_geometry(options_json)` equivalent."""
    opts = dict(DEFAULTS)
    opts.update(json.loads(options) if isinstance(options, str) else options)
    total = int(opts["target_rows"])
    seed = int(opts["seed"])
    per = [total // partitions + (1 if p < total % partitions else 0) for p in range(partitions)]
    starts = np.cumsum([0] + per[:-1])
    plan = spark.createDataFrame(
        [(p, int(starts[p]), per[p]) for p in range(partitions)],
        "part INT, start LONG, n LONG",
    ).repartition(partitions, "part")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for bdf in batches:
            for _, row in bdf.iterrows():
                # per-partition seed = seed + partition_id (the reference's
                # random_geometry_provider.rs:277 convention)
                rng = np.random.default_rng(seed + int(row["part"]))
                ids, geoms, dists = [], [], []
                for i in range(int(row["n"])):
                    ids.append(int(row["start"]) + i)
                    geoms.append(_gen_one(rng, opts))
                    dists.append(float(rng.uniform(0, 100)))
                yield pd.DataFrame({"id": ids, "geometry": geoms, "dist": dists})

    return plan.mapInPandas(gen, SCHEMA)
