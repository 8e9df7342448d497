"""Checkpoint-resumable stages with per-partition lineage manifests.

The north rule requires the 10^12-row pipeline to be resumable from
checkpoint with per-partition lineage + metrics. The reference's analogue
is its per-operator metrics (`rust/sedona-spatial-join/src/index.rs:69-92`)
and `GeoStatistics` (`rust/sedona-expr/src/statistics.rs`) — we persist the
same information per materialized stage:

* each **stage** writes its output as parquet at `<root>/<stage>/data`,
  then a `manifest.json` recording: row count, per-spark-partition rows,
  geometry bbox + cell range (when a geometry/cell column exists), input
  manifest fingerprints (lineage), wall time, and a content fingerprint;
* `run_stage` SKIPS recomputation when a manifest exists and its lineage
  fingerprint matches — a crashed 40-stage job re-runs only missing stages;
* `SpatialFilterStats.prune` answers "can this stage's output intersect
  this bbox?" from the manifest alone (the manifest-level analogue of
  `rust/sedona-expr/src/spatial_filter.rs:36-134`).

Spark-native resume (structured streaming checkpoints) is deliberately NOT
used: the reference is a batch engine and batch materialization points are
the idiomatic Spark equivalent (same pattern as Delta/Iceberg checkpoint
tables).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Callable, Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class StageManifest:
    stage: str
    rows: int
    partitions: int
    partition_rows: Dict[str, int]
    wall_sec: float
    inputs: Dict[str, str]           # upstream stage -> fingerprint
    fingerprint: str                 # content fingerprint of this stage
    bbox: Optional[List[float]] = None       # [xmin, ymin, xmax, ymax]
    cell_range: Optional[List[int]] = None   # [min_cell, max_cell]
    metrics: Dict[str, float] = field(default_factory=dict)


def _manifest_path(root: str, stage: str) -> str:
    return os.path.join(root, stage, "manifest.json")


def _data_path(root: str, stage: str) -> str:
    return os.path.join(root, stage, "data")


def load_manifest(root: str, stage: str) -> Optional[StageManifest]:
    p = _manifest_path(root, stage)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return StageManifest(**json.load(f))


def _lineage_fingerprint(root: str, inputs: List[str]) -> Dict[str, str]:
    out = {}
    for dep in inputs:
        m = load_manifest(root, dep)
        out[dep] = m.fingerprint if m else "MISSING"
    return out


def run_stage(
    spark: SparkSession,
    root: str,
    stage: str,
    build: Callable[[SparkSession], DataFrame],
    inputs: Optional[List[str]] = None,
    geom_bounds_cols: Optional[List[str]] = None,
    cell_col: Optional[str] = None,
    force: bool = False,
) -> DataFrame:
    """Run (or resume) one pipeline stage.

    If a manifest exists and every upstream fingerprint still matches, the
    stage is SKIPPED and its parquet output is returned — this is the
    checkpoint-resume path. `geom_bounds_cols` = [xmin,ymin,xmax,ymax]
    column names to track a bbox; `cell_col` tracks a cell-id range."""
    inputs = inputs or []
    lineage = _lineage_fingerprint(root, inputs)
    existing = load_manifest(root, stage)
    if existing and not force and existing.inputs == lineage:
        return spark.read.parquet(_data_path(root, stage))

    t0 = time.time()
    df = build(spark)
    data = _data_path(root, stage)
    df.write.mode("overwrite").parquet(data)
    out = spark.read.parquet(data)

    # per-partition lineage: spark partition id -> row count
    pr = (
        out.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    partition_rows = {str(r["_pid"]): int(r["count"]) for r in pr}
    rows = sum(partition_rows.values())

    bbox = None
    if geom_bounds_cols:
        x0, y0, x1, y1 = geom_bounds_cols
        r = out.agg(F.min(x0), F.min(y0), F.max(x1), F.max(y1)).collect()[0]
        if r[0] is not None:
            bbox = [float(v) for v in r]
    cell_range = None
    if cell_col and cell_col in out.columns:
        r = out.agg(F.min(cell_col), F.max(cell_col)).collect()[0]
        if r[0] is not None:
            cell_range = [int(r[0]), int(r[1])]

    # cheap content fingerprint: xor of per-row hashes (order-insensitive)
    fp_row = out.select(
        F.sum(F.crc32(F.to_json(F.struct(*out.columns)))).alias("fp")
    ).collect()[0]
    fingerprint = str(fp_row["fp"])

    manifest = StageManifest(
        stage=stage,
        rows=rows,
        partitions=len(partition_rows),
        partition_rows=partition_rows,
        wall_sec=round(time.time() - t0, 3),
        inputs=lineage,
        fingerprint=fingerprint,
        bbox=bbox,
        cell_range=cell_range,
    )
    os.makedirs(os.path.dirname(_manifest_path(root, stage)), exist_ok=True)
    with open(_manifest_path(root, stage), "w") as f:
        json.dump(asdict(manifest), f, indent=1)
    return out


class SpatialFilterStats:
    """Manifest-level spatial pruning (analogue of the reference's
    `SpatialFilter` over `GeoStatistics`): decide from the manifest alone
    whether a stage's output can intersect a query bbox."""

    def __init__(self, manifest: StageManifest):
        self.m = manifest

    def may_intersect(self, xmin: float, ymin: float, xmax: float, ymax: float) -> bool:
        if self.m.bbox is None:
            return True  # unknown -> cannot prune
        bx0, by0, bx1, by1 = self.m.bbox
        return not (bx1 < xmin or xmax < bx0 or by1 < ymin or ymax < by0)

    def may_contain_cell(self, cell_id: int) -> bool:
        if self.m.cell_range is None:
            return True
        lo, hi = self.m.cell_range
        return lo <= cell_id <= hi
