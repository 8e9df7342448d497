"""Distributed tile cutting: split geometries across grid tiles.

The export half of the north-rule tiling story: after geotagging and
joining, a web-scale pipeline materializes per-tile layers ("tile
assignments" — vector-tile builds, map-render pre-cuts, per-tile
training shards). `tile_cut` emits one row per (geometry, overlapping
tile) with the geometry CLIPPED to the tile box and its clipped area,
so downstream per-tile work partitions perfectly on (ix, iy).

Scale shape: the only explode is the envelope covering (pick `level` so
typical geometries span O(1..100) tiles; the adaptive covering operator
exists for pathological size skew), and the exact clip runs AFTER the
explode, so the clip work itself is parallel across tiles. No shuffle
at all until the caller groups by tile.

Clip kernel: axis-box geometries (detected per row) clip in pure
min/max arithmetic — every output coordinate is one of the input
doubles, so a plain-SQL oracle reproduces areas bit-for-bit. General
polygons clip through the snap-rounded overlay engine
(`geometry/overlay.py`), with the partition law (clip areas sum to the
polygon area) pinned by tests.

Reference scope: SedonaDB is single-node and has no tile-export
operator; this is north-rule surface (BASELINE.json: "matching ... its
reference tile-assignment outputs").
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from sedona_db_spark.geometry import algos, overlay, wkb
from sedona_db_spark.tiling import Grid

__all__ = ["tile_cut"]

_COVER_T = ArrayType(StructType([
    StructField("ix", IntegerType()),
    StructField("iy", IntegerType()),
]))

_CLIP_T = StructType([
    StructField("clip", BinaryType()),
    StructField("clip_area", DoubleType()),
])


def _as_box(g) -> Optional[tuple]:
    """(xmin, ymin, xmax, ymax) when `g` is a single axis-parallel
    rectangle ring, else None."""
    if g is None or g.type_id != wkb.POLYGON or len(g.coords) != 1:
        return None
    r = np.asarray(g.coords[0])
    if r.shape[0] != 5 or not np.array_equal(r[0], r[4]):
        return None
    xs, ys = r[:4, 0], r[:4, 1]
    if len(np.unique(xs)) != 2 or len(np.unique(ys)) != 2:
        return None
    # each edge must be axis-parallel (rules out 4-point diamonds)
    dx, dy = np.diff(r[:, 0]), np.diff(r[:, 1])
    if not np.all((dx == 0) | (dy == 0)):
        return None
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def tile_cut(
    df: DataFrame,
    geom_col: str,
    level: int,
    id_cols: Optional[Sequence[str]] = None,
    bounds: Optional[tuple] = None,
    keep_clip: bool = True,
) -> DataFrame:
    """One row per (input row, overlapping level-`level` tile).

    Output adds: ``ix``, ``iy`` (tile indices), ``clip`` (WKB of the
    geometry clipped to the tile box, when ``keep_clip``), ``clip_area``.
    Degenerate clips (zero area: the geometry only touches the tile
    boundary) are dropped. NULL geometries produce no rows.
    """
    grid = Grid(level, bounds) if bounds else Grid(level)
    id_cols = list(id_cols) if id_cols is not None else [
        c for c in df.columns if c != geom_col
    ]

    @F.pandas_udf(_COVER_T)
    def cover(geoms: pd.Series) -> pd.Series:
        out = []
        for buf in geoms:
            if buf is None:
                out.append(None)
                continue
            g = wkb.parse(bytes(buf))
            if g is None:
                out.append(None)
                continue
            xmin, ymin, xmax, ymax = algos.bounds(g)
            if np.isnan(xmin):
                out.append(None)
                continue
            ix0, iy0, ix1, iy1 = grid.cover_env_ranges(
                np.array([xmin]), np.array([ymin]),
                np.array([xmax]), np.array([ymax]))
            out.append([
                {"ix": int(i), "iy": int(j)}
                for i in range(int(ix0[0]), int(ix1[0]) + 1)
                for j in range(int(iy0[0]), int(iy1[0]) + 1)
            ])
        return pd.Series(out, dtype=object)

    x0w, y0w = grid.bounds[0], grid.bounds[1]
    cw, ch = grid.cw, grid.ch

    @F.pandas_udf(_CLIP_T)
    def clip(geoms: pd.Series, ixs: pd.Series, iys: pd.Series) -> pd.DataFrame:
        blobs, areas = [], []
        for buf, i, j in zip(geoms, ixs, iys):
            cxmin, cymin = x0w + int(i) * cw, y0w + int(j) * ch
            cxmax, cymax = cxmin + cw, cymin + ch
            g = wkb.parse(bytes(buf))
            if g is None or g.type_id not in (wkb.POLYGON, wkb.MULTIPOLYGON):
                # the overlay engine returns EMPTY for non-areal inputs,
                # which would silently drop every point/line row here —
                # fail loud instead (clip support for lineal geometries is
                # a documented non-goal of this operator)
                raise NotImplementedError(
                    "tile_cut clips areal geometries (Polygon/MultiPolygon)"
                    f" only; got type_id={'NULL' if g is None else g.type_id}")
            box = _as_box(g)
            if box is not None:
                # pure min/max clip: outputs reuse input doubles exactly
                bx0, by0, bx1, by1 = box
                ox0, oy0 = max(bx0, cxmin), max(by0, cymin)
                ox1, oy1 = min(bx1, cxmax), min(by1, cymax)
                if ox0 < ox1 and oy0 < oy1:
                    piece = wkb.box(ox0, oy0, ox1, oy1)
                    blobs.append(wkb.encode(piece))
                    areas.append((ox1 - ox0) * (oy1 - oy0))
                else:
                    blobs.append(None)
                    areas.append(0.0)
                continue
            piece = overlay.polygon_overlay(
                g, wkb.box(cxmin, cymin, cxmax, cymax), "intersection")
            a = algos.area(piece)
            if a > 0.0:
                blobs.append(wkb.encode(piece))
                areas.append(float(a))
            else:
                blobs.append(None)
                areas.append(0.0)
        return pd.DataFrame({"clip": pd.Series(blobs, dtype=object),
                             "clip_area": areas})

    exploded = (
        df.where(F.col(geom_col).isNotNull())
        .withColumn("_tile", F.explode(cover(F.col(geom_col))))
        .select(*id_cols, geom_col,
                F.col("_tile.ix").alias("ix"), F.col("_tile.iy").alias("iy"))
    )
    out = exploded.withColumn(
        "_c", clip(F.col(geom_col), F.col("ix"), F.col("iy"))
    ).where(F.col("_c.clip_area") > 0.0)
    cols = [*id_cols, "ix", "iy", F.col("_c.clip_area").alias("clip_area")]
    if keep_clip:
        cols.insert(len(cols) - 1, F.col("_c.clip").alias("clip"))
    return out.select(*cols)


def _parent_cell_expr(cell, d: int):
    """Column form of tiling.cell_parent: drop 2 morton bits per level
    (pure bit math — whole-stage codegen)."""
    lvl = F.shiftright(cell, 58)
    m = cell.bitwiseAND(F.lit((1 << 58) - 1))
    return F.shiftleft(lvl - F.lit(d), 58).bitwiseOR(
        F.shiftright(m, 2 * d))


def pyramid_rollup(
    df: DataFrame,
    cell_col: str = "cell_id",
    value_col: str = "value",
    to_level: int = 0,
) -> DataFrame:
    """Tile-pyramid rollup: per-cell additive metrics aggregated to EVERY
    ancestor level down to ``to_level`` (the hypertable / tile-server
    zoom-stack shape).

    Scale shape: each input row EXPLODES to its (L - to_level + 1)
    ancestors via bit math — one map-side fan, ONE shuffle on the
    ancestor cell — instead of L sequential groupBy stages.  At 10^12
    rows the fan factor is the zoom depth (constant, <= 29), and the
    per-level outputs shrink 4x per level so the shuffle is dominated by
    the finest level, same as the sequential plan but in one stage.

    Input cells must sit at ONE level (the geotag pipelines emit exactly
    that); mixed levels raise."""
    cells = df.select(F.col(cell_col).cast("long").alias("cell"),
                      F.col(value_col).cast("double").alias("v"))
    levels = [int(r[0]) for r in
              cells.select(F.shiftright("cell", 58)).distinct().collect()]
    if len(levels) != 1:
        raise ValueError(f"pyramid_rollup expects one cell level, got {levels}")
    base = levels[0]
    if to_level < 0 or to_level > base:
        raise ValueError(f"to_level {to_level} outside [0, {base}]")
    ancestors = F.array(*[
        _parent_cell_expr(F.col("cell"), d) for d in range(base - to_level + 1)
    ])
    fan = cells.select(F.explode(ancestors).alias("cell"), "v")
    return (
        fan.groupBy("cell")
        .agg(F.sum("v").alias(value_col), F.count("*").alias("n_children"))
        .withColumn("level", F.shiftright("cell", 58).cast("int"))
        .select(F.col("cell").alias(cell_col), "level", value_col,
                "n_children")
    )
