"""Getis-Ord Gi* hotspot statistic over a cell lattice — the classic
"where are the significant hot/cold spots" analysis, Spark-first.

Getis & Ord 1992/1995 (the star variant includes the focal cell).  The
engine's geotag pipeline already aggregates events/pages into quadkey or
integer lattice cells (tiling.py, operators/tiles.py); this operator
takes that per-cell table and scores every cell's 3x3 neighborhood
(queen contiguity) against the global distribution:

    Gi* = (S_i - x_bar * n_i) / (s * sqrt((N*n_i - n_i^2) / (N - 1)))

with S_i = neighborhood sum, n_i = OBSERVED neighbors (cells absent from
the table are no-data, not zero — the standard lattice convention),
x_bar/s = global mean/std over the N observed cells.

Scale shape (no new machinery):
1. global moments — one map-side-combinable agg, joined back as a
   broadcast literal row (never a driver round trip inside the plan).
2. neighborhood sums — each cell EXPLODES to its 9 neighbor keys (a 9x
   map-side fan, no pairwise join), one groupBy(cell) shuffle, then one
   equi-join back to the observed cells.  Two narrow shuffles total,
   both on the same (cx, cy) key.
3. the z-score is pure column algebra (whole-stage codegen).

No reference analogue (SedonaDB has no spatial statistics); PostGIS
users reach for pysal/esda — this is that operator at corpus scale.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def getis_ord_gstar(
    df: DataFrame,
    cell_x: str = "cx",
    cell_y: str = "cy",
    value_col: str = "value",
) -> DataFrame:
    """Per-cell Gi* z-scores.  ``df`` must carry ONE row per (cell_x,
    cell_y) integer cell (pre-aggregate first — the contract every
    lattice statistic assumes).  Duplicate cells are NOT detected here
    (detection would cost an extra aggregation); they inflate n_total
    and duplicate output rows, so groupBy before calling."""
    cells = df.select(
        F.col(cell_x).cast("long").alias("cx"),
        F.col(cell_y).cast("long").alias("cy"),
        F.col(value_col).cast("double").alias("v"),
    )

    stats = cells.agg(
        F.count("*").alias("n_total"),
        F.avg("v").alias("xbar"),
        # population std (the Gi* definition), guarded against the
        # negative-epsilon of catastrophic cancellation
        F.sqrt(F.greatest(
            F.avg(F.col("v") * F.col("v")) - F.avg("v") * F.avg("v"),
            F.lit(0.0))).alias("s"),
    )

    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    # each cell fans out onto its 9 neighbor keys (map-side, no join)
    fan = cells.select("cx", "cy", "v", F.explode(offsets).alias("o")).select(
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
        "v",
    )
    neigh = fan.groupBy("cx", "cy").agg(
        F.sum("v").alias("s_i"),
        F.count("*").alias("n_i"),
    )

    out = (
        cells.join(neigh, ["cx", "cy"])      # keeps observed cells only
        .join(F.broadcast(stats))
        .withColumn(
            "gi_star",
            (F.col("s_i") - F.col("xbar") * F.col("n_i"))
            / (F.col("s") * F.sqrt(
                (F.col("n_total") * F.col("n_i") - F.col("n_i") * F.col("n_i"))
                / (F.col("n_total") - F.lit(1)))),
        )
    )
    return out.select("cx", "cy", F.col("v").alias(value_col),
                      "n_i", "gi_star")


def morans_i(
    df: DataFrame,
    cell_x: str = "cx",
    cell_y: str = "cy",
    value_col: str = "value",
) -> DataFrame:
    """Global Moran's I spatial autocorrelation over the queen-contiguity
    lattice (Moran 1950; weights binary, self excluded):

        I = (N / W) * sum_ij w_ij z_i z_j / sum_i z_i^2

    Returns ONE row: (i, e_i, n_cells, w_sum) with E[I] = -1/(N-1).
    Same two-shuffle shape as Gi*: moments agg + 8-key neighbor fan."""
    cells = df.select(
        F.col(cell_x).cast("long").alias("cx"),
        F.col(cell_y).cast("long").alias("cy"),
        F.col(value_col).cast("double").alias("v"),
    )
    stats = cells.agg(F.count("*").alias("n"), F.avg("v").alias("xbar"))
    z = cells.join(F.broadcast(stats)).withColumn("z", F.col("v") - F.col("xbar"))

    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    ])
    fan = z.select("cx", "cy", "z", F.explode(offsets).alias("o")).select(
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
        F.col("z").alias("z_nb"),
    )
    lag = fan.groupBy("cx", "cy").agg(
        F.sum("z_nb").alias("z_lag"),
        F.count("*").alias("w_i"),
    )
    joined = z.join(lag, ["cx", "cy"])  # observed cells only
    return (
        joined.agg(
            F.sum(F.col("z") * F.col("z_lag")).alias("cross"),
            F.sum(F.col("z") * F.col("z")).alias("ss"),
            F.sum("w_i").alias("w_sum"),
            F.count("*").alias("n_cells"),
        )
        .withColumn("i", (F.col("n_cells") / F.col("w_sum"))
                    * F.col("cross") / F.col("ss"))
        .withColumn("e_i", F.lit(-1.0) / (F.col("n_cells") - 1))
        .select("i", "e_i", "n_cells", "w_sum")
    )


def local_morans_i(
    df: DataFrame,
    cell_x: str = "cx",
    cell_y: str = "cy",
    value_col: str = "value",
) -> DataFrame:
    """Local Moran's I (Anselin 1995 LISA): I_i = (z_i / m2) * sum_j w_ij
    z_j with m2 = sum z^2 / N, plus the HH/LL/HL/LH quadrant label used
    for cluster maps.  Cells with no observed neighbor are dropped (their
    lag is undefined)."""
    cells = df.select(
        F.col(cell_x).cast("long").alias("cx"),
        F.col(cell_y).cast("long").alias("cy"),
        F.col(value_col).cast("double").alias("v"),
    )
    stats = cells.agg(
        F.count("*").alias("n"),
        F.avg("v").alias("xbar"),
        F.avg(F.col("v") * F.col("v")).alias("x2bar"),
    )
    z = cells.join(F.broadcast(stats)).withColumn("z", F.col("v") - F.col("xbar")) \
        .withColumn("m2", F.col("x2bar") - F.col("xbar") * F.col("xbar"))

    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        if not (dx == 0 and dy == 0)
    ])
    fan = z.select("cx", "cy", "z", F.explode(offsets).alias("o")).select(
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
        F.col("z").alias("z_nb"),
    )
    lag = fan.groupBy("cx", "cy").agg(
        F.avg("z_nb").alias("z_lag"),      # row-standardized weights
        F.count("*").alias("w_i"),
    )
    out = z.join(lag, ["cx", "cy"]).withColumn(
        "i_i", F.col("z") / F.col("m2") * F.col("z_lag")
    ).withColumn(
        "quadrant",
        F.when((F.col("z") >= 0) & (F.col("z_lag") >= 0), F.lit("HH"))
        .when((F.col("z") < 0) & (F.col("z_lag") < 0), F.lit("LL"))
        .when((F.col("z") >= 0) & (F.col("z_lag") < 0), F.lit("HL"))
        .otherwise(F.lit("LH")),
    )
    return out.select("cx", "cy", F.col("v").alias(value_col),
                      "w_i", "i_i", "quadrant")


def ripleys_k(
    df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    radii=(1.0, 2.0, 4.0),
    area: float = None,
    grid_level: int = None,
) -> DataFrame:
    """Ripley's K function (Ripley 1976) — multi-scale clustering test
    for a point pattern: K(r) = (A / n^2) * #{ordered pairs within r}
    (no edge correction — the plain estimator; document/compare against
    CSR's pi*r^2).

    Scale shape: ONE banded dwithin self-join at max(radii) generates
    candidate pairs (operators/spatial_join.py grid prefilter — never the
    n^2 product), each pair's distance bins into every radius it fits
    via one map-side explode, and one groupBy sums the counts.  ``area``
    defaults to the bounding-box area of the pattern (one agg).

    Self-pair exclusion is CONTENT-DERIVED (no monotonically_increasing_id,
    which is recomputation-dependent — a task retry or AQE re-plan over a
    non-deterministic upstream could silently corrupt pair exclusion; see
    knn_join.py for the same rule): the pattern collapses to distinct
    (x, y) locations with a multiplicity count, a cross-location pair
    contributes mult_u * mult_v ordered pairs, and the coincident pair of
    a location with itself contributes mult * (mult - 1) — exactly the
    ordered-pairs-of-distinct-rows estimator, deterministic under any
    recomputation, and the self-join shrinks on duplicate-heavy patterns."""
    from ..geometry import wkb as _wkb
    from .spatial_join import spatial_join

    r_max = float(max(radii))
    pts = df.select(F.col(x_col).cast("double").alias("x"),
                    F.col(y_col).cast("double").alias("y"))
    n_area = pts.agg(
        F.count("*").alias("n"),
        ((F.max("x") - F.min("x")) * (F.max("y") - F.min("y"))).alias("bbox_a"),
    ).collect()[0]
    n = int(n_area["n"])
    a = float(area) if area is not None else float(n_area["bbox_a"])

    @F.pandas_udf("binary")
    def mkpt(xs: pd.Series, ys: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(list(_wkb.encode_points_xy(
            np.asarray(xs, dtype=np.float64),
            np.asarray(ys, dtype=np.float64))), dtype=object)

    locs = pts.groupBy("x", "y").agg(F.count(F.lit(1)).alias("_mult"))
    L = locs.withColumn("geom", mkpt("x", "y"))
    R = L.select(F.col("x").alias("x2"), F.col("y").alias("y2"),
                 F.col("_mult").alias("_mult2"), F.col("geom").alias("geom2"))
    pairs = spatial_join(
        L, R, "dwithin", left_geom="geom", right_geom="geom2",
        distance=r_max, grid_level=grid_level,
    )
    same = (F.col("x") == F.col("x2")) & (F.col("y") == F.col("y2"))
    w = F.when(same, F.col("_mult") * (F.col("_mult") - 1)).otherwise(
        F.col("_mult") * F.col("_mult2"))
    d = F.sqrt((F.col("x") - F.col("x2")) ** 2 + (F.col("y") - F.col("y2")) ** 2)
    rs = F.array(*[F.lit(float(r)) for r in sorted(radii)])
    binned = pairs.select(
        w.alias("_w"), F.explode(F.filter(rs, lambda r: d <= r)).alias("r"))
    out = binned.groupBy("r").agg(F.sum("_w").alias("n_pairs"))
    return out.select(
        "r",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        (F.col("n_pairs") * F.lit(a) / F.lit(float(n) * n)).alias("k"),
        F.sqrt(F.col("n_pairs") * F.lit(a)
               / (F.lit(float(n) * n) * F.lit(math.pi))).alias("l"),
    )
