"""Distributed trajectory proximity join (CPA join): pairs of moving
objects that come within ``d`` of each other WHILE CO-TEMPORAL.

PostGIS exposes the scalar side of this (ST_CPAWithin / ST_DistanceCPA,
see geometry/trajectory.py); at corpus scale the all-pairs form is a
join problem.  Spark-first composition — no new distributed machinery:

1. **spatial prefilter** — the existing two-phase banded ``dwithin``
   join (operators/spatial_join.py): the static 2D distance between the
   trajectories' traces lower-bounds the CPA distance, so any pair with
   CPA <= d is also statically within d.  Grid-cell equi-join, never a
   cartesian product.
2. **time prefilter** — measure ranges must overlap (cheap column
   conjunct over ST_MMin/ST_MMax computed once per side, pushed before
   the refine).
3. **CPA refine** — the exact per-pair clamped-quadratic kernel
   (geometry/trajectory.cpa_within) over the surviving candidates in an
   Arrow-batched pandas UDF.

Scale notes: shuffles are exactly the dwithin join's cell exchange; the
time conjunct and the refine are map-side.  Skewed cells salt through
``salt_replicas`` like any other join.  The refine is the only Python
stage and runs on candidates only (post-prefilter), mirroring the
two-phase discipline every other join in this engine follows.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, DoubleType

from ..geometry import trajectory as tj, wkb
from .spatial_join import spatial_join


@pandas_udf(BooleanType())
def _cpa_within_udf(a: pd.Series, b: pd.Series, d: pd.Series) -> pd.Series:
    return pd.Series(
        [None if (x is None or y is None or t is None) else
         tj.cpa_within(wkb.parse(bytes(x)), wkb.parse(bytes(y)), float(t))
         for x, y, t in zip(a, b, d)], dtype=object)


@pandas_udf(DoubleType())
def _m_bound_udf(s: pd.Series, is_max: pd.Series) -> pd.Series:
    out = []
    for v, mx in zip(s, is_max):
        if v is None:
            out.append(None)
            continue
        g = wkb.parse(bytes(v))
        c = tj._traj_coords(g)
        out.append(float(c[-1, 3]) if mx else float(c[0, 3]))
    return pd.Series(out, dtype="float64")


def cpa_join(
    left: DataFrame,
    right: DataFrame,
    distance,
    left_geom: str = "traj",
    right_geom: str = "traj",
    grid_level: Optional[int] = None,
    broadcast_right: Optional[bool] = None,
    salt_replicas: int = 0,
) -> DataFrame:
    """Inner join of trajectory pairs with CPA distance <= ``distance``.

    ``distance`` may be a literal or a Column on the joined row.  Both
    geometry columns must be LINESTRING M trajectories (strictly
    increasing measures) — the refine raises on invalid input rather
    than dropping rows silently."""
    d_col = distance if isinstance(distance, Column) else F.lit(float(distance))

    if left_geom == right_geom:
        # the join output restores original names on both sides; keep the
        # pair addressable by renaming the build side (mirrors pandas'
        # suffix discipline)
        new_r = f"{right_geom}_r"
        if new_r in left.columns or new_r in right.columns:
            raise ValueError(
                f"cannot disambiguate geometry columns: {new_r!r} already exists"
            )
        right = right.withColumnRenamed(right_geom, new_r)
        right_geom = new_r

    # time bounds once per side (valid trajectories have sorted measures,
    # so first/last vertex M are the bounds — checked again in the refine)
    lt = left.withColumn("__t0_l", _m_bound_udf(F.col(left_geom), F.lit(False))) \
             .withColumn("__t1_l", _m_bound_udf(F.col(left_geom), F.lit(True)))
    rt = right.withColumn("__t0_r", _m_bound_udf(F.col(right_geom), F.lit(False))) \
              .withColumn("__t1_r", _m_bound_udf(F.col(right_geom), F.lit(True)))

    cand = spatial_join(
        lt, rt, "dwithin",
        left_geom=left_geom, right_geom=right_geom,
        distance=d_col,
        grid_level=grid_level,
        broadcast_right=broadcast_right,
        salt_replicas=salt_replicas,
    )
    cand = cand.where(
        (F.col("__t0_l") <= F.col("__t1_r")) & (F.col("__t0_r") <= F.col("__t1_l"))
    )
    out = cand.where(
        _cpa_within_udf(F.col(left_geom), F.col(right_geom), d_col)
    )
    return out.drop("__t0_l", "__t1_l", "__t0_r", "__t1_r")
