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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, DoubleType

from ..geometry import trajectory as tj, wkb
from .spatial_join import spatial_join


# 2-vertex LINESTRING M (ISO little-endian, type 2002, n=2): 57 bytes,
# 6 trailing doubles (x0 y0 m0 x1 y1 m1).  The dominant AIS-style shape —
# vectorized CPA (one quadratic per pair) instead of per-row parse+scan.
_LSM2_HDR = b"\x01" + (2002).to_bytes(4, "little") + (2).to_bytes(4, "little")


def _cpa_within_fast(abuf, bbuf, idx, thresh):
    """Vectorized single-segment CPA: mirrors _cpa_scan's arithmetic
    term-for-term (z=0) so thresholds resolve bit-identically."""
    ca = (np.frombuffer(b"".join(abuf[i] for i in idx), dtype=np.uint8)
          .reshape(len(idx), 57)[:, 9:].copy().view(np.float64))
    cb = (np.frombuffer(b"".join(bbuf[i] for i in idx), dtype=np.uint8)
          .reshape(len(idx), 57)[:, 9:].copy().view(np.float64))
    ta0, ta1, tb0, tb1 = ca[:, 2], ca[:, 5], cb[:, 2], cb[:, 5]
    if not (np.all(ta1 > ta0) and np.all(tb1 > tb0)):
        raise ValueError("invalid trajectory: measures must strictly increase")
    t0 = np.maximum(ta0, tb0)
    t1 = np.minimum(ta1, tb1)
    overlap = t1 >= t0
    vax = (ca[:, 3] - ca[:, 0]) / (ta1 - ta0)
    vay = (ca[:, 4] - ca[:, 1]) / (ta1 - ta0)
    vbx = (cb[:, 3] - cb[:, 0]) / (tb1 - tb0)
    vby = (cb[:, 4] - cb[:, 1]) / (tb1 - tb0)
    dp0x = (ca[:, 0] + (t0 - ta0) * vax) - (cb[:, 0] + (t0 - tb0) * vbx)
    dp0y = (ca[:, 1] + (t0 - ta0) * vay) - (cb[:, 1] + (t0 - tb0) * vby)
    dvx = vax - vbx
    dvy = vay - vby
    dv2 = dvx * dvx + dvy * dvy
    with np.errstate(divide="ignore", invalid="ignore"):
        tstar = t0 - (dp0x * dvx + dp0y * dvy) / dv2
    tstar = np.where(dv2 > 0, np.clip(tstar, t0, t1), t0)
    ddx = dp0x + (tstar - t0) * dvx
    ddy = dp0y + (tstar - t0) * dvy
    dist = np.sqrt(ddx * ddx + ddy * ddy)
    return overlap & (dist <= thresh)


@pandas_udf(BooleanType())
def _cpa_within_udf(a: pd.Series, b: pd.Series, d: pd.Series) -> pd.Series:
    abuf = [None if x is None else bytes(x) for x in a]
    bbuf = [None if y is None else bytes(y) for y in b]
    dt = d.to_numpy(np.float64, na_value=np.nan)
    fast = np.fromiter(
        (x is not None and y is not None and t == t
         and len(x) == 57 and len(y) == 57
         and x[:9] == _LSM2_HDR and y[:9] == _LSM2_HDR
         for x, y, t in zip(abuf, bbuf, dt)),
        dtype=bool, count=len(abuf))
    out = np.empty(len(abuf), dtype=object)
    idx = np.nonzero(fast)[0]
    if len(idx):
        out[idx] = _cpa_within_fast(abuf, bbuf, idx, dt[idx])
    for i in np.nonzero(~fast)[0]:
        x, y, t = abuf[i], bbuf[i], dt[i]
        out[i] = (None if (x is None or y is None or t != t) else
                  tj.cpa_within(wkb.parse(x), wkb.parse(y), float(t)))
    return pd.Series(out, dtype=object)


@pandas_udf(DoubleType())
def _m_bound_udf(s: pd.Series, is_max: pd.Series) -> pd.Series:
    bufs = [None if v is None else bytes(v) for v in s]
    mx = is_max.to_numpy()
    out = np.full(len(bufs), np.nan)
    fast = np.fromiter(
        (v is not None and len(v) == 57 and v[:9] == _LSM2_HDR
         for v in bufs), dtype=bool, count=len(bufs))
    idx = np.nonzero(fast)[0]
    if len(idx):
        c = (np.frombuffer(b"".join(bufs[i] for i in idx), dtype=np.uint8)
             .reshape(len(idx), 57)[:, 9:].copy().view(np.float64))
        out[idx] = np.where(mx[idx], c[:, 5], c[:, 2])
    for i in np.nonzero(~fast)[0]:
        if bufs[i] is None:
            continue
        c = tj._traj_coords(wkb.parse(bufs[i]))
        out[i] = float(c[-1, 3]) if mx[i] else float(c[0, 3])
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
