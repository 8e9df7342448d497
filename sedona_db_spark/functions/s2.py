"""Spark column surface for S2 cell ids.

Only the lat/lng -> cell kernel needs Python (trig + Hilbert walk,
vectorized numpy over Arrow batches).  Everything downstream — parent,
level, token prefix, containment ranges — is pure int64 bit algebra on
the id, expressed as built-in Columns so it stays inside whole-stage
codegen: cell-id range partitioning, prefix joins, and rollups to
coarser levels never leave the JVM.

SQL names registered: ``S2_CellID(lon, lat, level)`` over raw
coordinates and ``ST_S2CellID(geom, level)`` over WKB points (Apache
Sedona spells the geometry flavor ``ST_S2CellIDs`` returning an array
of covering cells; a point's covering is a single cell, which is the
geotagging shape the north rule needs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..geometry import s2cell, wkb

__all__ = [
    "s2_cell_id",
    "s2_cell_id_geom",
    "s2_parent",
    "s2_level",
    "s2_range_min",
    "s2_range_max",
    "s2_token",
    "register_s2",
]


def _cell_udf(level: int):
    @pandas_udf(LongType())
    def _k(lat: pd.Series, lng: pd.Series) -> pd.Series:
        la = lat.to_numpy(dtype=np.float64, na_value=np.nan)
        lo = lng.to_numpy(dtype=np.float64, na_value=np.nan)
        ok = np.isfinite(la) & np.isfinite(lo)
        out = np.zeros(len(la), dtype=np.int64)
        if ok.any():
            out[ok] = s2cell.cell_id_from_latlng(la[ok], lo[ok], level)
        res = pd.Series(out, dtype="Int64")
        res[~ok] = pd.NA
        return res

    return _k


def s2_cell_id(lat, lng, level: int = 30) -> Column:
    """S2 cell id (signed int64 view) of a lat/lng degree pair."""
    return _cell_udf(level)(F.col(lat) if isinstance(lat, str) else lat,
                            F.col(lng) if isinstance(lng, str) else lng)


def s2_cell_id_geom(geom, level: int = 30) -> Column:
    """S2 cell id of a WKB point column (x = lon, y = lat)."""
    @pandas_udf(LongType())
    def _k(g: pd.Series) -> pd.Series:
        vals = [None if v is None else bytes(v) for v in g]
        x, y, valid = wkb.decode_points_xy(vals)
        # NULL rows map to NULL cells; a non-null NON-POINT must raise,
        # not silently vanish into NULL (strict-decode discipline)
        nonnull = np.array([v is not None for v in vals])
        if bool((nonnull & ~valid).any()):
            bad = int(np.argmax(nonnull & ~valid))
            raise ValueError(
                "s2_cell_id_geom expects an XY point column; row "
                f"{bad} is not a point")
        ok = valid & np.isfinite(x) & np.isfinite(y)
        out = np.zeros(len(vals), dtype=np.int64)
        if ok.any():
            out[ok] = s2cell.cell_id_from_latlng(y[ok], x[ok], level)
        res = pd.Series(out, dtype="Int64")
        res[~ok] = pd.NA
        return res

    return _k(F.col(geom) if isinstance(geom, str) else geom)


def _lsb(level: int) -> int:
    return 1 << (2 * (s2cell.MAX_LEVEL - level))


def s2_parent(cell, level: int) -> Column:
    """Ancestor id — pure bit algebra: ``(id & -lsb) | lsb`` (two's
    complement keeps the identity valid on Spark's signed longs)."""
    c = F.col(cell) if isinstance(cell, str) else cell
    lsb = _lsb(level)
    return c.bitwiseAND(F.lit(-lsb)).bitwiseOR(F.lit(lsb))


def _lsb_col(cell) -> Column:
    c = F.col(cell) if isinstance(cell, str) else cell
    # id & -id isolates the trailing set bit, signed or not
    return c.bitwiseAND(-c)


def s2_level(cell) -> Column:
    """Level from the trailing bit: 30 - bit_position/2 (JVM-side)."""
    c = F.col(cell) if isinstance(cell, str) else cell
    # Spark's bin() prints the unsigned 64-bit pattern; the lsb of a
    # valid id is below bit 61, so length(bin(lsb)) = pos+1 exactly
    return (F.lit(s2cell.MAX_LEVEL)
            - (F.length(F.bin(_lsb_col(c))) - F.lit(1)) / F.lit(2)
            ).cast("int")


def s2_range_min(cell) -> Column:
    c = F.col(cell) if isinstance(cell, str) else cell
    return c - (_lsb_col(c) - F.lit(1))


def s2_range_max(cell) -> Column:
    c = F.col(cell) if isinstance(cell, str) else cell
    return c + (_lsb_col(c) - F.lit(1))


def s2_token(cell) -> Column:
    """Canonical hex token (JVM-side): 16-nibble hex, trailing zeros
    stripped. ``hex()`` on a long prints the unsigned pattern."""
    c = F.col(cell) if isinstance(cell, str) else cell
    return F.regexp_replace(
        F.lower(F.lpad(F.hex(c), 16, "0")), "0+$", ""
    )


def register_s2(spark) -> None:
    """SQL names: S2_CellID(lat, lng, level) / ST_S2CellID(geom, level).

    Registered with a fixed level argument resolved at call time via a
    3-arg plain wrapper (levels are the 31 constants, so the pandas
    kernel re-derives per batch from the passed level column's first
    value — constant-foldable in every real query)."""
    from pyspark.sql.types import DoubleType  # noqa: F401  (doc aid)

    def _sql_cell(lat, lng, level):
        import pandas as _pd

        lv = int(level.iloc[0]) if len(level) else 30
        la = lat.to_numpy(dtype=np.float64, na_value=np.nan)
        lo = lng.to_numpy(dtype=np.float64, na_value=np.nan)
        ok = np.isfinite(la) & np.isfinite(lo)
        out = np.zeros(len(la), dtype=np.int64)
        if ok.any():
            out[ok] = s2cell.cell_id_from_latlng(la[ok], lo[ok], lv)
        res = _pd.Series(out, dtype="Int64")
        res[~ok] = _pd.NA
        return res

    spark.udf.register("S2_CellID", pandas_udf(_sql_cell, LongType()))

    def _sql_cell_geom(g, level):
        import pandas as _pd

        lv = int(level.iloc[0]) if len(level) else 30
        vals = [None if v is None else bytes(v) for v in g]
        x, y, valid = wkb.decode_points_xy(vals)
        nonnull = np.array([v is not None for v in vals])
        if bool((nonnull & ~valid).any()):
            # strict decode: non-point must raise, not become NULL
            raise ValueError("ST_S2CellID expects an XY point column")
        ok = valid & np.isfinite(x) & np.isfinite(y)
        out = np.zeros(len(vals), dtype=np.int64)
        if ok.any():
            out[ok] = s2cell.cell_id_from_latlng(y[ok], x[ok], lv)
        res = _pd.Series(out, dtype="Int64")
        res[~ok] = _pd.NA
        return res

    spark.udf.register("ST_S2CellID", pandas_udf(_sql_cell_geom, LongType()))
