"""Geometry column convention for Spark — the SedonaType analogue.

The reference's type system (`rust/sedona-schema/src/datatypes.rs:29-35`)
is ``Wkb(Edges, Crs)`` stored as Arrow Binary with GeoArrow extension
metadata ``{"edges": ..., "crs": ...}``. Spark has no extension types, so we
carry the same convention as:

* storage: ``BinaryType`` column holding ISO WKB;
* logical tag: ``StructField.metadata`` key ``sedona_db_spark`` with
  ``{"type": "geometry"|"geography", "crs": "...", "edges": "planar"|"spherical"}``.

CRS propagation (`README.md:52` — "always maintains coordinate reference
system information") happens in this layer: every ST_* wrapper re-attaches
metadata to its output column via ``as_geometry``/``with_geom_meta``. Like
the reference, predicate/function dispatch matches on edges and ignores CRS
(`datatypes.rs:217-229`), but mixing two different CRS values in a binary
function raises.
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StructField

META_KEY = "sedona_db_spark"
DEFAULT_CRS = "OGC:CRS84"

PLANAR = "planar"
SPHERICAL = "spherical"


def geom_meta(crs: Optional[str] = DEFAULT_CRS, edges: str = PLANAR) -> dict:
    return {
        META_KEY: {
            "type": "geography" if edges == SPHERICAL else "geometry",
            "crs": crs,
            "edges": edges,
        }
    }


def geometry_field(name: str, crs: Optional[str] = DEFAULT_CRS, edges: str = PLANAR,
                   nullable: bool = True) -> StructField:
    return StructField(name, BinaryType(), nullable, metadata=geom_meta(crs, edges))


def with_geom_meta(df: DataFrame, colname: str, crs: Optional[str] = DEFAULT_CRS,
                   edges: str = PLANAR) -> DataFrame:
    """Attach geometry metadata to an existing binary column (wrapped under
    META_KEY, matching geometry_field/get_geom_meta)."""
    return df.withMetadata(colname, geom_meta(crs, edges))


def get_geom_meta(df: DataFrame, colname: str) -> Optional[dict]:
    for f in df.schema.fields:
        if f.name == colname:
            md = f.metadata or {}
            return md.get(META_KEY)
    return None


def is_geometry_col(df: DataFrame, colname: str) -> bool:
    return get_geom_meta(df, colname) is not None


def crs_of(df: DataFrame, colname: str) -> Optional[str]:
    md = get_geom_meta(df, colname)
    return md.get("crs") if md else None


def check_crs_match(df: DataFrame, col_a: str, col_b: str) -> None:
    """Reference raises on CRS mismatch between two geometry args
    (`rust/sedona-schema/src/datatypes.rs` matcher machinery)."""
    a, b = crs_of(df, col_a), crs_of(df, col_b)
    if a is not None and b is not None and a != b:
        raise ValueError(f"CRS mismatch: {col_a} has {a!r}, {col_b} has {b!r}; "
                         f"use ST_Transform or ST_SetCRS first")
