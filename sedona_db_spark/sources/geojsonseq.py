"""Newline-delimited GeoJSON source/sink (RFC 8142 GeoJSON text
sequences / the common `.geojsonl` interchange files).

Spark-first: the reader is `spark.read.text` (splittable, predicate
pushdown on nothing — it's a text format — but PARTITIONED scan and
per-line Arrow-batched decode), the writer is a per-partition encode to
`text`.  One Feature per line; geometry goes through the engine's
RFC 7946 codec (geometry/geojson.py, bit-exact round trips), properties
are carried as a map<string,string> column (the lossless-and-typed path
is GeoParquet — this format exists for interchange, documented).
"""

from __future__ import annotations

import json
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BinaryType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from ..geometry import geojson, wkb

_ROW = StructType([
    StructField("geometry", BinaryType()),
    StructField("properties", MapType(StringType(), StringType())),
])


@pandas_udf(_ROW)
def _decode_line(lines: pd.Series) -> pd.DataFrame:
    geoms, props = [], []
    for ln in lines:
        if ln is None or not ln.strip():
            geoms.append(None)
            props.append(None)
            continue
        # RFC 8142 allows a leading RS (0x1E) separator
        obj = json.loads(ln.lstrip("\x1e").strip())
        if obj.get("type") == "Feature":
            gobj, pobj = obj.get("geometry"), obj.get("properties") or {}
        else:                                   # bare geometry per line
            gobj, pobj = obj, {}
        g = None if gobj is None else geojson.from_geojson(json.dumps(gobj))
        geoms.append(None if g is None else wkb.encode(g))
        props.append({str(k): (json.dumps(v) if isinstance(v, (dict, list))
                               else ("" if v is None else str(v)))
                      for k, v in pobj.items()})
    return pd.DataFrame({"geometry": geoms, "properties": props})


def read_geojsonseq(spark: SparkSession, path: str) -> DataFrame:
    """(geometry BINARY, properties MAP<STRING,STRING>) from one Feature
    per line.  Blank lines are skipped; a non-Feature JSON object is
    treated as a bare geometry."""
    lines = spark.read.text(path)
    out = lines.where(F.length(F.trim(F.col("value"))) > 0).select(
        _decode_line(F.col("value")).alias("r")
    )
    return out.select(F.col("r.geometry").alias("geometry"),
                      F.col("r.properties").alias("properties"))


@pandas_udf(StringType())
def _encode_line(geom: pd.Series, props: pd.Series) -> pd.Series:
    out = []
    for gv, pv in zip(geom, props):
        gj = None
        if gv is not None:
            gj = json.loads(geojson.to_geojson(wkb.parse(bytes(gv))))
        p = {} if pv is None else dict(pv)
        out.append(json.dumps(
            {"type": "Feature", "geometry": gj, "properties": p},
            separators=(",", ":"), sort_keys=True))
    return pd.Series(out, dtype=object)


def write_geojsonseq(df: DataFrame, path: str,
                     geom_col: str = "geometry",
                     props_col: Optional[str] = "properties",
                     mode: str = "overwrite") -> None:
    """One Feature per line, distributed text write (each task writes its
    partition — no driver collect)."""
    props = (F.col(props_col) if props_col and props_col in df.columns
             else F.lit(None).cast(MapType(StringType(), StringType())))
    lines = df.select(_encode_line(F.col(geom_col), props).alias("value"))
    lines.write.mode(mode).text(path)
