"""`connect()`-style front-end mirroring the reference's Python API.

The reference's entry point is `sedona.db.connect()` returning a
`SedonaContext` with `sql` / `read_parquet` / `create_data_frame` / `view`
/ `drop_view` (`python/sedonadb/python/sedonadb/context.py:28-210` in
/root/reference), and its DataFrame carries `to_view` / `to_memtable` /
`to_pandas` / `to_arrow_table` / `to_parquet` / `show` / `explain` / etc.
(`dataframe.py:38-460`). A reference user switching to this engine keeps
the same call shapes:

    import sedona_db_spark as sd
    con = sd.connect(spark)           # or connect() to build a session
    con.sql("SELECT ST_Area(ST_GeomFromText('...'))").show()
    df = con.read_parquet(path)       # GeoParquet-aware
    df.to_view("t");  con.sql("SELECT count(*) FROM t")

Everything returns a plain PySpark DataFrame (plus the handful of
reference-named conveniences patched via this module's helpers), so the
full Spark API remains available — deliberately, since Catalyst IS the
relational engine here.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession


class SedonaContext:
    """Reference-parity context over a SparkSession (context.py:28-210)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        from .functions.st import register_all

        register_all(spark)
        self._views: set = set()

    # -- ingestion (context.py:52-81) ---------------------------------------
    def create_data_frame(self, obj: Any, schema: Any = None) -> DataFrame:
        """pandas / Arrow table / list-of-rows -> DataFrame (Arrow path)."""
        import pandas as pd

        try:
            import pyarrow as pa

            if isinstance(obj, pa.Table):
                obj = obj.to_pandas()
        except ImportError:  # pragma: no cover
            pass
        if isinstance(obj, pd.DataFrame):
            return self.spark.createDataFrame(obj, schema=schema)
        return self.spark.createDataFrame(obj, schema=schema)

    # -- views (context.py:83-120) ------------------------------------------
    def view(self, name: str) -> DataFrame:
        if name not in self._views and name not in [
            t.name for t in self.spark.catalog.listTables()
        ]:
            raise ValueError(f"view {name!r} does not exist")
        return self.spark.table(name)

    def drop_view(self, name: str) -> None:
        self.spark.catalog.dropTempView(name)
        self._views.discard(name)

    # -- io (context.py:122-154) --------------------------------------------
    def read_parquet(self, paths, options: Optional[dict] = None) -> DataFrame:
        """GeoParquet-aware parquet read (geometry metadata re-attached,
        native encodings decoded — sources/geoparquet.py). A list of paths
        becomes ONE multi-path scan (single plan node)."""
        from .sources.geoparquet import read_geoparquet

        return read_geoparquet(self.spark, paths)

    # -- sql (context.py:155-171) -------------------------------------------
    def sql(self, sql: str, spatial_planning: bool = True) -> DataFrame:
        """Run SQL with spatial-join planning.

        Joins whose condition is a spatial predicate (``JOIN b ON
        ST_Intersects(a.g, b.g)``, ``FROM a, b WHERE ST_DWithin(...)``,
        ``ON ST_KNN(...)``) are routed through the two-phase
        ``spatial_join``/``knn_join`` operators — the analogue of the
        reference's logical/physical rewrite rules
        (``rust/sedona-spatial-join/src/optimizer.rs:131-420``). Without
        this, Catalyst executes such joins as a cartesian product with a
        per-row UDF filter. Pass ``spatial_planning=False`` to bypass.
        """
        if spatial_planning:
            from .plans.sql_planner import (
                plan_spatial_sql,
                spatial_joins_in_plain_sql,
            )

            planned = plan_spatial_sql(self.spark, sql)
            if planned is not None:
                return planned
            if spatial_joins_in_plain_sql(sql):
                import warnings

                warnings.warn(
                    "this SQL contains a spatial predicate over two tables "
                    "in a shape the spatial planner does not rewrite; "
                    "Catalyst will execute it as a cartesian product. "
                    "Use sedona_db_spark.operators.spatial_join / knn_join "
                    "directly, or simplify the join to "
                    "'FROM a JOIN b ON ST_Pred(a.g, b.g) [AND ...]'.",
                    stacklevel=2,
                )
        return self.spark.sql(sql)

    # -- udfs (context.py:173-207) ------------------------------------------
    def register_udf(self, udf: Any, name: Optional[str] = None):
        self.spark.udf.register(name or getattr(udf, "__name__", "udf"), udf)

    # -- reference DataFrame conveniences ------------------------------------
    def to_view(self, df: DataFrame, name: str, overwrite: bool = False) -> DataFrame:
        """dataframe.py:182-206 — register df as a named view."""
        if not overwrite and name in self._views:
            raise ValueError(f"view {name!r} already exists (pass overwrite=True)")
        df.createOrReplaceTempView(name)
        self._views.add(name)
        return self.spark.table(name)

    def to_memtable(self, df: DataFrame) -> DataFrame:
        """dataframe.py:207-229 — materialize in memory."""
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()
        return df

    def to_parquet(self, df: DataFrame, path: str, geom_cols=None, **kw) -> None:
        """GeoParquet write (dataframe.py:296-377 analogue)."""
        from .sources.geoparquet import write_geoparquet

        cols = geom_cols
        if cols is None:
            cols = [c for c in df.columns if c == "geometry"]
        if cols:
            write_geoparquet(df, str(path), cols, **kw)
        else:
            df.write.mode("overwrite").parquet(str(path))


def connect(spark: Optional[SparkSession] = None, cpus: Optional[int] = None) -> SedonaContext:
    """The reference's `sedona.db.connect()` (context.py:208-210): build or
    wrap a session with every ST_*/RS_* function registered."""
    if spark is None:
        builder = SparkSession.builder.appName("sedona_db_spark")
        if cpus:
            builder = builder.master(f"local[{cpus}]").config(
                "spark.sql.shuffle.partitions", str(cpus)
            )
        spark = builder.getOrCreate()
    return SedonaContext(spark)
