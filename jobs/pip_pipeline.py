"""spark-submit entrypoint for the flagship PIP rollup (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

The `sedona_db_spark` package is NOT vendored here — it must arrive via
``--py-files sedona_db_spark.zip`` (built by package.py), exactly as it
would on a real cluster where executors have no access to the repo
checkout. The job:

    customer points (derived coords, ST_Point)
      x nation boxes (5x5 world partition)
      -> two-phase spatial join (within)         [pandas-UDF refine on
                                                  executors => proves the
                                                  zip reached the workers]
      -> per-nation rollup -> parquet sink

Usage:
    spark-submit --master local[8] --py-files dist/sedona_db_spark.zip \
        jobs/pip_pipeline.py --sf-dir /root/testdata/sf0.001 --out /tmp/rollup
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("sedona-db-spark-pip").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # imported AFTER the session exists: on spark-submit the zip from
    # --py-files is already on the driver's sys.path, and Spark ships it
    # to every executor's python worker
    from sedona_db_spark.functions import st
    from sedona_db_spark.operators.fanout import fan_out
    from sedona_db_spark.operators.spatial_join import spatial_join

    c = fan_out(spark.read.parquet(f"{args.sf_dir}/customer.parquet"))
    cx = F.lit(-180.0) + ((F.col("c_custkey") * 7) % 3600) * F.lit(0.1) + F.lit(0.005)
    cy = F.lit(-90.0) + ((F.col("c_custkey") * 13) % 1800) * F.lit(0.1) + F.lit(0.005)
    pts = c.withColumn("geom", st.ST_Point(cx, cy)).select("c_custkey", "geom")

    n = spark.read.parquet(f"{args.sf_dir}/nation.parquet")
    x0 = F.lit(-180.0) + (F.col("n_nationkey") % 5) * F.lit(72.0)
    y0 = F.lit(-90.0) + F.floor(F.col("n_nationkey") / 5) * F.lit(36.0)
    boxes = n.withColumn(
        "geom", st.ST_MakeEnvelope(x0, y0, x0 + F.lit(72.0), y0 + F.lit(36.0))
    ).select("n_nationkey", "geom")

    j = spatial_join(pts, boxes, predicate="within",
                     left_geom="geom", right_geom="geom")
    rollup = j.groupBy("n_nationkey").agg(F.count("*").alias("cnt"))
    rollup.write.mode("overwrite").parquet(args.out)

    total = spark.read.parquet(args.out).agg(F.sum("cnt")).collect()[0][0]
    print(f"PIP_ROLLUP_TOTAL={total}")
    spark.stop()


if __name__ == "__main__":
    main()
