"""Two-parallelism scaling evidence (north rule).

No real cluster exists in this sandbox, so the N vs 4N executor comparison
is proxied by running the SAME job at `local[8]` and `local[32]` on the
same input (driver instruction in BASELINE.md). Each level runs in its own
fresh JVM (sequential `SparkSession`s), with one warm-up iteration per
level so JIT/Arrow setup is excluded from the measured runs.

Job = the headline PIP spatial join: R x replicated lineitem-derived
points (uniform grid coordinates) joined `within` 25 admin boxes through
the two-phase tile-prefilter + vectorized-refine plan, then counted per
box. Throughput = input points / median wall time.

Usage: python scaling_bench.py [--replicate 8] [--sf-dir DIR]
Prints one JSON line: throughput at both levels + scaling efficiency
(speedup / core-ratio), appended to BENCH history by the caller.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time


def run_level(cpus: int, sf_dir: str, replicate: int, iters: int = 3):
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        import bench
        import __spark_entry__ as em
        from sedona_db_spark.operators.spatial_join import spatial_join

        pts = bench.lineitem_points(spark, sf_dir)
        if replicate > 1:
            pts = pts.withColumn(
                "_r", F.explode(F.array(*[F.lit(i) for i in range(replicate)]))
            ).drop("_r")
        # materialize the input once so measured runs see identical work
        pts = pts.repartition(cpus * 2).persist()
        n = pts.count()
        boxes = em._nation_boxes(spark, sf_dir).select("n_nationkey", "geom")

        def job():
            j = spatial_join(pts.select("l_orderkey", "lon", "lat"), boxes,
                             predicate="within", left_geom="geom",
                             right_geom="geom", left_xy=("lon", "lat"),
                             grid_level=4, broadcast_right=True)
            return j.groupBy("n_nationkey").count().collect()

        job()  # warm-up (JIT, Arrow, python worker pool)
        times = []
        for _ in range(iters):
            t0 = time.time()
            job()
            times.append(time.time() - t0)
        wall = statistics.median(times)
        return n, wall, times
    finally:
        spark.stop()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=8)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    n_lo, t_lo, times_lo = run_level(args.low, args.sf_dir, args.replicate, args.iters)
    n_hi, t_hi, times_hi = run_level(args.high, args.sf_dir, args.replicate, args.iters)
    assert n_lo == n_hi
    thr_lo = n_lo / t_lo
    thr_hi = n_hi / t_hi
    speedup = thr_hi / thr_lo
    core_ratio = args.high / args.low
    out = {
        "job": "pip spatial join (within, 25 admin boxes)",
        "rows": n_lo,
        "sf_dir": args.sf_dir,
        f"wall_sec_local[{args.low}]": round(t_lo, 3),
        f"wall_sec_local[{args.high}]": round(t_hi, 3),
        f"throughput_rows_per_sec_local[{args.low}]": round(thr_lo, 1),
        f"throughput_rows_per_sec_local[{args.high}]": round(thr_hi, 1),
        "speedup": round(speedup, 3),
        "core_ratio": core_ratio,
        "scaling_efficiency": round(speedup / core_ratio, 3),
        "raw_times_low": [round(t, 3) for t in times_lo],
        "raw_times_high": [round(t, 3) for t in times_hi],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
