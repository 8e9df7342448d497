"""Distributed k-means over point geometries (ST_ClusterKMeans shape).

PostGIS exposes ``ST_ClusterKMeans`` as a window function; Sedona users
reach for the same thing to coarsen point layers before joins or to
build IVF-style partitions. This is the Spark-native shape:

* init: the k points with the SMALLEST ids (deterministic — retries,
  repartitioning, and the SQL oracle all see the same start; the
  kmeans++ randomized init trades determinism for quality and is the
  wrong default in a pipeline that must be re-runnable);
* assign: argmin of squared euclidean distance to the k broadcast
  centroids — pure Column arithmetic over decoded x/y, whole-stage
  codegen, no shuffle;
* update: one groupBy(cluster) average, k rows collected to the driver
  (k is small by definition), re-broadcast next round.

Each iteration is ONE map-side assignment pass + ONE k-row aggregate —
at 10^12 points the per-iteration cost is a single scan, and nothing
driver-side grows with the data. Centroids are rounded to 6 dp each
round so the chain of floating averages is reproducible across engines —
different summation orders drift ~1e-11, far inside the 1e-6 quantum —
and the SQL oracle unrolls the iterations as CTEs, PageRank-style.

Ties in the argmin go to the LOWEST centroid index (strict < on the
running minimum), matching the unrolled SQL exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from sedona_db_spark.functions import st

__all__ = ["kmeans_points"]


def kmeans_points(df: DataFrame, k: int, iterations: int = 3,
                  geom_col: str = "geometry", id_col: str = "id") -> DataFrame:
    """(id, cluster) with cluster in [0, k): k-means over point geoms."""
    if not 1 <= k <= 4096:
        raise ValueError(f"k must be in [1, 4096], got {k}")
    if not 1 <= iterations <= 50:
        raise ValueError(f"iterations must be in [1, 50], got {iterations}")
    pts = df.select(
        F.col(id_col).alias("_kid"),
        st.ST_X(F.col(geom_col)).alias("_kx"),
        st.ST_Y(F.col(geom_col)).alias("_ky"),
    ).where(F.col("_kx").isNotNull() & F.col("_ky").isNotNull())

    # deterministic init: k smallest ids, ordered by id -> centroid index
    seed_rows = pts.orderBy("_kid").limit(k).collect()
    cents = [(float(r["_kx"]), float(r["_ky"])) for r in seed_rows]
    if len(cents) < k:
        raise ValueError(f"k={k} but only {len(cents)} non-null points")

    def assign_col(centroids):
        best_d, best_i = None, None
        for i, (cx, cy) in enumerate(centroids):
            d = ((F.col("_kx") - F.lit(cx)) * (F.col("_kx") - F.lit(cx))
                 + (F.col("_ky") - F.lit(cy)) * (F.col("_ky") - F.lit(cy)))
            if best_d is None:
                best_d, best_i = d, F.lit(0)
            else:
                # strict <: ties keep the earlier (lower) index
                best_i = F.when(d < best_d, F.lit(i)).otherwise(best_i)
                best_d = F.when(d < best_d, d).otherwise(best_d)
        return best_i

    for _ in range(iterations):
        assigned = pts.withColumn("_kc", assign_col(cents))
        upd = {
            int(r["_kc"]): (float(r["cx"]), float(r["cy"]))
            for r in assigned.groupBy("_kc").agg(
                F.round(F.avg("_kx"), 6).alias("cx"),
                F.round(F.avg("_ky"), 6).alias("cy"),
            ).collect()
        }
        # a centroid that lost every point keeps its position (standard
        # "empty cluster keeps centroid" rule; deterministic)
        cents = [upd.get(i, cents[i]) for i in range(k)]

    out = pts.withColumn("_kc", assign_col(cents))
    return out.select(F.col("_kid").alias(id_col), F.col("_kc").alias("cluster"))
