"""Distributed DBSCAN over point geometries.

Ester et al., KDD 1996, composed Spark-first from this engine's existing
scale primitives — no new distributed machinery:

1. **ε-neighborhood self-join** via the banded two-phase ``spatial_join``
   (``dwithin``): candidate pairs come from grid-cell equi-joins, never
   an all-pairs product, with the point fast paths (full-scan confirmed)
   keeping the refine zero-Python.
2. **degree count** — one groupBy over the pair stream; a point is CORE
   when ≥ ``min_pts`` points (including itself) lie within ε.
3. **clusters** — alternating large-/small-star connected components
   (operators/components.py, O(log n) rounds, plan-size bounded by
   per-round localCheckpoint) over CORE–CORE edges only; the cluster id
   is the smallest core id in the component (deterministic).
4. **border assignment** — a non-core point within ε of ≥ 1 core joins
   the MINIMUM cluster id among its core neighbors (DBSCAN leaves border
   ties implementation-defined; min is deterministic and
   partition-independent). Everything else is NOISE (cluster NULL).

Scale notes: the only shuffles are the spatial join's cell exchange, one
degree groupBy, the CC rounds over the (far smaller) core-core edge set,
and one broadcast-friendly cluster re-join. Zipf-hot cells can be salted
through spatial_join's ``salt_replicas`` just like any other join.

The reference engine has no clustering operator (newer Apache Sedona
grew ST_DBSCAN on exactly this composition); it is part of the
geospatial-tier beyond-reference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .components import connected_components
from .spatial_join import spatial_join


def dbscan(df: DataFrame, eps: float, min_pts: int,
           geom_col: str = "geometry", id_col: str = "id",
           **join_kwargs) -> DataFrame:
    """(id, cluster, is_core) for every input point.

    ``cluster`` is the smallest CORE point id of the cluster, NULL for
    noise. ``is_core`` marks ε-density ≥ min_pts (self included).
    Extra kwargs (``grid_level``, ``salt_replicas``, …) pass through to
    the ε self-join."""
    pts = df.select(F.col(id_col).cast("long").alias("pid"),
                    F.col(geom_col).alias("g"))
    # ε-neighborhood pairs, both directions; the self-pair is added
    # explicitly (dwithin emits it too, but being explicit keeps the
    # degree definition self-evident and dedup-safe)
    right = pts.select(F.col("pid").alias("qid"), F.col("g").alias("g2"))
    pairs = (
        spatial_join(pts, right, "dwithin", "g", "g2",
                     distance=float(eps), **join_kwargs)
        .select("pid", "qid")
        .dropDuplicates(["pid", "qid"])
    )
    deg = pairs.groupBy("pid").agg(F.count(F.lit(1)).alias("deg"))
    core = deg.where(F.col("deg") >= int(min_pts)).select("pid")

    # CORE-CORE edges drive the components; an isolated core (no core
    # neighbor but enough border neighbors) is its own cluster
    cc_edges = (
        pairs.where(F.col("pid") < F.col("qid"))
        .join(core.select(F.col("pid")), "pid")
        .join(core.select(F.col("pid").alias("qid")), "qid")
    )
    comp = connected_components(cc_edges, src="pid", dst="qid")
    core_clusters = (
        core.join(comp.withColumnRenamed("node", "pid"), "pid", "left")
        .select("pid", F.coalesce("component", "pid").alias("cluster"))
    )

    # border points: min cluster among ε-neighboring cores
    border = (
        pairs.join(core_clusters.select(F.col("pid").alias("qid"),
                                        F.col("cluster").alias("ncluster")),
                   "qid")
        .groupBy("pid").agg(F.min("ncluster").alias("bcluster"))
    )
    out = (
        pts.select("pid")
        .join(core_clusters.withColumnRenamed("cluster", "ccluster"), "pid", "left")
        .join(border, "pid", "left")
        .select(
            F.col("pid").alias(id_col),
            # core cluster wins; else border assignment; else noise NULL
            F.coalesce("ccluster", "bcluster").alias("cluster"),
            F.col("ccluster").isNotNull().alias("is_core"),
        )
    )
    return out


def cluster_within(df: DataFrame, distance: float,
                   geom_col: str = "geometry", id_col: str = "id",
                   **join_kwargs) -> DataFrame:
    """PostGIS ``ST_ClusterWithin`` semantics, distributed: transitive
    closure of pairwise ST_DWithin(`distance`) — two geometries share a
    cluster iff a chain of <=distance hops connects them. Returns
    (id, cluster) with cluster = the smallest member id; every row gets a
    cluster (a singleton clusters with itself).

    This is exactly DBSCAN with min_pts=1 (every point core, no noise,
    no border rule), so it reuses that operator's scale shape: banded
    ε self-join (never all-pairs) + alternating-star connected
    components in O(log n) rounds."""
    out = dbscan(df, eps=float(distance), min_pts=1,
                 geom_col=geom_col, id_col=id_col, **join_kwargs)
    return out.select(id_col, "cluster")
