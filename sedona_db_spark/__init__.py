"""sedona_db_spark — a from-scratch PySpark-native spatial analytics engine
with the capabilities of SedonaDB (reference: martin-augment/sedona-db,
studied read-only at /root/reference; no code copied — the execution design
is Spark DataFrame composition, not a port of its Rust operators).

Public surface:

    from sedona_db_spark import register_all, spatial_join, knn_join
    register_all(spark)                      # ST_* functions in spark.sql
    spatial_join(pages, admin, "within", ...)
    knn_join(probe, build, k=5, ...)

Submodules:
    geometry.wkb / geometry.algos — numpy WKB codec + predicate kernels
    functions.st                  — ~75 ST_* scalar functions (pandas UDFs)
    functions.aggregates          — ST_*_Aggr spatial aggregates
    functions.text                — corpus text analysis (JVM columns)
    operators.spatial_join        — two-phase tile-prefilter + refine join
    operators.knn_join            — grid ring-expansion kNN join
    operators.dedup               — exact / MinHash-LSH / SimHash / cosine
    operators.similarity          — brute-force + IVF ANN top-k
    sources.pages                 — Common-Crawl-style pages pipeline
    sources.geoparquet            — GeoParquet `geo` metadata read/write
    sources.random_geometry       — sd_random_geometry parity generator
    sources.multimodal            — binary media columns + feature stubs
    plans.manifests               — checkpoint-resume lineage manifests
    tiling                        — quadkey grid (cell ids, covers, rings)
"""

from .context import SedonaContext, connect
from .functions.st import register_all
from .operators.asof import asof_join
from .operators.classifier import (
    quality_filter_lr,
    score_lr,
    train_lr_classifier,
)
from .operators.dbscan import cluster_within, dbscan
from .operators.kmeans import kmeans_points
from .operators.knn_join import knn_join
from .operators.spatial_join import (
    knn_join_ordered,
    spatial_join,
    spatial_join_ordered,
)
from .operators.subdivide import subdivide
from .operators.tiles import tile_cut

__all__ = [
    "connect",
    "SedonaContext",
    "register_all",
    "spatial_join",
    "knn_join",
    "spatial_join_ordered",
    "knn_join_ordered",
    "asof_join",
    "train_lr_classifier",
    "score_lr",
    "quality_filter_lr",
    "dbscan",
    "cluster_within",
    "kmeans_points",
    "tile_cut",
    "subdivide",
]
__version__ = "0.1.0"
