"""Link-graph analytics over web corpora: PageRank.

A web-scale curation pipeline ranks hosts/domains by link authority
(spam filtering, crawl prioritization, quality weighting — Common
Crawl publishes exactly this as its host-level ranking dataset). The
reference engine (SedonaDB) has no graph surface — single-node engines
rank in memory; at 10^12 pages the link graph itself is distributed, so
this module implements power-iteration PageRank (Brin & Page 1998) as
pure DataFrame ops:

* one shuffle per iteration (``groupBy(dst)`` over the contribution
  join); the edge set is re-used every round, so persist it once,
* dangling mass (nodes with no out-links) is folded back uniformly via
  a ONE-ROW aggregate crossJoin — no driver collect in the loop; the
  dangling-node set is static, so it is resolved ONCE into a per-node
  flag before the loop (no per-iteration anti-join),
* each iteration ends in an eager ``localCheckpoint`` so the plan stays
  constant-size across rounds (the same discipline as
  operators/components.py — a naive loop builds an exponentially
  nested plan that OOMs the driver long before the executors hurt).

Scale notes (100 TB): edges shuffle-partition on ``src`` for the
contribution join and on ``dst`` for the sum — both hash exchanges on
the node id; Zipf-hot hub domains skew the ``dst`` sum, which AQE's
skew-join splitting absorbs (contributions are associative so partial
aggregation runs map-side first). Rank state is 2 columns × |nodes| —
thin. The iteration count is fixed and small (the standard 10-50), so
total cost is K shuffles over a thin table.

Every number is SQL-recomputable: the oracle unrolls the same K
iterations as chained CTEs (DuckDB), including the dangling-mass
scalar per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank", "domain_link_graph"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Returns ``(node, rank)`` for every node appearing as source or
    destination. Semantics (matching the SQL oracle exactly):

    * ranks start uniform ``1/N``;
    * each round: ``rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/outdeg(u)
      + dangling/N)`` where ``dangling = Σ rank(u)`` over nodes with no
      out-edges;
    * total rank mass stays 1 every round (conservation is asserted in
      tests).

    ``edges`` rows are treated as-is (pre-`distinct()` them if the
    graph is simple). Parallel edges therefore weight contributions.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # one scalar; the loop itself never collects
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    e = e.persist()

    # The dangling-node SET is static — resolve it ONCE into a per-node
    # boolean before the loop (the anti-join used to re-run every
    # iteration: one avoidable exchange × K). The flag rides along in the
    # rank state, so per-iteration dangling mass is a filter + one-row agg.
    tagged = (
        nodes.join(
            outdeg.select(F.col("s").alias("node"),
                          F.lit(True).alias("_hasout")),
            "node", "left")
        .select("node", F.coalesce("_hasout", F.lit(False)).alias("_hasout"))
        .persist()
    )

    ranks = tagged.select("node", "_hasout",
                          (F.lit(1.0) / F.lit(float(n))).alias("rank"))
    base = (1.0 - damping) / float(n)
    for _ in range(iterations):
        # contribution of every edge: rank(src)/outdeg(src), summed by dst
        contrib = (
            e.join(ranks.withColumnRenamed("node", "s").drop("_hasout"), "s")
            .join(outdeg, "s")
            .select(F.col("d").alias("node"),
                    (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        # dangling mass: rank held by nodes with no out-edges, folded
        # back uniformly. One-row aggregate, broadcast crossJoin — the
        # loop plan contains no driver round-trip and no join to find it.
        dangling = (
            ranks.where(~F.col("_hasout"))
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
        )
        ranks = (
            tagged.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "_hasout",
                (F.lit(base)
                 + F.lit(damping)
                 * (F.coalesce(F.col("csum"), F.lit(0.0))
                    + F.col("dang") / F.lit(float(n)))).alias("rank"),
            )
        ).localCheckpoint()
    return ranks.select("node", "rank")


def domain_link_graph(docs: DataFrame, source_col: str = "source",
                      id_col: str = "doc_id", out_links: int = 3) -> DataFrame:
    """Deterministic synthetic domain→domain edge list for a corpus.

    Stand-in for real hyperlink extraction (the sandbox documents table
    carries no anchors): each document emits ``out_links`` links from
    its source domain to md5-chosen target domains, self-loops dropped,
    then DISTINCT. The md5-prefix bucket hash is byte-identical in
    Spark and DuckDB (same rule as operators/dsir.py), so the SQL
    oracle rebuilds the exact edge set.

    Domains are indexed by their sorted order; the row_number window
    runs over the DISTINCT domain list (tiny), never the corpus.
    """
    from pyspark.sql import Window

    domains = docs.select(F.col(source_col).alias("domain")).distinct()
    idx = domains.select(
        "domain",
        (F.row_number().over(Window.orderBy("domain")) - 1).alias("idx"),
    )
    n_dom = idx.count()
    links = docs.select(
        F.col(source_col).alias("src"),
        F.explode(F.array(*[F.lit(j) for j in range(1, out_links + 1)]))
        .alias("j"),
        F.col(id_col).alias("_id"),
    ).select(
        "src",
        (F.conv(F.substring(F.md5(F.concat_ws(
            "#", F.col("_id").cast("string"), F.col("j").cast("string"))),
            1, 8), 16, 10).cast("long") % F.lit(n_dom)).alias("idx"),
    )
    edges = (
        links.join(F.broadcast(idx), "idx")
        .select("src", F.col("domain").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return edges
