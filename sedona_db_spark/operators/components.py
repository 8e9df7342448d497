"""Connected components over near-dup pair graphs (dedup clustering).

LSH dedup (operators/dedup.py) emits PAIRS; a real pipeline needs
CLUSTERS — transitively connected groups with one canonical survivor
("A~B, B~C ⇒ keep one of {A,B,C}"). The reference engine has no analogue
(single-node dedup can union-find in memory); at 10^12 documents the
graph itself is distributed, so we implement the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14 — public algorithm), which converges
in O(log n) rounds of pure DataFrame groupBy/join ops:

* large-star: every node attaches its LARGER neighbors to the smallest
  node of its neighborhood (incl. itself);
* small-star: every node attaches its smaller-or-equal neighbors to the
  smallest.

Each round is two shuffles on the node id; edges only ever point
"downhill", so the edge set monotonically contracts toward stars rooted
at component minima. The loop is driver-side but touches only a
CONVERGENCE COUNTER (one scalar per round), never row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star contraction (Kiveris et al. §3).

    large-star(u):  m = min(Γ(u) ∪ {u});   emit (v, m) for v ∈ Γ(u), v > u
    small-star(u):  m = min(Γ≤(u) ∪ {u});  emit (v, m) for v ∈ Γ≤(u) ∪ {u}

    `edges` is symmetric (both directions present), so every undirected
    edge is seen from both endpoints. Returns the new symmetric edge set.
    """
    if large:
        nbrs = edges
    else:
        nbrs = edges.where(F.col("d") <= F.col("s"))
    m = nbrs.groupBy("s").agg(F.least(F.min("d"), F.col("s")).alias("m"))
    j = nbrs.join(m, "s")
    if large:
        out = j.where(F.col("d") > F.col("s")).select(
            F.col("d").alias("a"), F.col("m").alias("b")
        )
    else:
        out = j.select(F.col("d").alias("a"), F.col("m").alias("b")).union(
            j.select(F.col("s").alias("a"), F.col("m").alias("b"))
        )
    out = out.where(F.col("a") != F.col("b")).dropDuplicates(["a", "b"])
    return out.select(F.col("a").alias("s"), F.col("b").alias("d")).union(
        out.select(F.col("b").alias("s"), F.col("a").alias("d"))
    ).dropDuplicates(["s", "d"])


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 32,
) -> DataFrame:
    """(node, component) for every node appearing in `pairs`; `component`
    is the smallest node id in its component.

    O(log n) rounds; each round two shuffles over the (contracting) edge
    set. Each round's edge frame is EAGERLY localCheckpoint-ed: without
    lineage truncation the logical plan nests the whole previous round
    (unions + joins), growing exponentially with round count and OOM-ing
    the driver on plan transforms long before data size matters. (On a
    production cluster with flaky executors, point
    `spark.sparkContext.setCheckpointDir` at reliable storage and swap
    localCheckpoint for checkpoint — same shape, replicated storage.)
    """
    e0 = pairs.select(F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d"))
    edges = e0.union(e0.select(F.col("d").alias("s"), F.col("s").alias("d"))).where(
        F.col("s") != F.col("d")
    ).dropDuplicates(["s", "d"]).localCheckpoint()
    nodes = edges.select(F.col("s").alias("node")).distinct().localCheckpoint()

    prev = edges
    for _ in range(max_rounds):
        nxt = _star_round(_star_round(prev, large=True), large=False).localCheckpoint()
        # convergence: the edge set is a fixpoint of both stars
        changed = nxt.exceptAll(prev).limit(1).count() + prev.exceptAll(nxt).limit(1).count()
        prev = nxt
        if changed == 0:
            break
    # fixpoint edges form stars: every non-root points at its component
    # minimum. Roots (component minima) have no outgoing downhill edge.
    lab = prev.where(F.col("s") > F.col("d")).groupBy("s").agg(
        F.min("d").alias("component")
    ).select(F.col("s").alias("node"), "component")
    out = nodes.join(lab, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )
    return out


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """All rows of `df` + `component` (cluster id = smallest member id)
    + `is_canonical` (TRUE for the one row per cluster to keep).

    Rows in no pair are their own singleton cluster (canonical)."""
    cc = connected_components(pairs, src, dst)
    key = F.col(id_col).cast("long")
    out = df.join(cc, key == F.col("node"), "left").drop("node")
    return out.withColumn(
        "component", F.coalesce(F.col("component"), key)
    ).withColumn("is_canonical", (F.col("component") == key).cast("boolean"))
