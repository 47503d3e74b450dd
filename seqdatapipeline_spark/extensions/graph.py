"""Graph analytics over edge-list DataFrames.

The reference's batch-routing dictionary (pipelineParser.py:89-103)
is the closest it gets to a graph — grouped job lists keyed by a
composite key. At corpus scale the interesting graphs are implicit:
items co-ordered in the same basket, documents sharing near-dup
buckets, users sharing sessions. This module gives those edge lists
first-class iterative algorithms with the join-based sparse-matvec
shape that survives 100 TB:

- every PageRank round is ONE equi-join (ranks ⋈ edges on src) plus
  one map-side-combinable groupBy(dst) — the standard Pregel-style
  contraction expressed declaratively so AQE can re-plan each round;
- both sides are hash-partitioned on the node key up front, so every
  round reuses the same exchange instead of re-shuffling;
- the node count is the only scalar that ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import fan_out


def co_occurrence_edges(
    facts: DataFrame,
    group_col: str,
    item_col: str,
    max_group: int = 64,
) -> DataFrame:
    """Undirected item-item edges: two items are linked when they
    appear in the same group (parts in one order, docs in one
    bucket). Pairs are generated INSIDE each group after a
    collect_set bounded by `max_group` — a q-item group emits q·(q-1)
    directed edges, and groups above the bound are dropped the same
    way dedup drops degenerate LSH mega-buckets (a group that large
    links everything to everything and carries no signal). The fact
    table is never self-joined."""
    items = (
        facts.groupBy(group_col)
        .agg(F.collect_set(F.col(item_col)).alias("__items"))
        .filter(F.size("__items").between(2, max_group))
    )
    a = F.explode(F.col("__items")).alias("src")
    pairs = items.select(a, F.col("__items")).select(
        F.col("src"), F.explode(F.col("__items")).alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    return pairs.distinct()


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    normalize: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list, `iters` synchronous rounds.

    Each round: contrib = ranks ⋈ edges (equi-join on src, both sides
    pre-partitioned on the node key so the sort-merge exchange is
    planned once and reused) → groupBy(dst).sum (map-side partial
    agg) → left-join back onto the node set for the damping update.
    No driver-side state except the node COUNT (one scalar); ranks
    stay distributed end to end. With a bounded iteration count the
    lineage stays shallow enough that no checkpoint is needed — an
    unbounded convergence loop would truncate lineage per round like
    extensions.dedup.connected_components does.

    Nodes with no out-edges (dangling) keep redistributing only the
    teleport mass — callers building from undirected co-occurrence
    edges have none by construction."""
    spark = edges.sparkSession
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = fan_out(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    out = e.join(deg, "src").repartition(shuffle, "src").cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(shuffle, "node")
        .cache()
    )
    n = nodes.count()  # the one driver scalar
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            out.join(ranks, out["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("__deg")).alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(teleport) + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))).alias("rank"),
        )
    if normalize:
        # Mean-1 normalization (rank · N): keeps the output resolution
        # independent of graph size — raw ranks are O(1/N) and would
        # vanish under fixed-precision rounding on large graphs.
        ranks = ranks.select("node", (F.col("rank") * F.lit(float(n))).alias("rank"))
    return ranks


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node in/out degree in ONE pass: each edge explodes into its
    two endpoint rows tagged (out, in), then a single
    map-side-combinable groupBy(node) sums the tags — the edge list
    (often itself derived) is never scanned twice, and no outer merge
    of two aggregates is needed."""
    both = edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("node"), F.lit(1).alias("o"), F.lit(0).alias("i")),
                F.struct(F.col(dst).alias("node"), F.lit(0).alias("o"), F.lit(1).alias("i")),
            )
        ).alias("e")
    ).select("e.*")
    return both.groupBy("node").agg(
        F.sum("o").cast("long").alias("out_deg"),
        F.sum("i").cast("long").alias("in_deg"),
    )
