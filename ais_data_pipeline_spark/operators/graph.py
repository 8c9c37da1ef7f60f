"""Iterative graph algorithms as DataFrame plans (engine extension
layer; the reference has no graph surface — this generalizes the
label-propagation connected components already in operators/dedup.py).

PageRank here is the canonical distributed formulation (Brin & Page
1998; the Pregel/GraphX message-passing shape re-expressed as joins):
each iteration every node sends rank/outdeg along its out-edges and
new rank = (1-d) + d * Σ incoming. One join + one aggregation per
iteration, both shuffling on the node key — co-partitioned if the
edge list is pre-partitioned by src, which is how a 100 TB run would
lay the graph out (the rank table is |V| rows, edges |E|; neither
ever collects to the driver).

Determinism (oracle-replayable): contributions accumulate through
DECIMAL casts (associative — partition order can't change the sum),
the damping arithmetic is the same double expression both engines
evaluate, and the iteration count is a fixed constant. Ranks round
only at output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over an edge list. Nodes are every id appearing as
    ``src`` or ``dst``; a node with no out-edges contributes nothing
    (callers with dangling-mass semantics should pre-symmetrize or
    add self-loops — the co-occurrence graphs this engine builds are
    symmetric, so every node has outdeg >= 1).

    Returns (node, pr) with full-precision ranks; round at output."""
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__outdeg"))
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    ranks = nodes.select("node", F.lit(1.0).alias("pr"))
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    for _ in range(iters):
        contribs = (
            ranks.join(deg, ranks.node == F.col(src))
            .join(e, F.col("node") == F.col("__s"))
            .select(
                F.col("__d").alias("node"),
                (F.col("pr") / F.col("__outdeg")).cast("decimal(38,18)").alias("__c"),
            )
        )
        sums = contribs.groupBy("node").agg(F.sum("__c").cast("double").alias("__in"))
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
            ).alias("pr"),
        )
    return ranks


def cooccurrence_edges(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Symmetric co-occurrence edge list: (a, b) for every pair of
    distinct items sharing a group — the self-join shuffles on the
    group key and emits O(group_size^2) pairs per group, bounded by
    the natural group size (order line counts here)."""
    a = df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("src"))
    b = df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("dst"))
    return (
        a.join(b, "__g")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
