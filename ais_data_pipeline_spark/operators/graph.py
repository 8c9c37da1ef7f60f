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
from ais_data_pipeline_spark.checkpointing import materialize


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

    Returns (node, pr) with full-precision ranks; round at output.

    Iterative-lineage truncation: without it, iteration i's plan embeds
    every previous iteration, so the edge build (often a pairs
    self-join + distinct) re-executes O(iters) times and plan size
    doubles per round — a scale-killer at real iteration counts. Each
    round therefore ``localCheckpoint``s the INCOMING ranks (eager), and
    the loop-invariant frames (edges, outdegrees, node set) checkpoint
    once up front so the edge build runs exactly once. The LAST
    iteration's lineage stays live, so the returned plan is exactly one
    iteration (join + partial-agg) over checkpointed inputs — constant
    in ``iters``, and plan-auditable. localCheckpoint blocks are
    reclaimed by Spark's ContextCleaner when the frames are
    garbage-collected — no persist leak across a long query sweep.

    Reliability caveat (applies to every lineage-truncating operator
    in this repo — also dedup.near_dup_clusters, ir.bm25_topk /
    inverted_index, the curation pipeline): the default local
    checkpoint stores UNREPLICATED executor-local blocks with the
    lineage cut, so on a multi-executor cluster losing an executor
    mid-job makes the frames unrecoverable and fails the job. For
    fault-tolerant cluster runs, call
    ``checkpointing.set_reliable_checkpoints(spark, dir)`` once at job
    start (dir on HDFS/object store): every truncation site in the
    package switches to reliable ``.checkpoint(eager=True)`` — same
    semantics, survives executor loss, at the cost of a write per
    round. local[] and short-lived jobs keep the cheap default."""
    # an edge with a NULL endpoint is not an edge: it previously kept
    # its slot in the source's outdegree (destroying that share of the
    # rank mass) and minted a phantom NULL node in the output
    # (round-11 review)
    e = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .filter(F.col("__s").isNotNull() & F.col("__d").isNotNull())
        .transform(materialize)
    )
    # outdegree is loop-invariant — attach it to the edge list ONCE so
    # every iteration is a single ranks⋈edges join instead of two
    # (identical arithmetic: pr/__outdeg on the same values). r18: a
    # count() window over __s instead of groupBy+self-join — the same
    # per-source count from ONE exchange of the edge list instead of
    # two plus a join (guide §2.4; measured 2.6 s -> 1.3 s at sf0.1).
    from pyspark.sql import Window

    e_deg = (
        e.withColumn(
            "__outdeg", F.count(F.lit(1)).over(Window.partitionBy("__s"))
        )
        .transform(materialize)
    )
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionAll(e.select(F.col("__d").alias("node")))
        .distinct()
        .transform(materialize)
    )
    ranks = nodes.select("node", F.lit(1.0).alias("pr"))
    for i in range(iters):
        if i > 0:
            ranks = ranks.transform(materialize)
        contribs = (
            ranks.join(e_deg, ranks.node == F.col("__s"))
            .select(
                F.col("__d").alias("node"),
                (F.col("pr") / F.col("__outdeg")).cast("decimal(38,18)").alias("__c"),
            )
        )
        sums = contribs.groupBy("node").agg(F.sum("__c").cast("double").alias("__in"))
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("pr"),
            )
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
    # r18: hint the pair self-join to shuffled-hash — a sort-merge join
    # pays two full sorts of the fact table for an equi-join whose
    # partitions are order-sized by construction (guide §3.1; measured
    # 3.0 s -> 1.0 s at sf0.1). AQE skew handling still applies.
    return (
        a.join(b.hint("shuffle_hash"), "__g")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def weighted_cooccurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_weight: int = 1,
) -> DataFrame:
    """Canonical (src < dst) undirected edges weighted by the number of
    distinct groups the pair shares, thresholded at ``min_weight`` —
    the standard sparsifier that turns a dense co-occurrence graph
    into an analyzable one. Pairs materialize per group (bounded by
    group size) and only (pair, group) keys shuffle."""
    a = df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("src"))
    b = df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("dst"))
    # shuffled-hash for the same reason as cooccurrence_edges (r18)
    return (
        a.join(b.hint("shuffle_hash"), "__g")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst", "__g")
        .distinct()
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
        .filter(F.col("weight") >= min_weight)
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over a canonical (src < dst) edge list
    — the compact-forward / degree-orientation algorithm (Latapy 2008;
    the shape MapReduce triangle counting uses):

    1. rank nodes by (degree, id) and re-orient every edge from the
       lower-ranked endpoint to the higher-ranked one;
    2. wedges: self-join oriented edges on the source — each node
       contributes C(outdeg, 2) candidate pairs, and orientation
       bounds outdeg by ~sqrt(|E|) even for hubs, which is what keeps
       the wedge count from going quadratic on skewed graphs (a hub
       with degree d has outdeg only toward higher-ranked nodes);
    3. close each wedge (b, c) against the oriented edge set.

    Each triangle is found exactly once; exploding its three corners
    gives per-node counts. Returns (node, n_triangles), nodes with
    ≥1 triangle only. Result is identical to the naive a<b<c id
    ordering — orientation changes the join sizes, not the answer.

    The edge list is referenced three times (degrees + two orientation
    joins) and the oriented list three times (both wedge sides + the
    closing probe); Catalyst does not CSE repeated DataFrame subtrees,
    so both materialize here via eager ``localCheckpoint`` — without it
    the upstream edge build (often a pairs self-join + distinct)
    executes up to five times. localCheckpoint over persist because the
    blocks are reclaimed by the ContextCleaner on GC — a query sweep
    calling this 150 times leaks no cache entries.

    The src < dst precondition is ENFORCED here, not assumed: one
    self-loop or duplicate edge silently manufactured phantom
    triangles (round-10 review — a lone (u, u) edge closed wedges
    against every real (u, x) edge)."""
    edges = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .transform(materialize)
    )
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient by (deg, id): lower -> higher; carry endpoint ranks inline
    e = (
        edges.join(deg.withColumnsRenamed({"node": "src", "deg": "ds"}), "src")
        .join(deg.withColumnsRenamed({"node": "dst", "deg": "dd"}), "dst")
        .select(
            F.when(
                (F.col("ds") < F.col("dd"))
                | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))),
                F.struct(
                    F.col("src").alias("u"), F.col("dst").alias("v"),
                    F.col("dd").alias("dv"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("dst").alias("u"), F.col("src").alias("v"),
                    F.col("ds").alias("dv"),
                )
            )
            .alias("__e")
        )
        .select("__e.u", "__e.v", "__e.dv")
        .transform(materialize)
    )
    w1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"), F.col("dv").alias("db"))
    w2 = e.select(F.col("u").alias("a"), F.col("v").alias("c"), F.col("dv").alias("dc"))
    wedges = w1.join(w2, "a").filter(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closing = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    tri = wedges.join(closing, ["b", "c"]).select("a", "b", "c")
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def star_connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC 2014) → (id, cluster_id), cluster_id = min
    member — the same contract as ``dedup.near_dup_clusters``.

    Why a second CC: min-label propagation needs O(diameter) rounds,
    so a path-shaped component of length 10^6 needs 10^6 shuffles.
    Star contraction halves structure every round — O(log n) rounds
    on ANY topology — which is the variant a 100 TB graph with long
    chains (web graphs, citation chains, transaction traces) needs.
    Near-dup graphs are dense/tiny (label propagation wins on
    constants); both are offered and equivalence-gated in pytest.

    Each round is two grouped-min + join stages on the node key;
    edges stay canonical (larger endpoint first), every intermediate
    materializes so round i's plan never embeds round i-1, and
    convergence (edge set stable) is checked with one anti-join +
    count per round.

    - large-star: every neighbor v > u links to m = min(Γ(u) ∪ {u})
    - small-star: every neighbor v < u (and u itself) links to
      m = min(Γ<(u) ∪ {u})
    """
    # node set BEFORE the self-loop filter: an id appearing only in
    # self-pairs is a legitimate singleton cluster, not a dropped row
    # (round-10 review — [(7, 7)] returned an empty result). A NULL id
    # is NOT a node: it previously surfaced as an (id=NULL,
    # cluster_id=NULL) output row (round-11 review); its non-null
    # partner keeps its singleton row through the node set.
    both = (
        pairs.select(F.col(a_col).alias("s"), F.col(b_col).alias("t"))
        .union(pairs.select(F.col(b_col).alias("s"), F.col(a_col).alias("t")))
        .filter(F.col("s").isNotNull())
    )
    # canonical (u, v): u = larger endpoint, v = smaller; self-loops
    # carry no connectivity and drop HERE (after the node set above)
    edges = (
        both.filter(F.col("s") != F.col("t"))
        .select(
            F.greatest("s", "t").alias("u"), F.least("s", "t").alias("v")
        )
        .distinct()
        .transform(materialize)
    )
    nodes = (
        both.select(F.col("s").alias("id")).distinct().transform(materialize)
    )
    for _round in range(max_iter):
        # large-star over the symmetric adjacency
        sym = edges.select(F.col("u").alias("a"), F.col("v").alias("b")).union(
            edges.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )
        mins = sym.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        large = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star on canonical edges (neighbors below u)
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, "u")
            .select(F.col("v").alias("child"), F.col("m"))
            .union(mins2.select(F.col("u").alias("child"), F.col("m")))
            .filter(F.col("child") != F.col("m"))
            .select(F.col("child").alias("u"), F.col("m").alias("v"))
            .distinct()
            .transform(materialize)
        )
        # convergence = set equality of two DISTINCT canonical edge
        # sets. r18: compare counts first (cheap jobs on materialized
        # frames — almost always unequal mid-contraction, skipping the
        # join entirely), and when equal ONE one-sided anti-join
        # suffices: |A| = |B| and A∖B = ∅ imply B∖A = ∅.
        stable = (
            small.count() == edges.count()
            and small.join(edges, ["u", "v"], "left_anti").limit(1).count() == 0
        )
        edges = small
        if stable:
            from ais_data_pipeline_spark.observability import log

            log("star_cc_converged", rounds=_round + 1)
            break
    else:
        # Mirror of dedup.near_dup_clusters' non-convergence contract:
        # the edge set never stabilized within max_iter, so the labels
        # below may be over-split. Star contraction needs O(log n)
        # rounds on any topology, so hitting this means max_iter was
        # set far below log2(|V|) (or max_iter=0) — surface it rather
        # than returning silently wrong components.
        from ais_data_pipeline_spark.observability import log

        log(
            "star_cc_not_converged",
            level="warning",
            max_iter=max_iter,
            hint="raise max_iter above log2(node count)",
        )
    roots = edges.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
    return nodes.join(roots, "id", "left").select(
        "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
    )


def bfs_hops(
    edges: DataFrame,
    source: int,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Breadth-first hop distances from ``source`` over an undirected
    edge list (canonical or symmetric — symmetrized inside) → (id,
    hops), nodes within ``max_hops`` only.

    The Pregel frontier shape as DataFrame rounds: each hop joins the
    CURRENT FRONTIER (not the full visited set) against the edge list,
    anti-joins out already-visited nodes, and materializes — so round
    h shuffles O(frontier_h x avg-degree) rows, lineage stays one
    round deep, and the loop exits early when a frontier comes back
    empty. Rounds = min(eccentricity, max_hops) — on small-world
    graphs this is single digits regardless of node count.
    """
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        # a NULL endpoint is not a node: a (x, NULL) edge previously
        # put an (id=NULL, hops=h) row into the visited set (r11 review)
        .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
        .distinct()
        .transform(materialize)
    )
    frontier = sym.sparkSession.range(1).select(
        F.lit(source).cast("long").alias("id"), F.lit(0).cast("long").alias("hops")
    )
    visited = frontier.transform(materialize)
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier.id == sym.s)
            .select(F.col("d").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .withColumn("hops", F.lit(h).cast("long"))
            .transform(materialize)
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.union(nxt).transform(materialize)
        frontier = nxt
    return visited
