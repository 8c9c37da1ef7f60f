"""Corpus preparation for LLM training: chunking documents into
fixed-token windows and packing sequences into training bins — the two
operations between "clean text" and "batches on the trainer".

Both are pure DataFrame plans:

- ``chunk_documents`` — overlapping token-window chunks via one
  materialized token array + ``posexplode`` over the chunk index
  sequence. The token array is materialized in its OWN projection
  first: expressions referenced inside higher-order/generator lambdas
  re-evaluate per element, and a re-stated ``split`` would make
  chunking O(tokens²) per document (the round-1 HOF lesson).
- ``pack_sequences`` — greedy fixed-budget bin packing via a running
  token cumsum per shard: bin id = floor((cumsum - n_tokens)/budget).
  Packing is inherently sequential, so the distributed form shards
  first (documents within a shard pack together, shards parallelize);
  one window shuffle per shard, no driver loop. The trainer reads
  (shard, bin) groups as its batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ais_data_pipeline_spark.operators.text import tokens_col


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping token windows:
    chunk i covers tokens ``[i*stride, i*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; every token belongs to ≥1
    chunk and the count is ``max(1, ceil((n - overlap) / stride))``.
    Output: (id, chunk_index, chunk_text, n_tokens)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    # materialize the token array BEFORE any lambda references it
    toks = df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("__toks"))
    n = F.size("__toks")
    n_chunks = F.greatest(F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"))
    chunked = toks.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_index", "__i"),
        F.col("__toks"),
    )
    piece = F.slice(F.col("__toks"), F.col("chunk_index") * stride + 1, chunk_tokens)
    return chunked.select(
        F.col(id_col),
        "chunk_index",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 256,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to token-budget training bins by START OFFSET:
    within a shard (``id % n_shards``), documents pack in id order and
    ``bin_id = floor(start_offset / budget_tokens)`` where start_offset
    is the running token total before the document. Bins are bounded by
    the budget in start offsets only — a document that spans a boundary
    stays in the bin it starts in, so a bin's total can exceed
    ``budget_tokens`` (and an over-budget document shares its bin with
    the docs packed before it). Trainers that need strict per-bin caps
    should treat this as the shard/locality assignment and do the final
    greedy split within a bin. Output: (id, shard, bin_id, n_tokens)."""
    w = Window.partitionBy("shard").orderBy(id_col)
    sized = df.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).alias("shard"),
        F.size(tokens_col(F.col(text_col))).alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(w)
    return sized.select(
        F.col(id_col),
        "shard",
        F.floor((cum - F.col("n_tokens")) / F.lit(budget_tokens)).cast("bigint").alias("bin_id"),
        "n_tokens",
    )


def next_fit_bins(token_counts: list[int], budget_tokens: int) -> list[int]:
    """The pure next-fit fold behind ``pack_sequences_strict``: given
    per-document token counts in pack order, return each document's
    bin id. Bins are dense from 0; the current bin closes when adding
    a document would exceed the budget; an oversized document occupies
    a bin alone. Factored out so the invariants are property-testable
    without a Spark session."""
    bins: list[int] = []
    cur_bin, fill = 0, 0
    for n in token_counts:
        # negative counts (e.g. a size(NULL) = -1 that slipped past a
        # tokenizer) would let an oversized doc share a bin and break
        # the strict-cap invariant (round-10 review) — clamp to 0
        n = max(int(n), 0)
        if fill > 0 and fill + n > budget_tokens:
            cur_bin += 1
            fill = 0
        bins.append(cur_bin)
        fill += n
    return bins


def pack_sequences_strict(
    df: DataFrame,
    budget_tokens: int = 256,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy NEXT-FIT packing with a STRICT per-bin token cap — the
    variant trainers consume directly: within a shard (``id %
    n_shards``), documents pack in id order into the current bin until
    adding one would exceed ``budget_tokens``, which closes the bin and
    opens the next. Every bin's total is ≤ budget except a single
    oversized document, which occupies a bin alone (never truncated
    here — truncation is ``chunk_documents``'s job upstream;
    zero-token documents consume no budget and may share any bin).

    The bin id is a prefix-dependent fold (each assignment depends on
    the running fill, which RESETS at bin boundaries) — not expressible
    as a window cumsum (``pack_sequences``'s start-offset binning is
    the windowed approximation) and an ``F.aggregate`` fold would copy
    its output array per element (O(m²) per shard). So the scan runs
    as a per-shard Arrow batch (``applyInPandas``): O(m) per shard,
    shards are the parallelism unit — raise ``n_shards`` so per-shard
    document counts stay executor-sized at corpus scale. Deterministic:
    pure integer arithmetic over the id-sorted shard.
    Output: (id, shard, bin_id, n_tokens)."""
    import pandas as pd

    sized = df.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).alias("shard"),
        F.size(tokens_col(F.col(text_col))).alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins = next_fit_bins(list(pdf["n_tokens"]), budget_tokens)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["n_tokens"] = pdf["n_tokens"].astype("int32")
        return pdf[[id_col, "shard", "bin_id", "n_tokens"]]

    return sized.groupBy("shard").applyInPandas(
        pack, schema=f"{id_col} bigint, shard bigint, bin_id bigint, n_tokens int"
    )


def mixture_sample(
    df: DataFrame,
    k: int,
    alpha: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    redistribute: bool = False,
) -> DataFrame:
    """Temperature-weighted mixture sampling across sources — the data
    mixing step of a training pipeline: per-source quotas follow
    share^alpha (alpha < 1 upsamples small sources, alpha = 1 keeps
    natural proportions), quota_s = floor(k * w_s / Σw), and each
    source contributes its quota of documents ranked by the portable
    md5(seed, id) hash.

    Everything is a pure function of the key set: quotas come from
    exact counts, ranks from the same engine-portable hash
    ``hash_sample`` uses — re-running on any partitioning returns the
    identical sample, and the plan is one count aggregate (tiny,
    broadcast back) plus one rank window per source. NULL-source rows
    form their own group (the quota join is NULL-safe — a plain
    equi-join silently excluded that whole slice, round-10 review).

    Undershoot (round-10 review — the old docstring claimed
    '#sources-1'): floor() costs up to #sources-1 rows AND a quota
    larger than its source's size goes unfilled (share^alpha
    deliberately over-asks small sources), so the true bound is
    ``k - Σ min(quota_s, n_s)``. ``redistribute=True`` water-fills
    driver-side: surplus quota reflows to sources with remaining
    capacity, proportional to their weights, iterating until stable —
    deterministic (exact counts, tiny #sources loop), but NOT the
    plain share^alpha formula, hence opt-in. Returns (source, id)."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    if redistribute:
        rows = [
            (r[source_col], int(r["__n"])) for r in counts.collect()
        ]  # tiny by contract: one row per source
        w = {s: float(n) ** alpha for s, n in rows}
        cap = dict(rows)
        give = {s: 0 for s, _ in rows}
        remaining = k
        while remaining > 0:
            open_s = [s for s in give if give[s] < cap[s]]
            if not open_s:
                break
            tot = sum(w[s] for s in open_s)
            alloc = {
                s: min(int(remaining * w[s] / tot), cap[s] - give[s])
                for s in open_s
            }
            if all(v == 0 for v in alloc.values()):
                # floor() stalled: hand out singles in weight order
                for s in sorted(open_s, key=lambda x: (-w[x], str(x))):
                    if remaining == 0:
                        break
                    give[s] += 1
                    remaining -= 1
                continue
            for s, v in alloc.items():
                give[s] += v
                remaining -= v
        from ais_data_pipeline_spark.localrel import local_df

        quotas = local_df(
            counts.sparkSession,
            [(s, g) for s, g in give.items()],
            f"{source_col} string, __quota long",
        )
    else:
        w_all = Window.partitionBy()
        quotas = counts.select(
            source_col,
            F.floor(
                F.lit(float(k))
                * F.pow(F.col("__n").cast("double"), F.lit(alpha))
                / F.sum(F.pow(F.col("__n").cast("double"), F.lit(alpha))).over(w_all)
            ).alias("__quota"),
        )
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    rk = Window.partitionBy(source_col).orderBy(h, F.col(id_col))
    q = F.broadcast(quotas.withColumnRenamed(source_col, "__q_src"))
    return (
        df.join(q, F.col(source_col).eqNullSafe(F.col("__q_src")))
        .withColumn("__rk", F.row_number().over(rk))
        .filter(F.col("__rk") <= F.col("__quota"))
        .select(source_col, id_col)
    )


def stratified_sample(
    df: DataFrame,
    n_per_stratum: int,
    strata_col: str = "stratum",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Fixed-quota stratified sampling: exactly ``n_per_stratum`` rows
    from every stratum (fewer if the stratum is smaller), members
    picked by the engine-portable md5(seed, id) rank — the
    quality-balanced-subset primitive (sample N docs per quality
    decile / language / domain bucket) next to ``mixture_sample``'s
    proportional share^alpha quotas.

    Deterministic under any partitioning (pure function of the key
    set); plan is one rank window per stratum — a single shuffle on
    ``strata_col``, no quota table needed since the quota is a
    constant. Returns the sampled rows (all input columns).
    """
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    rk = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(rk))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def dataset_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """Deterministic train/val/test assignment: each row draws the
    engine-portable uniform u = md5(seed, id)-prefix / 2^60 and lands
    in train (u < train), val (u < train+val), else test.

    A pure function of the key — the assignment survives repartition,
    re-runs, and engine changes (the property that keeps eval sets
    stable across pipeline versions), and rows never move between
    splits when the corpus grows (unlike rank-based splitting, where
    inserting a document shifts every rank after it). Adds a
    ``split`` column; no shuffle.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**60 + 1))
    return df.withColumn(
        "split",
        F.when(u < train, "train").when(u < train + val, "val").otherwise("test"),
    )


def shard_col(id_col: str = "doc_id", n_shards: int = 8):
    """Engine-portable shard assignment: the first 15 hex digits of
    md5(id) as a non-negative 60-bit int, mod ``n_shards``. A pure
    function of the key — identical in Spark, DuckDB, and any engine
    with md5 (same portable-hash family as ``dataset_split`` /
    hash_sample), so shard membership survives re-runs, repartitions,
    and engine swaps."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    return (h % F.lit(n_shards)).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> None:
    """Deterministic global shuffle into training shards — the last
    step before a trainer consumes the corpus. Every row gets
    ``shard = md5_60(id) % n_shards`` and ``sort_key = md5(id)``; the
    table writes as ``shard=`` partition directories with rows sorted
    by ``sort_key`` inside each shard. Because both columns are pure
    functions of the id, the ENTIRE layout — which shard a document
    lands in and its position within the shard — is reproducible
    bit-for-bit across runs, engines, and cluster sizes, which is
    what makes training-data orders auditable (re-running the
    pipeline cannot silently reorder the stream a checkpoint-resumed
    training job reads).

    Scale shape: no global sort. One hash-partition shuffle
    (``repartition(n_shards, shard)``) plus a per-partition sort —
    each executor sorts only its own shard, the classic
    sort-within-partitions global-shuffle recipe. At 100 TB
    ``n_shards`` rises to O(cluster cores); the md5 order inside a
    shard is already pseudo-random, so consuming shards round-robin
    yields a well-mixed stream without ever materializing a total
    order."""
    out = df.withColumn("shard", shard_col(id_col, n_shards)).withColumn(
        "sort_key", F.md5(F.col(id_col).cast("string"))
    )
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "sort_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
