"""Count-Min sketch (Cormode & Muthukrishnan 2005) as a DataFrame
aggregation — the fixed-memory frequency sketch beside the engine's
HLL (approx_count_distinct) and Bloom-filter surfaces.

The sketch is a d x w counter grid: item -> d buckets (one per hash
row), estimate(item) = min over rows of the bucket counts — always an
over-estimate, with error <= 2N/w at probability 1 - (1/2)^d.

Spark-first shape: building the grid is ONE groupBy over (row,
bucket) — map-side partial aggregation collapses every partition to
<= d*w cells before the shuffle, so the network cost is the sketch
size (constant), not the data size. Grids from different partitions /
days / tables MERGE by cell-wise addition (the groupBy does exactly
that), which is the property that makes CMS work for incremental
100 TB ingestion.

Hashing is the engine's portable 60-bit md5-prefix hash (same trick
as simhash's md5_60), so an ANSI-SQL oracle can rebuild the identical
grid and estimates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_bucket(item: Column, row: int, w: int) -> Column:
    """Bucket of ``item`` in hash row ``row``: portable md5-prefix
    hash of 'row:item', mod w. Non-negative (hash is 60-bit)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), item.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return (h % w).cast("int")


def cms_build(df: DataFrame, item_col: str, d: int = 4, w: int = 256) -> DataFrame:
    """Build the d x w grid: (row, bucket, cnt). One explode to d rows
    per record, one partially-aggregated groupBy — output is <= d*w
    rows regardless of input size. NULL items are not countable items
    (the HLL convention, round-11 review): they previously minted
    phantom ``bucket=NULL`` cells that broke the per-row ``sum(cnt) ==
    N`` invariant while estimating 0 on the probe side."""
    if d < 1 or w < 1:
        raise ValueError("CMS needs d >= 1 hash rows and w >= 1 buckets")
    item = F.col(item_col)
    cells = df.filter(item.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _cms_bucket(item, r, w).alias("bucket")
                    )
                    for r in range(d)
                ]
            )
        ).alias("__c")
    )
    return cells.groupBy(
        F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    cms: DataFrame, candidates: DataFrame, item_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Point-query the sketch for each candidate item: join each of
    the item's d (row, bucket) cells against the grid, take the min.
    The candidate set is usually small (heavy-hitter verification) —
    it broadcasts; the grid is <= d*w rows and broadcasts too."""
    if d < 1 or w < 1:
        raise ValueError("CMS needs d >= 1 hash rows and w >= 1 buckets")
    item = F.col(item_col)
    # NULL candidates mirror the build-side rule: not countable items
    probes = candidates.filter(item.isNotNull()).select(
        item,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _cms_bucket(item, r, w).alias("bucket")
                    )
                    for r in range(d)
                ]
            )
        ).alias("__p"),
    ).select(item, F.col("__p.row").alias("row"), F.col("__p.bucket").alias("bucket"))
    # LEFT join: an EMPTY grid cell is a count of 0, not a missing row
    # — the inner join dropped empty buckets from the min (inflating
    # estimates) and lost all-empty candidates from the output
    # entirely (round-10 review)
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )


# ---------------------------------------------------------------------------
# Portable deterministic HyperLogLog (Flajolet et al. 2007) — register
# tables as DataFrames, mergeable by MAX, bit-identical cross-engine.
# ---------------------------------------------------------------------------

#: 2^HLL_P registers; 60-bit md5-prefix hash = 6 bucket bits + 54 rank bits.
HLL_P = 6
HLL_M = 1 << HLL_P


def hll_registers(
    df: DataFrame, item_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """HLL register table — (group..., bucket, M) with M = max rank —
    from one groupBy. The PARTIAL form of distinct counting: register
    tables built per partition / day / nation MERGE by max(M) per
    bucket (``hll_merge``), which is what lets a 100 TB ingest keep
    per-segment sketches and roll them up without re-scanning. Unlike
    ``approx_count_distinct`` (whose sketch never leaves the JVM
    aggregate), the registers here are a first-class DataFrame you can
    persist, ship, and merge.

    Hash is the portable 60-bit md5-prefix (same as CMS/simhash):
    bucket = h mod 2^p, rank = leading-zeros-in-54-bits(h div 2^p)+1,
    computed with exact integer/bin-length arithmetic — an ANSI-SQL
    oracle rebuilds identical registers.
    """
    # NULLs are not distinct values: count_distinct excludes them, and
    # a NULL row previously produced a (bucket=NULL, M=NULL) register
    # that biased the harmonic sum (round-10 review)
    df = df.filter(F.col(item_col).isNotNull())
    h = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    bucket = (h % HLL_M).alias("bucket")
    # h div 2^p via an exact bit shift — h is a 60-bit long, and the
    # float-division form (floor(h / m)) silently rounds h at the
    # long→double promotion above 2^53
    rest = F.shiftright(h, HLL_P)
    # rank = 54-bit leading zeros + 1 = 55 - bitlength(rest); rest=0 → 55
    rho = F.when(rest == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.bin(rest))
    )
    keys = [F.col(c) for c in (group_cols or [])] + [bucket]
    return df.select(*keys, rho.alias("__rho")).groupBy(
        *(group_cols or []), "bucket"
    ).agg(F.max("__rho").alias("M"))


def hll_merge(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables down to coarser groups: max(M) per
    (group..., bucket). Lossless — merging per-nation registers to a
    region equals building the region's registers directly."""
    return registers.groupBy(*group_cols, "bucket").agg(
        F.max("M").alias("M")
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Raw HLL estimate per group: alpha_m * m^2 / Σ 2^-M_j (empty
    buckets contribute 2^0 = 1). DETERMINISTIC cross-engine by EXACT
    integer arithmetic: the harmonic sum is computed scaled by 2^55 —
    each register contributes the exact long 2^(55-M), each empty
    bucket 2^55, the total fits a BIGINT (≤ 2^61) — so the only float
    ops are one cast and one constant-times-division at the end,
    identical IEEE steps in any engine and any aggregation order.
    No small-range (linear-counting) correction: it needs ln, which
    is 1-ulp non-portable cross-engine (same measured finding that
    shaped dsir_domain_scores); the raw estimate is the deterministic
    contract, documented here.

    Idempotently MERGES first (max M per group+bucket): feeding an
    unmerged UNION of segment register tables previously double-counted
    buckets, drove the empty-bucket term ``m - nb`` negative, and
    returned a silently NEGATIVE estimate (measured -55.98 for a
    true ~1000 — round-11 review); for already-merged registers the
    extra aggregate is a no-op on <= m rows per group.
    """
    registers = registers.groupBy(*group_cols, "bucket").agg(
        F.max("M").alias("M")
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(HLL_M)))
    # 2^(55-M) is a power of two ≤ 2^54: exact as double, exact as long
    term = F.pow(F.lit(2.0), (F.lit(55) - F.col("M")).cast("double")).cast(
        "long"
    )
    folded = registers.groupBy(*group_cols).agg(
        # coalesce: an EMPTY ungrouped register table must yield the
        # raw all-empty-bucket estimate, not hll_est=NULL (round-10)
        F.coalesce(F.sum(term), F.lit(0).cast("long")).alias("__s_present"),
        F.count(F.lit(1)).alias("__nb"),
    )
    s_scaled = F.col("__s_present") + (
        F.lit(HLL_M).cast("long") - F.col("__nb")
    ) * F.lit(1 << 55).cast("long")
    return folded.select(
        *group_cols,
        (
            alpha
            * F.lit(float(HLL_M * HLL_M))
            * F.lit(float(1 << 55))
            / s_scaled.cast("double")
        ).alias("hll_est"),
    )


# ---------------------------------------------------------------------------
# Portable Bloom filter (Bloom 1970) — bit words as a DataFrame, k=2
# md5-derived positions, exact cross-engine (63-bit words: DuckDB range-
# checks 1<<63, so bit 63 is never used).
# ---------------------------------------------------------------------------

#: 2^16 bit positions packed 63 per word → 1041 words ≈ 8 KiB.
BLOOM_BITS = 1 << 16
BLOOM_WORD = 63


def _bloom_positions(h: Column) -> list[Column]:
    """k=2 bit positions from the 60-bit portable hash: low 16 bits and
    the next 16 (exact shifts/mods only — no float division on the
    60-bit value)."""
    return [h % BLOOM_BITS, F.shiftright(h, 16) % BLOOM_BITS]


def bloom_build(df: DataFrame, hash_col: str) -> DataFrame:
    """Build the Bloom word table — (w, word) with ≤ ceil(2^16/63)
    rows — from a column of portable 60-bit hashes. ONE groupBy with a
    bit_or aggregate: partitions combine map-side, the shuffle carries
    at most the filter size, and word tables from different segments
    merge by the same bit_or (the CMS/HLL mergeability story, bitwise).
    The result is small enough to broadcast into any probe join.
    """
    h = F.col(hash_col)
    # a NULL hash is not a set member: it previously minted a junk
    # (w=NULL, word=NULL) row in the filter table (round-11 review)
    pos = df.filter(h.isNotNull()).select(
        F.explode(F.array(*_bloom_positions(h))).alias("__p")
    )
    return (
        pos.select(
            F.floor(F.col("__p") / BLOOM_WORD).cast("long").alias("w"),
            (F.col("__p") % BLOOM_WORD).cast("int").alias("__b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), __b))").alias("word"))
    )


def bloom_probe(df: DataFrame, hash_col: str, bloom: DataFrame) -> DataFrame:
    """Append a boolean ``bloom_pass`` to ``df``: True iff both bit
    positions of ``hash_col`` are set in the (broadcast) Bloom word
    table. No false negatives by construction; false positives at the
    classic (1 - e^{-kn/m})^k rate — measure it before trusting a
    prefilter, which is exactly what the registered query does."""
    h = F.col(hash_col)
    p1, p2 = _bloom_positions(h)
    probed = df.withColumn(
        "__w1", F.floor(p1 / BLOOM_WORD).cast("long")
    ).withColumn("__b1", (p1 % BLOOM_WORD).cast("int")).withColumn(
        "__w2", F.floor(p2 / BLOOM_WORD).cast("long")
    ).withColumn("__b2", (p2 % BLOOM_WORD).cast("int"))
    b1 = bloom.select(F.col("w").alias("__w1"), F.col("word").alias("__word1"))
    b2 = bloom.select(F.col("w").alias("__w2"), F.col("word").alias("__word2"))
    joined = probed.join(F.broadcast(b1), "__w1", "left").join(
        F.broadcast(b2), "__w2", "left"
    )
    pass_col = (
        F.coalesce(F.col("__word1"), F.lit(0)).bitwiseAND(
            F.expr("shiftleft(CAST(1 AS BIGINT), __b1)")
        )
        != 0
    ) & (
        F.coalesce(F.col("__word2"), F.lit(0)).bitwiseAND(
            F.expr("shiftleft(CAST(1 AS BIGINT), __b2)")
        )
        != 0
    )
    # a NULL hash previously leaked bloom_pass=NULL — a third state a
    # boolean column must not carry (downstream filter("bloom_pass")
    # and filter(~bloom_pass) BOTH dropped such rows); a NULL item is
    # definitively not in the set (round-11 review)
    pass_col = F.coalesce(pass_col, F.lit(False))
    return joined.withColumn("bloom_pass", pass_col).drop(
        "__w1", "__b1", "__w2", "__b2", "__word1", "__word2"
    )


# ---------------------------------------------------------------------------
# Mergeable equi-width histogram sketch — the distribution member of the
# sketch family (CMS = frequency, HLL = distinct, Bloom = membership).
# ---------------------------------------------------------------------------


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 1024,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-range equi-width histogram — (group..., bin, cnt) with at
    most ``n_bins`` rows per group — in one partially-aggregated
    groupBy. Histograms from different segments MERGE by adding bin
    counts (a groupBy-sum), and any quantile reads off the cumulative
    counts with worst-case value error (hi-lo)/n_bins — the trade a
    100 TB profiler makes: a fixed ~8 KiB summary per segment instead
    of a global sort. Bin logic is exact integer arithmetic over
    clamped values, so a SQL replica bins identically (values at bin
    edges included downward via floor; v = hi lands in the last bin).
    """
    if n_bins < 1 or not hi > lo:
        raise ValueError("histogram needs n_bins >= 1 and hi > lo")
    v = F.col(value_col).cast("double")
    span = (hi - lo) / n_bins
    raw = F.floor((v - F.lit(float(lo))) / F.lit(float(span))).cast("long")
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    return (
        # NULL/NaN values have no bin: greatest(NULL, 0) silently sent
        # them to bin 0, corrupting counts and every downstream
        # quantile (round-10 review)
        df.filter(v.isNotNull() & ~F.isnan(v))
        .select(*(group_cols or []), bin_.alias("bin"))
        .groupBy(*(group_cols or []), "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    quantiles: list[float],
    lo: float,
    hi: float,
    n_bins: int = 1024,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: for each p, the
    UPPER EDGE of the first bin whose cumulative count reaches
    ceil(p * n) — a percentile_disc-shaped rule on exact integers
    (rank threshold via integer ceil: (num + den - 1) DIV den), so
    the chosen bin is bit-portable; only the final edge arithmetic
    touches doubles, identically on both engines. One cumulative
    window over ≤ n_bins rows per group.
    """
    from pyspark.sql import Window

    span = (hi - lo) / n_bins
    if not quantiles:
        # empty list: an empty frame of the declared shape, not None
        return hist.select(
            *(group_cols or []),
            F.lit(0.0).alias("p"),
            F.lit(0.0).alias("q_est"),
        ).limit(0)
    w = (
        Window.partitionBy(*(group_cols or []))
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("__cum", F.sum("cnt").over(w)).withColumn(
        "__n", F.sum("cnt").over(Window.partitionBy(*(group_cols or [])))
    )
    out = None
    for p in quantiles:
        num, den = int(round(p * 1_000_000)), 1_000_000
        # cum >= ceil(n*num/den)  <=>  cum*den >= n*num (positive
        # integers) — the multiply-only form in DECIMAL(38,0) cannot
        # wrap, where __n * 1e6 overflowed BIGINT past ~9.2e12 rows
        # per group and passed EVERY bin (round-10 review); same
        # chosen bin bit-for-bit at any size
        hit = (
            cum.filter(
                F.col("__cum").cast("decimal(38,0)") * F.lit(den)
                >= F.col("__n").cast("decimal(38,0)") * F.lit(num)
            )
            .groupBy(*(group_cols or []))
            .agg(F.min("bin").alias("__bin"))
            .select(
                *(group_cols or []),
                F.lit(p).alias("p"),
                (
                    F.lit(float(lo))
                    + (F.col("__bin") + F.lit(1)).cast("double") * F.lit(float(span))
                ).alias("q_est"),
            )
        )
        out = hit if out is None else out.unionAll(hit)
    return out


# ---------------------------------------------------------------------------
# Theta / KMV sketch (round 13): distinct-count SET EXPRESSIONS
# ---------------------------------------------------------------------------

#: hash domain of the portable 60-bit md5-prefix (shared with HLL/CMS)
THETA_DOMAIN = 1 << 60


def theta_hash(item: Column) -> Column:
    """The engine's portable 60-bit hash (md5-prefix, exact integer
    conversion) — an ANSI-SQL oracle recomputes it verbatim."""
    return F.conv(
        F.substring(F.md5(item.cast("string")), 1, 15), 16, 10
    ).cast("long")


def theta_sketch(df: DataFrame, item_col: str, k: int = 256) -> DataFrame:
    """KMV / theta sketch (Beyer et al. 2007 "On Synopses for Distinct-
    Value Estimation", the Apache DataSketches theta family): the ``k``
    smallest DISTINCT portable hashes of ``item_col``, as a ≤k-row
    DataFrame of ``h bigint``. Unlike HLL registers it supports SET
    EXPRESSIONS — intersection/difference cardinalities, the
    train/test-overlap and cross-source-dedup questions a corpus audit
    asks — because the retained hashes are a uniform sample of the
    distinct universe below the sketch's theta.

    Scale shape: an Arrow-batched per-partition partial pass keeps each
    batch's k smallest distinct hashes (numpy ``unique`` — sorted, so
    the merge is a slice), then the global k-smallest runs over ≤ k
    rows per batch — the full distinct set NEVER shuffles, unlike a
    ``count_distinct``. The result is partition-count independent: the
    k smallest distinct hashes of a union of per-partition k-smallest
    supersets are exactly the global k smallest."""
    import pandas as pd

    hashed = df.filter(F.col(item_col).isNotNull()).select(
        theta_hash(F.col(item_col)).alias("h")
    )

    def partial(batches):
        import numpy as np

        best = None
        for pdf in batches:
            u = np.unique(pdf["h"].to_numpy())
            best = (
                u[:k]
                if best is None
                else np.unique(np.concatenate([best, u]))[:k]
            )
        if best is not None and best.size:
            yield pd.DataFrame({"h": best})

    partials = hashed.mapInPandas(partial, "h bigint")
    return partials.distinct().orderBy("h").limit(k)


def theta_stats(sk: DataFrame, k: int = 256) -> DataFrame:
    """One-row (n, theta, est) from a sketch: exact ``n`` below ``k``
    (the sketch IS the distinct set), else the KMV unbiased estimator
    ``(k-1) * 2^60 / h_(k)``. The only float op is the final division
    of two exactly-representable doubles ((k-1)*2^60 has <= ~8+60
    significant bits but is a power-of-two multiple of a small int —
    exact; theta rounds once at the BIGINT→DOUBLE cast, identically in
    any IEEE engine), so the estimate is bit-identical cross-engine."""
    return sk.agg(
        F.count("h").alias("n"), F.max("h").alias("theta")
    ).select(
        "n",
        "theta",
        F.when(F.col("n") < k, F.col("n").cast("double"))
        .otherwise(
            F.lit(float((k - 1) * THETA_DOMAIN)) / F.col("theta").cast("double")
        )
        .alias("est"),
    )


def theta_intersect_estimate(
    ska: DataFrame, skb: DataFrame, k: int = 256
) -> DataFrame:
    """One-row (n_common, theta, est) intersection-cardinality estimate
    of two sketches built with the same ``k``: every retained hash is a
    uniform sample of the distinct universe below its sketch's theta,
    so the hashes retained by BOTH sketches estimate the overlap at
    rate theta_min / 2^60. ``theta`` is 2^60 (exact regime) when both
    sketches are under-full; the join result is automatically below
    both sketch bounds, so no re-filter is needed."""
    sa = ska.agg(F.count("h").alias("na"), F.max("h").alias("ta"))
    sb = skb.agg(F.count("h").alias("nb"), F.max("h").alias("tb"))
    # both sides are <= k rows; broadcast so the probe never shuffles
    common = ska.join(F.broadcast(skb), "h").agg(
        F.count("h").alias("n_common")
    )
    theta = (
        F.when(
            (F.col("na") < k) & (F.col("nb") < k), F.lit(THETA_DOMAIN)
        )
        .when(F.col("na") < k, F.col("tb"))
        .when(F.col("nb") < k, F.col("ta"))
        .otherwise(F.least("ta", "tb"))
    )
    return (
        common.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .select(
            "n_common",
            theta.alias("theta"),
            (
                F.col("n_common").cast("double")
                * F.lit(float(THETA_DOMAIN))
                / theta.cast("double")
            ).alias("est"),
        )
    )


def theta_difference_estimate(
    ska: DataFrame, skb: DataFrame, k: int = 256
) -> DataFrame:
    """One-row (n_diff, theta, est) difference-cardinality estimate
    |A \\ B| of two same-``k`` sketches (round 14 — completes the
    theta set algebra as a DIRECT estimator rather than
    inclusion-exclusion): A's retained hashes at or below theta_min
    are a uniform sample of A's distinct universe at rate
    theta_min / 2^60, and B retains EVERY distinct hash below its own
    (>= theta_min) bound, so a sampled hash absent from B is genuine
    non-membership (up to ~2^-60 hash collisions). The anti-join
    count therefore estimates |A \\ B| at the sample rate — and
    degrades to the EXACT difference when both inputs are under-full
    (theta_min = 2^60). Both sides are <= k rows; the anti-join
    broadcasts."""
    sa = ska.agg(F.count("h").alias("na"), F.max("h").alias("ta"))
    sb = skb.agg(F.count("h").alias("nb"), F.max("h").alias("tb"))
    bounds = sa.crossJoin(F.broadcast(sb)).select(
        F.when((F.col("na") < k) & (F.col("nb") < k), F.lit(THETA_DOMAIN))
        .when(F.col("na") < k, F.col("tb"))
        .when(F.col("nb") < k, F.col("ta"))
        .otherwise(F.least("ta", "tb"))
        .alias("theta_min")
    )
    sampled = (
        ska.crossJoin(F.broadcast(bounds))
        .filter(F.col("h") <= F.col("theta_min"))
        .join(F.broadcast(skb), "h", "left_anti")
    )
    agg = sampled.agg(F.count("h").alias("n_diff"))
    return agg.crossJoin(F.broadcast(bounds)).select(
        "n_diff",
        F.col("theta_min").alias("theta"),
        (
            F.col("n_diff").cast("double")
            * F.lit(float(THETA_DOMAIN))
            / F.col("theta_min").cast("double")
        ).alias("est"),
    )


def theta_union_estimate(
    ska: DataFrame, skb: DataFrame, k: int = 256
) -> DataFrame:
    """One-row (n_retained, theta, est) union-cardinality estimate of
    two same-``k`` sketches. The union's candidate set is the distinct
    merge filtered below theta_min (entries above the tighter sketch's
    bound are not a uniform sample of the union); if k survive, the
    estimator re-tightens to the k-th smallest ((k-1)*2^60/h_(k)),
    else it is n'*2^60/theta_min — which degrades to the EXACT count
    when both inputs were under-full (theta_min = 2^60). Together with
    ``theta_intersect_estimate`` this closes the set algebra:
    difference(A, B) = est(A) - est_intersection, all from two k-row
    sketches."""
    sa = ska.agg(F.count("h").alias("na"), F.max("h").alias("ta"))
    sb = skb.agg(F.count("h").alias("nb"), F.max("h").alias("tb"))
    bounds = sa.crossJoin(F.broadcast(sb)).select(
        F.when((F.col("na") < k) & (F.col("nb") < k), F.lit(THETA_DOMAIN))
        .when(F.col("na") < k, F.col("tb"))
        .when(F.col("nb") < k, F.col("ta"))
        .otherwise(F.least("ta", "tb"))
        .alias("theta_min")
    )
    merged = (
        ska.unionByName(skb)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("h") <= F.col("theta_min"))
        .orderBy("h")
        .limit(k)
    )
    agg = merged.agg(
        F.count("h").alias("n_retained"), F.max("h").alias("hk")
    )
    return agg.crossJoin(F.broadcast(bounds)).select(
        "n_retained",
        F.when(F.col("n_retained") < k, F.col("theta_min"))
        .otherwise(F.col("hk"))
        .alias("theta"),
        F.when(
            F.col("n_retained") < k,
            F.col("n_retained").cast("double")
            * F.lit(float(THETA_DOMAIN))
            / F.col("theta_min").cast("double"),
        )
        .otherwise(
            F.lit(float((k - 1) * THETA_DOMAIN)) / F.col("hk").cast("double")
        )
        .alias("est"),
    )
