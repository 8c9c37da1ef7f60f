"""Time-series subsequence similarity: find where a short query
pattern best matches inside each key's value series (UCR-suite /
Matrix-Profile family, the z-normalized Euclidean subsequence search).

Spark-first shape: for a query of length m, the sliding window at
offset o is the m ``lead()`` columns over (key, time-order) — so the
whole distance profile is ONE window specification and m codegen'd
arithmetic terms. No UDF, no per-series collect: the only data
movement is the one shuffle that orders each series by key, and the
profile computes streaming over ordered rows. This scales to any
number of series (they parallelize perfectly) and to long series
(nothing materializes per-series state beyond m lead values).

Z-normalization (subtract window mean, divide by window std) is what
makes the match amplitude/offset-invariant — the standard semantic in
subsequence search literature. Windows with zero variance (constant
runs) have no z-normal form and are excluded, as is every incomplete
tail window.

For patterns long enough that m lead terms stop being reasonable
(m in the hundreds), the scale path is the FFT-based MASS algorithm in
an ``applyInPandas`` per-series kernel — the Arrow-batch template for
that lives in ``operators/similarity.cosine_topk_pandas``; the window
formulation here is the better plan for the short-pattern case.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def znormalize(pattern: list[float]) -> list[float]:
    """Driver-side z-normalization of the query pattern (population
    std, matching the per-window normalization)."""
    m = len(pattern)
    if m == 0:
        raise ValueError("empty pattern")
    mu = sum(pattern) / m
    var = sum((x - mu) ** 2 for x in pattern) / m
    sd = math.sqrt(var)
    if sd == 0.0:
        raise ValueError("constant pattern has no z-normal form")
    return [(x - mu) / sd for x in pattern]


def subsequence_distance_profile(
    df: DataFrame,
    pattern: list[float],
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    round_digits: int = 4,
) -> DataFrame:
    """Per-(key, offset) z-normalized Euclidean distance between the
    query pattern and the value subsequence starting at that offset.

    Columns: key, ``offset`` (0-based position in the ordered series),
    ``dist`` (rounded). Incomplete and zero-variance windows drop.
    """
    m = len(pattern)
    qz = znormalize(pattern)
    w = Window.partitionBy(key_col).orderBy(*order_cols)

    leads = [F.lead(F.col(value_col).cast("double"), i).over(w) for i in range(m)]
    # explicit left-associated sums — the oracle writes the identical
    # chains, so both engines evaluate the same double-precision tree
    s1 = leads[0]
    for x in leads[1:]:
        s1 = s1 + x
    s2 = leads[0] * leads[0]
    for x in leads[1:]:
        s2 = s2 + x * x
    mu = s1 / F.lit(float(m))
    sd = F.sqrt(s2 / F.lit(float(m)) - mu * mu)

    d2 = (leads[0] - mu) / sd - F.lit(qz[0])
    d2 = d2 * d2
    for i in range(1, m):
        t = (leads[i] - mu) / sd - F.lit(qz[i])
        d2 = d2 + t * t
    dist = F.round(F.sqrt(d2), round_digits)

    return (
        df.select(
            F.col(key_col),
            (F.row_number().over(w) - 1).alias("offset"),
            leads[m - 1].alias("__complete"),
            sd.alias("__sd"),
            dist.alias("dist"),
        )
        .filter(F.col("__complete").isNotNull() & (F.col("__sd") > 0))
        .drop("__complete", "__sd")
    )


def best_subsequence_match(
    df: DataFrame,
    pattern: list[float],
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    round_digits: int = 4,
) -> DataFrame:
    """Best (lowest-distance, earliest-offset) pattern match per key —
    the per-series top-1 of the distance profile."""
    prof = subsequence_distance_profile(
        df, pattern, key_col, value_col, order_cols, round_digits
    )
    rank_w = Window.partitionBy(key_col).orderBy(F.asc("dist"), F.asc("offset"))
    return (
        prof.withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") == 1)
        .select(key_col, F.col("offset").alias("best_offset"), F.col("dist").alias("best_dist"))
    )


def subsequence_distance_profile_fft(
    df: DataFrame,
    pattern: list[float],
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    round_digits: int = 4,
) -> DataFrame:
    """MASS (Mueen's Algorithm for Similarity Search) distance profile:
    the long-pattern scale path. Per series, the sliding dot product
    q·window for ALL offsets comes from one FFT cross-correlation
    (O(n log n) instead of O(n·m)), and with a pre-z-normalized query
    the profile closes to d(o) = sqrt(2·(m − q_z·w_o / sd_o)).

    Same semantics as ``subsequence_distance_profile`` (population
    std, zero-variance and incomplete windows drop), so at matching
    ``round_digits`` the two kernels agree bit-for-bit after rounding
    (FFT error ~1e-9 relative ≪ 1e-4). Arrow-batched applyInPandas:
    each series is one group, the in-group work is numpy vector math
    — the kernel template for per-series scientific ops that window
    arithmetic can't express at reasonable plan size."""
    import numpy as np
    import pandas as pd

    m = len(pattern)
    qz = np.asarray(znormalize(pattern), dtype=np.float64)
    order = list(order_cols)

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        n = x.size
        if n < m:
            return pd.DataFrame({key_col: [], "offset": [], "dist": []})
        # NULL values arrive as NaN. The window kernel drops exactly
        # the windows CONTAINING a NULL; a raw NaN here instead
        # poisoned every cumsum entry after it AND the whole FFT dot
        # product (one NULL made the entire series emit dist=NaN or
        # vanish — round-11 review). Mask: zero-fill for the
        # arithmetic, count NaNs per window, drop those windows.
        nanmask = np.isnan(x)
        xc = np.where(nanmask, 0.0, x)
        cn = np.concatenate(([0], np.cumsum(nanmask.astype(np.int64))))
        nan_in_win = cn[m:] - cn[:-m]
        # sliding mean/std via cumulative sums (population std)
        c1 = np.concatenate(([0.0], np.cumsum(xc)))
        c2 = np.concatenate(([0.0], np.cumsum(xc * xc)))
        s1 = c1[m:] - c1[:-m]
        s2 = c2[m:] - c2[:-m]
        mu = s1 / m
        var = np.maximum(s2 / m - mu * mu, 0.0)
        sd = np.sqrt(var)
        # sliding dot product via FFT cross-correlation
        size = 1 << int(np.ceil(np.log2(n + m)))
        qt = np.fft.irfft(
            np.fft.rfft(xc, size) * np.fft.rfft(qz[::-1], size), size
        )[m - 1 : n]
        with np.errstate(divide="ignore", invalid="ignore"):
            d2 = 2.0 * (m - qt / sd)
        dist = np.sqrt(np.maximum(d2, 0.0))
        keep = (sd > 0) & (nan_in_win == 0)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].iloc[0],
                "offset": np.arange(n - m + 1)[keep],
                "dist": np.round(dist[keep], round_digits),
            }
        )

    out_schema = f"{key_col} long, offset int, dist double"
    series = df.select(key_col, *order, F.col(value_col).cast("double").alias(value_col))
    return series.groupBy(key_col).applyInPandas(profile, schema=out_schema)


def best_subsequence_match_fft(
    df: DataFrame,
    pattern: list[float],
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    round_digits: int = 4,
) -> DataFrame:
    """Best match per key from the FFT profile — same output contract
    as ``best_subsequence_match``."""
    prof = subsequence_distance_profile_fft(
        df, pattern, key_col, value_col, order_cols, round_digits
    )
    rank_w = Window.partitionBy(key_col).orderBy(F.asc("dist"), F.asc("offset"))
    return (
        prof.withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(key_col),
            F.col("offset").alias("best_offset"),
            F.col("dist").alias("best_dist"),
        )
    )


def locf_fill(
    df: DataFrame,
    value_col,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    out_col: str = "filled",
    check_skew: bool = False,
) -> DataFrame:
    """LOCF (last-observation-carried-forward) gap fill: NULLs in
    ``value_col`` (a column name or expression — e.g. one that first
    nulls out sentinel zeros) take the latest preceding non-null value
    per key — ``last(..., ignorenulls=True)`` over a running frame,
    one shuffle on the key. The standard sensor/feature imputation.

    ``check_skew=True`` runs the sampled hot-key probe first
    (``streaming.windows.check_window_key_skew``): the per-key running
    window needs the whole key in one task, so a hot key serializes —
    the probe emits the M1 warning record without changing results
    (round-10 verdict item 3: the guard convention, wired)."""
    from pyspark.sql import Window

    if check_skew:
        from ais_data_pipeline_spark.streaming.windows import (
            check_window_key_skew,
        )

        check_window_key_skew(df, key_col)
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return df.withColumn(out_col, F.last(v, ignorenulls=True).over(w))


def rolling_zscore_anomalies(
    df: DataFrame,
    value_col: str = "value",
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    lookback: int = 20,
    min_n: int = 10,
    threshold: float = 3.0,
    round_digits: int = 3,
    check_skew: bool = False,
) -> DataFrame:
    """Streaming-style anomaly detection over a batch table: flag rows
    whose value deviates more than ``threshold`` sample standard
    deviations from the trailing ``lookback``-row window (current row
    EXCLUDED — the model never sees the point it scores).

    One shuffle on the key; the frame is bounded so window state is
    O(lookback) per key. Determinism: the trailing sum and sum of
    squares accumulate as DECIMAL (associative — partition order can't
    perturb them) and the mean/variance/z arithmetic is the same
    double expression both engines evaluate; ``std == 0`` frames are
    skipped. NULL and NaN value rows occupy a frame slot but join
    neither the count nor the sums, and are never themselves flagged.
    Returns (key, order..., value, z).

    ``check_skew=True`` runs the sampled hot-key probe first (the
    trailing window still needs the whole key in one task; the bounded
    frame caps STATE, not task-input size)."""
    from pyspark.sql.window import Window

    if check_skew:
        from ais_data_pipeline_spark.streaming.windows import (
            check_window_key_skew,
        )

        check_window_key_skew(df, key_col)
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-lookback, -1)
    )
    v = F.col(value_col).cast("decimal(18,6)")
    # NaN is a non-value for the trailing stats, exactly like NULL: it
    # occupies a ROWS-frame slot but joins neither the count nor the
    # sums. The decimal cast already drops NaN from the sums (NaN →
    # NULL decimal); without this count guard a NaN row would inflate
    # n while contributing nothing to s, silently biasing the mean —
    # and the streaming scorer could never replicate that, because
    # Arrow→pandas renders NULL and NaN identically (round-12 review).
    is_float = dict(df.dtypes).get(value_col) in ("double", "float")
    counted = (
        F.when(~F.isnan(value_col), F.col(value_col)) if is_float else F.col(value_col)
    )
    n = F.count(counted).over(w)
    s = F.sum(v).over(w).cast("double")
    s2 = F.sum(v * v).over(w).cast("double")
    mean = s / n
    var = (s2 / n - mean * mean) * n / (n - 1)
    z = (F.col(value_col) - mean) / F.sqrt(var)
    # A NaN current row can't be scored (z would be NaN) — and Spark
    # orders NaN ABOVE every number, so abs(NaN) > threshold is TRUE
    # and an unguarded filter emits the NaN row as a z=NaN "anomaly"
    # (round-12 review).
    scoreable = (n >= min_n) & (var > 0)
    if is_float:
        scoreable = scoreable & ~F.isnan(value_col)
    out = df.select(
        key_col,
        *order_cols,
        value_col,
        F.when(scoreable, z).alias("__z"),
    )
    return (
        out.filter(F.abs(F.col("__z")) > threshold)
        .select(
            key_col,
            *order_cols,
            value_col,
            F.round(F.col("__z"), round_digits).alias("z"),
        )
    )


def funnel_stages(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: per user, the timestamp of the first
    ``stages[0]`` event, the first ``stages[1]`` event STRICTLY after
    it, the first ``stages[2]`` strictly after that, and so on — the
    product-analytics primitive (view → click → purchase) behind
    conversion/drop-off reporting.

    Spark-first shape: each stage time is a conditional ``min()``
    window over the user partition, and stage i's condition references
    stage i-1's window column — so the whole chain is ONE shuffle
    (every window shares the partitioning; Catalyst stacks the Window
    operators on a single Exchange) with a final same-key groupBy that
    reuses it. No joins, no per-user arrays, no Python: contrast with
    the SQL formulation, which chains one join per stage. Scales in
    users (partition key) and is insensitive to per-user event counts
    (windows stream; nothing per-user materializes).

    Returns one row per user that reached stage 0:
    (user, t_<stage0>, t_<stage1>, ... — nulls where the funnel was
    abandoned). Ties: strict ``>`` between stages, so a same-timestamp
    later-stage event does NOT advance the funnel (matches the
    min-after-min SQL semantics exactly).
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    if len(set(stages)) != len(stages):
        # a repeated stage name would silently overwrite its own
        # t_<stage> column and then break the final agg on ambiguity
        raise ValueError("funnel stages must be distinct")
    w = Window.partitionBy(user_col)
    out = df
    cols: list[str] = []
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if i > 0:
            prev = F.col(cols[-1])
            cond = cond & prev.isNotNull() & (F.col(ts_col) > prev)
        name = f"t_{stage}"
        out = out.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        cols.append(name)
    return (
        out.groupBy(user_col)
        .agg(*[F.max(c).alias(c) for c in cols])
        .filter(F.col(cols[0]).isNotNull())
    )
