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
