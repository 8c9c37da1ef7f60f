"""Sorts / limits / top-k / sampling (reference O1-O5).

``top_k`` compiles to Catalyst's ``TakeOrderedAndProject`` — each
partition keeps only k rows, then the driver merges k×partitions; no
global sort materializes even at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def head(df: DataFrame, n: int) -> DataFrame:
    """Reference O1. Note the reference's own caveat: first-n is a
    biased sample (notebooks/preprocessing_with_polars.ipynb:330);
    prefer ``sample`` for statistics."""
    return df.limit(n)


def sort_desc(df: DataFrame, column: str) -> DataFrame:
    """Reference O2."""
    return df.orderBy(F.desc(column))


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Reference O3: sort + limit → TakeOrderedAndProject."""
    return df.orderBy(*order_by).limit(k)


def random_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Reference O4 (per-partition Bernoulli sample; no shuffle)."""
    return df.sample(fraction=fraction, seed=seed)


def first_row_dict(df: DataFrame) -> dict:
    """Reference O5: ``.row(0, named=True)``."""
    row = df.first()
    return row.asDict() if row is not None else {}


def hash_sample(df, id_col: str, keep_hex_lt: str = "1999"):
    """Deterministic, engine-portable sampling: keep rows whose
    md5(id)'s leading hex compares below a threshold — fraction =
    int(keep_hex_lt, 16) / 16^len. Unlike seeded RNG sampling (whose
    draw order is engine- and partitioning-dependent), the kept set is
    a pure function of the key: stable across engines, runs, and
    repartitioning — which is what makes samples reproducible and
    joinable (the same entity samples in or out everywhere). ~10% at
    the default '1999'/16^4."""
    from pyspark.sql import functions as F

    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, len(keep_hex_lt))
    return df.filter(h < keep_hex_lt)


def skyline_2d(
    df: DataFrame, x_col: str, y_col: str, id_col: str
) -> DataFrame:
    """2-D Pareto frontier, minimizing both columns: the points no
    other point weakly dominates (<= on both, < on at least one).

    The naive formulation is an O(n^2) dominance self-join; the
    scale-safe plan is one window pass — over distinct (x, y) sorted
    by (x asc, y asc), a point is on the frontier iff its y is
    strictly below the running minimum y of all preceding points
    (anything before it has x <= its x; equal (x, y) dedupes to the
    min-id representative first, so 'preceding' implies dominance).
    One shuffle to sort, streaming frontier test."""
    from pyspark.sql import Window

    x, y = F.col(x_col), F.col(y_col)
    distinct = df.groupBy(x_col, y_col).agg(F.min(id_col).alias(id_col))
    w = (
        Window.orderBy(x.asc(), y.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run_min = F.min(y).over(w)
    return (
        distinct.withColumn("__m", run_min)
        .filter(F.col("__m").isNull() | (y < F.col("__m")))
        .drop("__m")
    )


def weighted_hash_sample(
    df: DataFrame, weight_col: str, k: int, id_col: str, seed: int = 42
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis
    2006): each row draws u ~ Uniform(0,1) and the k rows with the
    largest u^(1/w) win — equivalently the largest ln(u)/w, the
    monotone form used here to avoid pow().

    u comes from the engine's portable md5-prefix hash of (seed, id),
    so the draw is deterministic, reproducible across engines, and
    embarrassingly parallel: the plan is one projection +
    TakeOrderedAndProject — no shuffle, no RNG state, and re-running
    on different partitionings picks the identical sample (unlike
    ``random_sample``, whose per-partition RNG is layout-dependent)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    # (h + 1) / (2^60 + 1) lands in (0, 1] exclusive of 0 — ln stays finite
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**60 + 1))
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.withColumn("__key", key)
        .orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__key")
    )
