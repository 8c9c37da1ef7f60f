"""Aggregation operators (reference A1-A6) plus the grouped layer the
reference lacks (SURVEY §2.5 "Absent": Spark built-ins, exposed here).

The per-column profiling aggregates deliberately batch EVERY column into
ONE ``agg`` so the whole profile is a single partial+final aggregation
pass over the data — one scan, no shuffle beyond the final combine,
exactly how a 100 TB profile must run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F


def row_count(df: DataFrame) -> int:
    """Reference A1."""
    return df.count()


def distinct_ratios(df: DataFrame, columns: list[str], approx: bool = False) -> dict[str, float]:
    """Distinct-count / row-count per column, all in one aggregation
    (reference A2, notebooks/preprocessing_with_polars.ipynb:1858-1862).

    ``approx=True`` swaps in HyperLogLog (``approx_count_distinct``) —
    the right call at 100 TB since the consumer is a 0.1/0.01 threshold
    rule that tolerates approximation (SURVEY §2.5 A2).
    """
    cd = F.approx_count_distinct if approx else F.count_distinct
    aggs = [cd(F.col(c)).alias(f"{c}__nd") for c in columns]
    aggs.append(F.count(F.lit(1)).alias("__n"))
    row = df.agg(*aggs).first()
    n = row["__n"] or 1
    return {c: row[f"{c}__nd"] / n for c in columns}


def min_max(df: DataFrame, columns: list[str]) -> dict[str, tuple]:
    """Min+max for every column in one batched agg (reference A3,
    notebooks/0_preprocessing.ipynb:3385-3390)."""
    aggs = []
    for c in columns:
        aggs.append(F.min(F.col(c)).alias(f"{c}__min"))
        aggs.append(F.max(F.col(c)).alias(f"{c}__max"))
    row = df.agg(*aggs).first()
    return {c: (row[f"{c}__min"], row[f"{c}__max"]) for c in columns}


def null_counts(df: DataFrame, columns: list[str] | None = None) -> dict[str, int]:
    """Null count per column, one pass (profiling support for the
    downcast ladder's null-flag inputs, reference T6)."""
    columns = columns or df.columns
    aggs = [F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in columns]
    row = df.agg(*aggs).first()
    return row.asDict()


def count_matching(df: DataFrame, predicate: Column) -> int:
    """Reference A6: ``filter(...).count()``."""
    return df.filter(predicate).count()


def column_sum(df: DataFrame, column: str):
    """Reference A4."""
    return df.agg(F.sum(column).alias("s")).first()["s"]


def column_max(df: DataFrame, column: str):
    """Reference A5."""
    return df.agg(F.max(column).alias("m")).first()["m"]


def grouped(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    """Grouped aggregation — map-side partial agg + one shuffle on the
    keys; the workhorse the reference never had."""
    return df.groupBy(*keys).agg(*aggs)


def salted_grouped(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    buckets: int = 16,
    count_alias: str = "n",
) -> DataFrame:
    """Skew-resistant grouped count+sum: phase 1 aggregates on
    (keys, random salt) so one hot key spreads over ``buckets``
    reducers; phase 2 merges the partials on the true keys.

    The merge input is |keys|×buckets rows — negligible — so the
    expensive shuffle is the salted one, which is balanced by
    construction. Sum columns must be exact types (decimal/int): the
    two-phase reassociation reorders additions, which only equals the
    single-phase result for associative exact arithmetic, not doubles.
    """
    salt = (F.rand(seed=7) * buckets).cast("int")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__pn"),
            *[F.sum(c).alias(f"__ps_{a}") for c, a in sum_cols.items()],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__pn").alias(count_alias),
        *[F.sum(f"__ps_{a}").alias(a) for a in sum_cols.values()],
    )


def profile_summary(df: DataFrame, sample_rows: int = 50_000) -> Row:
    """One-pass dataset profile over a bounded sample (reference M4's
    sampling idea without the head() ordering bias — SURVEY §2.6 note)."""
    return df.limit(sample_rows).agg(
        F.count(F.lit(1)).alias("rows"),
        *[F.approx_count_distinct(c).alias(f"{c}__nd") for c in df.columns],
    ).first()


def zscore_per_group(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    out_col: str = "zscore",
) -> DataFrame:
    """Per-group z-score via applyInPandas (grouped-map Pandas API):
    each group arrives as one pandas DataFrame, normalized with ddof=0.

    The JVM-window equivalent is cheaper for plain z-scores; this is
    the template for grouped transforms that need real Python (sklearn
    scalers, per-group model scoring). One shuffle on the keys, groups
    must fit executor memory — salt or pre-aggregate beyond that.
    """
    import pandas as pd

    out_fields = df.schema.fields
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    schema += f", {out_col} double"

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        std = v.std(ddof=0)
        pdf[out_col] = (v - v.mean()) / std if std > 0 else 0.0
        return pdf

    return df.groupBy(*key_cols).applyInPandas(normalize, schema)


def profile_stats(
    df: DataFrame,
    ratio_cols: list[str],
    range_cols: list[str],
    approx: bool = False,
) -> tuple[dict[str, float], dict[str, tuple]]:
    """Distinct ratios AND min/max ranges in ONE batched aggregation —
    the fused form of ``distinct_ratios`` + ``min_max`` for callers
    needing both (the tightening planner): one pass over the input
    instead of two, which at 100 TB halves the profiling scan cost
    (and over a cached frame halves the cache traversals)."""
    cd = F.approx_count_distinct if approx else F.count_distinct
    aggs = [cd(F.col(c)).alias(f"{c}__nd") for c in ratio_cols]
    aggs.append(F.count(F.lit(1)).alias("__n"))
    for c in range_cols:
        aggs.append(F.min(F.col(c)).alias(f"{c}__min"))
        aggs.append(F.max(F.col(c)).alias(f"{c}__max"))
    row = df.agg(*aggs).first()
    n = row["__n"] or 1
    ratios = {c: row[f"{c}__nd"] / n for c in ratio_cols}
    ranges = {c: (row[f"{c}__min"], row[f"{c}__max"]) for c in range_cols}
    return ratios, ranges
