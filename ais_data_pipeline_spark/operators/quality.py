"""Declarative data-quality checks (Deequ-lite): a check list compiles
into ONE batched aggregation pass over the table — never one scan per
check — and unpivots into a (check_name, n_violations, passed) report.

This is the constraint layer a training-data pipeline runs before
anything expensive: null contracts, range contracts, key uniqueness.
All counting happens map-side-partial; the report is a handful of rows
regardless of table size.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    # violation predicate: rows where it is TRUE violate the check
    violation: Column


def not_null(col: str) -> Check:
    return Check(f"{col}_not_null", F.col(col).isNull())


def in_range(col: str, lo: float, hi: float) -> Check:
    c = F.col(col)
    return Check(
        f"{col}_in_range",
        c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi)),
    )


def matches(col: str, pattern: str) -> Check:
    c = F.col(col)
    return Check(f"{col}_matches", c.isNull() | ~c.rlike(pattern))


def run_checks(df: DataFrame, checks: list[Check], unique_key: str | None = None) -> DataFrame:
    """Evaluate all checks in one aggregation; ``unique_key`` adds a
    duplicate-key check (count - distinct count) to the same pass.
    Returns (check_name, n_violations, passed) rows."""
    aggs = [
        F.count(F.when(c.violation, F.lit(1))).alias(c.name) for c in checks
    ]
    names = [c.name for c in checks]
    if unique_key is not None:
        aggs.append(
            (F.count(unique_key) - F.count_distinct(unique_key)).alias(
                f"{unique_key}_unique"
            )
        )
        names.append(f"{unique_key}_unique")
    row = df.agg(*aggs)
    stack = F.expr(
        "stack({n}, {pairs}) AS (check_name, n_violations)".format(
            n=len(names),
            pairs=", ".join(f"'{n}', {n}" for n in names),
        )
    )
    return row.select(stack).select(
        "check_name",
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )
