"""Filter / predicate operators (reference P3-P8).

All return lazy filtered DataFrames; the predicates are plain Catalyst
expressions, so they push down to the Parquet scan (row-group stats) and
stay inside whole-stage codegen.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def all_horizontal(conditions: list[Column]) -> Column:
    """Boolean AND across a condition list (reference P7
    ``pl.all_horizontal``, notebooks/0_preprocessing.ipynb:3468)."""
    return reduce(operator.and_, conditions)


def any_horizontal(conditions: list[Column]) -> Column:
    """Boolean OR across a condition list (reference P7
    ``pl.any_horizontal``, notebooks/0_preprocessing.ipynb:3454)."""
    return reduce(operator.or_, conditions)


def filter_all(df: DataFrame, conditions: list[Column]) -> DataFrame:
    """Keep rows satisfying EVERY condition (reference P3)."""
    return df.filter(all_horizontal(conditions))


def filter_any(df: DataFrame, conditions: list[Column]) -> DataFrame:
    """Keep rows satisfying ANY condition — the quarantine select
    (reference P4, notebooks/0_preprocessing.ipynb:3447-3454)."""
    return df.filter(any_horizontal(conditions))


def in_range(col: str, lo, hi) -> Column:
    """Closed-interval range predicate (reference P5
    ``is_between(..., closed="both")``)."""
    return F.col(col).between(lo, hi)


def is_null(col: str) -> Column:
    """Reference P6."""
    return F.col(col).isNull()


def fits_int32_or_null(col: str) -> Column:
    """The reference's Int32-downcast admission predicate: value in
    [-2^31, 2^31-1] or null (reference notebooks/0_preprocessing
    .ipynb:3464-3468)."""
    return F.col(col).isNull() | F.col(col).between(-(2**31), 2**31 - 1)
