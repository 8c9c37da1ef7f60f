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
