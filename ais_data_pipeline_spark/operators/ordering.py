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
