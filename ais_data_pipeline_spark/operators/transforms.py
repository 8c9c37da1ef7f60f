"""Column transforms / scalar functions (reference T1-T8).

Everything is a built-in-functions projection — JVM-side, codegen'd, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_date_lenient(df: DataFrame, columns: list[str], fmt: str | None = None) -> DataFrame:
    """String→Date with unparseable → null (reference T1,
    ``str.strptime(pl.Date, strict=False)``, notebooks/
    preprocessing_with_polars.ipynb:1490-1494). Under the engine's
    non-ANSI session ``to_date`` already nulls on failure; ``try_to_date``
    semantics would be the ANSI-safe spelling."""
    out = df
    for c in columns:
        out = out.withColumn(c, F.to_date(F.col(c), fmt) if fmt else F.to_date(F.col(c)))
    return out


def cast_columns(df: DataFrame, casts: dict[str, T.DataType | str]) -> DataFrame:
    """Plain casts (reference T5); lenient under non-ANSI session."""
    return df.withColumns({c: F.col(c).cast(t) for c, t in casts.items()})


def categorical_cast(df: DataFrame, columns: list[str]) -> DataFrame:
    """Reference T2/T3: dictionary-encode low-cardinality columns.

    Spark has no runtime Categorical type (SURVEY §1.2): the logical
    type stays StringType and the physical win comes free from Parquet
    dictionary pages + Tungsten. Numeric inputs are stringified first
    (the reference's 2-step int→string→categorical, notebooks/
    preprocessing_with_polars.ipynb:2845-2849). For the explicit
    dictionary-normalization rewrite see operators.dictionary.
    """
    return df.withColumns({c: F.col(c).cast("string") for c in columns})


def ranged_downcast(col: str, target: T.DataType, lo: int, hi: int) -> Column:
    """Reference T4: ``when(in-range OR null) cast(target) otherwise
    null`` — out-of-range becomes null instead of erroring (reference
    notebooks/0_preprocessing.ipynb:3414-3419)."""
    c = F.col(col)
    return (
        F.when(c.isNull() | c.between(lo, hi), c.cast(target))
        .otherwise(F.lit(None).cast(target))
        .alias(col)
    )


def with_derived(df: DataFrame, exprs: dict[str, Column]) -> DataFrame:
    """Reference T7: add derived arithmetic columns in one projection."""
    return df.withColumns(exprs)


def snapshot_diff(old, new, keys: list[str], compare_cols: list[str] | None = None):
    """Change-data-capture diff between two table snapshots: full outer
    join on the key, classify each key as added / removed / changed
    (any compared column differs, null-safely) — unchanged rows drop.
    The ETL regression-diff and incremental-sync primitive; one
    co-partitioned shuffle on the key, no collect.
    """
    from pyspark.sql import functions as F

    compare_cols = compare_cols or [c for c in old.columns if c not in keys]
    # presence must be judged on the join sides, not a nullable value
    # column — use a sentinel from each side
    o = old.select(*keys, F.lit(1).alias("__old"), *[F.col(c).alias(f"old_{c}") for c in compare_cols])
    n = new.select(*keys, F.lit(1).alias("__new"), *[F.col(c).alias(f"new_{c}") for c in compare_cols])
    j = o.join(n, keys, "full_outer")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__old").isNull(), F.lit("added"))
        .when(F.col("__new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type") != "unchanged")
        .select(*keys, "change_type")
    )
