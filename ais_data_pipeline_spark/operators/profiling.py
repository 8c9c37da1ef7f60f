"""Profiling + type-tightening pass (SURVEY §4's one genuinely custom
engine component; reference §3.2 lifecycle).

The reference alternates plan mutation with sampled execution: estimate
in-memory size from a row sample (M4), measure per-column distinct
ratios and cast low-cardinality columns to categorical at thresholds
0.10 (strings) / 0.01 (numerics) (A2/T2/T3), measure min/max and
downcast integers with out-of-range rows quarantined (A3/T4-T6/P4/K4).

Spark-first shape: a driver-side planner that runs a handful of batched
aggregation actions (ONE agg per profile kind — single pass each) and
then emits ordinary DataFrame casts for Catalyst to execute. Zero custom
optimizer rules (SURVEY §4 conclusion). At 100 TB the distinct profile
uses HyperLogLog sketches and the sample estimator reads a bounded
number of rows — profiling cost is independent of table size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ais_data_pipeline_spark.functions.numeric import smallest_int_type
from ais_data_pipeline_spark.operators.aggregates import profile_stats
from ais_data_pipeline_spark.operators.filters import fits_int32_or_null

#: Reference thresholds (notebooks/preprocessing_with_polars.ipynb:1862,2726).
STRING_CATEGORICAL_THRESHOLD = 0.10
NUMERIC_CATEGORICAL_THRESHOLD = 0.01


def estimate_size(df: DataFrame, n_rows: int | None = None, sample_rows: int = 50_000) -> dict:
    """Sampled memory estimate (reference M4, ``estimate_size``,
    notebooks/preprocessing_with_polars.ipynb:296-356): pull k rows to
    pandas, measure deep memory per column, extrapolate to n_rows.

    Uses ``limit(k)`` like the reference (with its documented
    first-rows bias caveat); the Arrow path keeps the transfer cheap.
    Returns {column: est_total_bytes} plus totals.
    """
    if n_rows is None:
        n_rows = df.count()
    sample = df.limit(sample_rows).toPandas()
    k = max(len(sample), 1)
    mem = sample.memory_usage(deep=True, index=False)
    per_col = {c: int(mem[c] / k * n_rows) for c in sample.columns}
    total = sum(per_col.values())
    return {
        "n_rows": n_rows,
        "sample_rows": k,
        "per_column_bytes": per_col,
        "est_total_bytes": total,
        "est_total_mib": total / (1024 * 1024),
    }


@dataclass
class TighteningPlan:
    """The decisions the pass made — inspectable before application."""

    categorical_strings: list[str] = field(default_factory=list)
    categorical_numerics: list[str] = field(default_factory=list)
    downcasts: dict[str, T.DataType] = field(default_factory=dict)
    quarantine_columns: list[str] = field(default_factory=list)


def plan_tightening(
    df: DataFrame,
    string_threshold: float = STRING_CATEGORICAL_THRESHOLD,
    numeric_threshold: float = NUMERIC_CATEGORICAL_THRESHOLD,
    approx: bool = True,
) -> TighteningPlan:
    """Profile ``df`` and decide categorical/downcast treatment.

    ONE batched aggregation total: distinct ratios (string+integer
    columns) and integer min/max ranges fuse into a single agg
    (``aggregates.profile_stats``) — a single pass over the input
    where the reference runs one pass per profile kind.
    """
    string_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    int_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType, T.ByteType))
    ]
    plan = TighteningPlan()
    if not (string_cols or int_cols):
        return plan
    ratios, ranges = profile_stats(
        df, string_cols + int_cols, int_cols, approx=approx
    )
    for c in string_cols:
        if ratios.get(c, 1.0) <= string_threshold:
            plan.categorical_strings.append(c)

    if int_cols:
        for c in int_cols:
            lo, hi = ranges[c]
            target = smallest_int_type(lo, hi, allow_boolean=True)
            current = df.schema[c].dataType
            if _width(target) < _width(current):
                plan.downcasts[c] = target
            if isinstance(current, T.LongType) and (
                (lo is not None and lo < -(2**31)) or (hi is not None and hi > 2**31 - 1)
            ):
                plan.quarantine_columns.append(c)
            if ratios.get(c, 1.0) <= numeric_threshold and c not in plan.downcasts:
                plan.categorical_numerics.append(c)
    return plan


def _width(t: T.DataType) -> int:
    order = {T.BooleanType: 1, T.ByteType: 1, T.ShortType: 2, T.IntegerType: 4, T.LongType: 8}
    return order.get(type(t), 16)


def apply_tightening(df: DataFrame, plan: TighteningPlan) -> DataFrame:
    """Emit the casts the plan decided — one projection, no shuffle.

    Categorical columns stay StringType logically (numeric categoricals
    are stringified, reference T3); Parquet dictionary encoding supplies
    the physical win (SURVEY §1.2 Categorical row).
    """
    exprs = {}
    for c in plan.categorical_numerics:
        exprs[c] = F.col(c).cast("string")
    for c, t in plan.downcasts.items():
        exprs[c] = F.col(c).cast(t)
    return df.withColumns(exprs) if exprs else df


def int32_admission_predicate(columns: list[str]):
    """AND of per-column fits-int32-or-null predicates — the main-output
    admission rule whose complement is the quarantine set (reference
    notebooks/0_preprocessing.ipynb:3446-3468)."""
    from ais_data_pipeline_spark.operators.filters import all_horizontal

    return all_horizontal([fits_int32_or_null(c) for c in columns])
