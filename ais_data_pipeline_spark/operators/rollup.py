"""Incremental rollup maintenance (continuous-aggregate / hypertable
pattern): keep a time-bucketed aggregate table up to date by merging a
small DELTA of new events into stored PARTIAL STATE, never re-scanning
the raw history.

The trick is storing algebraic (mergeable) partial aggregates — count,
decimal sum, min, max — instead of finalized values: merging two
partials is a groupBy-sum over their union, so

    merge(partials(base), partials(delta)) == partials(base ∪ delta)

holds exactly (decimal addition is associative; count/min/max are
trivially mergeable). Finalization (avg = sum/n, double rendering)
happens only at read time.

At 100 TB: the base partials table is parquet partitioned by bucket
date; a delta touches only the buckets its events fall into, so the
merge reads + rewrites just those partitions (``upsert_parquet`` keyed
on the bucket) while the raw event history is never re-read. The
shuffle is proportional to |delta buckets|, not |history|. Non-algebraic
aggregates (exact distinct, exact median) need sketch partials instead
(HLL / KLL — see the approx tier); the structure here is the same.

Parity note: the reference has no continuous aggregates — this is the
engine-extension tier (SURVEY §2 additions), modeled on the
TimescaleDB/Materialize continuous-aggregate contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decimal type used for mergeable sums — exact and associative, so the
#: merge order can never change the result (oracle determinism rule)
_SUM_DECIMAL = "decimal(24,2)"


def rollup_partials(
    events: DataFrame,
    bucket: str = "hour",
    keys: list[str] | None = None,
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Partial (mergeable) rollup state per (time bucket, keys):
    ``n`` (count), ``s`` (decimal sum), ``mn``/``mx`` (min/max).
    One map-side-combined shuffle on the bucket+keys."""
    keys = keys if keys is not None else ["event_type"]
    b = F.date_trunc(bucket, F.col(ts_col)).alias("__bucket")
    return (
        events.groupBy(b, *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast(_SUM_DECIMAL)).alias("s"),
            F.min(value_col).alias("mn"),
            F.max(value_col).alias("mx"),
        )
    )


def merge_rollups(*partials: DataFrame) -> DataFrame:
    """Merge partial-state rollups (base ∪ deltas): union then one
    groupBy re-combining the algebraic states. Output schema equals
    ``rollup_partials`` output, so merges compose/chain."""
    if not partials:
        raise ValueError("merge_rollups needs at least one partials frame")
    union = partials[0]
    for p in partials[1:]:
        union = union.unionByName(p)
    group_cols = [c for c in union.columns if c not in ("n", "s", "mn", "mx")]
    return (
        union.groupBy(*group_cols)
        .agg(
            F.sum("n").alias("n"),
            # sum of decimal sums stays _SUM_DECIMAL-exact; re-cast to
            # keep the schema closed under merging
            F.sum("s").cast(_SUM_DECIMAL).alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )


def finalize_rollup(partials: DataFrame, bucket_alias: str = "bucket_start") -> DataFrame:
    """Render partial state for consumers: UTC string bucket, bigint
    count, double sum/min/max, 6-digit average (exact decimal numerator
    / integer count, per the determinism rules)."""
    return partials.select(
        F.date_format("__bucket", "yyyy-MM-dd HH:mm:ss").alias(bucket_alias),
        *[c for c in partials.columns if c not in ("__bucket", "n", "s", "mn", "mx")],
        F.col("n").cast("bigint").alias("n_events"),
        F.col("s").cast("double").alias("sum_value"),
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("avg_value"),
        F.col("mn").cast("double").alias("min_value"),
        F.col("mx").cast("double").alias("max_value"),
    )
