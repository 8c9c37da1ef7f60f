"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_to_parallelism(df: DataFrame) -> DataFrame:
    """Widen a narrow scan to cluster parallelism before compute-heavy
    per-row work (shingling, hashing, Python batch UDFs: CPU ≫ bytes).

    A small parquet file arrives as ONE input split, so everything up
    to the first shuffle runs on one core — observed 20× slowdowns on
    the shingle operators. The round-robin repartition costs one tiny
    shuffle of raw rows; skipped when the scan is already wide enough
    (the 100 TB case, where inputs come in thousands of splits).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
