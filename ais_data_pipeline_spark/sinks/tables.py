"""Bucketed managed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle of
both sides. Bucketing materializes that shuffle ONCE at write time:
``bucketBy(n, keys)`` hash-partitions rows into a fixed bucket count
per partition-file, and Catalyst then plans joins/aggregations on the
bucket keys without any Exchange — every subsequent join of two tables
bucketed the same way is map-side. The trade: writes pay the clustering
and the bucket count is fixed at write time (pick ~ total_size /
target_partition_size at the expected scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (optionally sort-within-bucket) managed
    table. Sorting within buckets additionally enables shuffle-AND-
    sort-free sort-merge joins."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table; the bucketing metadata rides along
    from the catalog and Catalyst exploits it automatically."""
    return spark.table(table)
