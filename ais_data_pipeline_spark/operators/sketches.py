"""Count-Min sketch (Cormode & Muthukrishnan 2005) as a DataFrame
aggregation — the fixed-memory frequency sketch beside the engine's
HLL (approx_count_distinct) and Bloom-filter surfaces.

The sketch is a d x w counter grid: item -> d buckets (one per hash
row), estimate(item) = min over rows of the bucket counts — always an
over-estimate, with error <= 2N/w at probability 1 - (1/2)^d.

Spark-first shape: building the grid is ONE groupBy over (row,
bucket) — map-side partial aggregation collapses every partition to
<= d*w cells before the shuffle, so the network cost is the sketch
size (constant), not the data size. Grids from different partitions /
days / tables MERGE by cell-wise addition (the groupBy does exactly
that), which is the property that makes CMS work for incremental
100 TB ingestion.

Hashing is the engine's portable 60-bit md5-prefix hash (same trick
as simhash's md5_60), so an ANSI-SQL oracle can rebuild the identical
grid and estimates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_bucket(item: Column, row: int, w: int) -> Column:
    """Bucket of ``item`` in hash row ``row``: portable md5-prefix
    hash of 'row:item', mod w. Non-negative (hash is 60-bit)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), item.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return (h % w).cast("int")


def cms_build(df: DataFrame, item_col: str, d: int = 4, w: int = 256) -> DataFrame:
    """Build the d x w grid: (row, bucket, cnt). One explode to d rows
    per record, one partially-aggregated groupBy — output is <= d*w
    rows regardless of input size."""
    item = F.col(item_col)
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _cms_bucket(item, r, w).alias("bucket")
                    )
                    for r in range(d)
                ]
            )
        ).alias("__c")
    )
    return cells.groupBy(
        F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    cms: DataFrame, candidates: DataFrame, item_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Point-query the sketch for each candidate item: join each of
    the item's d (row, bucket) cells against the grid, take the min.
    The candidate set is usually small (heavy-hitter verification) —
    it broadcasts; the grid is <= d*w rows and broadcasts too."""
    item = F.col(item_col)
    probes = candidates.select(
        item,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"), _cms_bucket(item, r, w).alias("bucket")
                    )
                    for r in range(d)
                ]
            )
        ).alias("__p"),
    ).select(item, F.col("__p.row").alias("row"), F.col("__p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"])
        .groupBy(item_col)
        .agg(F.min("cnt").alias("est_cnt"))
    )
