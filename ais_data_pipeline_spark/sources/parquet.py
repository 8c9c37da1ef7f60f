"""Parquet scans + the canonical testdata table loader."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: All tables the driver materializes (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Columnar scan; column pruning reaches the reader via select."""
    df = spark.read.parquet(path)
    if columns:
        df = df.select(*columns)
    return df


def read_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Load one driver table. ``spread=True`` widens a narrow scan to
    cluster parallelism (operators/util.spread_to_parallelism) — pass
    it when the CALLER does compute-heavy per-row work (shingling,
    hashing, Python batch UDFs): a small parquet file arrives as ONE
    input split and would pin that work to a single core. Off by
    default: for ordinary scans the extra round-robin exchange costs
    more than it saves, and at warehouse scale inputs already arrive in
    thousands of splits (where spread is a no-op)."""
    if name == "events":
        df = read_events(spark, sf_dir)
    else:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if spread:
        from ais_data_pipeline_spark.operators.util import spread_to_parallelism

        df = spread_to_parallelism(df)
    return df


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver's events table has shipped two physical ``ts`` types
    across rounds: TIMESTAMP(NANOS) (rejected by Spark's vectorized
    reader — read as raw nanos via legacy nanosAsLong and rebuilt at
    micro precision) and TIMESTAMP(MICROS) without UTC adjustment
    (inferred as TIMESTAMP_NTZ on Spark 4). Normalize both to session-tz
    TimestampType: watermarks require it, and the session runs UTC so
    wall-clock values match DuckDB's naive reading either way."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # integer div: ns values exceed double's 2^53 exact range
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}
