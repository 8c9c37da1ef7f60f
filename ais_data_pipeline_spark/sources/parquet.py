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


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return read_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


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
