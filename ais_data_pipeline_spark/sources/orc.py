"""ORC source/sink — the second columnar format next to parquet
(reference scope is parquet-only: lambda_handler.py routes every
payload to parquet; ORC is engine-addition coverage so warehouses
standardized on ORC can run the same pipelines).

Spark's native ORC reader has the same scan-level machinery as
parquet — column pruning, predicate pushdown (``PushedFilters`` in
the scan node), partition pruning over ``partitionBy`` layouts — so
every plan property the engine asserts for parquet holds here;
``tests/test_operators.py::test_orc_roundtrip_pushdown`` pins the
pushdown in the physical plan. zstd compression matches the parquet
sink's codec choice (BASELINE.md documents the brotli deviation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "zstd",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
