"""SparkSession factory with scale-aware defaults.

The reference engine (Polars streaming) gets bounded-memory, out-of-core
execution from its runtime (SURVEY §4 "Streaming / out-of-core"); Spark
gives us the same from partitioned execution + spill, so the session
factory's job is only to pin the configs that matter for correctness
(UTC, non-ANSI lenient casts — reference T1/T4 null-on-failure semantics)
and scale (AQE, Arrow, sane shuffle partitioning, zstd parquet).

Cluster-sizing contract (measured; SCALING.md "Curation throughput vs
cores"): provision **≈0.5 GiB of executor heap per task thread** for
the curation/dedup tier. The cores-vs-throughput curve is near-linear
to 16 threads on a 4 GiB heap and heap-bound beyond — marginal cores
past that ratio return ~65% efficiency (GC contention on a fixed
young gen), so scale heap WITH threads before adding executors. At
that sizing a 32-thread node sustains ~269 MiB/s of CSV→Parquet
ingest steady-state and ~1.2 MiB/s/thread of full curation.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Non-ANSI mode pins the reference's lenient cast semantics: Polars
# strict=False string→date parse yields null on failure
# (reference notebooks/preprocessing_with_polars.ipynb:1490-1494); under
# ANSI Spark 4 would raise instead.
_CORRECTNESS_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.parquet.datetimeRebaseModeInWrite": "CORRECTED",
    "spark.sql.parquet.int96RebaseModeInWrite": "CORRECTED",
}

# Scale posture: AQE re-plans at runtime (skew joins, partition
# coalescing, join-strategy switches at 100 TB); Arrow keeps the
# pandas/numpy interop and Pandas-UDF path vectorized; zstd is the
# engine's standard codec (reference used brotli — deviation recorded in
# BASELINE.md / SURVEY §2.2 K3).
_SCALE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "zstd",
    # zstd level 9: +0.5x compression over the default 3 on the
    # pipeline output at no measurable write-time cost (measured; level
    # 15 costs 8x the write time for nothing further)
    "spark.hadoop.parquet.compression.codec.zstd.level": "9",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # 128 MiB input splits: the right granularity for multi-TB parquet
    # scans; harmless locally.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # r18 (guide §1.2 order-of-operations, measured): PySpark 4's
    # DataFrame-debugging origin capture (default ON) wraps EVERY
    # Column/functions API call with a conf read + PySparkCurrentOrigin
    # set/clear — three extra py4j round-trips plus a Python stack walk
    # per call. On the bench box (py4j RTT ~1.5 ms) that made driver-
    # side PLAN CONSTRUCTION the dominant cost of the centroid-literal
    # operators: pq_topk construction alone dropped 4.7 s -> 1.2 s with
    # the capture off. Cost of disabling: errors lose the Python
    # call-site line in their message — nothing else changes (no plan,
    # no result difference). This is a per-query driver cost, so the
    # win holds at any cluster scale.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}


def default_parallelism() -> int:
    """Local-mode core count; honors SPARK_GRAFT_CPUS from the harness."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 4


def get_spark(
    app_name: str = "ais_data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster the caller passes ~2-3× total executor cores instead (and
    AQE coalesces down from there).
    """
    cores = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cores}]")
    conf = dict(_CORRECTNESS_CONF)
    conf.update(_SCALE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cores)
    conf.setdefault("spark.ui.enabled", "false")
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
