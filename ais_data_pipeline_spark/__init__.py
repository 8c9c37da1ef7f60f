"""ais_data_pipeline_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference repo
``densmyslov/ais-data-pipeline`` (a Polars/Lambda serverless ETL pipeline;
see SURVEY.md) as an idiomatic Apache Spark engine:

- ``session``    — SparkSession factory with scale-aware defaults (AQE,
                   Arrow, UTC, zstd parquet).
- ``sources``    — CSV (explicit schema + multi-token null normalization,
                   reference S1), Parquet, HTTP landing-zone ingest
                   (reference S3-S5), config documents.
- ``sinks``      — partitioned Parquet writes (reference K1-K3) and the
                   quarantine dual-write (K4).
- ``operators``  — projections/filters/transforms/aggregates/ordering
                   (reference P*/T*/A*/O*), joins & windows, profiling/
                   type-tightening pass, dedup, similarity search, text
                   analysis, multimodal column plumbing.
- ``functions``  — column-expression helpers and pure-Python utilities
                   (downcast ladder T6, vector math).
- ``plans``      — composable end-to-end jobs (the rent_contracts
                   pipeline, reference notebook §3.2).
- ``streaming``  — Structured Streaming ingest, watermarked windows,
                   sessionization, stateful ops.

Everything is DataFrame/Catalyst-first: operators return lazy DataFrames,
never collect in a transform, and are designed so that at 100 TB the plan
broadcasts small dims, prunes columns/partitions at the scan, and keeps
hot paths inside whole-stage codegen.
"""

from ais_data_pipeline_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
