"""Source connectors: CSV/Parquet/JSON scans, HTTP landing-zone ingest,
config documents, filename routing (reference S1-S5)."""

from ais_data_pipeline_spark.sources.csv import read_csv, normalize_null_tokens
from ais_data_pipeline_spark.sources.parquet import read_parquet, read_table, read_tables
from ais_data_pipeline_spark.sources.routing import suffix_from_url, SUFFIX_MAP
from ais_data_pipeline_spark.sources.config import load_parameters

__all__ = [
    "read_csv",
    "normalize_null_tokens",
    "read_parquet",
    "read_table",
    "read_tables",
    "suffix_from_url",
    "SUFFIX_MAP",
    "load_parameters",
]
