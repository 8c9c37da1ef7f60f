"""CSV source with multi-token null normalization (reference S1/S2).

The reference scans CSV lazily with a null-token list and bounded schema
inference: ``pl.scan_csv(fn, null_values=["", "null", "NULL", "None"],
infer_schema_length=10000)`` (reference notebooks/
preprocessing_with_polars.ipynb:225-229). Spark's CSV ``nullValue`` takes
a single token, so the engine normalizes the remaining tokens post-read
— and therefore prefers an explicit ``StructType`` schema applied AFTER
normalization (read string-typed, normalize, cast), so inference never
mis-types a column on the strength of a "None" token (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Tokens the reference treats as SQL NULL in raw CSV.
NULL_TOKENS = ("", "null", "NULL", "None")


def normalize_null_tokens(
    df: DataFrame,
    tokens: tuple[str, ...] = NULL_TOKENS,
    columns: list[str] | None = None,
) -> DataFrame:
    """Map every string cell equal to a null token to SQL NULL.

    Runs as a single projection (one ``when`` per string column) so it
    stays inside whole-stage codegen and costs no shuffle.
    """
    tokens = tuple(t for t in tokens if t != "")  # "" handled by Spark's nullValue/emptyValue
    target = set(columns) if columns is not None else None
    exprs = []
    for field in df.schema.fields:
        c = field.name
        if isinstance(field.dataType, T.StringType) and (target is None or c in target):
            col = F.col(c)
            exprs.append(
                F.when(col.isin(*tokens), F.lit(None).cast("string")).otherwise(col).alias(c)
            )
        else:
            exprs.append(F.col(c))
    return df.select(*exprs)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    null_tokens: tuple[str, ...] = NULL_TOKENS,
    drop_malformed: bool = False,
    infer_schema_length: int | None = None,
) -> DataFrame:
    """Read CSV with the engine's null semantics.

    - ``schema`` given → read every column as string, normalize null
      tokens, then cast to the declared types (lenient: failed casts →
      null, matching reference T1/T4 semantics under non-ANSI mode).
    - no schema → bounded inference like the reference's
      ``infer_schema_length`` via ``samplingRatio`` isn't row-count
      bounded in Spark, so we read a normalized string frame and let
      the caller profile/tighten (operators.profiling), or pass
      ``infer_schema_length`` to approximate with sampling.
    - ``drop_malformed`` → DROPMALFORMED mode (reference S2's
      ``on_bad_lines='skip'``), without ever materializing on the
      driver (the pandas-OOM class disappears; SURVEY §2.1 S2).
    """
    reader = (
        spark.read.option("header", header)
        .option("nullValue", "")
        .option("emptyValue", "")
    )
    if drop_malformed:
        reader = reader.option("mode", "DROPMALFORMED")

    if schema is not None:
        string_schema = T.StructType(
            [T.StructField(f.name, T.StringType(), True) for f in schema.fields]
        )
        df = reader.schema(string_schema).csv(path)
        df = normalize_null_tokens(df, null_tokens)
        # try_cast, not cast: the lenient null-on-failure contract must
        # hold even under ANSI mode (Spark 4 default), where a plain
        # cast raises on the first malformed value
        df = df.select(
            *[F.col(f.name).try_cast(f.dataType).alias(f.name) for f in schema.fields]
        )
        return df

    if infer_schema_length is not None:
        reader = reader.option("inferSchema", True).option(
            "samplingRatio", 1.0
        )
        df = reader.csv(path)
    else:
        df = reader.csv(path)
    return normalize_null_tokens(df, null_tokens)
