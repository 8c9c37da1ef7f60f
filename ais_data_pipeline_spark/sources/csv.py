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
    - no schema → the raw normalized string frame (caller profiles /
      tightens via operators.profiling).
    - ``infer_schema_length=k`` → bounded inference matching the
      reference's ``infer_schema_length=10000``: types are decided from
      the FIRST k rows only (one ``limit(k)`` aggregation pass), then
      applied with ``try_cast`` so values past the bound that don't fit
      become null instead of silently widening the column type (or
      erroring). A bad token at row k+1 can no longer flip a bigint
      column to string — the reference's exact bound semantics.
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

    df = normalize_null_tokens(reader.csv(path), null_tokens)
    if infer_schema_length is not None:
        inferred = _infer_types_bounded(df, infer_schema_length)
        df = df.select(
            *[F.col(c).try_cast(t).alias(c) for c, t in inferred.items()]
        )
    return df


#: Narrowing ladder for bounded inference; first type every non-null
#: sample value casts to wins (string is the fallback).
_INFER_LADDER: tuple[T.DataType, ...] = (
    T.LongType(),
    T.DoubleType(),
    T.BooleanType(),
    T.DateType(),
    T.TimestampType(),
)


def _infer_types_bounded(df: DataFrame, k: int) -> dict[str, T.DataType]:
    """Decide a type per string column from the first ``k`` rows only.

    One ``limit(k)`` + single aggregation pass: for each column count
    non-null values and, per candidate type, how many of them
    ``try_cast`` successfully; the narrowest type that fits ALL sampled
    non-null values wins. Bounded work regardless of input size — the
    scan stops after ``k`` rows (LocalLimit), unlike a samplingRatio
    pass which re-reads the whole file.
    """
    cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    out: dict[str, T.DataType] = {
        f.name: f.dataType for f in df.schema.fields if f.name not in cols
    }
    if not cols:
        return out
    sample = df.limit(k)
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"{c}__n"))
        for i, t in enumerate(_INFER_LADDER):
            ok = col.try_cast(t)
            if isinstance(t, T.DateType):
                # cast(string AS DATE) truncates full timestamps — only
                # bare yyyy-MM-dd strings may infer as DATE
                ok = F.when(col.rlike(r"^\s*\d{4}-\d{1,2}-\d{1,2}\s*$"), ok)
            aggs.append(F.count(ok).alias(f"{c}__t{i}"))
    row = sample.agg(*aggs).first()
    for c in cols:
        n = row[f"{c}__n"]
        chosen: T.DataType = T.StringType()
        if n > 0:
            for i, t in enumerate(_INFER_LADDER):
                if row[f"{c}__t{i}"] == n:
                    chosen = t
                    break
        out[c] = chosen
    return {f.name: out[f.name] for f in df.schema.fields}
