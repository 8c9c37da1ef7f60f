"""Driver-side rows → JVM local relation, WITHOUT the pickled-RDD trap.

``spark.createDataFrame(list_of_rows)`` parallelizes the rows into
``defaultParallelism`` pickled Python slices — on ``local[32]`` that is
a 32-slice Python RDD, and EVERY downstream job that touches the frame
pays up to 32 Python-worker round-trips (~0.14 s each: a tiny sidecar
write costs ~4.4 s, measured). Routing the same rows through Arrow
(``pyarrow.Table`` input) converts driver-side and lands as a true
JVM-local relation: the identical write drops to ~0.13 s, and
downstream joins/collects never touch a Python worker.

Exactness: Arrow carries IEEE doubles (and nested list<double>)
bit-for-bit, so collect→local_df round-trips preserve the engine's
determinism contract exactly like the literal round-trips the oracles
rely on.
"""

from __future__ import annotations

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_ARROW = {
    T.IntegerType: pa.int32(),
    T.LongType: pa.int64(),
    T.DoubleType: pa.float64(),
    T.FloatType: pa.float32(),
    T.StringType: pa.string(),
    T.BooleanType: pa.bool_(),
    T.ShortType: pa.int16(),
    T.ByteType: pa.int8(),
    T.BinaryType: pa.binary(),
    T.DateType: pa.date32(),
    # The session pins spark.sql.session.timeZone=UTC, so a tz-naive
    # microsecond Arrow timestamp converts losslessly.
    T.TimestampType: pa.timestamp("us"),
    T.TimestampNTZType: pa.timestamp("us"),
}


def _arrow_type(dt: T.DataType) -> pa.DataType:
    if isinstance(dt, T.ArrayType):
        return pa.list_(_arrow_type(dt.elementType))
    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    if isinstance(dt, T.StructType):
        return pa.struct(
            [pa.field(f.name, _arrow_type(f.dataType)) for f in dt.fields]
        )
    if isinstance(dt, T.MapType):
        return pa.map_(_arrow_type(dt.keyType), _arrow_type(dt.valueType))
    for spark_t, arrow_t in _ARROW.items():
        if isinstance(dt, spark_t):
            return arrow_t
    raise TypeError(f"local_df: unmapped type {dt}")


def local_df(
    spark: SparkSession,
    rows: list,
    schema: str | T.StructType,
) -> DataFrame:
    """Build a DataFrame from driver-side rows via Arrow. ``rows`` are
    tuples/Rows in schema field order; ``schema`` is a DDL string or
    StructType. Use this (never raw ``createDataFrame(list)``) for
    every bounded driver-side table — centroids, codebooks, manifests,
    greedy-selection results."""
    # public DDL parser (Spark 3.4+) over the private
    # T._parse_datatype_string, which can move on a Spark upgrade
    struct = T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
    arrays = []
    for i, field in enumerate(struct.fields):
        vals = [None if r[i] is None else r[i] for r in rows]
        arrays.append(pa.array(vals, _arrow_type(field.dataType)))
    tbl = pa.Table.from_arrays(arrays, names=[f.name for f in struct.fields])
    return spark.createDataFrame(tbl, schema=struct)
