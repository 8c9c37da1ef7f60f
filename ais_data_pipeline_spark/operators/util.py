"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: conservative broadcast-size estimate for an id-only drop-set row
#: (one short string key + per-row overhead in the driver-built
#: broadcast relation). Deliberately fat: the gate exists to AVOID
#: an 8 GB broadcast explosion, not to maximize hint coverage.
DROP_SET_BYTES_PER_ROW = 64


def in_values_cond(col_name: str, values) -> "F.Column":
    """``col IN (v1, v2, …)`` as ONE parsed SQL expression.

    ``Column.isin(list)`` converts every element through its own py4j
    literal call (~1.5 ms each on a slow link — a 2,500-value probe
    list cost ~4 s of driver time per call site, measured r19), while
    one ``F.expr`` parse is a single round-trip to the identical
    ``In`` expression — same pushed-filter form (``PushedFilters:
    [In(col, …)]``), same NULL semantics (a NULL literal in the list
    never matches, exactly like ``isin``). Values may be str, int,
    float, bool, or None. Empty list → ``false`` (isin() with an empty
    list is the same constant-false filter)."""
    if not values:
        return F.lit(False)
    rendered = []
    for v in values:
        if v is None:
            rendered.append("NULL")
        elif isinstance(v, bool):
            rendered.append("true" if v else "false")
        elif isinstance(v, int):
            rendered.append(f"{v}L")
        elif isinstance(v, float):
            rendered.append(repr(v) + "D")
        else:
            rendered.append("'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'")
    quoted = "`" + col_name.replace("`", "``") + "`"
    return F.expr(f"{quoted} IN ({', '.join(rendered)})")


def _auto_broadcast_bytes(df: DataFrame) -> int:
    """The session's ``spark.sql.autoBroadcastJoinThreshold`` in bytes
    (-1 / unparsable -> 0, i.e. never hint)."""
    raw = str(
        df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    ).strip().lower()
    mult = 1
    for suffix, m in (("kb", 2**10), ("mb", 2**20), ("gb", 2**30),
                      ("k", 2**10), ("m", 2**20), ("g", 2**30), ("b", 1)):
        if raw.endswith(suffix):
            raw = raw[: -len(suffix)]
            mult = m
            break
    try:
        n = int(raw) * mult
    except ValueError:
        return 0
    return max(n, 0)


def gated_broadcast(
    df: DataFrame, n_rows: int, bytes_per_row: int = DROP_SET_BYTES_PER_ROW
) -> DataFrame:
    """``F.broadcast(df)`` only when the ALREADY-COUNTED side plausibly
    fits the session's autoBroadcastJoinThreshold; otherwise return
    ``df`` un-hinted and let AQE pick the join (shuffled anti-join on
    keys only — correct at any size, just not broadcast-fast).

    The r16 web-corpus lesson: drop-sets (duplicate fetches / bodies)
    are a few percent of a HEALTHY crawl, but real Common Crawl dumps
    run well past broadcast size at 100 TB — tens of billions of
    duplicate keys against the 8 GB broadcast hard limit. Every
    drop-set call site already materializes the count for stage
    accounting, so the gate is free."""
    if n_rows * bytes_per_row <= _auto_broadcast_bytes(df):
        return F.broadcast(df)
    return df


def spread_to_parallelism(df: DataFrame) -> DataFrame:
    """Widen a narrow scan to cluster parallelism before compute-heavy
    per-row work (shingling, hashing, Python batch UDFs: CPU ≫ bytes).

    A small parquet file arrives as ONE input split, so everything up
    to the first shuffle runs on one core — observed 20× slowdowns on
    the shingle operators. The round-robin repartition costs one tiny
    shuffle of raw rows; skipped when the scan is already wide enough
    (the 100 TB case, where inputs come in thousands of splits).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
