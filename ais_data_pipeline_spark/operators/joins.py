"""Joins, set ops, windows — the analytics layer the reference lacks
(SURVEY §2.7: "None implemented in the reference"; pure Spark built-ins
exposed with scale-aware defaults).

Scale posture: dimension joins broadcast explicitly (no shuffle of the
fact side); fact-fact joins rely on AQE for skew handling; ``top_k_per_group``
uses a window + row_number which shuffles once on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Fact⋈dim with the dim side broadcast by default — at 100 TB a
    shuffle of the fact table to join a 5-row region dim is the classic
    avoidable bottleneck."""
    right = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(right, on, how)


def semi_join(df: DataFrame, other: DataFrame, on) -> DataFrame:
    """EXISTS (left_semi): filters without duplicating or widening."""
    return df.join(other, on, "left_semi")


def anti_join(df: DataFrame, other: DataFrame, on) -> DataFrame:
    """NOT EXISTS (left_anti)."""
    return df.join(other, on, "left_anti")


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k within each group via row_number window — one shuffle on
    the group key, rows beyond k dropped before any further stage."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def range_self_join_within(
    df: DataFrame,
    key: str,
    time_col: str,
    window_seconds: int,
    id_col: str,
) -> DataFrame:
    """Interval self-join: all ordered pairs (a, b) sharing ``key`` with
    ``a.time < b.time <= a.time + window_seconds``.

    A naive time-inequality join has no equi key and degenerates to a
    per-key cross product. Instead both sides get a coarse time bucket
    (``floor(epoch/window)``); the left row probes its own bucket and
    the next one (any pair within the window spans at most one bucket
    boundary), making the join a plain equi-join on (key, bucket) —
    shuffle-partitioned, AQE-skew-splittable — with the exact interval
    predicate applied after. Each qualifying pair matches exactly once
    because the right row's bucket is single-valued.
    """
    bucket = F.floor(F.unix_timestamp(F.col(time_col)) / window_seconds)
    left = df.select(
        F.col(key),
        F.col(id_col).alias("first_id"),
        F.col(time_col).alias("__lt"),
        F.explode(F.array(bucket, bucket + 1)).alias("__bucket"),
    )
    right = df.select(
        F.col(key),
        F.col(id_col).alias("next_id"),
        F.col(time_col).alias("__rt"),
        bucket.alias("__bucket"),
    )
    win = F.expr(f"INTERVAL {window_seconds} SECONDS")
    return (
        left.join(right, [key, "__bucket"])
        .filter((F.col("__rt") > F.col("__lt")) & (F.col("__rt") <= F.col("__lt") + win))
        .select(key, "first_id", "next_id")
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """As-of join composed from built-ins: equi-join on keys + time
    inequality, then keep the best match per left row via row_number.

    ``direction``: "backward" (latest right at-or-before the left time
    — the default, matching pandas.merge_asof), "forward" (earliest
    right at-or-after), or "nearest" (smallest absolute gap; ties break
    to the earlier right row, pandas-compatible).

    TIE HAZARD (round-11 review): when several right rows share the
    winning ``right_time``, the ordering above does not distinguish
    them and row_number picks an ARBITRARY one — the matched time is
    still deterministic, but any other right column is not. Pass
    ``tie_break`` (right-side column names appended ascending to the
    window order — an id column is the usual choice) whenever you
    select right payload columns; the oracle-checked registry queries
    either project only the time or pass one.

    Spark lacks a native as-of join (pyspark_guide "Common OLAP
    patterns"); this composition shuffles both sides once on the key
    columns. For dense right sides add a coarse time-bucket key to both
    sides before calling to cut the join fan-out.
    """
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = [F.col(f"l.{c}") == F.col(f"r.{c}") for c in on]
    if direction == "backward":
        cond.append(rt <= lt)
        order = [rt.desc_nulls_last()]
    elif direction == "forward":
        cond.append(rt >= lt)
        order = [rt.asc_nulls_last()]
    elif direction == "nearest":
        gap = F.abs(rt.cast("double") - lt.cast("double"))
        order = [F.when(rt.isNull(), None).otherwise(gap).asc_nulls_last(), rt.asc()]
    else:
        raise ValueError(f"unknown as-of direction: {direction!r}")
    order = order + [F.col(f"r.{c}").asc_nulls_last() for c in (tie_break or [])]
    if tolerance_seconds is not None:
        tol = F.expr(f"INTERVAL {tolerance_seconds} SECONDS")
        if direction in ("backward", "nearest"):
            cond.append(rt >= lt - tol)
        if direction in ("forward", "nearest"):
            cond.append(rt <= lt + tol)
    # The dedup window must partition by a UNIQUE left-row identity, not
    # (keys, left_time): two distinct left rows sharing key+timestamp
    # would otherwise collapse into one partition and row_number()==1
    # silently drops one of them.
    l = left.withColumn("__lrow", F.monotonically_increasing_id()).alias("l")
    r = right.alias("r")
    joined = l.join(r, cond, "left")
    w = Window.partitionBy(F.col("l.__lrow")).orderBy(*order)
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}").alias(f"r_{c}") for c in right.columns if c not in on
    ]
    return joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).select(*out_cols)


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    window_seconds: int,
) -> DataFrame:
    """Two-sided backward interval join: each left row matches right
    rows sharing ``key`` with ``left_time - window <= right_time <
    left_time`` (the attribution/lookback shape).

    Same bucket trick as ``range_self_join_within``: the right side
    gets one coarse time bucket (``floor(epoch/window)``), the left
    probes its own bucket and the previous one (a backward window
    spans at most one boundary), so the join is a plain equi-join on
    (key, bucket) — shuffle-partitioned and AQE-skew-splittable, no
    per-key cross product — with the exact interval predicate applied
    after. Each qualifying pair matches exactly once because the right
    bucket is single-valued. Returns all left + right columns (alias
    time/id columns distinctly before calling).
    """
    bucket_l = F.floor(F.unix_timestamp(F.col(left_time)) / window_seconds)
    bucket_r = F.floor(F.unix_timestamp(F.col(right_time)) / window_seconds)
    l = left.withColumn("__bucket", F.explode(F.array(bucket_l - 1, bucket_l)))
    r = right.withColumn("__bucket", bucket_r)
    win = F.expr(f"INTERVAL {window_seconds} SECONDS")
    return (
        l.join(r, [key, "__bucket"])
        .filter(
            (F.col(right_time) < F.col(left_time))
            & (F.col(right_time) >= F.col(left_time) - win)
        )
        .drop("__bucket")
    )
