"""Incremental materialized-view maintenance (engine extension layer;
generalizes the mergeable-partial rollup maintenance in
operators/rollup.py to JOIN views).

The delta algebra for an inner-join view V = A ⋈ B receiving row
inserts dA, dB:

    ΔV = dA ⋈ (B ∪ dB)  ∪  A_old ⋈ dB
    V_new = V_old ∪ ΔV

— each joint pair (a, b) with a new member lands in exactly one term
(new-a pairs in the first, old-a/new-b pairs in the second), so ΔV has
no duplicates and no misses.

Scale shape: the deltas are small (a batch of inserts), so BOTH join
terms broadcast the delta side — maintaining a petabyte view costs two
broadcast joins over the base tables and never reshuffles or rebuilds
V. The refresh-vs-rebuild ratio is |ΔV| / |V|; at a typical daily
insert rate that is orders of magnitude. Deletes/updates extend the
same algebra with anti-join retractions; inserts-only is the shape the
engine's append-style sources (streaming ingest, snapshot appends)
produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_view_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Rows newly entering the inner-join view A ⋈ B when ``a_delta``
    and ``b_delta`` arrive. Columns: the join output's."""
    da = F.broadcast(a_delta) if broadcast_deltas else a_delta
    db = F.broadcast(b_delta) if broadcast_deltas else b_delta
    b_new = b_old.unionByName(b_delta)
    return da.join(b_new, on).unionByName(a_old.join(db, on))


def refresh_join_view(
    view_old: DataFrame,
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
) -> DataFrame:
    """V_new = V_old ∪ ΔV — the incremental refresh. Equal (proven by
    the registry oracle) to recomputing (A ∪ dA) ⋈ (B ∪ dB) from
    scratch, at delta-sized cost."""
    return view_old.unionByName(
        join_view_delta(a_old, a_delta, b_old, b_delta, on)
    )
