"""Custom stateful streaming operator via applyInPandasWithState.

Example operator: per-key running counters (count, sum, max-seen event
time) that survive across micro-batches — the pattern behind rate
monitoring, dedup-by-key-within-horizon, and incremental profiles. The
reference has no stateful ops (SURVEY §2.8); this is the engine's
extension point for them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
STATE_SCHEMA = "n bigint, total double, last_ts timestamp"


def running_totals_fn(key, batches: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """GroupState update function: fold each micro-batch's rows for the
    key into (n, total, last_ts) state and emit the updated snapshot."""
    if state.exists:
        n, total, last_ts = state.get
    else:
        n, total, last_ts = 0, 0.0, None
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [last_ts],
        }
    )


def running_totals(events_stream, timeout: str = "NoTimeout"):
    """Attach the stateful operator to a streaming events DataFrame
    (columns: user_id, ts, value). Output mode must be 'update'."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        running_totals_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
