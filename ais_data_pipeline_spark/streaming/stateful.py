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
    key into (n, total, last_ts) state and emit the updated snapshot.

    The total replicates the JVM decimal(18,6) cast semantics
    (quantized-Decimal accumulation, exact and associative), so the
    final snapshot hash-matches the batch/DuckDB decimal aggregate
    bit for bit — the stored double round-trips exactly because a sum
    of 6-dp decimals is a 6-dp decimal and |total| stays far below
    2^53 * 1e-6 (see queries.py determinism header)."""
    from decimal import ROUND_HALF_UP, Context, Decimal
    from functools import reduce

    ctx = Context(prec=50)
    q6 = Decimal("0.000001")
    if state.exists:
        n, total_f, last_ts = state.get
        # repr-restore, same as the per-value path: equivalent to the
        # exact-binary Decimal(total_f) here (the stored double IS a
        # 6-dp decimal that round-trips exactly, see invariant above),
        # but keeps one replication rule throughout.
        total = Decimal(repr(total_f)).quantize(q6, ROUND_HALF_UP)
    else:
        n, total, last_ts = 0, Decimal(0), None
    for pdf in batches:
        n += len(pdf)  # the batch analog is count(*): NULL rows count
        # repr(float) replicates the JVM double→decimal cast's
        # Double.toString (shortest-repr) step — see zscore_anomaly_fn.
        # NULL/NaN values arrive as NaN and must SKIP the fold (the
        # JVM decimal cast makes them NULL and sum skips NULLs): one
        # NaN previously poisoned the running total to NaN forever
        # (round-11 review).
        total = reduce(
            ctx.add,
            (
                Decimal(repr(float(v))).quantize(q6, ROUND_HALF_UP)
                for v in pdf["value"]
                if v is not None and float(v) == float(v)
            ),
            total,
        )
        batch_max = pdf["ts"].max()  # skips NaT; all-NaT yields NaT
        if batch_max is not pd.NaT:
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    total = float(total)
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


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, "
    "session_start timestamp, session_end timestamp"
)
SESSION_STATE_SCHEMA = "n bigint, total double, start_ts timestamp, end_ts timestamp"
_SESSION_GAP_MS = 30 * 60 * 1000


def session_finalize_fn(key, batches: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """Event-time-timeout session finalizer: fold events into per-key
    session state; when the watermark passes (last event + gap) the
    state TIMES OUT and the finalized session emits exactly once —
    the applyInPandasWithState pattern for 'emit when closed' results
    that plain watermarked aggregation can't express (arbitrary state,
    arbitrary finalization logic)."""
    if state.hasTimedOut:
        n, total, start_ts, end_ts = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "session_start": [start_ts],
                "session_end": [end_ts],
            }
        )
        return
    if state.exists:
        n, total, start_ts, end_ts = state.get
    else:
        n, total, start_ts, end_ts = 0, 0.0, None, None
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())  # pandas sum skips NaN
        lo, hi = pdf["ts"].min(), pdf["ts"].max()  # min/max skip NaT
        if lo is not pd.NaT:
            start_ts = lo if start_ts is None else min(start_ts, lo)
        if hi is not pd.NaT:
            end_ts = hi if end_ts is None else max(end_ts, hi)
    state.update((n, total, start_ts, end_ts))
    # timeout at session end + gap, but always ahead of the watermark
    # (Spark rejects a timeout at-or-behind it). A key whose every ts
    # was NULL has no event time: fall back to watermark + gap so the
    # state still times out instead of leaking forever (r11 review —
    # NaT.value is iNaT, which previously fed a garbage huge-negative
    # timeout into the max()).
    if end_ts is None:
        end_ms = state.getCurrentWatermarkMs()
    else:
        end_ms = int(pd.Timestamp(end_ts).value // 1_000_000)
    state.setTimeoutTimestamp(max(end_ms + _SESSION_GAP_MS, state.getCurrentWatermarkMs() + 1))
    return


def session_summaries(events_stream, watermark_delay: str = "10 minutes"):
    """Attach the session finalizer to a streaming events frame
    (columns: user_id, ts, value). Emits one row per CLOSED session
    (append semantics): nothing while a session is open, the summary
    exactly once after the watermark passes its gap."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            session_finalize_fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


ZSCORE_OUTPUT_SCHEMA = "user_id bigint, event_id bigint, value double, z double"
ZSCORE_STATE_SCHEMA = "vals array<double>"
_Z_LOOKBACK = 20
_Z_MIN_N = 10
_Z_THRESHOLD = 3.0


def zscore_anomaly_fn(key, batches: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """Streaming form of operators.timeseries.rolling_zscore_anomalies:
    per-key state is the ring buffer of the last ``_Z_LOOKBACK`` values
    (bounded — state size is O(lookback) per key no matter how long
    the stream runs). Each row scores against the state BEFORE its own
    value enters the buffer, matching the batch operator's
    current-row-excluded frame; rows sort by (ts, event_id) inside the
    batch so replaying a batch is deterministic.

    Values accumulate as ``Decimal`` quantized to 6 dp — the exact
    semantics of the batch operator's ``decimal(18,6)`` cast (binary
    double expanded exactly, then HALF_UP at 1e-6) — and the mean/
    variance/z arithmetic repeats the batch plan's double expression
    op for op, so the streaming output is BIT-IDENTICAL to the batch
    result when events arrive in (ts, event_id) order per key."""
    import math
    from decimal import ROUND_HALF_UP, Context, Decimal
    from functools import reduce

    ctx = Context(prec=50)  # exact decimal sums; default prec=28 could round
    q6 = Decimal("0.000001")
    # Buffer slots are Decimal for real values, None for NULL/NaN rows.
    # A non-value row must OCCUPY a slot — the batch operator's ROWS
    # frame rowsBetween(-lookback,-1) counts physical rows, so a NULL
    # row there evicts an older value from the frame while count()/
    # sum() skip only its value (round-12 review: skipping such rows
    # entirely gave the streaming window one extra older value and
    # broke bit-identity for keys with NULL history). Sentinels
    # round-trip state as NaN: the state schema is array<double> and
    # NaN survives it losslessly.
    buf: list[Decimal | None] = (
        [
            None
            if float(v) != float(v)
            else Decimal(repr(float(v))).quantize(q6, ROUND_HALF_UP)
            for v in state.get[0]
        ]
        if state.exists
        else []
    )
    out_uid, out_eid, out_val, out_z = [], [], [], []
    # Materialize the whole micro-batch before sorting: Spark delivers a
    # key's batch as MULTIPLE Arrow chunks once it exceeds
    # arrow.maxRecordsPerBatch (default 10k), and chunk order is not
    # (ts, event_id) — sorting per-chunk would silently break the
    # bit-identity with the batch operator for large keys.
    chunks = list(batches)
    pdfs = [pd.concat(chunks)] if chunks else []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for eid, val in zip(pdf["event_id"], pdf["value"]):
            if val is None or float(val) != float(val):
                # a NULL/NaN value joins neither the count nor the
                # sums and its own z is NULL in the batch plan — but
                # it still fills a ROWS-frame slot there, so it must
                # fill a buffer slot here (a bare `continue` gave the
                # next windows one extra older value; round-12 review)
                buf.append(None)
                if len(buf) > _Z_LOOKBACK:
                    buf.pop(0)
                continue
            reals = [d for d in buf if d is not None]
            n = len(reals)
            if n >= _Z_MIN_N:
                s = float(reduce(ctx.add, reals, Decimal(0)))
                s2 = float(reduce(ctx.add, [ctx.multiply(d, d) for d in reals], Decimal(0)))
                mean = s / n
                var = (s2 / n - mean * mean) * n / (n - 1)
                if var > 0:
                    z = (float(val) - mean) / math.sqrt(var)
                    if abs(z) > _Z_THRESHOLD:
                        out_uid.append(key[0])
                        out_eid.append(int(eid))
                        out_val.append(float(val))
                        out_z.append(round(z, 3))
            # repr(float) = shortest round-trip decimal — replicates the
            # JVM's Double.toString→BigDecimal step of the double→
            # decimal(18,6) cast; Decimal(float) would expand the binary
            # double exactly and quantize half-points differently.
            buf.append(Decimal(repr(float(val))).quantize(q6, ROUND_HALF_UP))
            if len(buf) > _Z_LOOKBACK:
                buf.pop(0)
    state.update(([float("nan") if d is None else float(d) for d in buf],))
    yield pd.DataFrame(
        {"user_id": out_uid, "event_id": out_eid, "value": out_val, "z": out_z}
    )


def zscore_anomalies_stream(events_stream):
    """Attach the anomaly scorer to a streaming events frame (columns:
    user_id, event_id, ts, value). Output mode 'append': a flagged row
    emits exactly once, in the micro-batch that contains it — append
    semantics, so file sinks work directly."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        zscore_anomaly_fn,
        outputStructType=ZSCORE_OUTPUT_SCHEMA,
        stateStructType=ZSCORE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# -- Spark 4 transformWithState (r15) ----------------------------------------

TWS_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, n_types bigint"


class TypeProfileProcessor:
    """Per-user event profile on Spark 4's ``transformWithStateInPandas``
    — the arbitrary-stateful API that SUCCEEDS applyInPandasWithState:
    instead of one monolithic state tuple, the processor composes
    TYPED state primitives from the handle. Here a MapState
    (event_type -> count, the per-key sub-keyed store the old API
    could only fake by packing maps into a value blob) plus a
    ValueState row counter; each micro-batch folds its rows in and
    emits the updated (n_events, n_types) snapshot. NULL event_types
    are skipped by the distinct count (SQL COUNT(DISTINCT) semantics)
    but counted in n_events (COUNT(*)), so the final snapshot per key
    hash-matches the batch aggregate exactly. At 100 TB: state lives
    in the state store keyed by (user, event_type) — bounded by the
    live key space, not the stream length — and supports TTL where
    the corpus needs expiry."""

    def init(self, handle) -> None:
        self.counts = handle.getMapState(
            "type_counts", "event_type string", "n bigint"
        )
        self.totals = handle.getValueState("totals", "n_events bigint")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n = self.totals.get()[0] if self.totals.exists() else 0
        for pdf in rows:
            n += len(pdf)  # COUNT(*): NULL event_types still count
            # value_counts drops NaN/None — COUNT(DISTINCT) semantics
            for t, c in pdf["event_type"].value_counts().items():
                cur = (
                    self.counts.getValue((t,))[0]
                    if self.counts.containsKey((t,))
                    else 0
                )
                self.counts.updateValue((t,), (cur + int(c),))
        self.totals.update((n,))
        n_types = sum(1 for _ in self.counts.keys())
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "n_types": [n_types]}
        )

    def close(self) -> None:
        pass


def distinct_type_profiles_tws(events_stream):
    """Attach the transformWithState processor to a streaming events
    frame (columns: user_id, event_type). Output mode 'update' — one
    snapshot per touched key per micro-batch.

    ENVIRONMENT GATE: Spark's TransformWithStateInPySpark driver
    worker speaks protobuf to the state store, so running this needs
    the ``protobuf`` package (absent in the build container — the
    pytest skips and no registry row depends on it; the query-shape
    equivalent stays driver-proven through
    ``streaming_stateful_totals``'s applyInPandasWithState path)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # subclass dynamically so importing this module never hard-depends
    # on the Spark 4 API surface (graceful on older sessions)
    proc = type(
        "_TypeProfileTWS", (StatefulProcessor,), dict(TypeProfileProcessor.__dict__)
    )()
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
