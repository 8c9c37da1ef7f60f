"""Structured logging + operation counters (reference M1/M2/M5).

The reference Lambda emits one-line JSON events ``{event, level, ts,
**fields}`` (reference dubai-dataset/lambdas/data-ingestion/
lambda_handler.py:18-31) and keeps async-safe per-operation counters
returned in the job summary (lambda_handler.py:35-59). The engine keeps
the same observable contract; counters additionally have a Spark-
accumulator-backed variant for distributed code paths.
"""

from __future__ import annotations

import json
import sys
import threading
import time
from typing import Any


def log(event: str, level: str = "info", **fields: Any) -> dict[str, Any]:
    """Emit one structured JSON log line; returns the record."""
    record = {
        "event": event,
        "level": level,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        **fields,
    }
    print(json.dumps(record, default=str), file=sys.stderr, flush=True)
    return record


class OpCounter:
    """Thread-safe named counters (reference S3RequestCounter parity).

    The reference counts S3 API calls per operation plus a total; the
    engine counts whatever operations a job cares about (files fetched,
    bytes written, rows quarantined, ...).
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counts: dict[str, int] = {}

    def incr(self, op: str, n: int = 1) -> None:
        with self._lock:
            self._counts[op] = self._counts.get(op, 0) + n

    def snapshot(self) -> dict[str, int]:
        with self._lock:
            out = dict(self._counts)
        out["total"] = sum(out.values())
        return out


class AccumulatorCounter:
    """Executor-side counter: one Spark LongAccumulator per operation.

    Use inside ``foreachPartition``/UDF-adjacent code where Python
    threads on the driver can't see executor increments.
    """

    def __init__(self, spark, ops: list[str]) -> None:
        sc = spark.sparkContext
        self._accs = {op: sc.accumulator(0) for op in ops}

    def incr(self, op: str, n: int = 1) -> None:
        self._accs[op].add(n)

    def snapshot(self) -> dict[str, int]:
        out = {op: acc.value for op, acc in self._accs.items()}
        out["total"] = sum(out.values())
        return out


class Stopwatch:
    """Wall-clock + throughput accounting (reference M5 cost math)."""

    def __init__(self) -> None:
        self.t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    def mb_per_s(self, n_bytes: int) -> float:
        dt = self.elapsed()
        return (n_bytes / (1024 * 1024)) / dt if dt > 0 else 0.0
