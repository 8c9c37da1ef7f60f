#!/usr/bin/env python
"""WARC-source throughput probe: the measured cost of the streaming
one-task-per-file reader (`sources/warc.py`) — the number a Common
Crawl-scale ingest needs for sizing. CC ships ~1 GiB .warc.gz files;
the reader's unit of parallelism is the file, so per-node throughput
is (files in flight × per-file MB/s) and the per-file number here is
the sizing constant.

Method: synthesize n_files multi-member .warc.gz shards of n_recs
records each (conversion records with ~payload_kb text payloads, the
WET shape), then read them through read_warc and aggregate a checksum
so nothing is optimized away. Reports compressed and uncompressed
MB/s per node and records/s, plus a 2x-files run to pin the
per-file-parallel scaling shape.

Emits one JSON line:
  {"metric": "warc_throughput", "cpus": ..., "n_files": ...,
   "recs_per_file": ..., "payload_kb": ..., "gz_mb": ...,
   "raw_mb": ..., "sec": ..., "raw_mb_per_sec": ...,
   "recs_per_sec": ..., "scale_2x_ratio": ...}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ais_data_pipeline_spark.session import get_spark

N_FILES = int(os.environ.get("WARC_PROBE_FILES", 8))
RECS = int(os.environ.get("WARC_PROBE_RECS", 2000))
PAYLOAD_KB = int(os.environ.get("WARC_PROBE_KB", 8))


def build_shard(path: str, shard: int, n_recs: int, payload_kb: int) -> int:
    """Deterministic shard; returns uncompressed payload bytes."""
    from ais_data_pipeline_spark.sources.warc import encode_warc_records

    # repeated-token text so gzip behaves like web text (~3-4x), not
    # like random bytes (1x) or constants (100x)
    words = [f"tok{k} " for k in range(64)]
    raw = 0
    recs = []
    for r in range(n_recs):
        body = (
            "".join(words[(r + j) % 64] for j in range(payload_kb * 1024 // 7))
        ).encode()[: payload_kb * 1024]
        raw += len(body)
        recs.append(
            dict(
                warc_type="conversion",
                record_id=f"<urn:doc:{shard}:{r}>",
                warc_date="2024-01-01T00:00:00Z",
                target_uri=f"http://example.org/{shard}/{r}",
                content_type="text/plain",
                payload=body,
            )
        )
    with open(path, "wb") as f:
        f.write(encode_warc_records(recs))
    return raw


def main() -> None:
    from pyspark.sql import functions as F

    from ais_data_pipeline_spark.sources.warc import read_warc

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="warc_probe", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    d = tempfile.mkdtemp(prefix="warc_probe_")
    paths, raw_bytes = [], 0
    for s in range(N_FILES):
        p = os.path.join(d, f"shard-{s:03d}.warc.gz")
        raw_bytes += build_shard(p, s, RECS, PAYLOAD_KB)
        paths.append(p)
    gz_bytes = sum(os.path.getsize(p) for p in paths)

    def run(ps: list[str]) -> tuple[float, int]:
        t0 = time.perf_counter()
        row = (
            read_warc(spark, ps)
            .agg(
                F.count("*").alias("n"),
                F.sum(F.octet_length("payload")).alias("b"),
            )
            .collect()[0]
        )
        sec = time.perf_counter() - t0
        assert row["n"] == len(ps) * RECS and row["b"] > 0
        return sec, int(row["b"])

    run(paths[:2])  # warm the Python workers / codegen
    sec, _ = run(paths)
    half_sec, _ = run(paths[: max(1, N_FILES // 2)])
    out = {
        "metric": "warc_throughput",
        "cpus": cpus,
        "n_files": N_FILES,
        "recs_per_file": RECS,
        "payload_kb": PAYLOAD_KB,
        "gz_mb": round(gz_bytes / 1e6, 1),
        "raw_mb": round(raw_bytes / 1e6, 1),
        "sec": round(sec, 3),
        "raw_mb_per_sec": round(raw_bytes / 1e6 / sec, 1),
        "recs_per_sec": round(N_FILES * RECS / sec),
        # files are the parallel unit: half the files in no less than
        # ~half the time means per-file cost is flat (no cross-file
        # serialization); ratio = full_sec / half_sec, ~2.0 ideal at
        # n_files <= cpus, lower when task scheduling amortizes
        "scale_2x_ratio": round(sec / half_sec, 2),
    }
    print(json.dumps(out))
    import shutil

    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
