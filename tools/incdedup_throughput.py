#!/usr/bin/env python
"""Incremental-dedup THROUGHPUT vs batch size: SCALING.md's flat-probe
table fixes the batch at 500–1000 docs and grows the index — proving
O(batch) latency. A 100 TB ingest also cares about the other axis: how
many MiB/s of batch text one driver sustains as batches grow, against a
fixed large index. This probe builds a 500k-doc index once, then times
``dedup_batch_against_index`` for batches of 1k / 10k / 100k docs
(half exact copies of history → exercise the drop path, half fresh →
exercise the survive path) and reports per-batch seconds and MiB/s.

Batch sizes straddle ``pushdown_limit`` (10k) deliberately: 1k/10k use
the literal IN-filter + bloom row-group-skip path, 100k flips to the
broadcast-semi-join path — the probe prices both probe strategies.

Usage: python tools/incdedup_throughput.py
(env: SPARK_GRAFT_INCDEDUP_INDEX_DOCS default 500_000,
 SPARK_GRAFT_INCDEDUP_BATCHES default "1000,10000,100000")
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INDEX_DOCS = int(os.environ.get("SPARK_GRAFT_INCDEDUP_INDEX_DOCS", 500_000))
BATCHES = [
    int(x)
    for x in os.environ.get(
        "SPARK_GRAFT_INCDEDUP_BATCHES", "1000,10000,100000"
    ).split(",")
]


def main() -> None:
    from pyspark.sql import functions as F

    from ais_data_pipeline_spark.session import get_spark
    from ais_data_pipeline_spark.streaming.incremental_dedup import (
        build_dedup_index,
        dedup_batch_against_index,
    )
    from tools.scaling_probe import gen_documents

    spark = get_spark(app_name="incdedup_throughput")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="ais_incdedup_tp_")
    idx = os.path.join(root, "index")
    corpus = gen_documents(spark, INDEX_DOCS)
    t0 = time.perf_counter()
    build_dedup_index(corpus, idx)
    build_sec = round(time.perf_counter() - t0, 1)

    results = []
    for b in BATCHES:
        # half the batch copies history texts (ids 0..b/2 → drop), half
        # is fresh (ids INDEX_DOCS.. → survive); doc_ids offset past any
        # real id so survivor accounting is unambiguous
        half = b // 2
        copies = gen_documents(spark, half)
        fresh = (
            gen_documents(spark, INDEX_DOCS + (b - half))
            .filter(F.col("doc_id") >= INDEX_DOCS)
        )
        batch = (
            copies.unionAll(fresh)
            .withColumn("doc_id", F.col("doc_id") + 1_000_000_000)
            .localCheckpoint(eager=True)  # fixture cost out of the timing
        )
        text_bytes = batch.agg(F.sum(F.length("text"))).first()[0]
        t0 = time.perf_counter()
        survivors = dedup_batch_against_index(batch, idx).count()
        dt = time.perf_counter() - t0
        results.append(
            {
                "batch_docs": b,
                "survivors": survivors,
                "text_mib": round(text_bytes / 2**20, 1),
                "sec": round(dt, 1),
                "text_mib_per_sec": round(text_bytes / 2**20 / dt, 1),
            }
        )

    print(
        json.dumps(
            {
                "metric": "incdedup_batch_throughput",
                "index_docs": INDEX_DOCS,
                "index_build_sec": build_sec,
                "batches": results,
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
