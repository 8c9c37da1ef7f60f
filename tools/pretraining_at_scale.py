#!/usr/bin/env python
"""The pretraining capstone plan (curate → mixture → pack → shard) at
reference scale: the oracle proves the COMPOSITION at sf0.01; this
tool proves the composed plan's bounded-memory story on the same
3M-doc / 4.3 GiB corpus the curation probe uses, under the same capped
4 GiB heap, and reports per-stage (docs, tokens) accounting plus peak
and post-GC-live heap.

The corpus (shared with tools/curation_at_scale.py, cached in /tmp)
has no source column; a deterministic ``doc_id % 20`` source stands in
for the mixture stage, mirroring the 20-source documents fixture.
Sample size defaults to 500k docs (~20% of the curated corpus) so the
pack/shard stages run at real scale too.

Usage: python tools/pretraining_at_scale.py  (env:
SPARK_GRAFT_CURATION_DOCS default 3_000_000, SPARK_GRAFT_SCALE_HEAP
default 4g, SPARK_GRAFT_PRETRAIN_SAMPLE_K default 500_000)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS = int(os.environ.get("SPARK_GRAFT_CURATION_DOCS", 3_000_000))
HEAP = os.environ.get("SPARK_GRAFT_SCALE_HEAP", "4g")
SAMPLE_K = int(os.environ.get("SPARK_GRAFT_PRETRAIN_SAMPLE_K", 500_000))


def main() -> None:
    corpus = f"/tmp/ais_scale_curation_{DOCS}"
    if not glob.glob(os.path.join(corpus, "*.parquet")):
        gen = subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(os.path.abspath(__file__)), "curation_at_scale.py"),
                "--generate",
            ],
            timeout=1200,
        )
        if gen.returncode != 0:
            raise RuntimeError(f"corpus generation failed (rc={gen.returncode})")

    os.environ["SPARK_DRIVER_MEMORY"] = HEAP
    from pyspark.sql import functions as F

    from ais_data_pipeline_spark.plans.pretraining import run_pretraining
    from ais_data_pipeline_spark.session import get_spark
    from tools.pipeline_at_scale import _HeapPoller

    spark = get_spark(
        app_name="pretraining_at_scale",
        shuffle_partitions=128,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.sql.parquet.columnarReaderBatchSize": "512",
            "spark.memory.fraction": "0.45",
            "spark.driver.extraJavaOptions": (
                "-XX:G1ReservePercent=15 -XX:InitiatingHeapOccupancyPercent=35"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(corpus).withColumn(
        "source", F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string"))
    )
    out_root = f"/tmp/ais_scale_pretrain_{DOCS}"
    shutil.rmtree(out_root, ignore_errors=True)

    t0 = time.perf_counter()
    with _HeapPoller(spark) as poller:
        # no max_bucket_size: this corpus plants dups in PAIRS (no
        # degenerate cluster), and uncapped keeps the curation stage
        # counts bit-identical to tools/curation_at_scale.py's
        res = run_pretraining(spark, docs, out_root, sample_k=SAMPLE_K)
    dt = time.perf_counter() - t0

    jvm = spark._jvm
    jvm.java.lang.System.gc()
    time.sleep(1.0)
    live = (
        jvm.java.lang.management.ManagementFactory.getMemoryMXBean()
        .getHeapMemoryUsage()
        .getUsed()
    )

    print(
        json.dumps(
            {
                "metric": "pretraining_capstone_at_scale",
                "n_docs": DOCS,
                "sample_k": SAMPLE_K,
                "stage_rows": [
                    {"stage": s, "n_units": u, "n_tokens": t}
                    for s, u, t in res.stage_rows
                ],
                "elapsed_sec": round(dt, 1),
                "heap_cap": HEAP,
                "peak_heap_mib": poller.peak_mib,
                "post_gc_live_mib": round(live / 2**20, 1),
            }
        )
    )
    shutil.rmtree(out_root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
