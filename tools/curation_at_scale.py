#!/usr/bin/env python
"""Curation pipeline at reference scale: the per-round bench proves
exact-dedup → MinHash near-dup → quality filtering at sf0.1 (~5k docs);
this tool proves the SCALE PATH (LSH-bucketed near-dup, not the
brute-force oracle variant) on a multi-GiB generated document corpus
under an explicitly CAPPED JVM heap, reporting per-stage survivor
counts, throughput, and the measured peak heap — so "the curation tier
is scale-safe" is a number, not a claim.

Corpus: deterministic synthetic docs (50–400 tokens from a 30k-token
vocabulary, token choice = xxhash64(base_id, pos)) with planted
duplicates — 2% exact copies (doc_id%50==1 copies id-1) and 2%
near-duplicates (doc_id%50==2 re-rolls every 17th token of id-2:
~6% token churn → 3-gram Jaccard ≈ 0.7, above the 0.5 threshold) —
so each stage's removal count has a known expectation to sanity-check
against. Default 3M docs ≈ 4.4 GiB of raw text, cached under /tmp.

Runs in its OWN JVM so the heap cap is real. Corpus generation runs in
a SEPARATE, uncapped JVM first (``--generate`` self-invocation): the
round-6 driver run generated the 1.7 GiB corpus inside the capped
session and the combined footprint OOMed the measured run — the cap is
a claim about the CURATION stages, not about fixture generation.

Usage: python tools/curation_at_scale.py  (env:
SPARK_GRAFT_CURATION_DOCS, SPARK_GRAFT_SCALE_HEAP default 4g)
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCS = int(os.environ.get("SPARK_GRAFT_CURATION_DOCS", 3_000_000))
HEAP = os.environ.get("SPARK_GRAFT_SCALE_HEAP", "4g")
VOCAB = 30_000


def generate_corpus(spark, path: str, n_docs: int) -> None:
    from pyspark.sql import functions as F

    base_id = (
        F.when(F.col("id") % 50 == 1, F.col("id") - 1)
        .when(F.col("id") % 50 == 2, F.col("id") - 2)
        .otherwise(F.col("id"))
    )
    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), base_id.alias("__base")
    )
    n_tokens = F.pmod(F.xxhash64(F.col("__base"), F.lit(0)), F.lit(351)) + F.lit(50)
    is_near = F.col("doc_id") % 50 == 2

    def token(p):
        base_tok = F.pmod(F.xxhash64(F.col("__base"), p), F.lit(VOCAB))
        # near-dup docs re-roll every 17th position from their OWN id
        churn_tok = F.pmod(F.xxhash64(F.col("doc_id"), p), F.lit(VOCAB))
        return F.concat(
            F.lit("w"),
            F.when(is_near & (p % 17 == 0), churn_tok).otherwise(base_tok),
        )

    text = F.array_join(F.transform(F.sequence(F.lit(1), n_tokens), token), " ")
    (
        df.select(F.col("doc_id"), text.alias("text"))
        .repartition(64)
        .write.mode("overwrite")
        .parquet(path)
    )


def _generate_main() -> None:
    """Corpus-generation leg: its own (uncapped, 8g) JVM, exits after
    the write. Kept out of the capped measured session so fixture
    generation can never eat the headroom the curation stages are
    being graded on."""
    os.environ["SPARK_DRIVER_MEMORY"] = os.environ.get(
        "SPARK_GRAFT_CURATION_GEN_HEAP", "8g"
    )
    from ais_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="curation_at_scale_generate")
    spark.sparkContext.setLogLevel("ERROR")
    generate_corpus(spark, f"/tmp/ais_scale_curation_{DOCS}", DOCS)
    spark.stop()


def main() -> None:
    corpus = f"/tmp/ais_scale_curation_{DOCS}"
    if not glob.glob(os.path.join(corpus, "*.parquet")):
        # cold cache: generate in a separate uncapped JVM, then start
        # the capped measured session
        gen = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--generate"],
            timeout=1200,
        )
        if gen.returncode != 0 or not glob.glob(os.path.join(corpus, "*.parquet")):
            raise RuntimeError(
                f"corpus generation failed (rc={gen.returncode})"
            )

    os.environ["SPARK_DRIVER_MEMORY"] = HEAP
    from pyspark.sql import functions as F

    from ais_data_pipeline_spark.operators.dedup import minhash_near_dup
    from ais_data_pipeline_spark.operators.text import quality_col
    from ais_data_pipeline_spark.operators.util import gated_broadcast
    from ais_data_pipeline_spark.session import get_spark
    from tools.pipeline_at_scale import _HeapPoller

    # Headroom confs (round-6 verdict: the near-dup stage peaked at 98%
    # of the 4g cap — one allocator hiccup from OOM, and the driver's
    # r6 run DID OOM). All four are pure memory/granularity knobs —
    # stage results are identical:
    # - 128 shuffle partitions quarter the per-task hash-agg/join
    #   footprint of the band-row and shingle-verify shuffles;
    # - 32 MiB input splits bound how much raw text one scan task owns;
    # - columnarReaderBatchSize 512 (from 4096) cuts 8x the resident
    #   decoded-text column vectors per scan task — the r6-style OOM's
    #   actual allocation site was the vectorized parquet reader
    #   reserving contiguous string buffers across 32 concurrent tasks;
    # - memory.fraction 0.45 (from 0.6) makes execution spill earlier,
    #   reserving more heap for those unmanaged reader allocations.
    spark = get_spark(
        app_name="curation_at_scale",
        shuffle_partitions=128,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
            "spark.sql.parquet.columnarReaderBatchSize": "512",
            "spark.memory.fraction": "0.45",
            # G1: keep 15% of regions free for evacuation and start
            # concurrent marking earlier — trims the floating-garbage
            # component of peak used-heap under a tight cap
            "spark.driver.extraJavaOptions": (
                "-XX:G1ReservePercent=15 -XX:InitiatingHeapOccupancyPercent=35"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    parquet_bytes = sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(corpus, "*.parquet"))
    )

    d = spark.read.parquet(corpus)
    text_bytes = d.agg(F.sum(F.length("text"))).first()[0]

    from tools.pipeline_at_scale import gc_millis

    load_before = os.getloadavg()
    gc0 = gc_millis(spark)
    t0 = time.perf_counter()
    with _HeapPoller(spark) as poller:
        # The bounded-memory rule at this scale: TEXT NEVER SHUFFLES
        # and never pins in checkpoint blocks. Each stage computes its
        # (small) DROP id-set — duplicates are a few % of the corpus —
        # and survivors are broadcast anti-joins re-applied to the raw
        # scan. (The first cut of this tool localCheckpointed full-text
        # survivor frames and shuffled text through the survivor join:
        # OOM at 3M docs under the 4 GiB cap. Broadcast-drop-set, by
        # contrast, shuffles only (doc_id, hash) pairs and band rows.)

        # stage 1: exact dedup — AND the quality flag, fused into the
        # same text pass (r15, r14 verdict stretch 8): quality is a
        # pure per-doc function, independent of the dedup decisions,
        # so the only reason stage 3 re-read 4.3 GiB of text was that
        # nobody had computed the flag while the text was already in
        # cache. The side-channel is textless — (doc_id, md5-hex,
        # bool) ≈ 41 B/doc — and goes to SCRATCH PARQUET, not
        # checkpoint blocks: the fused projection's transient
        # footprint (string vectors + token arrays + md5) already
        # rides the 4g cap's margin, and in-memory blocks competing
        # for storage memory tipped the first r15 cut into reader
        # OOMs. ~40 MB on disk, re-read twice, both scans trivial.
        scan1_path = corpus + "_scan1"
        (
            d.select(
                "doc_id",
                F.md5(F.col("text").cast("binary")).alias("h"),
                # round(...,5) >= t replicates quality_score's 5-dp
                # decision boundary exactly (same recipe as
                # plans.curation.run_curation)
                (F.round(quality_col(F.col("text")), 5) >= 0.65).alias("qp"),
            )
            .write.mode("overwrite")
            .parquet(scan1_path)
        )
        scan1 = spark.read.parquet(scan1_path)
        keep_min = scan1.groupBy("h").agg(F.min("doc_id").alias("__keep"))
        drop_exact = (
            scan1.join(keep_min, "h")
            .filter(F.col("doc_id") != F.col("__keep"))
            .select("doc_id")
            .localCheckpoint(eager=True)  # small: dup ids only
        )
        n_drop1 = drop_exact.count()
        # size-gated (r17, shared with plans.curation/web_corpus)
        s1 = d.join(gated_broadcast(drop_exact, n_drop1), "doc_id", "left_anti")
        n1 = DOCS - n_drop1
        t1 = time.perf_counter()

        # stage 2: LSH near-dup on survivors (banded buckets + exact-
        # Jaccard verify); again only the drop ids materialize
        drop_near = (
            minhash_near_dup(s1, threshold=0.5, n_hashes=32, bands=16)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_drop2 = drop_near.count()
        s2 = s1.join(gated_broadcast(drop_near, n_drop2), "doc_id", "left_anti")
        n2 = n1 - n_drop2
        t2 = time.perf_counter()

        # stage 3: set arithmetic over the fused side-channel — ZERO
        # text re-scan. survivors passing = all passing − passing
        # among the (disjoint) drop sets; identical to filtering s2
        # by construction, pinned by the pytest fusion-equivalence
        # test and the unchanged planted-dup accounting below.
        qual = scan1.select("doc_id", "qp")
        n_pass_all = qual.filter("qp").count()
        n_drop_pass = (
            qual.join(
                gated_broadcast(
                    drop_exact.unionByName(drop_near), n_drop1 + n_drop2
                ),
                "doc_id",
            )
            .filter("qp")
            .count()
        )
        n3 = n_pass_all - n_drop_pass
        t3 = time.perf_counter()
    dt = t3 - t0
    gc_ms = gc_millis(spark) - gc0
    load_after = os.getloadavg()

    # Post-run LIVE set: peak USED heap under a tight cap is dominated
    # by G1 floating garbage (used floats to ~94% of ANY cap before
    # mixed collections — measured identically at 4g with 32 and 24
    # task threads). The margin that actually guards against OOM is
    # live data + transient allocations, so report used-after-full-GC
    # alongside the raw peak.
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
                "metric": "curation_at_reference_scale",
                "n_docs": DOCS,
                "text_mib": round(text_bytes / 2**20, 2),
                "parquet_mib": round(parquet_bytes / 2**20, 2),
                "stage_counts": {
                    "00_total": DOCS,
                    "01_exact_dedup": n1,
                    "02_near_dup": n2,
                    "03_quality": n3,
                },
                "planted": {
                    "exact_copies": DOCS // 50,
                    "near_dups": DOCS // 50,
                },
                "stage_sec": {
                    "exact": round(t1 - t0, 1),
                    "near_dup": round(t2 - t1, 1),
                    "quality": round(t3 - t2, 1),
                },
                "elapsed_sec": round(dt, 1),
                "text_mib_per_sec": round(text_bytes / 2**20 / dt, 1),
                "heap_cap": HEAP,
                "peak_heap_mib": poller.peak_mib,
                "post_gc_live_mib": round(live / 2**20, 1),
                "gc_ms": gc_ms,
                "gc_frac": round(gc_ms / (dt * 1000), 3),
                "load_avg_before": [round(x, 2) for x in load_before],
                "load_avg_after": [round(x, 2) for x in load_after],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    if "--generate" in sys.argv[1:]:
        _generate_main()
    else:
        main()
