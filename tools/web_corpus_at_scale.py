#!/usr/bin/env python
"""Web-corpus plan at GiB scale: the pytest proves the raw-WARC →
training-shards chain on fixture bytes; this tool proves the SCALE
PATH — streaming one-task-per-shard WARC parse, HTTP splitting,
HTML→text extraction, size-gated dedup anti-joins, scratch-parquet
side-channel — on a multi-GiB generated crawl under an explicitly
CAPPED JVM heap, reporting per-stage survivor counts against planted
expectations, throughput, and measured peak heap (r16 verdict item 2's
"Done" clause: every other composed plan has this row; web_corpus ran
only at pytest scale and its two scale assumptions were exactly the
ungated broadcasts and the full-text localCheckpoint this round
removed).

Corpus: deterministic synthetic HTML response records across
``SPARK_GRAFT_WEBCORPUS_SHARDS`` .warc.gz shards (one gzip member per
record, the CC layout). Per doc_id % 50 the crawl plants: 1 dirty
URL-variant refetch of id-1 (canonical-URL dedup drops it), 1 exact
body copy of id-2 under a new URL (exact dedup drops it), 1 garbage
page (quality drops it), one 404 + one binary + one malformed record
(the HTTP split quarantines / filters them before stage 0) — so every
stage's removal count has a closed expectation. Default 600k docs ≈
1 GiB of decompressed HTML.

Generation runs in its OWN uncapped JVM first (the curation_at_scale
lesson: fixture generation must never eat the headroom the measured
stages are graded on); the measured run is a fresh capped JVM.

Usage: python tools/web_corpus_at_scale.py  (env:
SPARK_GRAFT_WEBCORPUS_DOCS, SPARK_GRAFT_WEBCORPUS_SHARDS,
SPARK_GRAFT_SCALE_HEAP default 4g)
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

DOCS = int(os.environ.get("SPARK_GRAFT_WEBCORPUS_DOCS", 600_000))
SHARDS = int(os.environ.get("SPARK_GRAFT_WEBCORPUS_SHARDS", 64))
HEAP = os.environ.get("SPARK_GRAFT_SCALE_HEAP", "4g")
VOCAB = 30_000
QUALITY_THRESHOLD = 0.6  # >=100-token synthetic docs score 0.7; garbage 0.46


def _doc_text(base_id: int) -> str:
    """Deterministic synthetic page text: 110-360 'wNNNNN' tokens from
    the shared vocabulary, all seeded by base_id — copies regenerate
    bit-identically from their base."""
    import random

    rng = random.Random(base_id * 2654435761 % (1 << 31))
    n = 110 + rng.randrange(251)
    return " ".join(f"w{rng.randrange(VOCAB)}" for _ in range(n))


def _page_html(base_id: int) -> bytes:
    t = _doc_text(base_id)
    return (
        f"<html><head><title>Page {base_id}</title>"
        f"<script>track({base_id});</script>"
        f"<style>p {{ margin: 0 }}</style></head>"
        f"<body><!-- gen {base_id} --><p>{t}</p>"
        f"<a href='/nav'>nav home</a></body></html>"
    ).encode()


def _record_for(doc_id: int) -> dict:
    """(warc record dict) for one doc_id, per the planted plan."""
    from ais_data_pipeline_spark.sources.http_payload import (
        encode_http_response,
    )

    cls = doc_id % 50
    html_hdrs = [("Content-Type", "text/html; charset=utf-8")]
    uri = f"http://example.org/p/{doc_id}"
    if cls == 1:  # dirty refetch of id-1: same canonical URL, same body
        uri = f"HTTP://EXAMPLE.ORG:80/p/{doc_id - 1}?utm_source=feed"
        payload = encode_http_response(
            200, "OK", html_hdrs, _page_html(doc_id - 1),
            chunked=(doc_id % 2 == 0),
        )
    elif cls == 2:  # exact body copy of id-2 under a brand-new URL
        payload = encode_http_response(
            200, "OK", html_hdrs, _page_html(doc_id - 2),
            content_encoding="gzip",
        )
    elif cls == 3:  # quality reject: short garbage
        payload = encode_http_response(
            200, "OK", [("Content-Type", "text/plain")], b"zz " * 40
        )
    elif cls == 4:  # pre-stage-0: 404
        payload = encode_http_response(
            404, "Not Found", html_hdrs, b"<p>gone</p>"
        )
    elif cls == 5:  # pre-stage-0: binary body (no body_text)
        payload = encode_http_response(
            200, "OK", [("Content-Type", "image/png")], b"\x89PNG" * 16
        )
    elif cls == 6:  # pre-stage-0: malformed HTTP message -> http_error
        payload = b"this is not an http message"
    else:
        payload = encode_http_response(
            200, "OK", html_hdrs, _page_html(doc_id),
            chunked=(doc_id % 3 == 0),
            content_encoding="gzip" if doc_id % 4 == 1 else None,
        )
    return dict(
        warc_type="response",
        record_id=f"<urn:doc:{doc_id}>",
        warc_date="2024-01-01T00:00:00Z",
        target_uri=uri,
        content_type="application/http; msgtype=response",
        payload=payload,
    )


def generate_corpus(spark, path: str, n_docs: int, n_shards: int) -> None:
    """Each shard task writes its own .warc.gz (one gzip member per
    record) — the generation parallel unit IS the read parallel unit."""
    from pyspark.sql import functions as F

    os.makedirs(path, exist_ok=True)

    def write_shard(pdf):
        import pandas as pd

        from ais_data_pipeline_spark.sources.warc import encode_warc_records

        shard = int(pdf["shard"].iloc[0])
        ids = sorted(int(i) for i in pdf["doc_id"])
        recs = [_record_for(i) for i in ids]
        with open(f"{path}/shard-{shard:04d}.warc.gz", "wb") as f:
            f.write(encode_warc_records(recs))
        return pd.DataFrame({"shard": [shard], "n": [len(recs)]})

    (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % n_shards).cast("int").alias("shard"),
        )
        .groupBy("shard")
        .applyInPandas(write_shard, "shard int, n long")
        .collect()
    )


def _generate_main() -> None:
    os.environ["SPARK_DRIVER_MEMORY"] = os.environ.get(
        "SPARK_GRAFT_WEBCORPUS_GEN_HEAP", "8g"
    )
    from ais_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="web_corpus_at_scale_generate")
    spark.sparkContext.setLogLevel("ERROR")
    generate_corpus(spark, f"/tmp/ais_scale_webcorpus_{DOCS}", DOCS, SHARDS)
    spark.stop()


def main() -> None:
    corpus = f"/tmp/ais_scale_webcorpus_{DOCS}"
    if len(glob.glob(os.path.join(corpus, "*.warc.gz"))) != SHARDS:
        gen = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--generate"],
            timeout=2400,
        )
        if gen.returncode != 0 or not glob.glob(
            os.path.join(corpus, "*.warc.gz")
        ):
            raise RuntimeError(f"corpus generation failed (rc={gen.returncode})")

    os.environ["SPARK_DRIVER_MEMORY"] = HEAP
    from ais_data_pipeline_spark.plans.web_corpus import run_web_corpus
    from ais_data_pipeline_spark.session import get_spark
    from tools.pipeline_at_scale import _HeapPoller, gc_millis

    # same headroom confs as curation_at_scale (they are memory/
    # granularity knobs only; results identical)
    spark = get_spark(
        app_name="web_corpus_at_scale",
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

    warc_bytes = sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(corpus, "*.warc.gz"))
    )
    out = f"/tmp/ais_scale_webcorpus_out_{DOCS}"
    shutil.rmtree(out, ignore_errors=True)

    load_before = os.getloadavg()
    gc0 = gc_millis(spark)
    t0 = time.perf_counter()
    with _HeapPoller(spark) as poller:
        res = run_web_corpus(
            spark,
            os.path.join(corpus, "*.warc.gz"),
            out,
            quality_threshold=QUALITY_THRESHOLD,
            n_shards=64,
            input_format="warc",
        )
    dt = time.perf_counter() - t0
    gc_ms = gc_millis(spark) - gc0
    load_after = os.getloadavg()

    # decompressed-text volume: measure from the written shards + the
    # known drop classes is circular; report the parse-side volume the
    # plan actually moved (sum of kept text lengths via one scan)
    from pyspark.sql import functions as F

    text_bytes = (
        spark.read.parquet(out).agg(F.sum(F.length("text"))).first()[0]
    )

    per50 = DOCS // 50
    expected = {
        "00_conversion_records": DOCS - 3 * per50,  # 404/png/malformed out
        "01_url_dedup": DOCS - 4 * per50,
        "02_quality": DOCS - 5 * per50,
        "03_exact_dedup": DOCS - 6 * per50,
    }
    ok = res.stage_counts == expected

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
                "metric": "web_corpus_at_scale",
                "n_docs": DOCS,
                "n_shards": SHARDS,
                "warc_gz_mib": round(warc_bytes / 2**20, 2),
                "kept_text_mib": round((text_bytes or 0) / 2**20, 2),
                "stage_counts": res.stage_counts,
                "stage_counts_expected": expected,
                "stage_counts_exact": ok,
                "elapsed_sec": round(dt, 1),
                "warc_gz_mib_per_sec": round(warc_bytes / 2**20 / dt, 1),
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
