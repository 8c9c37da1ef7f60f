#!/usr/bin/env python
"""Sub-stage profile of the curation near-dup leg (round-14 verdict
item 2): times each prefix of the MinHash-LSH plan on the cached
at-scale corpus so the optimization target is measured, not guessed.

Prefixes (each forced via the noop sink / a count):
  shingle    scan -> tokens -> shingle-hash arrays
  signature  + 32-permutation minhash signature
  band_rows  + banded bucket explode (docs x bands rows)
  candidates LSH candidate pairs (band-bucket self-join + distinct)
  full       minhash_near_dup (candidates + exact-Jaccard verify)

Usage: python tools/profile_near_dup.py [n_docs]  (default 750k slice
of the cached 3M corpus; generates it first if absent).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/ais_scale_curation_3000000"


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 750_000
    from ais_data_pipeline_spark.session import get_spark
    from ais_data_pipeline_spark.operators.dedup import (
        minhash_band_rows,
        minhash_lsh_candidates,
        minhash_near_dup,
        minhash_signature,
        shingle_hashes_from_tokens,
        tokens_lower,
    )
    from ais_data_pipeline_spark.operators.util import spread_to_parallelism
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="profile_near_dup",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    if not os.path.isdir(CORPUS):
        print("corpus missing — run tools/curation_at_scale.py first", file=sys.stderr)
        sys.exit(1)
    docs = spark.read.parquet(CORPUS).filter(F.col("doc_id") < n_docs)
    docs.count()  # warm the scan / page cache

    out: dict[str, float] = {"n_docs": n_docs}

    def leg(name: str, df, force="noop"):
        t0 = time.perf_counter()
        if force == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            out[name + "_rows"] = df.count()
        out[name] = round(time.perf_counter() - t0, 2)
        print(name, out[name], flush=True)

    toked = spread_to_parallelism(docs).select(
        F.col("doc_id").alias("doc"), tokens_lower(F.col("text")).alias("__tok")
    )
    sh = toked.select(
        "doc", shingle_hashes_from_tokens(F.col("__tok"), 3).alias("__sh")
    )
    leg("shingle", sh.select("doc", F.size("__sh").alias("n")))
    sig = sh.select("doc", minhash_signature(F.col("__sh"), 32, 42).alias("sig"))
    leg("signature", sig.select("doc", F.size("sig").alias("n")))
    leg("band_rows", minhash_band_rows(docs, 32, 16, "text", "doc_id"))
    leg(
        "candidates",
        minhash_lsh_candidates(docs, 32, 16, "text", "doc_id"),
        force="count",
    )
    leg("full", minhash_near_dup(docs, 0.5, 32, 16, "text", "doc_id"), force="count")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
