#!/usr/bin/env python
"""IVF-PQ recall characterization: recall@10 vs nprobe x m.

A user reaching for IVF-PQ must pick (m, nprobe) from a measured
recall curve, not the code's defaults — FAISS publishes the same kind
of table for IndexIVFPQ. This probe builds one index per m on the
sf0.01 synthetic embeddings (64-dim uniform — the HARD case for PQ:
no cluster structure for codebooks to exploit, so these numbers are a
recall floor, not a ceiling) and measures mean/min recall@10 against
exact L2 over a fixed query set.

Usage: python tools/ivfpq_recall.py [n_queries]   (default 20)
Prints a markdown table for SCALING.md plus one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ais_data_pipeline_spark.operators.similarity import (
    _as_double_array,
    _l2sq,
    build_ivfpq_index,
    ivfpq_probe_topk,
)
from ais_data_pipeline_spark.session import get_spark
from ais_data_pipeline_spark.sources.parquet import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark(app_name="ivfpq_recall", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    e = read_table(spark, SF_DIR, "embeddings")
    queries = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in e.filter(F.col("vec_id") < n_queries).collect()
    }

    def exact_top10(qv):
        q = F.array(*[F.lit(x) for x in qv])
        return [
            r["vec_id"]
            for r in e.select(
                "vec_id", _l2sq(_as_double_array(F.col("embedding")), q).alias("d")
            )
            .orderBy(F.asc("d"), F.asc("vec_id"))
            .limit(10)
            .collect()
        ]

    exact = {vid: set(exact_top10(qv)) for vid, qv in queries.items()}

    results = {}
    for m in (4, 8):
        idx = tempfile.mkdtemp(prefix=f"ivfpq_recall_m{m}_")
        build_ivfpq_index(e, idx, n_centroids=8, m=m, k=8, iters=2, coarse_iters=2)
        for nprobe in (1, 2, 4, 8):
            recalls = []
            for vid, qv in queries.items():
                got = {
                    r["vec_id"]
                    for r in ivfpq_probe_topk(spark, idx, qv, k=10, nprobe=nprobe).collect()
                }
                recalls.append(len(got & exact[vid]) / 10.0)
            results[(m, nprobe)] = {
                "mean": sum(recalls) / len(recalls),
                "min": min(recalls),
            }
            print(f"m={m} nprobe={nprobe}: mean={results[(m, nprobe)]['mean']:.2f} "
                  f"min={results[(m, nprobe)]['min']:.2f}", flush=True)

    print("\n| m | code bits | nprobe=1 | nprobe=2 | nprobe=4 | nprobe=8 |")
    print("|---|---|---|---|---|---|")
    for m in (4, 8):
        cells = " | ".join(
            f"{results[(m, np_)]['mean']:.2f} (min {results[(m, np_)]['min']:.2f})"
            for np_ in (1, 2, 4, 8)
        )
        print(f"| {m} | {m * 3} | {cells} |")
    print()
    print(json.dumps({
        "n_queries": n_queries,
        "recall_at_10": {f"m{m}_nprobe{np_}": results[(m, np_)] for m, np_ in results},
    }))


if __name__ == "__main__":
    main()
