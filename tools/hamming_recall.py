#!/usr/bin/env python
"""Binary-Hamming recall characterization: recall@10 vs oversample.

A user of the 1-bit tier must pick the oversample (candidate pool)
from a measured recall curve — the sign-bit signature keeps only the
orthant of each vector, so on 64-dim uniform embeddings (the HARD
case: no cluster structure, cosine neighbors barely separate) these
numbers are a recall floor, not a ceiling. The re-rank stage is exact,
so recall converges to 1.0 as oversample approaches the corpus size;
the curve tells you what the popcount scan buys at each pool size.

Usage: python tools/hamming_recall.py [n_queries]   (default 20)
Prints a markdown table for SCALING.md plus one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ais_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    hamming_rerank_topk,
)
from ais_data_pipeline_spark.session import get_spark
from ais_data_pipeline_spark.sources.parquet import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
OVERSAMPLES = (25, 50, 100, 200)


def main() -> None:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark(
        app_name="hamming_recall", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = read_table(spark, SF_DIR, "embeddings")
    n_corpus = e.count()
    queries = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in e.filter(F.col("vec_id") < n_queries).collect()
    }

    exact = {
        vid: {r["vec_id"] for r in cosine_topk(e, qv, k=10).collect()}
        for vid, qv in queries.items()
    }

    results = {}
    for ov in OVERSAMPLES:
        recalls = []
        for vid, qv in queries.items():
            got = {
                r["vec_id"]
                for r in hamming_rerank_topk(e, qv, k=10, oversample=ov).collect()
            }
            recalls.append(len(got & exact[vid]) / 10.0)
        results[ov] = {"mean": sum(recalls) / len(recalls), "min": min(recalls)}
        print(
            f"oversample={ov}: mean={results[ov]['mean']:.2f} "
            f"min={results[ov]['min']:.2f}",
            flush=True,
        )

    print("\n| oversample | share of corpus | recall@10 mean | min |")
    print("|---|---|---|---|")
    for ov in OVERSAMPLES:
        print(
            f"| {ov} | {ov / n_corpus:.0%} | {results[ov]['mean']:.2f} "
            f"| {results[ov]['min']:.2f} |"
        )
    print()
    print(
        json.dumps(
            {
                "n_queries": n_queries,
                "n_corpus": n_corpus,
                "recall_at_10": {str(ov): results[ov] for ov in OVERSAMPLES},
            }
        )
    )


if __name__ == "__main__":
    main()
