#!/usr/bin/env python
"""Scaling probe: run core operators on synthetic data at growing row
counts and report wall-clock scaling factors. Near-linear growth (and
sublinear per-row cost) is the evidence that the plans would survive a
1000x scale-up; superlinear growth flags a shuffle/skew problem.

Synthetic generators mirror the testdata distributions (same columns,
same cardinality ratios) so the plans are identical to the bench ones.
Usage: python tools/scaling_probe.py [scales...]  (default 1 10 50)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ais_data_pipeline_spark.session import get_spark

BASE_EVENTS = 100_000       # sf0.1 events rows
BASE_LINEITEM = 600_000     # sf0.1 lineitem rows
BASE_DOCS = 5_000           # sf0.1 documents rows


def gen_lineitem(spark, rows: int):
    return (
        spark.range(rows)
        .select(
            (F.col("id") % (rows // 4)).alias("l_orderkey"),
            (F.col("id") % 20000).alias("l_partkey"),
            (F.col("id") % 1000).alias("l_suppkey"),
            (F.col("id") % 7).cast("int").alias("l_linenumber"),
            (F.col("id") % 50 + 1).cast("double").alias("l_quantity"),
            ((F.col("id") % 90000) + 900.0).alias("l_extendedprice"),
            ((F.col("id") % 11) / 100.0).alias("l_discount"),
            ((F.col("id") % 9) / 100.0).alias("l_tax"),
            F.element_at(F.array(F.lit("A"), F.lit("N"), F.lit("R")), (F.col("id") % 3 + 1).cast("int")).alias("l_returnflag"),
            F.element_at(F.array(F.lit("O"), F.lit("F")), (F.col("id") % 2 + 1).cast("int")).alias("l_linestatus"),
            F.date_add(F.lit("1995-01-01").cast("date"), (F.col("id") % 2500).cast("int")).alias("l_shipdate"),
        )
    )


def gen_events(spark, rows: int):
    return (
        spark.range(rows)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(1704067200) + (F.col("id") % 864000)).alias("ts"),
            (F.col("id") % (rows // 67 + 1)).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in ("click", "view", "purchase", "scroll", "error")]),
                (F.col("id") % 5 + 1).cast("int"),
            ).alias("event_type"),
            ((F.col("id") * 37 % 10000) / 10.0).alias("value"),
        )
    )


def gen_documents(spark, rows: int):
    # ~100-token docs from a 1000-word vocabulary, 2% exact duplicates
    word = lambda seed: F.concat(F.lit("w"), ((F.col("id") * seed) % 1000).cast("string"))
    text = F.concat_ws(" ", *[word(s) for s in range(3, 103)])
    return spark.range(rows).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 50 == 0, F.concat_ws(" ", *[F.lit(f"dup{i}") for i in range(100)]))
        .otherwise(text)
        .alias("text"),
    )


def probes(spark, scale: int, only: set[str] | None = None):
    li = gen_lineitem(spark, BASE_LINEITEM * scale)
    ev = gen_events(spark, BASE_EVENTS * scale)
    docs = gen_documents(spark, BASE_DOCS * scale)

    def grouped_agg():
        return li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")),
            F.avg("l_extendedprice"),
            F.count(F.lit(1)),
        ).collect()

    def window_sessionize():
        from ais_data_pipeline_spark.streaming.windows import sessionize_batch
        return sessionize_batch(ev).groupBy("user_id").agg(F.max("session_id")).collect()

    def range_join():
        from ais_data_pipeline_spark.operators.joins import range_self_join_within
        return range_self_join_within(ev, "user_id", "ts", 300, "event_id").count()

    def exact_dedup_probe():
        from ais_data_pipeline_spark.operators.dedup import exact_dedup
        return exact_dedup(docs).count()

    def minhash_probe():
        from ais_data_pipeline_spark.operators.dedup import minhash_lsh_candidates
        return minhash_lsh_candidates(docs).count()

    def fact_fact_join():
        orders_like = li.select("l_orderkey").distinct().withColumn(
            "o_flag", (F.col("l_orderkey") % 3).cast("int")
        )
        return (
            li.join(orders_like, "l_orderkey")
            .groupBy("o_flag")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")))
            .collect()
        )

    def rollup_merge():
        from ais_data_pipeline_spark.operators.rollup import merge_rollups, rollup_partials
        base = ev.filter(F.col("event_id") % 10 < 8)
        delta = ev.filter(F.col("event_id") % 10 >= 8)
        return merge_rollups(rollup_partials(base), rollup_partials(delta)).count()

    def subsequence():
        from ais_data_pipeline_spark.operators.timeseries import best_subsequence_match
        return best_subsequence_match(
            ev, [0.0, 0.0, 1.0, 3.0, 1.0, 0.0, 0.0, 0.0]
        ).count()

    def chunk_docs():
        from ais_data_pipeline_spark.operators.corpus import chunk_documents
        return chunk_documents(docs).count()

    def pack_strict():
        # n_shards scales with the corpus so per-shard document counts
        # stay bounded — the operator's documented scaling knob; the
        # probe proves the per-shard Arrow scan stays ~linear overall
        from ais_data_pipeline_spark.operators.corpus import pack_sequences_strict
        return pack_sequences_strict(docs, n_shards=8 * scale).count()

    def gen_embeddings(rows: int):
        comps = [
            ((F.xxhash64(F.col("id"), F.lit(i)) % 1000) / 500.0 - 1.0)
            for i in range(16)
        ]
        return spark.range(rows).select(
            F.col("id").alias("vec_id"),
            F.array(*comps).cast("array<double>").alias("embedding"),
        )

    def pairwise_auto():
        # guarded all-pairs k-NN with auto plane sizing — the probe that
        # proves sub-quadratic candidate growth end-to-end
        from ais_data_pipeline_spark.operators.similarity import pairwise_topk_per_vector
        return pairwise_topk_per_vector(
            gen_embeddings(2_000 * scale), k=5, n_planes=None, max_bucket_size=5_000
        ).count()

    # Persisted-index probes: build scales with the corpus; the PROBE
    # must stay flat (partition pruning is the whole point of an index).
    idx_root = tempfile.mkdtemp(prefix="scaling_idx_")
    idx_emb = gen_embeddings(20_000 * scale)
    probe_query = [((7 * i) % 1000) / 500.0 - 1.0 for i in range(16)]

    def ann_index_build():
        from ais_data_pipeline_spark.operators.similarity import build_ann_index
        build_ann_index(idx_emb, idx_root + "/ann", n_planes=8)
        return 1

    def ann_index_probe():
        from ais_data_pipeline_spark.operators.similarity import cosine_topk_indexed
        return cosine_topk_indexed(
            spark, idx_root + "/ann", probe_query, k=10, n_planes=8
        ).count()

    def ivf_index_build():
        from ais_data_pipeline_spark.operators.similarity import build_ivf_index
        build_ivf_index(idx_emb, idx_root + "/ivf", n_centroids=16)
        return 1

    def ivf_index_probe():
        from ais_data_pipeline_spark.operators.similarity import ivf_probe_topk
        return ivf_probe_topk(
            spark, idx_root + "/ivf", probe_query, k=10, nprobe=4
        ).count()

    def ivfpq_index_build():
        from ais_data_pipeline_spark.operators.similarity import build_ivfpq_index
        build_ivfpq_index(
            idx_emb, idx_root + "/ivfpq", n_centroids=8, m=4, k=8, iters=1
        )
        return 1

    def ivfpq_index_probe():
        from ais_data_pipeline_spark.operators.similarity import ivfpq_probe_topk
        return ivfpq_probe_topk(
            spark, idx_root + "/ivfpq", probe_query, k=10, nprobe=2
        ).count()

    def subsequence_fft():
        from ais_data_pipeline_spark.operators.timeseries import (
            best_subsequence_match_fft,
        )
        return best_subsequence_match_fft(
            ev, [0.0, 0.0, 1.0, 3.0, 1.0, 0.0, 0.0, 0.0]
        ).count()

    def cms_probe():
        from ais_data_pipeline_spark.operators.sketches import cms_build
        return cms_build(li.select("l_suppkey"), "l_suppkey", d=4, w=256).count()

    def pagerank_probe():
        from ais_data_pipeline_spark.operators.graph import (
            cooccurrence_edges,
            pagerank,
        )
        # bound per-group pair fan-out like the real query does via
        # order line counts: groups here are l_orderkey (~4 rows each)
        return pagerank(
            cooccurrence_edges(li, "l_orderkey", "l_partkey"), iters=1
        ).count()

    def repeated_spans_probe():
        from ais_data_pipeline_spark.operators.dedup import cross_doc_repeated_spans
        return cross_doc_repeated_spans(docs, k=8).count()

    def triangles_probe():
        from ais_data_pipeline_spark.operators.graph import (
            triangle_counts,
            weighted_cooccurrence_edges,
        )
        # min_weight scales with the data so graph density (and thus
        # triangle count) stays roughly constant — the probe measures
        # the edge build + oriented wedge join, not an exploding output
        edges = weighted_cooccurrence_edges(
            li, "l_orderkey", "l_suppkey", min_weight=max(2, scale)
        )
        return triangle_counts(edges.select("src", "dst")).count()

    def contamination_probe():
        from ais_data_pipeline_spark.operators.ir import ngram_contamination
        return ngram_contamination(
            docs.filter(F.col("doc_id") % 50 != 0),
            docs.filter(F.col("doc_id") % 50 == 0),
            n=3,
        ).count()

    def bm25_probe():
        from ais_data_pipeline_spark.operators.ir import bm25_topk
        return bm25_topk(docs, ["w3", "w501", "w999"], k=10).count()

    def zscore_probe():
        from ais_data_pipeline_spark.operators.timeseries import (
            rolling_zscore_anomalies,
        )
        return rolling_zscore_anomalies(ev).count()

    def incdedup_index_build():
        from ais_data_pipeline_spark.streaming.incremental_dedup import (
            build_dedup_index,
        )
        build_dedup_index(docs, os.path.join(idx_root, "incdedup"))
        return 1

    def incdedup_batch_probe():
        # FIXED 500-doc batch against the scale-grown index: the probe
        # must stay flat (O(batch), broadcast index probes). Batch ids
        # offset past the corpus; texts coincide with history docs
        # 0..499, so the whole batch drops as exact dups — the decision
        # path (hash probe + bucket probe + verify) is fully exercised.
        from ais_data_pipeline_spark.streaming.incremental_dedup import (
            dedup_batch_against_index,
        )
        batch = gen_documents(spark, 500).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000_000
        )
        return dedup_batch_against_index(
            batch, os.path.join(idx_root, "incdedup")
        ).count()

    def gopher_probe():
        from ais_data_pipeline_spark.operators.text import gopher_filter_stats
        return gopher_filter_stats(docs).count()

    def clf_probe():
        from ais_data_pipeline_spark.operators.text import hashed_linear_score
        return hashed_linear_score(docs, n_buckets=1024).count()

    def vocab_probe():
        from ais_data_pipeline_spark.operators.text import tokens_col
        tf = (
            docs.select(F.explode(tokens_col(F.col("text"))).alias("t"))
            .groupBy("t")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return tf.agg(F.sum("c"), F.count(F.lit(1))).count()

    def hamming_probe():
        from ais_data_pipeline_spark.operators.similarity import hamming_rerank_topk
        return hamming_rerank_topk(
            idx_emb, probe_query, k=10, oversample=100
        ).count()

    out = {}
    for name, fn in [
        ("grouped_agg", grouped_agg),
        ("fact_fact_join", fact_fact_join),
        ("window_sessionize", window_sessionize),
        ("range_join", range_join),
        ("exact_dedup", exact_dedup_probe),
        ("minhash_lsh", minhash_probe),
        ("rollup_merge", rollup_merge),
        ("subsequence_match", subsequence),
        ("subsequence_fft", subsequence_fft),
        ("chunk_documents", chunk_docs),
        ("pack_strict", pack_strict),
        ("pairwise_knn_auto", pairwise_auto),
        ("cms_build", cms_probe),
        ("pagerank_1iter", pagerank_probe),
        ("repeated_spans", repeated_spans_probe),
        ("triangles_oriented", triangles_probe),
        ("ngram_contamination", contamination_probe),
        ("bm25_topk", bm25_probe),
        ("rolling_zscore", zscore_probe),
        ("ann_index_build", ann_index_build),
        ("ann_index_probe", ann_index_probe),
        ("ivf_index_build", ivf_index_build),
        ("ivf_index_probe", ivf_index_probe),
        ("ivfpq_index_build", ivfpq_index_build),
        ("ivfpq_index_probe", ivfpq_index_probe),
        ("incdedup_index_build", incdedup_index_build),
        ("incdedup_batch_probe", incdedup_batch_probe),
        ("gopher_filter", gopher_probe),
        ("hashed_classifier", clf_probe),
        ("vocab_stats", vocab_probe),
        ("binary_hamming_topk", hamming_probe),
    ]:
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        fn()
        out[name] = round(time.perf_counter() - t0, 2)
    shutil.rmtree(idx_root, ignore_errors=True)
    return out


def star_cc_path_probe(spark, lengths=(1_000, 10_000, 50_000)):
    """Star-contraction CC on PATH graphs of growing length — the
    diameter-stress case where min-label propagation needs O(diameter)
    rounds. Reports wall-clock and correctness (every node must label
    to the path's min node); the rounds-used count comes out on stdout
    via the star_cc_converged observability event."""
    from ais_data_pipeline_spark.operators.graph import star_connected_components

    out = {}
    for n in lengths:
        pairs = spark.range(n - 1).select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
        )
        t0 = time.perf_counter()
        labels = star_connected_components(pairs, max_iter=40)
        wrong = labels.filter(F.col("cluster_id") != 0).count()
        out[str(n)] = {
            "sec": round(time.perf_counter() - t0, 2),
            "mislabeled": wrong,
        }
    return out


def pagerank_iters_probe(spark, iters_list=(2, 4, 8), scale: int = 1):
    """Time PageRank at growing ITERATION counts on fixed data — the
    probe that proves per-iteration lineage truncation: time must grow
    ~linearly in iters (the untruncated plan doubles per iteration)."""
    from ais_data_pipeline_spark.operators.graph import cooccurrence_edges, pagerank

    li = gen_lineitem(spark, BASE_LINEITEM * scale)
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    out = {}
    for it in iters_list:
        t0 = time.perf_counter()
        pagerank(edges, iters=it).count()
        out[str(it)] = round(time.perf_counter() - t0, 2)
    return out


def main():
    args = sys.argv[1:]
    spark = get_spark(app_name="scaling_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000_000).selectExpr("sum(id)").collect()  # warmup
    if "--pagerank-iters" in args:
        out = pagerank_iters_probe(spark)
        print(json.dumps({"pagerank_iters": out}), flush=True)
        spark.stop()
        return
    if "--star-path" in args:
        out = star_cc_path_probe(spark)
        print(json.dumps({"star_cc_path": out}), flush=True)
        spark.stop()
        return
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2 :]
    scales = [int(s) for s in args] or [1, 10, 50]
    results = {}
    for s in scales:
        results[s] = probes(spark, s, only=only)
        print(json.dumps({"scale": s, **results[s]}), flush=True)
    base = results[scales[0]]
    for s in scales[1:]:
        ratios = {k: round(results[s][k] / max(base[k], 0.01), 1) for k in base}
        print(json.dumps({"scale_ratio": f"{s}x", "time_ratios": ratios}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
