#!/usr/bin/env python
"""Plan-hygiene audit: explain EVERY registry query and report the
plan properties that decide 100 TB survival — exchange count, join
strategies, Python evaluation nodes, scan pushdown — into PLANS.md.

This operationalizes the per-operator `.explain("formatted")` review:
instead of auditing the hot queries by hand each round, the whole
registry is swept and regressions (a lost broadcast, a new Python
node, a filter that stopped reaching the scan) show up as a diff of a
checked-in report. The targeted assertions in tests/test_plans.py pin
the highest-stakes properties; this report gives breadth.

Usage: python tools/plan_audit.py [--sf-dir DIR] [--out PLANS.md]
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# streaming / write-side queries run real side effects; the audit reads
# plans only, so skip the ones whose fn() triggers execution to build
# the returned frame (their plan properties are pinned in pytest).
# name -> exemption reason; the footer enumerates this map and
# tests/test_plans.py asserts audited + exempt == registry, so the
# audit's coverage is mechanically checkable.
EXECUTING = {
    "streaming_windowed_counts": "streaming — fn() drains a real availableNow stream",
    "streaming_sliding_counts": "streaming — fn() drains a real availableNow stream",
    "streaming_dedup_pairs": "streaming — fn() drains a real availableNow stream",
    "streaming_stateful_totals": "streaming — applyInPandasWithState run at fn() time",
    "streaming_zscore_anomaly": "streaming — applyInPandasWithState run at fn() time",
    "streaming_cdc_upsert": "streaming — foreachBatch upsert executes at fn() time",
    "incremental_dedup_stats": "streaming — index build + two stream drains at fn() time",
    "incremental_embedding_dedup_stats": "streaming — index build + stream drains at fn() time",
    "streaming_ivf_ingest_topk": "streaming — index ingest stream drains at fn() time",
    "streaming_quality_monitor": "streaming — applyInPandasWithState run at fn() time",
    "streaming_web_ingest_stats": "streaming — two WARC landing drains + index writes at fn() time",
    "session_windows_native": "streaming — fn() drains a real availableNow stream",
    "stream_static_join": "streaming — fn() drains a real availableNow stream",
    "stream_stream_join": "streaming — fn() drains both sides at fn() time",
    "snapshot_time_travel": "write-side — fn() writes snapshot versions to scratch",
    "snapshot_diff_orders": "write-side — fn() writes snapshot versions to scratch",
    "orc_roundtrip_agg": "write-side — fn() writes the ORC table to scratch",
    "schema_evolution_merge": "write-side — fn() writes both schema versions to scratch",
    "mmr_diverse_topk": "eager — greedy per-step argmax collects; result is a local relation",
    "training_shard_manifest": "write-side — fn() writes the sharded table to scratch",
}

# NOT plan-only: these fns run bounded Spark jobs at DataFrame-
# construction time — iterative lineage truncation (eager
# localCheckpoint), k·dim centroid / codebook collects, or a scratch-dir
# index build before the probe. They stay IN the audit (their final
# probe/read plan is exactly what needs watching — e.g. the IVF-PQ
# single pruned scan), but a sweep over them is a real-work run, not a
# free explain() pass. Keep this set in sync with the eager builders in
# operators/{graph,dedup,ir,similarity}.py and the curation pipeline.
EAGER = {
    # warc_record_stats packs its warc.gz fixture shards at fn() time;
    # the RETURNED read plan (path relation -> mapInPandas parse ->
    # one groupBy) is the part worth auditing
    "warc_record_stats",
    # bigram_lm_scores materializes the pair stream eagerly (one pass
    # feeds the bigram counts AND the scoring join)
    "bigram_lm_scores",
    "part_pagerank",
    "supplier_triangles",
    "near_dup_clusters",
    # minhash_near_dup's verify pre-filter materializes the candidate
    # set eagerly (localCheckpoint, round-8 O(candidates) fix) — these
    # three run bounded Spark jobs at DataFrame-construction time
    "minhash_near_dup",
    "near_dup_clusters_star",
    "pretraining_pipeline_stats",
    # global_ntile / skyline_2d / grouped_global_rank collect their
    # quantile thresholds at fn() time (value-bucket pattern)
    "order_price_deciles",
    "conversion_latency_deciles",
    "skyline_orders",
    "rank_distribution",
    "cluster_best_representative",
    "bm25_top_docs",
    "inverted_index_postings",
    "curation_pipeline_stats",
    "kmeans_ivf_centroids",
    "pq_adc_topk",
    "ann_index_topk",
    "ivf_index_topk",
    "ivfpq_index_topk",
    "ivfpq_rerank_topk",
    "semdedup_stats",
    "dsir_domain_scores",
}


def audit(sf_dir: str) -> list[dict]:
    from ais_data_pipeline_spark.queries import registry
    from ais_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plan_audit", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for q in registry():
        if q.name in EXECUTING:
            continue
        try:
            df = q.fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            rows.append({"name": q.name, "error": repr(e)[:120]})
            continue
        # count the "(N) NodeName" detail headers only — the formatted
        # tree section repeats every node name and would double-count
        node = lambda name: len(re.findall(rf"\(\d+\) {name}\b", plan))  # noqa: E731
        rows.append(
            {
                "name": q.name,
                "exchanges": node("Exchange"),
                "broadcasts": node("BroadcastExchange"),
                "bhj": node("BroadcastHashJoin"),
                "smj": node("SortMergeJoin"),
                "python": node("BatchEvalPython")
                + node("ArrowEvalPython")
                + node("FlatMapGroupsInPandas")
                + node("MapInPandas"),
                "pushed": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
                "take_ordered": "TakeOrderedAndProject" in plan,
                "scans": node("Scan (?:parquet|orc|csv|ExistingRDD)"),
            }
        )
    return rows


def render(rows: list[dict], sf_dir: str) -> str:
    out = io.StringIO()
    out.write("# PLANS — registry-wide physical-plan audit\n\n")
    out.write(
        "Generated by `tools/plan_audit.py` over every registry query at\n"
        f"`{sf_dir}` (streaming/write-side queries are exercised in pytest\n"
        "instead — their fn() executes side effects; queries in the EAGER\n"
        "set run bounded Spark jobs at construction — lineage-truncating\n"
        "checkpoints, centroid/codebook collects, scratch index builds —\n"
        "so their audit row costs real work and their scan column may show\n"
        "ExistingRDD instead of the source parquet). Columns: shuffle\n"
        "exchanges, broadcast exchanges, broadcast-hash vs sort-merge\n"
        "joins, Python eval nodes (Arrow batches only, and only where the\n"
        "operator is explicitly pandas-based), whether any filter reached\n"
        "a scan, TakeOrderedAndProject for top-k, and scan count.\n\n"
        "Review rule: a query whose exchange count grows round-over-round,\n"
        "loses a broadcast, or gains a Python node needs a plan review\n"
        "before merge — diff this file. Exchange COUNTS say nothing about\n"
        "what the exchanges CARRY — `tools/shuffle_audit.py` measures the\n"
        "actual shuffle bytes for the representative shapes (table in\n"
        "SCALING.md, round 8).\n\n"
    )
    out.write("| query | exch | bcast | BHJ | SMJ | py | pushdown | topk | scans |\n")
    out.write("|---|---|---|---|---|---|---|---|---|\n")
    for r in rows:
        if "error" in r:
            out.write(f"| {r['name']} | ERROR: {r['error']} | | | | | | | |\n")
            continue
        out.write(
            "| {name} | {exchanges} | {broadcasts} | {bhj} | {smj} | {python} | "
            "{pushed} | {take_ordered} | {scans} |\n".format(
                **{**r, "pushed": "y" if r["pushed"] else "", "take_ordered": "y" if r["take_ordered"] else ""}
            )
        )
    py_rows = [r for r in rows if r.get("python")]
    out.write(
        f"\n{len(rows)} plans audited; {len(py_rows)} use Arrow/pandas nodes: "
        + ", ".join(r["name"] for r in py_rows)
        + " (each an explicitly pandas-based operator — multimodal decode, "
        "FFT kernel, pandas-scoring variants).\n"
    )
    out.write(
        f"\n## Exempt from the audit ({len(EXECUTING)} queries)\n\n"
        "fn() executes side effects (stream drains, scratch writes, eager\n"
        "driver-side selection), so there is no free explain() pass; their\n"
        "plan/behavior properties are pinned in pytest instead.\n"
        "`tests/test_plans.py::test_plan_audit_covers_registry` asserts\n"
        "audited + exempt == registry.\n\n"
    )
    for name in sorted(EXECUTING):
        out.write(f"- `{name}` — {EXECUTING[name]}\n")
    return out.getvalue()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001"))
    p.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"))
    args = p.parse_args()
    rows = audit(args.sf_dir)
    report = render(rows, args.sf_dir)
    with open(args.out, "w") as f:
        f.write(report)
    errs = [r for r in rows if "error" in r]
    print(f"audited {len(rows)} plans -> {args.out}; errors: {len(errs)}")
    for r in errs:
        print(" ", r["name"], r["error"])


if __name__ == "__main__":
    main()
