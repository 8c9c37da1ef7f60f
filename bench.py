#!/usr/bin/env python
"""Headline benchmark: run the engine's representative queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (collect) so the full plan —
scan, shuffle, agg — is measured, not just plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ais_data_pipeline_spark.session import get_spark  # noqa: E402
from ais_data_pipeline_spark.queries import registry  # noqa: E402

#: The headline subset: one per engine layer (scan/filter, profile agg,
#: grouped agg, star join, fact-fact join, window, event-time window,
#: dedup, text, vector search).
HEADLINE = [
    "scan_project_filter",
    "profile_min_max",
    "q1_pricing_summary",
    "revenue_by_nation",
    "priority_revenue",
    "top_customer_per_nation",
    "events_hourly",
    "dedup_exact",
    "token_counts",
    "embedding_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="ais_data_pipeline_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    # JVM warmup outside the measured section
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    by_name = {q.name: q for q in registry()}
    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = by_name[name]
        t0 = time.perf_counter()
        rows = q.fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        assert rows is not None

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
