#!/usr/bin/env python
"""Per-leg bench profiler (optimization round instrumentation).

Runs one or more registry legs in a fresh session with event logging
on, then attributes each leg's wall-clock to Spark job time vs driver
gaps (planning / collect / py4j round-trips). Usage:

    python tools/profile_leg.py ivfpq_rerank_topk semdedup_stats ...

Prints, per leg: wall seconds (2nd run, warm), number of jobs, summed
job duration, the driver-gap remainder, and the five slowest jobs with
their descriptions. This is measurement-only tooling — it never runs
in the bench or the driver path.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from ais_data_pipeline_spark.session import get_spark  # noqa: E402
from ais_data_pipeline_spark.queries import registry  # noqa: E402

EVDIR = "/tmp/ais_profile_events"


def main() -> None:
    names = sys.argv[1:]
    os.makedirs(EVDIR, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(
        app_name="ais_profile",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    by_name = {q.name: q for q in registry()}
    sc = spark.sparkContext
    app_id = sc.applicationId
    marks: dict[str, tuple[float, float, float, float]] = {}
    for name in names:
        q = by_name[name]
        # warm run (codegen/JIT caches hot, matches bench best-of-N)
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).collect()
        warm0 = time.perf_counter() - t0
        sc.setJobDescription(f"PROFILE:{name}")
        t1 = time.time()
        p0 = time.perf_counter()
        q.fn(spark, sf_dir).collect()
        wall = time.perf_counter() - p0
        t2 = time.time()
        sc.setJobDescription(None)
        marks[name] = (t1 * 1000, t2 * 1000, wall, warm0)
    spark.stop()

    # parse the event log: job start/end per leg window (Spark 4 writes
    # a rolled zstd directory layout)
    import glob as _glob

    cands = _glob.glob(os.path.join(EVDIR, f"*{app_id}*"))
    path = cands[0]
    if os.path.isdir(path):
        path = sorted(_glob.glob(os.path.join(path, "events_*")))[-1]
    fh = open(path)
    jobs: list[dict] = []
    starts: dict[int, dict] = {}
    with fh as f:
        for line in f:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                starts[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "nstages": len(ev.get("Stage IDs", [])),
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                j = starts.pop(ev["Job ID"], None)
                if j:
                    j["t1"] = ev["Completion Time"]
                    j["id"] = ev["Job ID"]
                    jobs.append(j)
    for name in names:
        m0, m1, wall, warm0 = marks[name]
        legj = [j for j in jobs if j["t0"] >= m0 - 50 and j["t1"] <= m1 + 50]
        jsum = sum(j["t1"] - j["t0"] for j in legj) / 1000.0
        print(f"\n=== {name}: wall {wall:.3f}s (first {warm0:.3f}s) "
              f"jobs={len(legj)} job_time={jsum:.3f}s "
              f"driver_gap={wall - jsum:.3f}s")
        for j in sorted(legj, key=lambda x: x["t0"] - x["t1"])[:8]:
            print(f"    job {j['id']:4d} {(j['t1']-j['t0'])/1000:7.3f}s "
                  f"stages={j['nstages']}")


if __name__ == "__main__":
    main()
