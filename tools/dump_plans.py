#!/usr/bin/env python
"""Dump .explain('formatted') for named registry queries to files.

    python tools/dump_plans.py <outdir> <suffix> name [name ...]

Writes <outdir>/<name>_<suffix>.txt per query. Measurement-only
tooling for the optimization rounds' plan evidence.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from ais_data_pipeline_spark.session import get_spark  # noqa: E402
from ais_data_pipeline_spark.queries import registry  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(
        app_name="ais_dump_plans",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    by_name = {q.name: q for q in registry()}
    for name in names:
        df = by_name[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
