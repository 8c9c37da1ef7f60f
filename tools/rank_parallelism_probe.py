#!/usr/bin/env python
"""Few-huge-groups rank-window probe: measures the built-in
``PARTITION BY group`` window (parallelism capped at the group count)
against ``grouped_global_rank`` (quantile-value buckets, parallel,
per-task sorts ~1/B of a group) on the rank_distribution shape — N rows, 5 groups, full percent_rank /
cume_dist / ntile derivation, results checksum-verified equal.

Emits one JSON line:
  {"metric": "rank_parallelism_probe", "rows": .., "groups": 5,
   "builtin_s": .., "distributed_s": .., "speedup": ..,
   "checksum_equal": true}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ais_data_pipeline_spark.session import get_spark

ROWS = int(os.environ.get("RANK_PROBE_ROWS", 8_000_000))


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ais_data_pipeline_spark.operators.ordering import (
        grouped_global_rank,
        grouped_ntile_col,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="rank_probe", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    df = (
        spark.range(ROWS)
        .select(
            F.concat(F.lit("P"), (F.col("id") % 5)).alias("g"),
            (F.col("id") * 2654435761 % 999_983).alias("v"),
            F.col("id"),
        )
        .localCheckpoint()  # generation outside both timed legs
    )

    # identical downstream aggregate so neither leg can skip work: a
    # checksum over every row's (pct, cume, quartile)
    def summarize(ranked):
        return ranked.agg(
            F.sum(F.col("pct") * 1e6 + F.col("cume") * 1e3 + F.col("t")).alias("chk"),
            F.count(F.lit(1)).alias("n"),
        ).first()

    def builtin():
        w = Window.partitionBy("g").orderBy("v", "id")
        return summarize(
            df.select(
                F.percent_rank().over(w).alias("pct"),
                F.cume_dist().over(w).alias("cume"),
                F.ntile(4).over(w).alias("t"),
            )
        )

    def distributed():
        ranked = grouped_global_rank(df, ["g"], ["v", "id"])
        r, n = F.col("__rank"), F.col("__n_group")
        pct = F.when(n == 1, F.lit(0.0)).otherwise(
            (r - 1).cast("double") / (n - 1).cast("double")
        )
        return summarize(
            ranked.select(
                pct.alias("pct"),
                (r.cast("double") / n.cast("double")).alias("cume"),
                grouped_ntile_col(4).alias("t"),
            )
        )

    distributed()  # codegen warmup for both plan families
    builtin()
    t0 = time.perf_counter()
    r_b = builtin()
    t_b = time.perf_counter() - t0
    t0 = time.perf_counter()
    r_d = distributed()
    t_d = time.perf_counter() - t0

    equal = r_b["n"] == r_d["n"] == ROWS and abs(r_b["chk"] - r_d["chk"]) < 1e-6 * abs(
        r_b["chk"]
    )
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "rank_parallelism_probe",
                "rows": ROWS,
                "groups": 5,
                "cpus": cpus,
                "builtin_s": round(t_b, 2),
                "distributed_s": round(t_d, 2),
                "speedup": round(t_b / t_d, 2),
                "checksum_equal": bool(equal),
            }
        )
    )


if __name__ == "__main__":
    main()
