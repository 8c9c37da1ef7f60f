"""Vanilla-session driver-contract verification (the /verify recipe).

The external driver imports ``__spark_entry__`` with its OWN
SparkSession (default confs — not the repo factory). This tool replays
that contract: smoke ``entry(spark)`` at sf0.001, then run the named
queries (or all) at sf0.01 under the vanilla session and compare each
to its DuckDB oracle with the same normalization the pytest replica
uses (``tests/test_oracle.py``). Catches any query that silently
depends on factory confs (UTC timezone, nanosAsLong, non-ANSI).

Usage:
    python tools/verify_vanilla.py                 # smoke + ALL oracle queries
    python tools/verify_vanilla.py q1 q2 ...       # smoke + named queries
    python tools/verify_vanilla.py --no-smoke q1   # skip the entry() smoke
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    smoke = "--no-smoke" not in sys.argv

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("verify-vanilla")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as m

    if smoke:
        rows = m.entry(spark).collect()
        print(f"smoke entry(): {len(rows)} rows OK")

    from test_oracle import _duck, _norm_rows, _pd_rows

    from ais_data_pipeline_spark.queries import registry

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    qs = [q for q in registry() if q.oracle and (not names or q.name in names)]
    unknown = set(names) - {q.name for q in qs}
    if unknown:
        print(f"WARNING: not in registry (or no oracle): {sorted(unknown)}")
    con = _duck(sf_dir)
    failed = []
    for q in qs:
        try:
            sdf = q.fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = _pd_rows(sdf.toPandas())
            res = con.execute(q.oracle)
            duck_cols = [d[0] for d in res.description]
            duck_rows = _pd_rows(res.df())
            assert sorted(spark_cols) == sorted(duck_cols), "columns"
            assert len(spark_rows) == len(duck_rows), (
                f"rows {len(spark_rows)} vs {len(duck_rows)}"
            )
            ns = _norm_rows(spark_rows, spark_cols)
            nd = _norm_rows(duck_rows, duck_cols)
            mism = [i for i, (a, b) in enumerate(zip(ns, nd)) if a != b]
            assert not mism, f"{len(mism)} differing rows; first: {ns[mism[0]]} vs {nd[mism[0]]}"
            print(f"PASS {q.name}")
        except Exception as e:  # noqa: BLE001 — report-and-continue sweep
            failed.append(q.name)
            print(f"FAIL {q.name}: {e}")
    print(f"{len(qs) - len(failed)}/{len(qs)} green under vanilla session")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
