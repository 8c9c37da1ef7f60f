#!/usr/bin/env python
"""Skew-robustness probe: measure how the engine's three join/agg
shapes behave when one key carries half the table — the hot-key
distribution a 100 TB corpus WILL contain (one viral document, one
null-ish default key, one bot user).

SCALING.md claims "hot group keys salted, AQE skew splitting on" —
this probe turns those claims into numbers, per shape:

1. ``grouped_agg``      — groupBy(key).agg(count,sum) on uniform vs
   skewed keys. Expectation: ~flat. Map-side partial aggregation
   collapses the hot key to one partial row per task BEFORE the
   shuffle, so the reducer for key 0 receives #tasks rows, not 50% of
   the table. This is why the workhorse agg needs no salting.
2. ``salted_grouped``   — the explicit two-phase salt on the same
   skewed input, plus a result-equality check against the plain path.
   Expectation: ties with plain groupBy here (partial agg already
   absorbed the skew); its value is the shapes partial agg can NOT
   compress (growing aggregation state, spilling hash maps) — the
   probe records the tie honestly rather than inventing a win.
3. ``join_skew``        — skewed fact ⋈ uniform build side as a
   sort-merge join (broadcast disabled FOR THE PROBE: the engine's
   first defense for a small right side is broadcasting it, which
   makes join skew structurally impossible; the probe measures the
   fallback for when BOTH sides are big). AQE skew-split off vs on.
   Expectation: with AQE off, one task sorts/joins 50% of the table
   while the other 31 idle; with AQE on, the hot partition is split
   into ~size-balanced subtasks. Wall-clock ratio is the payoff.
   The skew threshold is scaled to the probe's data size (the default
   256 MiB trigger is tuned for cluster-scale partitions; at 100 TB
   the hot partition is ~50 TB and trips the default on its own).
4. ``window_per_key``   — row_number() OVER (PARTITION BY key) on the
   skewed table: the genuinely skew-vulnerable shape (a window needs
   the whole key in one task; no partial agg, no AQE split possible).
   Measured uniform vs skewed to document the hazard class. The
   engine's windowed operators (sessionize, moving averages, LOCF)
   all partition by bounded-cardinality keys (user, user+day,
   symbol+hour) for exactly this reason.

Emits one JSON line. Usage: python tools/skew_probe.py [rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ais_data_pipeline_spark.session import get_spark

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
N_KEYS = 100_000
HOT_FRAC = 0.5  # key 0 carries half of all rows


def gen_facts(spark, rows: int, skewed: bool):
    """(key, amount, payload): uniform keys, or 50% pinned to key 0.
    The payload is md5 hex (incompressible) — shuffle partition sizes,
    which the AQE skew detector reads, are COMPRESSED bytes; a constant
    filler would lz4 away and hide the hot partition from the
    detector, which real document/event payloads do not."""
    df = spark.range(rows)
    uniform_key = F.col("id") % N_KEYS
    key = (
        F.when(F.col("id") % 2 == 0, F.lit(0)).otherwise(uniform_key)
        if skewed
        else uniform_key
    )
    return df.select(
        key.alias("key"),
        (F.col("id") % 1000).cast("long").alias("amount"),
        F.concat(F.md5(F.col("id").cast("string")), F.md5(F.hex(F.col("id")))).alias("payload"),
    )


def gen_dim(spark):
    return spark.range(N_KEYS).select(
        F.col("id").alias("key"), (F.col("id") % 97).alias("weight")
    )


def timed(fn) -> tuple[float, object]:
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 2), out


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="ais_skew_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    out: dict = {"metric": "skew_probe", "rows": ROWS, "n_keys": N_KEYS,
                 "hot_frac": HOT_FRAC, "cpus": cpus}

    # -- 1. grouped agg: uniform vs skewed --------------------------------
    def agg_run(skewed: bool):
        return (
            gen_facts(spark, ROWS, skewed)
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("amount").alias("amt"))
            .agg(F.sum("n"), F.sum("amt"), F.count(F.lit(1)))
            .collect()[0]
        )

    agg_run(False)  # codegen warmup outside the timed section
    t_uni, r_uni = timed(lambda: agg_run(False))
    t_skw, r_skw = timed(lambda: agg_run(True))
    assert r_uni[0] == r_skw[0] == ROWS
    out["grouped_agg"] = {
        "uniform_s": t_uni,
        "skewed_s": t_skw,
        "skew_ratio": round(t_skw / t_uni, 2),
    }

    # -- 2. salted_grouped on the skewed input + equality vs plain --------
    from ais_data_pipeline_spark.operators.aggregates import salted_grouped

    skewed_facts = gen_facts(spark, ROWS, True)

    def salted_run():
        return (
            salted_grouped(skewed_facts, ["key"], {"amount": "amt"})
            .agg(F.sum("n"), F.sum("amt"), F.count(F.lit(1)))
            .collect()[0]
        )

    t_salt, r_salt = timed(salted_run)
    assert tuple(r_salt) == tuple(r_skw), (r_salt, r_skw)
    out["salted_grouped"] = {
        "skewed_s": t_salt,
        "vs_plain_ratio": round(t_salt / t_skw, 2),
        "result_equal_plain": True,
    }

    # -- 3. sort-merge join skew: AQE split off vs on ----------------------
    dim = gen_dim(spark)

    def join_run(aqe_skew: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
        # scale the trigger to the probe's data (see module docstring);
        # save BOTH threshold confs so the overrides can't leak into the
        # stage-4 window probe's AQE partition sizing
        prev_thresh = spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        prev_advisory = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            # the agg consumes the payload so column pruning cannot drop
            # it before the shuffle — the hot partition must actually be
            # hot on the wire for the skew detector to see it
            return (
                skewed_facts.join(dim, "key")
                .select(
                    F.sum(F.col("amount") * F.col("weight")).alias("s"),
                    F.sum(F.length("payload")).alias("pl"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()[0]
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                prev_thresh,
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", prev_advisory
            )

    join_run(True)  # warmup
    t_off, r_off = timed(lambda: join_run(False))
    t_on, r_on = timed(lambda: join_run(True))
    assert tuple(r_off) == tuple(r_on) and r_on["n"] == ROWS
    out["join_skew"] = {
        "aqe_off_s": t_off,
        "aqe_on_s": t_on,
        "speedup": round(t_off / t_on, 2),
    }

    # -- 4. per-key window: the honestly vulnerable shape ------------------
    from pyspark.sql import Window

    def window_run(skewed: bool):
        w = Window.partitionBy("key").orderBy("amount")
        return (
            gen_facts(spark, ROWS, skewed)
            .select("key", "amount", F.row_number().over(w).alias("rn"))
            .agg(F.sum("rn"))
            .collect()[0]
        )

    window_run(False)  # warmup
    t_wuni, _ = timed(lambda: window_run(False))
    t_wskw, _ = timed(lambda: window_run(True))
    out["window_per_key"] = {
        "uniform_s": t_wuni,
        "skewed_s": t_wskw,
        "skew_ratio": round(t_wskw / t_wuni, 2),
    }

    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
