"""The reference's flagship pipeline, Spark-first (reference §3.2).

Polars notebook dataflow (reference notebooks/preprocessing_with_polars
.ipynb): scan_csv → drop ``_ar`` columns (P1, with the documented
``actual_area`` quirk) → lenient date parse (T1) → profile distinct
ratios → categorical casts (T2/T3) → min/max-driven downcast with
quarantine (variant notebook 0_preprocessing.ipynb:3385-3473) →
collect → parquet/brotli.

Spark shape: one lazy DataFrame plan mutated by the profiling pass
(driver-side decisions, executor-side batched aggs), then a single
partitioned zstd parquet write plus the quarantine side-write. Bounded
memory at any scale — nothing ever collects to the driver except the
profile aggregates.

Invariants reproduced (SURVEY §5): 27-column output (no ``_ar``, no
``actual_area``), unparseable dates → null, rows_out + rows_quarantined
= rows_in.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ais_data_pipeline_spark.observability import Stopwatch, log
from ais_data_pipeline_spark.operators.profiling import (
    apply_tightening,
    estimate_size,
    int32_admission_predicate,
    plan_tightening,
)
from ais_data_pipeline_spark.operators.projections import exclude_substring
from ais_data_pipeline_spark.operators.transforms import parse_date_lenient
from ais_data_pipeline_spark.sources.csv import read_csv

DATE_COLUMNS = ["contract_start_date", "contract_end_date"]


@dataclass
class PipelineResult:
    rows_in: int = 0
    rows_out: int = 0
    rows_quarantined: int = 0
    columns_out: list[str] = field(default_factory=list)
    est_size: dict = field(default_factory=dict)
    elapsed_sec: float = 0.0


def run_pipeline(
    spark: SparkSession,
    csv_path: str,
    out_path: str,
    quarantine_path: str,
    schema: T.StructType | None = None,
    date_columns: list[str] | None = None,
    estimate: bool = False,
) -> PipelineResult:
    sw = Stopwatch()
    date_columns = DATE_COLUMNS if date_columns is None else date_columns

    df = read_csv(spark, csv_path, schema=schema)
    log("pipeline_scan", path=csv_path, n_cols=len(df.columns))

    # P1 (with the reference's substring quirk: drops actual_area too)
    df = exclude_substring(df, "_ar")
    # T1 lenient date parse
    df = parse_date_lenient(df, [c for c in date_columns if c in df.columns])

    # Reference order: quarantine int32-violating rows FIRST (on the raw
    # Long values), then profile + tighten the surviving rows — so the
    # downcast decisions aren't polluted by outliers and the admission
    # predicate never sees a stringified categorical column.
    long_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.LongType)]
    result = PipelineResult()

    if long_cols:
        good_pred = int32_admission_predicate(long_cols)
        tagged = df.withColumn(
            "__good", F.coalesce(good_pred.cast("boolean"), F.lit(False))
        ).persist()
        good = tagged.filter(F.col("__good")).drop("__good")
        bad = tagged.filter(~F.col("__good")).drop("__good")
    else:
        tagged, good, bad = None, df, None

    # profiling pass → categorical/downcast decisions (2 batched aggs)
    plan = plan_tightening(good)
    log(
        "tightening_plan",
        categorical_strings=plan.categorical_strings,
        categorical_numerics=plan.categorical_numerics,
        downcasts={c: str(t) for c, t in plan.downcasts.items()},
        quarantine_columns=plan.quarantine_columns,
    )
    tightened = apply_tightening(good, plan)
    result.columns_out = tightened.columns
    if estimate:
        result.est_size = estimate_size(tightened)

    # Row accounting rides on the write itself (df.observe) — re-reading
    # the just-written output for a .count() would add a full extra scan
    # of the table per sink at 100 TB.
    from pyspark.sql import Observation

    # The main and quarantine writes are independent jobs over the
    # same persisted parse — overlap them from a thread pool (guide
    # §2.6) so the (tiny) quarantine write rides the main write's tail
    # instead of serializing after it.
    from concurrent.futures import ThreadPoolExecutor

    obs_out = Observation("rows_out")

    def write_main() -> None:
        (
            tightened.observe(obs_out, F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .option("compression", "zstd")
            .parquet(out_path)
        )

    obs_bad = Observation("rows_quarantined")

    def write_bad() -> None:
        (
            bad.observe(obs_bad, F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .option("compression", "zstd")
            .parquet(quarantine_path)
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [pool.submit(write_main)]
        if bad is not None:
            futs.append(pool.submit(write_bad))
        for f in futs:
            f.result()
    result.rows_out = obs_out.get["n"]
    if bad is not None:
        result.rows_quarantined = obs_bad.get["n"]
    if tagged is not None:
        tagged.unpersist()
    result.rows_in = result.rows_out + result.rows_quarantined

    result.elapsed_sec = sw.elapsed()
    log(
        "pipeline_done",
        rows_in=result.rows_in,
        rows_out=result.rows_out,
        rows_quarantined=result.rows_quarantined,
        elapsed_sec=round(result.elapsed_sec, 2),
    )
    return result
