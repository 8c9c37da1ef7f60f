"""The end-to-end training-data capstone plan: raw documents →
training shards, as ONE call with per-stage accounting.

The chain a pretraining data team actually runs, composed from this
package's individually oracle-verified operators:

1. **curate** — exact dedup → MinHash-LSH near-dup → quality filter
   (``plans.curation.run_curation``: broadcast-drop-set shape, text
   never shuffles; proven at 4.3 GiB under a 4 GiB heap, SCALING.md);
2. **mix** — temperature-weighted mixture sampling across sources
   (``operators.corpus.mixture_sample``: share^alpha quotas, portable
   md5 rank — deterministic under any partitioning);
3. **pack** — strict next-fit token packing into trainer bins
   (``operators.corpus.pack_sequences_strict``: per-shard Arrow scan,
   O(m) per shard);
4. **shard** — deterministic global shuffle into ``shard=`` parquet
   directories (``operators.corpus.write_training_shards``: layout a
   pure function of the id, no global sort).

Every stage emits an M1 structured-log event with rows in/out, and the
returned accounting carries (docs, whitespace-token) totals per stage —
the units a pretraining budget is written in. The composed counts are
oracle-pinned by the ``pretraining_pipeline_stats`` registry query,
whose DuckDB oracle re-derives the full chain (dedup relation, quota
table, recursive next-fit fold, shard manifest) in SQL.

Scale shape: curation is the broadcast-drop-set recipe; the mixture
join broadcasts a #sources-row quota table; packing shuffles only
(id, shard, n_tokens) triples; the shard write is one hash-partition
shuffle + sortWithinPartitions. No stage shuffles document text except
the final sharded write — which IS the output.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ais_data_pipeline_spark.observability import log
from ais_data_pipeline_spark.operators.corpus import (
    mixture_sample,
    pack_sequences_strict,
    write_training_shards,
)
from ais_data_pipeline_spark.operators.text import token_count
from ais_data_pipeline_spark.plans.curation import CurationResult, run_curation


@dataclass(frozen=True)
class PretrainingResult:
    curation: CurationResult
    n_sampled: int
    sampled_tokens: int
    n_bins: int
    packed_tokens: int
    n_shards: int
    shard_docs: int
    shard_tokens: int

    @property
    def stage_rows(self) -> list[tuple[str, int, int]]:
        """(stage, n_units, n_tokens) accounting rows. n_units is
        documents for 00–04, bins for 05_pack, non-empty shard
        directories for 06_shards."""
        c = self.curation
        t = c.token_counts or {}
        return [
            ("00_total", c.n_total, t.get("00_total", 0)),
            ("01_exact_dedup", c.n_after_exact, t.get("01_exact_dedup", 0)),
            ("02_near_dup", c.n_after_near_dup, t.get("02_near_dup", 0)),
            ("03_quality", c.n_kept, t.get("03_quality", 0)),
            ("04_mixture", self.n_sampled, self.sampled_tokens),
            ("05_pack", self.n_bins, self.packed_tokens),
            ("06_shards", self.n_shards, self.shard_tokens),
        ]


def run_pretraining(
    spark: SparkSession,
    docs: DataFrame,
    out_root: str,
    sample_k: int = 100,
    alpha: float = 0.5,
    seed: int = 42,
    budget_tokens: int = 256,
    pack_shards: int = 8,
    n_shards: int = 8,
    quality_threshold: float = 0.65,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> PretrainingResult:
    """Run the full curate → mix → pack → shard chain. Writes the
    curated corpus to ``<out_root>/curated`` and the training shards to
    ``<out_root>/shards``; returns per-stage (docs, tokens) accounting.

    The pack stage is ADVISORY accounting (bin count + packed tokens at
    ``budget_tokens``): bins tell the trainer how many fixed-budget
    sequences the sampled corpus fills, while the shard layout is what
    lands on disk — packing within a shard is the trainer's streaming-
    time concern, and both use the same whitespace tokenization."""
    # 1. curate (writes <out_root>/curated; token accounting on)
    cur = run_curation(
        spark,
        docs,
        out_root + "/curated",
        quality_threshold=quality_threshold,
        jaccard_threshold=jaccard_threshold,
        max_bucket_size=max_bucket_size,
        text_col=text_col,
        id_col=id_col,
        count_tokens=True,
    )
    curated = spark.read.parquet(out_root + "/curated")

    # 2. mixture-sample the curated corpus (quota table broadcasts
    # inside mixture_sample; the id-set joins back broadcast too —
    # sample_k rows is always the small side)
    picked = mixture_sample(
        curated, k=sample_k, alpha=alpha, source_col=source_col,
        id_col=id_col, seed=seed,
    ).select(id_col)
    sampled = curated.join(F.broadcast(picked), id_col)
    srow = sampled.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(token_count(F.col(text_col)).cast("long")).alias("t"),
    ).first()
    n_sampled, sampled_tokens = srow["n"], srow["t"] or 0
    log("pretraining_mixture", rows_in=cur.n_kept, rows_out=n_sampled)

    # 3. strict next-fit packing accounting over the sample
    packed = pack_sequences_strict(
        sampled, budget_tokens=budget_tokens, n_shards=pack_shards,
        text_col=text_col, id_col=id_col,
    )
    prow = packed.agg(
        F.countDistinct("shard", "bin_id").alias("bins"),
        F.sum(F.col("n_tokens").cast("long")).alias("t"),
    ).first()
    n_bins, packed_tokens = prow["bins"], prow["t"] or 0
    log("pretraining_pack", rows_in=n_sampled, bins=n_bins)

    # 4. shard write + read-back manifest (proves the round trip —
    # the manifest is computed from the FILES, not the plan)
    write_training_shards(sampled, out_root + "/shards", n_shards=n_shards, id_col=id_col)
    shards = spark.read.parquet(out_root + "/shards")
    hrow = shards.agg(
        F.countDistinct("shard").alias("s"),
        F.count(F.lit(1)).alias("n"),
        F.sum(token_count(F.col(text_col)).cast("long")).alias("t"),
    ).first()
    n_sh, shard_docs, shard_tokens = hrow["s"], hrow["n"], hrow["t"] or 0
    log("pretraining_shards", rows_in=n_sampled, rows_out=shard_docs, shards=n_sh)

    return PretrainingResult(
        curation=cur,
        n_sampled=n_sampled,
        sampled_tokens=sampled_tokens,
        n_bins=n_bins,
        packed_tokens=packed_tokens,
        n_shards=n_sh,
        shard_docs=shard_docs,
        shard_tokens=shard_tokens,
    )
