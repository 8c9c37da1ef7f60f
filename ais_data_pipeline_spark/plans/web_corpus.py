"""Web-corpus ingestion plan: WARC shards → training-ready corpus.

The r16 capstone composition — one call takes raw ``.warc.gz`` shards
through the standard web-pipeline chain and leaves deterministic
training shards:

1. **Parse**: ``sources.warc.read_warc`` streams records one task per
   shard (the Common Crawl unit); only ``conversion`` records (WET
   extracted text) continue.
2. **Canonical-URL fetch dedup** (``functions.url``): the same page
   fetched under case/port/tracking/fragment variants collapses to
   one canonical key; the FIRST fetch (minimum (shard, record)) wins.
   Scheme-less URIs have no canonical identity and drop here.
3. **Quality gate**: the composite ``quality_col`` score at a caller
   threshold — the cheap scan-side filter before any content shuffle.
4. **Exact content dedup**: md5-of-text keep-minimum, the curation
   plan's drop-set shape.
5. **Shard write**: ``write_training_shards`` — md5-keyed layout,
   bit-reproducible across runs/engines/cluster sizes.

Scale shape mirrors ``plans.curation``: stages 2 and 4 compute drop
id-sets that anti-join against the record scan, so document text
crosses the wire exactly once — into the final shard shuffle. Two
r17 hardenings close the last 100 TB gaps (r16 verdict):

- **Drop-set broadcasts are size-gated** (``operators.util.
  gated_broadcast``): duplicate fetches / bodies are a few percent
  of a healthy crawl, but real CC dumps blow past broadcast size at
  100 TB (tens of billions of keys vs the 8 GB broadcast hard
  limit). The counts are already materialized for stage accounting;
  above the session's autoBroadcastJoinThreshold the hint is dropped
  and AQE picks a keys-only shuffled anti-join.
- **The one-parse projection side-channels to SCRATCH PARQUET**, not
  ``localCheckpoint``: pinning the full decompressed corpus in
  executor block managers is exactly the shape that OOMed the r15
  curation run (SCALING.md rule). Columnar zstd parquet is ~3-4×
  smaller, survives executor loss, and downstream stages read it
  with COLUMN PRUNING — the dedup stages scan (doc_key, url) /
  (doc_key, text-hash) without ever re-materializing text.

Per-stage accounting returns in the result and logs through the
structured observability contract (reference M1).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ais_data_pipeline_spark.checkpointing import materialize
from ais_data_pipeline_spark.functions.url import canonical_url
from ais_data_pipeline_spark.fsutil import io_for
from ais_data_pipeline_spark.observability import log
from ais_data_pipeline_spark.operators.corpus import write_training_shards
from ais_data_pipeline_spark.operators.text import quality_col
from ais_data_pipeline_spark.operators.util import gated_broadcast


@dataclass(frozen=True)
class WebCorpusResult:
    n_records: int
    n_after_url_dedup: int
    n_after_quality: int
    n_kept: int
    #: survivors of the optional language filter (None when the stage
    #: was not requested); sits between url-dedup and quality
    n_after_lang: int | None = None
    #: survivors of the optional MinHash near-dup stage (None when not
    #: requested); runs after exact dedup, and n_kept is then the
    #: near-dup survivor count (what was written)
    n_after_exact: int | None = None

    @property
    def stage_counts(self) -> dict[str, int]:
        out = {
            "00_conversion_records": self.n_records,
            "01_url_dedup": self.n_after_url_dedup,
        }
        if self.n_after_lang is not None:
            out["01a_lang_id"] = self.n_after_lang
        out["02_quality"] = self.n_after_quality
        out["03_exact_dedup"] = (
            self.n_after_exact if self.n_after_exact is not None else self.n_kept
        )
        if self.n_after_exact is not None:
            out["04_near_dup"] = self.n_kept
        return out


def run_web_corpus(
    spark: SparkSession,
    warc_paths: list[str] | str,
    out_path: str,
    quality_threshold: float = 0.5,
    n_shards: int = 8,
    payload_max_bytes: int | None = None,
    scratch_path: str | None = None,
    input_format: str = "wet",
    lang: str | None = None,
    near_dup_threshold: float | None = None,
    max_bucket_size: int | None = None,
) -> WebCorpusResult:
    """Run the WARC→shards chain; returns per-stage survivor counts
    (rows_in − rows_out fully attributed across the stages). The kept
    corpus lands at ``out_path`` as ``shard=`` partitions of
    (doc_key, url, text); ``doc_key`` is ``<warc_file>:<record_index>``
    — stable across re-runs of the same shards, which is what keeps
    the whole layout reproducible. ``scratch_path`` (default
    ``out_path + "_parsed"``) holds the one-parse parquet projection
    for the duration of the run; it is removed on success.

    ``input_format``: ``"wet"`` consumes ``conversion`` records (WET
    extracted text, payload IS the text); ``"warc"`` consumes raw
    ``response`` records — the HTTP message splits (status/headers/
    de-chunk/content-decode/charset text), only clean 200s with a
    textual body continue, and ``text/html`` bodies run the codegen
    HTML→text extraction. Either way the stage-0 count
    (``00_conversion_records``) is the number of parsed TEXT records
    entering the pipeline.

    Two optional stages complete the CCNet/RefinedWeb shape:

    - ``lang``: keep only documents the stopword-profile scorer
      (``predict_language``) labels with this code — a scan-side
      codegen filter between URL dedup and quality (stage key
      ``01a_lang_id``). The heuristic tier; swap in
      ``hashed_langid_scores`` output upstream for the model-served
      tier.
    - ``near_dup_threshold``: MinHash/LSH near-duplicate removal
      (exact-Jaccard-verified) AFTER exact dedup, dropping the
      lexicographically-later doc of each pair (stage key
      ``04_near_dup``); ``max_bucket_size`` is the boilerplate-cluster
      guard passed through to the LSH stage. The drop-set anti-join is
      size-gated like the others."""
    from ais_data_pipeline_spark.sources.warc import read_warc

    # zero-padded index (r16 ADVICE): doc_key min() is a STRING min,
    # and unpadded 'f:10' < 'f:9' broke the documented first-fetch-wins
    # rule on shards with >=10 records. %012d keeps lexicographic
    # order == (warc_file, record_index) order for any realistic shard.
    doc_key = F.format_string("%s:%012d", "warc_file", "record_index").alias(
        "doc_key"
    )
    recs = read_warc(spark, warc_paths, payload_max_bytes)
    if input_format == "warc":
        from ais_data_pipeline_spark.operators.text import html_to_text_col
        from ais_data_pipeline_spark.sources.http_payload import (
            split_http_responses,
        )

        resp = split_http_responses(recs)
        parsed = resp.filter(
            F.col("http_error").isNull()
            & (F.col("http_status") == 200)
            & F.col("body_text").isNotNull()
        ).select(
            doc_key,
            canonical_url(F.col("target_uri")).alias("url"),
            F.when(
                F.col("content_type").isin("text/html", "application/xhtml+xml"),
                html_to_text_col(F.col("body_text")),
            )
            .otherwise(F.col("body_text"))
            .alias("text"),
        )
    elif input_format == "wet":
        parsed = recs.filter(F.col("warc_type") == "conversion").select(
            doc_key,
            canonical_url(F.col("target_uri")).alias("url"),
            F.col("payload").cast("string").alias("text"),
        )
    else:
        raise ValueError(f"input_format must be 'wet' or 'warc', got {input_format!r}")

    # one parse of the (non-offset-splittable) warc.gz shards lands in
    # scratch parquet; every stage below is a column-pruned scan of it
    scratch = scratch_path or (out_path.rstrip("/") + "_parsed")
    parsed.write.mode("overwrite").parquet(scratch)
    docs = spark.read.parquet(scratch)
    n_records = docs.count()

    # stage 1: canonical-URL fetch dedup — the LATER fetches of a key
    # (non-minimum doc_key) form the small drop-set; scheme-less rows
    # (url NULL) drop with them
    with_url = docs.filter(F.col("url").isNotNull())
    first = with_url.groupBy("url").agg(F.min("doc_key").alias("__keep"))
    drop_url = (
        with_url.join(first, "url")
        .filter(F.col("doc_key") != F.col("__keep"))
        .select("doc_key")
        .transform(materialize)
    )
    n_drop_url_keys = drop_url.count()
    n_drop_url = n_drop_url_keys + (n_records - with_url.count())
    s1 = with_url.join(gated_broadcast(drop_url, n_drop_url_keys),
                       "doc_key", "left_anti")
    log("web_corpus_url_dedup", rows_in=n_records, rows_dropped=n_drop_url)
    n_after_url = n_records - n_drop_url

    # optional stage 1a: language filter — another scan-side codegen
    # expression fused into the same pass as quality (no extra scan)
    n_after_lang: int | None = None
    if lang is not None:
        from ais_data_pipeline_spark.operators.text import predict_language

        s1 = s1.filter(predict_language(F.col("text")) == lang)
        n_after_lang = s1.count()
        log(
            "web_corpus_lang_id",
            rows_in=n_after_url,
            rows_dropped=n_after_url - n_after_lang,
        )

    # stage 2: quality gate — scan-side expression, no shuffle
    # (round(…,5) replicates quality_score's decision boundary)
    s2 = s1.filter(F.round(quality_col(F.col("text")), 5) >= quality_threshold)
    n_after_quality = s2.count()
    log(
        "web_corpus_quality",
        rows_in=n_after_lang if n_after_lang is not None else n_after_url,
        rows_dropped=(n_after_lang if n_after_lang is not None else n_after_url)
        - n_after_quality,
    )

    # stage 3: exact content dedup — keep the minimum doc_key per body
    hashed = s2.select("doc_key", F.md5(F.col("text").cast("binary")).alias("__h"))
    keep_min = hashed.groupBy("__h").agg(F.min("doc_key").alias("__keep"))
    drop_exact = (
        hashed.join(keep_min, "__h")
        .filter(F.col("doc_key") != F.col("__keep"))
        .select("doc_key")
        .transform(materialize)
    )
    n_drop_exact = drop_exact.count()
    kept = s2.join(gated_broadcast(drop_exact, n_drop_exact),
                   "doc_key", "left_anti")
    log(
        "web_corpus_exact_dedup",
        rows_in=n_after_quality,
        rows_dropped=n_drop_exact,
    )
    n_after_exact = n_after_quality - n_drop_exact

    # optional stage 4: MinHash/LSH near-dup on the exact-dedup
    # survivors (the curation plan's stage, over string doc_keys —
    # lexicographically-later doc of each verified pair drops)
    n_kept = n_after_exact
    if near_dup_threshold is not None:
        from ais_data_pipeline_spark.operators.dedup import minhash_near_dup

        drop_near = (
            minhash_near_dup(
                kept,
                threshold=near_dup_threshold,
                text_col="text",
                id_col="doc_key",
                max_bucket_size=max_bucket_size,
            )
            .select(F.col("doc_b").alias("doc_key"))
            .distinct()
            .transform(materialize)
        )
        n_drop_near = drop_near.count()
        kept = kept.join(gated_broadcast(drop_near, n_drop_near),
                         "doc_key", "left_anti")
        n_kept = n_after_exact - n_drop_near
        log(
            "web_corpus_near_dup",
            rows_in=n_after_exact,
            rows_dropped=n_drop_near,
        )

    write_training_shards(kept, out_path, n_shards=n_shards, id_col="doc_key")
    log("web_corpus_written", rows_out=n_kept, shards=n_shards)
    io_for(scratch).remove(scratch)  # the one-parse projection is spent
    return WebCorpusResult(
        n_records=n_records,
        n_after_url_dedup=n_after_url,
        n_after_quality=n_after_quality,
        n_kept=n_kept,
        n_after_lang=n_after_lang,
        n_after_exact=n_after_exact if near_dup_threshold is not None else None,
    )
