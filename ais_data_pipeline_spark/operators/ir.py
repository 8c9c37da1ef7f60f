"""Information-retrieval operators over the documents corpus (engine
extension layer; the reference has no search surface — this rounds out
the training-data curation tier with the standard ranking/indexing/
decontamination primitives a 100 TB text pipeline needs).

- ``bm25_topk`` — Okapi BM25 ranking for a fixed term set. Tokens are
  filtered to the query terms BEFORE the (doc, term) shuffle, so the
  exchange carries only matching postings, never the corpus; document
  frequency comes off the tf rows via a term window (no second
  explode); corpus scalars (N, avgdl) ride a broadcast.
- ``inverted_index`` — posting-list construction. Per-term stats are
  one partial-aggregated shuffle; the materialized posting arrays are
  BOUNDED before collect_list by a row_number cut, so per-term state
  never exceeds ``postings_per_term`` even for stop-words.
- ``ngram_contamination`` — benchmark decontamination: fraction of a
  train doc's word n-grams that appear in any eval doc. Eval corpora
  are small (benchmarks), so the distinct eval-gram set broadcasts and
  the train corpus is scored map-side without shuffling text; grams
  are 64-bit xxhash64 shingles end-to-end (operators.dedup), never
  strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ais_data_pipeline_spark.operators.dedup import shingle_hashes_from_tokens
from ais_data_pipeline_spark.operators.text import tokens_col
from ais_data_pipeline_spark.checkpointing import materialize


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Top-k documents by BM25 (Robertson/Okapi, Lucene-style idf
    ``ln(1 + (N - df + .5)/(df + .5))``) for ``query_terms``.

    Deterministic: per-term scores are identical double expressions on
    exact integer inputs (tf, df, dl, N); the per-doc sum goes through
    DECIMAL(38,18) so partition order can't perturb it; ties break on
    doc id. Returns (doc_id, score).
    """
    toks = docs.select(F.col(id_col), tokens_col(F.col(text_col)).alias("__t"))
    # dl feeds the per-doc join AND the corpus scalars; materialize the
    # (id, length) pairs so the corpus is scanned twice (dl + postings),
    # not three times — at scale dl is 16 bytes/doc, trivially cached.
    # localCheckpoint over persist: blocks are GC-reclaimed by the
    # ContextCleaner, so a 150-query sweep accumulates no cache entries.
    # (Unreplicated executor-local blocks — for cluster fault tolerance
    # see the caveat on operators.graph.pagerank.)
    dl = toks.select(id_col, F.size("__t").alias("__dl")).transform(materialize)
    # filter to query terms BEFORE the shuffle: only matching postings move
    tf = (
        toks.select(F.col(id_col), F.explode("__t").alias("term"))
        .filter(F.col("term").isin([t.lower() for t in query_terms]))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # tf is unique per (doc, term): a count over the term window IS df
    tf = tf.withColumn("dfreq", F.count(F.lit(1)).over(Window.partitionBy("term")))
    scalars = dl.agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__dl").alias("__sumdl")
    )
    scored = (
        tf.join(dl, id_col)
        .crossJoin(F.broadcast(scalars))
        .select(
            F.col(id_col),
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("__n") - F.col("dfreq") + F.lit(0.5))
                    / (F.col("dfreq") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b)
                        * F.col("__dl")
                        / (F.col("__sumdl").cast("double") / F.col("__n"))
                    )
                )
            )
            .cast("decimal(38,18)")
            .alias("__s"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("__s").cast("double"), round_digits).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def inverted_index(
    docs: DataFrame,
    top_terms: int = 20,
    postings_per_term: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Posting lists for the ``top_terms`` highest-document-frequency
    terms: (term, dfreq, total_tf, postings) where postings is the
    JSON array of the first ``postings_per_term`` doc ids ascending.

    The posting arrays are cut by row_number BEFORE collect_list, so
    aggregation state per term is bounded — a stop-word appearing in
    every document still materializes only ``postings_per_term`` ids.
    JSON (not array) output keeps the result hashable downstream.
    """
    # tf feeds both the stats agg and the posting build, and `top`
    # feeds both the posting filter and the final join — materialize
    # them via eager localCheckpoint (Catalyst doesn't CSE repeated
    # subtrees; without this the explode+shuffle would run twice; and
    # unlike persist the blocks are GC-reclaimed, so a long query sweep
    # leaks nothing). At warehouse scale tf would be a bucketed table
    # (sinks/tables.py) rather than an executor cache.
    tf = (
        docs.select(F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(materialize)
    )
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("dfreq"), F.sum("tf").alias("total_tf")
    )
    top = (
        stats.orderBy(F.desc("dfreq"), F.asc("term"))
        .limit(top_terms)
        .transform(materialize)
    )
    cut = Window.partitionBy("term").orderBy(F.asc(id_col))
    postings = (
        tf.join(F.broadcast(top.select("term")), "term")
        .withColumn("__rn", F.row_number().over(cut))
        .filter(F.col("__rn") <= postings_per_term)
        .groupBy("term")
        .agg(F.to_json(F.sort_array(F.collect_list(id_col))).alias("postings"))
    )
    return top.join(postings, "term").select("term", "dfreq", "total_tf", "postings")


def ngram_contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 5,
) -> DataFrame:
    """Benchmark decontamination: for each train doc, the fraction of
    its distinct word n-grams found in ANY eval doc. Returns
    (doc_id, n_grams, n_hit, contamination) for docs with ≥1 hit.

    The eval gram set (distinct 64-bit shingle hashes) broadcasts —
    eval corpora are benchmark-sized — so the train side is scored in
    one pass with no text shuffle; per-doc gram counts and hit counts
    shuffle only (id, count) pairs.
    """
    def grams(df: DataFrame) -> DataFrame:
        toks = df.select(F.col(id_col), tokens_col(F.col(text_col)).alias("__t"))
        return toks.select(
            F.col(id_col), F.explode(shingle_hashes_from_tokens(F.col("__t"), n)).alias("g")
        )

    tg = grams(train)
    eg = grams(eval_docs).select(F.col("g").alias("__eg")).distinct()
    # ONE pass over the train grams: a LEFT broadcast join marks hits
    # without dropping rows, so gram count and hit count come out of
    # the same aggregation (no second explode of the corpus)
    return (
        tg.join(F.broadcast(eg), tg.g == F.col("__eg"), "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__eg").alias("n_hit"),
        )
        .filter(F.col("n_hit") > 0)
        .select(
            id_col,
            "n_grams",
            "n_hit",
            F.round(
                F.col("n_hit").cast("double") / F.col("n_grams"), round_digits
            ).alias("contamination"),
        )
    )
