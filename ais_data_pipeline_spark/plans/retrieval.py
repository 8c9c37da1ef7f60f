"""Vector retrieval as a first-class plan: build once, serve many.

The serving-side counterpart of ``plans.curation`` (batch) and
``streaming.incremental_dedup`` (ingest): one call materializes a
persisted vector index of the caller's chosen kind, and the returned
handle answers top-k queries against it — with per-probe structured
log events (reference M1 contract) and without ever rescanning the
corpus.

Index kinds, all oracle-verified through their registry queries:

- ``"ann"``   — random-hyperplane LSH buckets as partition dirs
                (`ann_index_topk`); exact re-rank inside probed buckets.
- ``"ivf"``   — data-adaptive coarse cells (`ivf_index_topk`); exact
                re-rank inside the nprobe nearest lists.
- ``"ivfpq"`` — coarse cells + product-quantized residuals
                (`ivfpq_index_topk` / `ivfpq_rerank_topk`); ADC scoring
                with optional exact re-rank of over-fetched candidates.

Scale shape: every build is one corpus scan plus a partitioned write;
every probe is a partition-pruned scan of the probed cells only
(SCALING.md measures all three probes flat while the corpus grows
50×). The plan object carries no state beyond paths + build params —
it is safe to reconstruct from the path on another driver.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ais_data_pipeline_spark.observability import log


@dataclass(frozen=True)
class VectorIndex:
    """Handle for a persisted index; ``topk`` serves queries."""

    spark: SparkSession
    kind: str
    path: str
    params: dict = field(default_factory=dict)

    def topk(
        self,
        query: list[float],
        k: int = 10,
        nprobe: int = 2,
        multiprobe_bits: int = 1,
        rerank: int | None = None,
        vectors_df: DataFrame | None = None,
    ) -> DataFrame:
        """Top-k rows for one query vector. ``rerank`` (ivfpq only)
        over-fetches that many ADC candidates and exact-L2 re-ranks
        them against ``vectors_df`` (the full-vector table)."""
        from ais_data_pipeline_spark.operators import similarity as S

        t0 = time.monotonic()
        if self.kind == "ann":
            out = S.cosine_topk_indexed(
                self.spark, self.path, query, k=k,
                n_planes=self.params["n_planes"], seed=self.params["seed"],
                multiprobe_bits=multiprobe_bits,
            )
        elif self.kind == "ivf":
            out = S.ivf_probe_topk(self.spark, self.path, query, k=k, nprobe=nprobe)
        elif self.kind == "ivfpq":
            if rerank is not None:
                if vectors_df is None:
                    raise ValueError("rerank needs vectors_df (full vectors)")
                out = S.ivfpq_rerank_topk(
                    self.spark, self.path, vectors_df, query,
                    k=k, nprobe=nprobe, n_candidates=rerank,
                )
            else:
                out = S.ivfpq_probe_topk(self.spark, self.path, query, k=k, nprobe=nprobe)
        else:  # pragma: no cover - constructor validates
            raise ValueError(f"unknown index kind {self.kind!r}")
        log(
            "vector_probe",
            kind=self.kind,
            path=self.path,
            k=k,
            nprobe=nprobe,
            rerank=rerank,
            plan_ms=round((time.monotonic() - t0) * 1000, 1),
        )
        return out


def build_vector_index(
    spark: SparkSession,
    vectors: DataFrame,
    path: str,
    kind: str = "ivf",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    # ann
    n_planes: int = 8,
    seed: int = 42,
    # ivf / ivfpq
    n_centroids: int = 16,
    # ivfpq
    m: int = 4,
    k_codes: int = 8,
    pq_iters: int = 1,
    coarse_iters: int = 2,
) -> VectorIndex:
    """Build a persisted index of ``kind`` at ``path`` and return the
    serving handle. One corpus scan + partitioned write; emits an M1
    build event with wall time."""
    from ais_data_pipeline_spark.operators import similarity as S

    t0 = time.monotonic()
    if kind == "ann":
        S.build_ann_index(vectors, path, n_planes=n_planes, seed=seed, vec_col=vec_col)
        params = {"n_planes": n_planes, "seed": seed}
    elif kind == "ivf":
        S.build_ivf_index(vectors, path, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col)
        params = {"n_centroids": n_centroids}
    elif kind == "ivfpq":
        S.build_ivfpq_index(
            vectors, path, n_centroids=n_centroids, m=m, k=k_codes,
            iters=pq_iters, coarse_iters=coarse_iters,
            vec_col=vec_col, id_col=id_col,
        )
        params = {"n_centroids": n_centroids, "m": m, "k": k_codes}
    else:
        raise ValueError(f"unknown index kind {kind!r} (ann | ivf | ivfpq)")
    log(
        "vector_index_built",
        kind=kind,
        path=path,
        build_sec=round(time.monotonic() - t0, 3),
        **params,
    )
    return VectorIndex(spark=spark, kind=kind, path=path, params=params)
