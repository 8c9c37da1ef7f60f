"""Multimodal column plumbing (engine extension layer — north star).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside. The Spark-side mechanics — schema,
Arrow batch shape, ``mapInPandas`` partition iteration, partitioning —
are real and tested; the actual codec work is STUBBED because no
image/audio libraries exist in this container:

- ``decode_image_meta`` extracts deterministic pseudo-metadata (byte
  length, sha256, fake dimensions derived from the hash) — the shape a
  real PIL/libvips decode would return.
- ``decode_image_pixels`` raises ``NotImplementedError`` by contract
  (clearly-marked stub; swap in a real decoder where available).

The batch path is ``mapInPandas`` with Arrow transfer: payloads stream
through per-partition ``pandas.DataFrame`` batches bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — at 100 TB no task
ever holds more than one batch of blobs in memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Output schema of the metadata extraction (what a real decoder stub
#: would fill: container-level facts + content address).
IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes int, sha256 string, width int, height int, format string"
)


def with_binary_payload(df: DataFrame, source_col: str, payload_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of a
    string column — the deterministic stand-in for real image bytes)."""
    return df.withColumn(payload_col, F.col(source_col).cast("binary"))


def _fake_dims(digest: bytes) -> tuple[int, int]:
    """Deterministic pseudo-dimensions from the content hash — stands
    in for a real header parse."""
    w = 64 + (int.from_bytes(digest[0:2], "big") % 1984)  # 64..2047
    h = 64 + (int.from_bytes(digest[2:4], "big") % 1984)
    return w, h


def decode_image_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-blob metadata via mapInPandas (Arrow-batched; the real-decoder
    insertion point). Deterministic: size, sha256, hash-derived dims."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            digests = [hashlib.sha256(bytes(p)).digest() for p in payloads]
            dims = [_fake_dims(d) for d in digests]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "sha256": [d.hex() for d in digests],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "format": ["stub" for _ in digests],
                }
            )

    from ais_data_pipeline_spark.operators.util import spread_to_parallelism

    # Python-side hashing is CPU-bound: widen single-split scans so the
    # Arrow batches fan out across cores
    narrow = spread_to_parallelism(df.select(id_col, payload_col))
    return narrow.mapInPandas(extract, IMAGE_META_SCHEMA)


def decode_image_pixels(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB: real pixel decode requires an image library not present in
    this environment. The call signature and batch plumbing are the
    contract; a deployment with PIL/torchvision implements ``_decode``.
    """
    raise NotImplementedError(
        "pixel decode requires an image codec library (PIL/libvips); "
        "not available in this environment — use decode_image_meta for "
        "the metadata path, or inject a decoder via mapInPandas"
    )


#: container magic numbers (hex of the leading bytes) → media type.
#: The sniff compares hex prefixes because hex(binary) renders
#: identically across engines (uppercase, no separator) — the
#: comparison itself is still the standard magic-byte dispatch.
_MAGIC_PREFIX = [
    ("89504E47", 1, "image/png"),
    ("FFD8FF", 1, "image/jpeg"),
    ("52494646", 1, "audio/wav"),  # RIFF container
    ("494433", 1, "audio/mp3"),  # ID3 tag
    ("66747970", 9, "video/mp4"),  # 'ftyp' at byte offset 4
]

AUDIO_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, sha256 string, sample_rate int, "
    "n_channels int, duration_ms bigint, codec string"
)

#: stub parameter tables for the header "parse" — chosen by payload
#: size, so both the mapInPandas path and a SQL oracle derive the
#: identical values
_SAMPLE_RATES = [8000, 16000, 22050, 44100, 48000]


def media_type_col(payload: Column) -> Column:
    """Magic-byte media-type sniff as one codegen'd when-chain over
    ``hex(payload)`` prefixes — the router in front of per-modality
    decode stages (first-match semantics, like the reference's URL
    router)."""
    h = F.hex(payload)
    expr = F.lit("application/octet-stream")
    for magic, pos, mtype in reversed(_MAGIC_PREFIX):
        expr = F.when(
            F.substring(h, pos, len(magic)) == magic, F.lit(mtype)
        ).otherwise(expr)
    return expr


def decode_audio_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Audio-blob metadata via mapInPandas (Arrow-batched; the real
    soundfile/ffprobe insertion point). The header 'parse' is a
    deterministic stub — sample rate / channel count chosen by payload
    size, duration from the PCM identity
    ``bytes / (rate * channels * 2)`` — so the Spark plumbing is
    fully oracle-checkable while the codec work stays an honest stub
    (no audio library in this container)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf[payload_col]]
            ns = [len(p) for p in payloads]
            rates = [_SAMPLE_RATES[n % len(_SAMPLE_RATES)] for n in ns]
            chans = [1 + n % 2 for n in ns]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": ns,
                    "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "sample_rate": rates,
                    "n_channels": chans,
                    "duration_ms": [
                        n * 1000 // (r * c * 2) for n, r, c in zip(ns, rates, chans)
                    ],
                    "codec": ["pcm_stub" for _ in ns],
                }
            )

    from ais_data_pipeline_spark.operators.util import spread_to_parallelism

    narrow = spread_to_parallelism(df.select(id_col, payload_col))
    return narrow.mapInPandas(extract, AUDIO_META_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    every_n_frames: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame-sampling PLAN: emits (doc_id, frame_index) rows for a
    stub frame count derived from payload size (real impl reads the
    container header). Downstream decode joins back on doc_id and seeks
    frame_index — the fan-out happens in the engine, the codec in the
    UDF."""
    n_frames = (F.length(F.col(payload_col)) / F.lit(16)).cast("int")
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n_frames))
        ).alias("frame_index"),
    )


def frame_embedding_col(
    id_col=None, frame_col=None, dim: int = 8, prefix: str = ""
):
    """Deterministic per-frame embedding STUB: dim doubles in [-1, 1)
    derived from md5(doc:frame:j) — the stand-in for a real
    decode→encoder UDF (the container has no vision libs; the decode
    contract stays `NotImplementedError` in decode_image_meta). What
    IS real, and what this column proves end-to-end, is the Spark-side
    plumbing a frame-embedding pipeline needs: the fan-out work-list,
    a fixed-width vector column produced per (doc, frame) row inside
    whole-stage codegen, and similarity search consuming it — swap the
    expression for a Pandas-UDF encoder and nothing downstream
    changes.

    Engine-portable arithmetic (same recipe as the md5_60 hash family):
    h = first 15 hex digits of md5 as a 60-bit int, then
    ``(double(h) / 2^60) * 2.0 - 1.0`` — the int→double rounding and
    the power-of-two division are identical IEEE ops in Spark, Python,
    and DuckDB, so a SQL oracle replays the vectors bit-for-bit.

    ``prefix`` namespaces the hash key (e.g. ``"c:"`` for text-chunk
    embeddings) so two stub encoders over the same (id, index) space
    don't produce the identical vector set."""
    from pyspark.sql import functions as F

    id_col = id_col if id_col is not None else F.col("doc_id")
    frame_col = frame_col if frame_col is not None else F.col("frame_index")
    comps = []
    for j in range(dim):
        h = F.conv(
            F.substring(
                F.md5(
                    F.format_string(prefix + "%d:%d:" + str(j), id_col, frame_col)
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        comps.append(
            h.cast("double") / F.lit(float(2**60)) * F.lit(2.0) - F.lit(1.0)
        )
    return F.array(*comps)
