#!/usr/bin/env python
"""Pixel-decode throughput probe: the measured cost of the pure-stdlib
decoders (PPM / BMP / PNG) through the real Arrow-batched mapInPandas
path, at realistic image dims — the number a 100 TB multimodal scan
needs for sizing, and the honest cost statement for the PNG path
(Average/Paeth scanlines reconstruct through a sequential left-neighbor
recurrence in Python; PPM/BMP and the other PNG filters are vectorized
numpy).

Method: encode n_docs fixtures per format at (side x side), decode via
decode_image_pixels (same operator the oracle queries use), aggregate a
checksum so nothing is optimized away. Two corpus sizes per format pin
the scaling shape (per-row stateless decode => flat Mpx/s).

Emits one JSON line:
  {"metric": "pixel_decode_throughput", "side": ..., "cpus": ...,
   "formats": {fmt: {"n_docs": .., "mpx": .., "sec": .., "mpx_per_sec":
   .., "mpx_per_sec_per_thread": .., "flatness_2x": ..}}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ais_data_pipeline_spark.session import get_spark

SIDE = int(os.environ.get("PIXEL_PROBE_SIDE", 128))
N_DOCS = int(os.environ.get("PIXEL_PROBE_DOCS", 2048))


def main() -> None:
    import pandas as pd

    from pyspark.sql import functions as F

    from ais_data_pipeline_spark.operators.multimodal import (
        IMAGE_PIXEL_SCHEMA,
        decode_image_pixels,
        encode_bmp,
        encode_png,
        encode_ppm,
    )
    from ais_data_pipeline_spark.operators.util import spread_to_parallelism

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="pixel_decode_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    from ais_data_pipeline_spark.operators.jpeg import encode_jpeg_coeffs

    def encode_jpeg_probe(i: int, w: int, h: int) -> bytes:
        """Probe JPEG with ~12 AC coefficients per block (moderate
        photographic detail) — NOT the constant-block oracle fixture,
        whose single-symbol blocks would flatter the Huffman bit loop
        that dominates real decode cost."""
        nbx, nby = (w + 7) // 8, (h + 7) // 8
        blocks = []
        for m in range(nbx * nby):
            b = [0] * 64
            b[0] = (i * 31 + m) % 256 - 128
            for j in range(12):
                k = 1 + (m * 7 + j * 5) % 63
                b[k] = ((i + m + j) % 19) - 9 or 1
            blocks.append(b)
        return encode_jpeg_coeffs(w, h, [blocks])

    from ais_data_pipeline_spark.operators.jpeg import encode_jpeg_progressive

    def encode_jpeg_prog_probe(i: int, w: int, h: int) -> bytes:
        """Same ~12-AC-coefficient content as the baseline probe,
        routed through the SOF2 multi-scan encoder — the progressive-
        vs-sequential entropy-cost comparison at equal pixel content
        (progressive revisits every coefficient once per successive-
        approximation level, so the bit loop runs ~2x the symbols)."""
        nbx, nby = (w + 7) // 8, (h + 7) // 8
        blocks = []
        for m in range(nbx * nby):
            b = [0] * 64
            b[0] = (i * 31 + m) % 256 - 128
            for j in range(12):
                k = 1 + (m * 7 + j * 5) % 63
                b[k] = ((i + m + j) % 19) - 9 or 1
            blocks.append(b)
        return encode_jpeg_progressive(w, h, [blocks])

    from ais_data_pipeline_spark.operators.gif import encode_gif as _enc_gif
    from ais_data_pipeline_spark.operators.multimodal import synth_pixel_value
    from ais_data_pipeline_spark.operators.tiff import encode_tiff as _enc_tiff

    def encode_gif_probe(i: int, w: int, h: int) -> bytes:
        pal = bytes(synth_pixel_value(i, c + j) for c in range(256) for j in range(3))
        return _enc_gif([(3 * p) % 256 for p in range(w * h)], pal, w, h)

    encoders = {
        "ppm": encode_ppm,
        "bmp": encode_bmp,
        "png": encode_png,
        "jpeg": encode_jpeg_probe,
        "jpeg_progressive": encode_jpeg_prog_probe,
        # round 13: the GIF LZW rung and the three TIFF codec rungs
        "gif": encode_gif_probe,
        "tiff": lambda i, w, h: _enc_tiff(i, w, h, rows_per_strip=16),
        "tiff_lzw": lambda i, w, h: _enc_tiff(i, w, h, compression=5, rows_per_strip=16),
        "tiff_packbits": lambda i, w, h: _enc_tiff(i, w, h, compression=32773, rows_per_strip=16),
        "tiff_deflate": lambda i, w, h: _enc_tiff(i, w, h, compression=8, rows_per_strip=16),
        # round 15: the new TIFF codec rungs — fax (the Python
        # mode-loop class, priced like GIF/TIFF-LZW), JPEG-in-TIFF
        # (per-strip abbreviated streams through the full JPEG
        # decoder), planar-2 (three plane walks + stack)
        "tiff_g4": lambda i, w, h: _enc_tiff(i, w, h, gray=True, compression=4, rows_per_strip=16),
        "tiff_jpeg": lambda i, w, h: _enc_tiff(i, w, h, compression=7, rows_per_strip=16),
        "tiff_planar2": lambda i, w, h: _enc_tiff(i, w, h, compression=5, rows_per_strip=16, planar=2),
    }

    def fixture(fmt: str, n: int):
        """(doc_id, payload) frame of n SIDE x SIDE images, encoded on
        the executors (mapInPandas) so the driver never holds the
        corpus."""
        enc = encoders[fmt]

        def gen(batches):
            for pdf in batches:
                ids = [int(i) for i in pdf["id"]]
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(ids, dtype="int64"),
                        "payload": [enc(i, SIDE, SIDE) for i in ids],
                    }
                )

        base = spread_to_parallelism(spark.range(n).select(F.col("id")))
        return base.mapInPandas(gen, "doc_id bigint, payload binary")

    def timed_decode(fmt: str, n: int) -> float:
        df = fixture(fmt, n).localCheckpoint()  # encode OUTSIDE the timed leg
        t0 = time.perf_counter()
        row = (
            decode_image_pixels(df)
            .agg(
                F.sum(F.col("sum_r") + F.col("sum_g") + F.col("sum_b")).alias("chk"),
                F.count("*").alias("n"),
            )
            .first()
        )
        dt = time.perf_counter() - t0
        assert row["n"] == n and row["chk"] is not None
        return dt

    sel = os.environ.get("PIXEL_PROBE_FORMATS")
    chosen = [f for f in encoders if not sel or f in sel.split(",")]
    out = {}
    for fmt in chosen:
        timed_decode(fmt, 256)  # JIT/Arrow warmup outside measurement
        t1 = timed_decode(fmt, N_DOCS)
        t2 = timed_decode(fmt, N_DOCS * 2)
        mpx = N_DOCS * SIDE * SIDE / 1e6
        out[fmt] = {
            "n_docs": N_DOCS,
            "mpx": round(mpx, 1),
            "sec": round(t1, 2),
            "mpx_per_sec": round(mpx / t1, 1),
            "mpx_per_sec_per_thread": round(mpx / t1 / cpus, 3),
            # per-row stateless decode: doubling the corpus should keep
            # throughput flat (ratio ~2.0 of elapsed, ~1.0 of rate)
            "flatness_2x": round(t2 / t1 / 2.0, 2),
        }

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "pixel_decode_throughput",
                "side": SIDE,
                "cpus": cpus,
                "formats": out,
            }
        )
    )


if __name__ == "__main__":
    main()
