#!/usr/bin/env python
"""Audio-decode throughput probe: the measured cost of the pure-stdlib
WAV/PCM decoder through the real Arrow-batched mapInPandas path — the
sizing number for a 100 TB audio scan, recorded in SCALING.md next to
the image-decode rows.

Method: encode n_docs 16-bit stereo WAVs of `seconds` seconds at 16 kHz
on the executors, decode via decode_audio_pcm (the operator the
audio_pcm_stats oracle query uses), aggregate a checksum. Two corpus
sizes pin the scaling shape (per-row stateless decode => flat rate).

Emits one JSON line:
  {"metric": "audio_decode_throughput", "cpus": ..., "n_docs": ...,
   "msamples": ..., "sec": ..., "msamples_per_sec": ...,
   "msamples_per_sec_per_thread": ..., "flatness_2x": ...}
"""

from __future__ import annotations

import json
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ais_data_pipeline_spark.session import get_spark

N_DOCS = int(os.environ.get("AUDIO_PROBE_DOCS", 2048))
SECONDS = float(os.environ.get("AUDIO_PROBE_SECONDS", 2.0))
#: pcm16 (plain fmt), float32 (WAVE_FORMAT_EXTENSIBLE wrapper),
#: round-13 rungs: adpcm (IMA predictor loop), mulaw (G.711 expansion
#: — measured separately since the float path takes the f4
#: frombuffer + float64 stats branch), and the round-14 flac rung
#: (the native frame codec's Python Rice loop — the documented
#: bit-loop class, priced honestly like TIFF-LZW)
FORMAT = os.environ.get("AUDIO_PROBE_FORMAT", "pcm16")
RATE = 16000
NCH = 2


def main() -> None:
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F

    from ais_data_pipeline_spark.operators.multimodal import decode_audio_pcm
    from ais_data_pipeline_spark.operators.util import spread_to_parallelism

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="audio_decode_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    n_frames = int(RATE * SECONDS)

    def encode_probe_wav(i: int) -> bytes:
        # varied stereo content (vectorized; the DECODE side is what's
        # being measured)
        k = np.arange(n_frames * NCH, dtype=np.int64)
        codes = (i * 131 + k * 17) % 65536 - 32768
        if FORMAT == "adpcm":  # round 13: the IMA predictor rung
            from ais_data_pipeline_spark.operators.wav import (
                encode_ima_adpcm_wav,
            )

            return encode_ima_adpcm_wav(
                codes.reshape(-1, NCH).astype(np.int16), RATE,
                block_align=512 * NCH,
            )
        if FORMAT == "flac":  # round 14: the native FLAC frame rung
            from ais_data_pipeline_spark.operators.flac_frames import (
                encode_flac_frames,
            )

            chans = codes.reshape(-1, NCH)
            return encode_flac_frames(
                [chans[:, c].tolist() for c in range(NCH)],
                RATE,
                bps=16,
                blocksize=4096,
                subframe_type=lambda f, c: "fixed2",
                stereo_mode=lambda f: ["ls", "ms"][f % 2],
            )
        if FORMAT == "mulaw":  # round 13: the G.711 expansion rung
            # invert the decode segment mapping approximately: probe
            # content only needs to be VALID mu-law bytes, not a true
            # companding round-trip — feed raw bytes directly
            raw = ((i * 131 + np.arange(n_frames * NCH)) % 256).astype(np.uint8).tobytes()
            balign = NCH
            fmt = b"fmt " + struct.pack(
                "<IHHIIHH", 16, 7, NCH, RATE, RATE * balign, balign, 8
            )
        elif FORMAT == "float32":
            from ais_data_pipeline_spark.operators.wav import _KSDATAFORMAT_TAIL

            raw = (codes / 32768.0).astype("<f4").tobytes()
            balign = 4 * NCH
            ext = struct.pack("<HHI", 22, 32, 0x3)
            ext += struct.pack("<H", 3) + b"\x00\x00" + _KSDATAFORMAT_TAIL
            fmt = b"fmt " + struct.pack(
                "<IHHIIHH", 40, 0xFFFE, NCH, RATE, RATE * balign, balign, 32
            ) + ext
        else:
            raw = codes.astype("<i2").tobytes()
            balign = 2 * NCH
            fmt = b"fmt " + struct.pack(
                "<IHHIIHH", 16, 1, NCH, RATE, RATE * balign, balign, 16
            )
        return (
            b"RIFF"
            + struct.pack("<I", 4 + len(fmt) + 8 + len(raw))
            + b"WAVE"
            + fmt
            + b"data"
            + struct.pack("<I", len(raw))
            + raw
        )

    def fixture(n: int):
        def gen(batches):
            for pdf in batches:
                ids = [int(i) for i in pdf["id"]]
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(ids, dtype="int64"),
                        "payload": [encode_probe_wav(i) for i in ids],
                    }
                )

        base = spread_to_parallelism(spark.range(n).select(F.col("id")))
        return base.mapInPandas(gen, "doc_id bigint, payload binary")

    def timed(n: int) -> float:
        df = fixture(n).localCheckpoint()  # encode OUTSIDE the timed leg
        t0 = time.perf_counter()
        row = (
            decode_audio_pcm(df)
            .agg(F.sum("sum_abs").alias("chk"), F.count("*").alias("n"))
            .first()
        )
        dt = time.perf_counter() - t0
        assert row["n"] == n * NCH and row["chk"] is not None
        return dt

    timed(256)  # warmup
    t1 = timed(N_DOCS)
    t2 = timed(N_DOCS * 2)
    msamples = N_DOCS * n_frames * NCH / 1e6
    print(
        json.dumps(
            {
                "metric": "audio_decode_throughput",
                "format": FORMAT,
                "cpus": cpus,
                "n_docs": N_DOCS,
                "seconds_each": SECONDS,
                "msamples": round(msamples, 1),
                "sec": round(t1, 2),
                "msamples_per_sec": round(msamples / t1, 1),
                "msamples_per_sec_per_thread": round(msamples / t1 / cpus, 3),
                "flatness_2x": round(t2 / t1 / 2.0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
