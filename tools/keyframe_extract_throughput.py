#!/usr/bin/env python
"""Keyframe-pipeline throughput probe: the measured cost of the
round-12 video sampling tier — the pure-stdlib ISO-BMFF sample-table
walk (``keyframe_sample_plan``, Arrow-batched mapInPandas over the
container headers) plus the ENGINE-side coded-frame byte extraction
(``extract_frame_blobs``: broadcast work-list + codegen'd binary
substring). The sizing numbers for a 100 TB video-corpus scan,
recorded in SCALING.md next to the image/audio decode rows.

Method: encode n_docs fixture MP4s with real stsz/stsc/stco/stss
tables and an mdat whose bytes live at the advertised offsets (the
same encoder the oracle-checked ``frame_sample_fanout`` uses), then
time (a) the offset walk alone and (b) walk + blob slicing + per-blob
checksum, at two corpus sizes to pin the scaling shape.

Emits one JSON line:
  {"metric": "keyframe_extract_throughput", "cpus": ..., "n_docs": ...,
   "containers_per_sec": ..., "frames": ..., "walk_sec": ...,
   "extract_sec": ..., "frame_mib_per_sec": ..., "flatness_2x": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ais_data_pipeline_spark.session import get_spark

N_DOCS = int(os.environ.get("KEYFRAME_PROBE_DOCS", 4096))


def main() -> None:
    from pyspark.sql import functions as F

    from ais_data_pipeline_spark.operators.multimodal import (
        extract_frame_blobs,
        keyframe_sample_plan,
        make_video_sample_fixture,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="keyframe_extract_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    def fixture(n: int):
        return make_video_sample_fixture(
            spark.range(n).withColumnRenamed("id", "doc_id")
        ).localCheckpoint()  # encode OUTSIDE the timed legs

    def timed(n: int) -> tuple[float, float, int, int]:
        df = fixture(n)
        t0 = time.perf_counter()
        frames = keyframe_sample_plan(df)
        n_frames = frames.count()
        walk = time.perf_counter() - t0
        t0 = time.perf_counter()
        row = (
            extract_frame_blobs(df)
            .agg(
                F.sum(F.length("frame_blob")).alias("bytes"),
                F.count("*").alias("n"),
            )
            .first()
        )
        extract = time.perf_counter() - t0
        assert row["n"] == n_frames
        return walk, extract, n_frames, int(row["bytes"])

    timed(256)  # warmup
    walk1, ext1, frames1, bytes1 = timed(N_DOCS)
    walk2, ext2, _, _ = timed(N_DOCS * 2)
    print(
        json.dumps(
            {
                "metric": "keyframe_extract_throughput",
                "cpus": cpus,
                "n_docs": N_DOCS,
                "frames": frames1,
                "frame_mib": round(bytes1 / 2**20, 1),
                "walk_sec": round(walk1, 2),
                "containers_per_sec": round(N_DOCS / walk1),
                "extract_sec": round(ext1, 2),
                "frame_mib_per_sec": round(bytes1 / 2**20 / ext1, 1),
                "flatness_2x": round((walk2 + ext2) / (walk1 + ext1) / 2.0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
