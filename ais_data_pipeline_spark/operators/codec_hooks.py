"""Reference adapters for the r15 decoder hooks — PyAV/ffmpeg slots.

The engine deliberately does NOT hand-build lossy-audio (MP3/Vorbis/
Opus) or inter-coded-video (H.264-class) sample decode: their output
is decoder-implementation-dependent, so a hand-built decode could
never be oracle-checked the way the lossless WAV/FLAC/image paths
are (COMPAT.md, r15). Instead ``decode_audio_pcm(lossy_decoder=)``
and ``decode_frame_pixels(frame_decoder=)`` accept callables. This
module is the PROOF those hooks carry a real decoder without touching
the operator contract: each factory returns a closure around PyAV
(``pip install av`` — NOT bundled; this container lacks it, so the
paired pytest ``importorskip``-gates) with the exact call signatures
the hooks require:

- ``pyav_lossy_decoder() -> (bytes -> (frames [n_samples, n_channels]
  int16 ndarray, sample_rate, 16))`` — container/codec sniffed by
  libav, samples resampled to packed s16 so the amplitude-stats path
  sees the same integer domain as 16-bit WAV.
- ``pyav_frame_decoder(container_format=None) -> (bytes ->
  (HxWx3 uint8 RGB ndarray, codec_name))`` — first decodable frame of
  the blob; pass ``container_format='h264'`` for raw Annex-B payloads
  that have no container to sniff.

The closures are serialized into the Arrow workers like any hook, so
every executor needs the ``av`` wheel — a cluster-image concern, not
an engine one.
"""

from __future__ import annotations

import io


def pyav_lossy_decoder():
    """Factory for the ``decode_audio_pcm(lossy_decoder=)`` slot.
    Raises ImportError where PyAV is absent (callers gate on it)."""
    import av  # noqa: F401 — fail HERE, not inside the executor

    def decode(blob: bytes):
        import av
        import numpy as np

        with av.open(io.BytesIO(bytes(blob))) as container:
            stream = container.streams.audio[0]
            resampler = av.AudioResampler(format="s16", layout=stream.layout)
            rate = None
            chunks: list = []
            for frame in container.decode(stream):
                rate = rate or frame.sample_rate
                for rframe in resampler.resample(frame):
                    arr = rframe.to_ndarray()  # packed s16: (1, n*ch)
                    ch = len(rframe.layout.channels)
                    chunks.append(arr.reshape(-1, ch))
            if not chunks:
                raise ValueError("no decodable audio frames in payload")
            return np.vstack(chunks).astype(np.int64), rate, 16

    return decode


def pyav_frame_decoder(container_format: str | None = None):
    """Factory for the ``decode_frame_pixels(frame_decoder=)`` slot:
    decodes the FIRST frame of the blob to RGB24. Raw Annex-B H.264
    payloads (what ``extract_frame_blobs`` emits for coded tracks)
    need ``container_format='h264'`` — there is no container left to
    sniff."""
    import av  # noqa: F401

    def decode(blob: bytes):
        import av

        with av.open(io.BytesIO(bytes(blob)), format=container_format) as c:
            stream = c.streams.video[0]
            for frame in c.decode(stream):
                return frame.to_ndarray(format="rgb24"), stream.codec_context.name
        raise ValueError("no decodable video frame in payload")

    return decode
