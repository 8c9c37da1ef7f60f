"""Pure-stdlib AVI (RIFF) container walk — the second real video
container (round 14, r13 verdict item 7).

The RIFF chunk grammar is the WAV one (``operators/wav.py``) with the
``AVI `` form type and nested LIST chunks: ``hdrl`` carries the
``avih`` main header and per-stream ``strl`` lists (``strh`` stream
header + ``strf`` format block, a BITMAPINFOHEADER for video), the
``movi`` LIST carries the coded frame chunks (``00dc``/``00db``), and
the optional ``idx1`` chunk indexes them. Layouts from the public
OpenDML / Microsoft AVI RIFF specification.

What this buys the frame fan-out tier: ``avi_keyframe_offsets``
returns the same (frame_index, byte_offset, size) work-list shape as
``mp4.video_keyframe_offsets``, so the engine-side extraction path
(broadcast work-list -> codegen'd binary substring -> real JPEG
decode) is container-agnostic — ``keyframe_sample_plan`` dispatches
on magic and nothing downstream changes.

Reference parity: the reference pipeline has no video handling; this
module is part of the mandated LLM-data-pipeline multimodal tier.
"""

from __future__ import annotations

import struct

#: AVIIF_KEYFRAME in idx1 dwFlags
_KEYFRAME = 0x10


def _chunks(data: bytes, lo: int, hi: int):
    """Yield (fourcc, body_lo, body_hi) for each RIFF chunk in
    [lo, hi); chunk bodies pad to even length. Raises ``ValueError``
    on truncation."""
    pos = lo
    while pos < hi:
        if pos + 8 > hi:
            raise ValueError("truncated AVI chunk header")
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > hi:
            raise ValueError(f"AVI chunk {fourcc!r} overruns its container")
        yield fourcc, body, body + size
        pos = body + size + (size & 1)  # even padding


def _require_avi(data: bytes) -> int:
    """Validate the RIFF/AVI header; return the end of the RIFF body
    (clamped to the payload — a truncated dwSize field must not let
    the walk read past EOF)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    return min(8 + riff_size, len(data))


def parse_avi_meta(data: bytes) -> dict:
    """AVI bytes -> {width, height, n_frames, duration_ms, codec,
    n_streams}. Geometry and frame count from ``avih``; duration =
    n_frames x dwMicroSecPerFrame; codec = the video stream's
    ``strh`` handler fourcc (falling back to the ``strf``
    biCompression fourcc)."""
    end = _require_avi(data)
    avih = None
    codec = None
    n_streams = 0
    for fourcc, lo, hi in _chunks(data, 12, end):
        if fourcc != b"LIST" or data[lo : lo + 4] != b"hdrl":
            continue
        for c2, l2, h2 in _chunks(data, lo + 4, hi):
            if c2 == b"avih":
                if h2 - l2 < 40:
                    raise ValueError("AVI avih header too short")
                avih = struct.unpack_from("<10I", data, l2)
            elif c2 == b"LIST" and data[l2 : l2 + 4] == b"strl":
                n_streams += 1
                handler = fmt_cc = None
                is_video = False
                for c3, l3, h3 in _chunks(data, l2 + 4, h2):
                    if c3 == b"strh" and h3 - l3 >= 8:
                        is_video = data[l3 : l3 + 4] == b"vids"
                        handler = data[l3 + 4 : l3 + 8]
                    elif c3 == b"strf" and h3 - l3 >= 20:
                        fmt_cc = data[l3 + 16 : l3 + 20]
                if is_video and codec is None:
                    cc = (
                        handler
                        if handler and handler.strip(b"\x00 ")
                        else (fmt_cc or b"")
                    )
                    codec = cc.decode("ascii", "replace").strip().lower()
    if avih is None:
        raise ValueError("AVI missing avih header")
    usec_pf, _maxbps, _pad, _flags, n_frames = avih[:5]
    width, height = avih[8], avih[9]
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "duration_ms": n_frames * usec_pf // 1000,
        "codec": codec or "unknown",
        "n_streams": n_streams,
    }


def avi_keyframe_offsets(data: bytes) -> list[tuple[int, int, int]]:
    """(frame_index, absolute_byte_offset, size) of every KEY video
    frame's coded bytes — the ``mp4.video_keyframe_offsets`` contract
    on the AVI layout. Prefers the ``idx1`` index (dwChunkOffset is
    movi-relative by convention, absolute in some writers — detected
    by checking where the referenced chunk header actually matches
    its ckid); falls back to a direct ``movi`` walk, where every
    ``00dc``/``00db`` chunk counts as key (the MJPEG all-sync
    default, same rule as MP4's absent stss)."""
    end = _require_avi(data)
    movi_lo = movi_hi = None
    idx1 = None
    for fourcc, lo, hi in _chunks(data, 12, end):
        if fourcc == b"LIST" and data[lo : lo + 4] == b"movi":
            movi_lo, movi_hi = lo, hi
        elif fourcc == b"idx1":
            idx1 = (lo, hi)
    if movi_lo is None:
        raise ValueError("AVI missing movi list")

    def is_video_chunk(ckid: bytes) -> bool:
        return len(ckid) == 4 and ckid[2:4] in (b"dc", b"db")

    out: list[tuple[int, int, int]] = []
    if idx1 is not None:
        lo, hi = idx1
        n = (hi - lo) // 16
        fi = 0
        for i in range(n):
            ckid = data[lo + 16 * i : lo + 16 * i + 4]
            flags, off, size = struct.unpack_from("<III", data, lo + 16 * i + 4)
            if not is_video_chunk(ckid):
                continue
            # offset convention: movi-relative (measured from the
            # 'movi' fourcc position) vs absolute — resolve by
            # checking which interpretation lands on the ckid header
            hdr_rel = movi_lo + off
            hdr = (
                hdr_rel
                if data[hdr_rel : hdr_rel + 4] == ckid
                else (off if data[off : off + 4] == ckid else None)
            )
            if hdr is None or hdr + 8 + size > len(data):
                raise ValueError("AVI idx1 entry points at no matching chunk")
            if flags & _KEYFRAME:
                out.append((fi, hdr + 8, size))
            fi += 1
        return out
    fi = 0
    for ckid, lo, hi in _chunks(data, movi_lo + 4, movi_hi):
        if is_video_chunk(ckid):
            out.append((fi, lo, hi - lo))  # no index: all frames key
            fi += 1
    return out


# ---------------------------------------------------------------------------
# fixture encoder — same closed-form MJPEG frames as encode_mp4_mjpeg
# ---------------------------------------------------------------------------


def encode_avi_mjpeg(doc_id: int) -> bytes:
    """Fixture Motion-JPEG AVI of the SAME closed-form frames as
    ``mp4.encode_mp4_mjpeg`` (``mjpeg_fixture_params`` dims /
    ``mjpeg_block_gray`` rasters; even doc_ids grayscale, odd color) —
    so the frame_pixel_stats oracle is container-independent by
    construction. Real layout: hdrl (avih + vids strl with MJPG
    handler + BITMAPINFOHEADER), movi with one ``00dc`` chunk per
    frame (odd sizes exercise the even-padding rule), and an idx1
    whose movi-relative offsets mark every frame AVIIF_KEYFRAME."""
    from ais_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_constant_blocks,
    )
    from ais_data_pipeline_spark.operators.mp4 import (
        mjpeg_block_gray,
        mjpeg_fixture_params,
    )

    n, w, h = mjpeg_fixture_params(doc_id)
    nb = (w // 8) * (h // 8)
    frames = [
        encode_jpeg_constant_blocks(
            w,
            h,
            [mjpeg_block_gray(doc_id, f, b) for b in range(nb)],
            color=doc_id % 2 == 1,
        )
        for f in range(n)
    ]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def list_chunk(formtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", formtype + body)

    avih = struct.pack(
        "<10I",
        1_000_000 // 24,  # dwMicroSecPerFrame
        0, 0, 0x10,  # maxbps, padding, AVIF_HASINDEX
        n, 0, 1, 0,  # totalframes, initialframes, streams, bufsize
        w, h,
    ) + bytes(16)
    strh = (
        b"vids" + b"MJPG" + struct.pack("<I", 0) + bytes(8)
        + struct.pack("<IIII", 1, 24, 0, n)  # scale, rate, start, length
        + bytes(16)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = bytearray()
    rel_offsets = []  # movi-relative: measured from the 'movi' fourcc
    for fr in frames:
        rel_offsets.append(4 + len(movi_body))
        movi_body += chunk(b"00dc", fr)
    movi = list_chunk(b"movi", bytes(movi_body))
    idx1 = chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", _KEYFRAME, rel_offsets[i], len(frames[i]))
            for i in range(n)
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
