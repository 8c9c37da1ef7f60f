"""Pure-stdlib ISO-BMFF (MP4) container parser — video metadata tier.

Round-11 arc completion: images got real pixel decode (r8–r11), audio
got real sample decode (r11); this module gives video a REAL container
parse in place of the payload-size stub `frame_sample_plan` used for
frame counts. Scope is what a ``struct`` box walk can own exactly:
the ISO/IEC 14496-12 box grammar (32-bit sizes, 64-bit ``largesize``,
size-0 to-end-of-file boxes), ``ftyp`` major brand, ``moov/mvhd``
timescale + duration (version 0 and 1), per-track ``tkhd`` dimensions
(16.16 fixed point) and ``hdlr`` handler type, and the ``stbl/stsz``
sample count/size table — the numbers a frame-sampling plan actually
needs (true frame count, duration, resolution) instead of a stub.
Decoding the CODED samples (H.264/AV1/AAC) stays the honest
``NotImplementedError`` class — that is codec work, not container
work, exactly the PIL-hook convention of the image tier.

Reference parity: the reference pipeline has no video handling at all;
this module is part of the mandated LLM-data-pipeline multimodal tier.
"""

from __future__ import annotations

import struct

#: container-level box types whose children we descend into
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk(data: bytes, lo: int, hi: int):
    """Yield (box_type, body_lo, body_hi) for each box in [lo, hi).
    Handles 64-bit ``largesize`` (size == 1) and to-end boxes
    (size == 0); raises ``ValueError`` on any malformed size."""
    pos = lo
    while pos < hi:
        if pos + 8 > hi:
            raise ValueError("truncated MP4 box header")
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > hi:
                raise ValueError("truncated MP4 largesize header")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
            if size < 16:
                raise ValueError("bad MP4 largesize")
        elif size == 0:  # box extends to the end of the enclosing space
            size = hi - pos
        elif size < 8:
            raise ValueError("bad MP4 box size")
        end = pos + size
        if end > hi:
            raise ValueError(f"MP4 box {btype!r} overruns its container")
        yield btype, body, end
        pos = end


def parse_mp4_meta(data: bytes) -> dict:
    """MP4 bytes -> container metadata dict: ``major_brand``,
    ``timescale``, ``duration_ms``, ``n_tracks``, and for the first
    VIDEO track (``hdlr`` = ``vide``) its ``width``/``height`` (whole
    pixels from tkhd's 16.16 fixed point) and ``n_samples`` (stsz
    entry count — the true frame count a sampling plan fans out over).
    Raises ``ValueError`` on corrupt containers (truncated/overrunning
    boxes, missing moov/mvhd, bad version fields)."""
    if len(data) < 8:
        raise ValueError("not an MP4 payload")
    out = {
        "major_brand": None,
        "timescale": None,
        "duration_ms": None,
        "n_tracks": 0,
        "width": None,
        "height": None,
        "n_samples": None,
    }
    saw_moov = False

    def visit(lo: int, hi: int, path: tuple[bytes, ...]) -> None:
        nonlocal saw_moov
        for btype, blo, bhi in _walk(data, lo, hi):
            if btype == b"ftyp" and not path:
                if bhi - blo < 8:
                    raise ValueError("short ftyp box")
                out["major_brand"] = data[blo : blo + 4].decode("latin-1")
            elif btype == b"mvhd" and path == (b"moov",):
                ver = data[blo]
                if ver == 0:
                    ts, dur = struct.unpack_from(">II", data, blo + 12)
                elif ver == 1:
                    ts, dur = struct.unpack_from(">IQ", data, blo + 20)
                else:
                    raise ValueError("bad mvhd version")
                if ts == 0:
                    raise ValueError("mvhd timescale is zero")
                out["timescale"] = ts
                out["duration_ms"] = dur * 1000 // ts
            elif btype == b"trak" and path == (b"moov",):
                tracks.append({"handler": None, "w": None, "h": None, "n": None})
                visit(blo, bhi, path + (b"trak",))
            elif btype == b"tkhd" and path[-1:] == (b"trak",):
                if not tracks:
                    raise ValueError("tkhd outside a trak box")
                ver = data[blo]
                # width/height (16.16 fixed) follow the FullBox header
                # (4) + times/ids (20 v0 / 32 v1) + reserved(8) +
                # layer/group/volume/reserved (8) + matrix (36):
                # ISO 14496-12 §8.3.2
                off = blo + (88 if ver == 1 else 76)
                if off + 8 > bhi:
                    raise ValueError("short tkhd box")
                w_fx, h_fx = struct.unpack_from(">II", data, off)
                tracks[-1]["w"] = w_fx >> 16
                tracks[-1]["h"] = h_fx >> 16
            elif btype == b"hdlr" and path[-1:] == (b"mdia",):
                if not tracks:
                    raise ValueError("hdlr outside a trak box")
                if blo + 12 > bhi:
                    raise ValueError("short hdlr box")
                tracks[-1]["handler"] = data[blo + 8 : blo + 12].decode("latin-1")
            elif btype == b"stsz" and path[-1:] == (b"stbl",):
                if not tracks:
                    raise ValueError("stsz outside a trak box")
                if blo + 12 > bhi:
                    raise ValueError("short stsz box")
                _szall, cnt = struct.unpack_from(">II", data, blo + 4)
                tracks[-1]["n"] = cnt
            elif btype == b"moov":
                saw_moov = True
                visit(blo, bhi, (b"moov",))
            elif btype in _CONTAINERS and path:
                visit(blo, bhi, path + (btype,))
            # free/skip/mdat/udta/unknown: skipped

    tracks: list[dict] = []
    visit(0, len(data), ())
    if not saw_moov:
        raise ValueError("MP4 missing moov box")
    if out["timescale"] is None:
        raise ValueError("MP4 missing mvhd box")
    out["n_tracks"] = len(tracks)
    for t in tracks:
        if t["handler"] == "vide":
            out["width"], out["height"], out["n_samples"] = t["w"], t["h"], t["n"]
            break
    return out


# ---------------------------------------------------------------------------
# fixture encoder (closed-form container a SQL oracle re-derives)
# ---------------------------------------------------------------------------


def _box(btype: bytes, body: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return struct.pack(">I", 1) + btype + struct.pack(">Q", 16 + len(body)) + body
    return struct.pack(">I", 8 + len(body)) + btype + body


def mp4_fixture_params(doc_id: int) -> tuple[int, int, int, int, int]:
    """(timescale, duration_units, width, height, n_samples) for the
    fixture — closed forms a SQL oracle replays."""
    timescale = [600, 1000, 90000, 24000, 30000][doc_id % 5]
    duration = (doc_id % 240 + 1) * timescale // 8  # up to 30 "seconds"
    width = 16 * (doc_id % 81 + 40)  # 640..1920
    height = 16 * (doc_id % 46 + 22)  # 352..1072
    n_samples = 24 * (doc_id % 240 + 1) // 8  # frames at a 24 fps fiction
    return timescale, duration, width, height, n_samples


def encode_mp4(doc_id: int) -> bytes:
    """Fixture MP4 writer: a real ISO-BMFF tree — ftyp, moov(mvhd +
    video trak(tkhd + mdia(hdlr + minf(stbl(stsz))))), a trailing free
    box, and a second (audio-handler) trak so the video-track
    selection is exercised. Every third doc wraps moov in a 64-bit
    ``largesize`` header and every fourth uses mvhd version 1, so both
    spec variants run in the Spark path; an interleaved ``skip`` box
    must be ignored by the walk."""
    ts, dur, w, h, n = mp4_fixture_params(doc_id)
    v1 = doc_id % 4 == 0
    if v1:
        mvhd = bytes([1, 0, 0, 0]) + b"\x00" * 16 + struct.pack(">IQ", ts, dur)
        mvhd += b"\x00" * 80
    else:
        mvhd = bytes(4) + b"\x00" * 8 + struct.pack(">II", ts, dur) + b"\x00" * 80

    def trak(handler: bytes, tw: int, th: int, cnt: int) -> bytes:
        # FullBox(4) + v0 fields/reserved/matrix (72) + width/height
        tkhd = bytes(4) + b"\x00" * 72 + struct.pack(">II", tw << 16, th << 16)
        stsz = bytes(4) + struct.pack(">II", 0, cnt) + b"".join(
            struct.pack(">I", 100 + i) for i in range(cnt)
        )
        stbl = _box(b"stsz", stsz)
        minf = _box(b"stbl", stbl)
        hdlr = bytes(4) + bytes(4) + handler + b"\x00" * 12
        mdia = _box(b"hdlr", hdlr) + _box(b"minf", minf)
        return _box(b"trak", _box(b"tkhd", tkhd) + _box(b"mdia", mdia))

    moov_body = (
        _box(b"mvhd", mvhd)
        + trak(b"vide", w, h, n)
        + _box(b"skip", b"\xde\xad" * 3)
        + trak(b"soun", 0, 0, n * 2)
    )
    out = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    out += _box(b"moov", moov_body, largesize=doc_id % 3 == 0)
    out += _box(b"free", b"\x00" * (doc_id % 7))
    return out
