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
needs (true frame count, duration, resolution) instead of a stub; round
13 adds the FRAGMENTED layout (fMP4/DASH/CMAF — ``mvex/trex``
defaults, ``moof/tfhd/trun`` sample runs, default-base-is-moof
offsets, sync from sample_flags), so streaming-packaged video
counts and keyframe byte maps resolve too.
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


def _walk_full(data: bytes, lo: int, hi: int):
    """Yield (box_type, box_start, body_lo, body_hi) for each box in
    [lo, hi). Handles 64-bit ``largesize`` (size == 1) and to-end
    boxes (size == 0); raises ``ValueError`` on any malformed size.
    ``box_start`` is the position of the size field — the anchor
    ISO 14496-12 §8.8.7 default-base-is-moof offsets are relative to
    (NOT body_lo - 8: a largesize box has a 16-byte header)."""
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
        yield btype, pos, body, end
        pos = end


def _walk(data: bytes, lo: int, hi: int):
    """Yield (box_type, body_lo, body_hi) — see ``_walk_full``."""
    for btype, _start, body, end in _walk_full(data, lo, hi):
        yield btype, body, end


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
        "video_track_id": None,
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
                tracks.append(
                    {"handler": None, "w": None, "h": None, "n": None,
                     "tid": None, "mts": None}
                )
                visit(blo, bhi, path + (b"trak",))
            elif btype == b"mdhd" and path[-1:] == (b"mdia",):
                if not tracks:
                    raise ValueError("mdhd outside a trak box")
                ver = data[blo]
                if ver == 0:
                    (mts,) = struct.unpack_from(">I", data, blo + 12)
                elif ver == 1:
                    (mts,) = struct.unpack_from(">I", data, blo + 20)
                else:
                    raise ValueError("bad mdhd version")
                tracks[-1]["mts"] = mts
            elif btype == b"tkhd" and path[-1:] == (b"trak",):
                if not tracks:
                    raise ValueError("tkhd outside a trak box")
                ver = data[blo]
                (tid,) = struct.unpack_from(
                    ">I", data, blo + (20 if ver == 1 else 12)
                )
                tracks[-1]["tid"] = tid
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
    video = next((t for t in tracks if t["handler"] == "vide"), None)
    if video is not None:
        out["width"], out["height"], out["n_samples"] = (
            video["w"], video["h"], video["n"],
        )
        out["video_track_id"] = video["tid"]
        # fragmented layout (round 13): sample tables live in moof
        # fragments — empty stsz + zero mvhd duration is the fMP4
        # signature; fill the counts from the trex/tfhd/trun walk
        if not video["n"] and b"moof" in data:
            frag = parse_mp4_fragments(data).get(video["tid"])
            if frag is not None:
                out["n_samples"] = frag["n_samples"]
                if not out["duration_ms"] and video["mts"]:
                    out["duration_ms"] = (
                        frag["duration"] * 1000 // video["mts"]
                    )
    return out


def parse_mp4_sample_table(data: bytes) -> dict:
    """First VIDEO track's full sample tables (round 12 — keyframe-
    aware sampling needs byte offsets, not just counts): per-sample
    sizes (``stsz``, fixed- or per-entry), sample-to-chunk runs
    (``stsc``), chunk offsets (``stco`` 32-bit or ``co64`` 64-bit),
    and the sync-sample list (``stss``; None when absent, which per
    ISO/IEC 14496-12 §8.6.2 means EVERY sample is a sync sample).
    Raises ``ValueError`` when the track lacks the tables a byte-level
    sampler needs."""
    if len(data) < 8:
        raise ValueError("not an MP4 payload")
    tracks: list[dict] = []

    def visit(lo: int, hi: int, path: tuple[bytes, ...]) -> None:
        for btype, blo, bhi in _walk(data, lo, hi):
            if btype == b"trak" and path == (b"moov",):
                tracks.append(
                    {"handler": None, "sizes": None, "stsc": None,
                     "offsets": None, "stss": None}
                )
                visit(blo, bhi, path + (b"trak",))
            elif btype == b"hdlr" and path[-1:] == (b"mdia",) and tracks:
                tracks[-1]["handler"] = data[blo + 8 : blo + 12].decode("latin-1")
            elif btype == b"stsz" and path[-1:] == (b"stbl",) and tracks:
                fixed, cnt = struct.unpack_from(">II", data, blo + 4)
                if fixed:
                    # cnt is a raw uint32 with no per-entry table to
                    # box-check against; a corrupt count near 2^32
                    # would materialize tens of GB. The samples must
                    # at least fit in the container, so bound the
                    # implied media bytes by the payload size.
                    if fixed * cnt > len(data):
                        raise ValueError(
                            "fixed-size stsz implies more media bytes "
                            "than the container holds"
                        )
                    tracks[-1]["sizes"] = [fixed] * cnt
                else:
                    if blo + 12 + 4 * cnt > bhi:
                        raise ValueError("stsz table overruns its box")
                    tracks[-1]["sizes"] = list(
                        struct.unpack_from(f">{cnt}I", data, blo + 12)
                    )
            elif btype == b"stsc" and path[-1:] == (b"stbl",) and tracks:
                (cnt,) = struct.unpack_from(">I", data, blo + 4)
                if blo + 8 + 12 * cnt > bhi:
                    raise ValueError("stsc table overruns its box")
                runs = [
                    struct.unpack_from(">III", data, blo + 8 + 12 * i)
                    for i in range(cnt)
                ]
                tracks[-1]["stsc"] = runs
            elif btype in (b"stco", b"co64") and path[-1:] == (b"stbl",) and tracks:
                (cnt,) = struct.unpack_from(">I", data, blo + 4)
                width, code = (8, "Q") if btype == b"co64" else (4, "I")
                if blo + 8 + width * cnt > bhi:
                    raise ValueError(f"{btype.decode()} table overruns its box")
                tracks[-1]["offsets"] = list(
                    struct.unpack_from(f">{cnt}{code}", data, blo + 8)
                )
            elif btype == b"stss" and path[-1:] == (b"stbl",) and tracks:
                (cnt,) = struct.unpack_from(">I", data, blo + 4)
                if blo + 8 + 4 * cnt > bhi:
                    raise ValueError("stss table overruns its box")
                tracks[-1]["stss"] = list(
                    struct.unpack_from(f">{cnt}I", data, blo + 8)
                )
            elif btype == b"moov":
                visit(blo, bhi, (b"moov",))
            elif btype in _CONTAINERS and path:
                visit(blo, bhi, path + (btype,))

    visit(0, len(data), ())
    video = next((t for t in tracks if t["handler"] == "vide"), None)
    if video is None:
        raise ValueError("MP4 has no video track")
    if video["sizes"] is None or video["stsc"] is None or video["offsets"] is None:
        raise ValueError("video track lacks stsz/stsc/stco sample tables")
    return video


def video_keyframe_offsets(data: bytes) -> list[tuple[int, int, int]]:
    """Real keyframe byte map: (frame_index 0-based, absolute byte
    offset, byte size) for every SYNC sample of the first video track,
    derived by the full §8.7.4 walk — stsc runs expanded to per-chunk
    sample counts, offsets accumulated from each chunk's stco/co64
    base through the preceding same-chunk stsz sizes. This is the
    work-list a video-corpus sampler hands its decode UDF: seekable
    offsets of independently-decodable frames, not just indices.
    Fragmented containers (round 13) resolve through the
    trex/tfhd/trun walk instead of stbl — same (index, offset, size)
    contract, sync from sample_flags."""
    if b"moof" in data:
        tid = parse_mp4_meta(data).get("video_track_id")
        frag = parse_mp4_fragments(data).get(tid)
        if frag is not None and frag["n_samples"]:
            return [
                (i, off, sz)
                for i, (off, sz, sync) in enumerate(frag["samples"])
                if sync
            ]
    t = parse_mp4_sample_table(data)
    sizes, runs, chunk_offs = t["sizes"], t["stsc"], t["offsets"]
    n = len(sizes)
    n_chunks = len(chunk_offs)
    # expand stsc runs: run i covers chunks [first_i, first_{i+1}), the
    # last run extending to the final chunk
    prev_first = 0
    counts: list[int] = []
    for i, (first, spc, _sdi) in enumerate(runs):
        if first <= prev_first:
            raise ValueError("stsc first_chunk values must increase")
        if first > n_chunks:
            # a run starting beyond the last stco chunk is corrupt; the
            # clamp below would otherwise silently stretch the PREVIOUS
            # run over the remaining chunks and hand out wrong offsets
            # (round-12 hardening sweep)
            raise ValueError("stsc run starts beyond the last chunk")
        nxt = runs[i + 1][0] if i + 1 < len(runs) else n_chunks + 1
        counts.extend([spc] * (min(nxt, n_chunks + 1) - first))
        prev_first = first
    if len(counts) < n_chunks:
        raise ValueError("stsc runs cover fewer chunks than stco")
    sample_offsets: list[int] = []
    si = 0
    for ci in range(n_chunks):
        off = chunk_offs[ci]
        for _ in range(counts[ci]):
            if si >= n:
                break
            sample_offsets.append(off)
            off += sizes[si]
            si += 1
    if si < n:
        raise ValueError("chunk tables cover fewer samples than stsz")
    sync = t["stss"] if t["stss"] is not None else list(range(1, n + 1))
    out: list[tuple[int, int, int]] = []
    for s in sync:  # stss sample numbers are 1-based
        if not 1 <= s <= n:
            raise ValueError("stss sync sample out of range")
        out.append((s - 1, sample_offsets[s - 1], sizes[s - 1]))
    return out


def parse_mp4_fragments(data: bytes) -> dict:
    """Fragmented-MP4 (fMP4/DASH/CMAF) walk — the layout where the
    sample tables live in ``moof`` fragments instead of ``stbl``
    (``mvhd`` duration 0, empty ``stsz``, ``mvex/trex`` defaults).
    Returns per-track_id dicts with ``n_samples``, ``duration`` (media
    timescale units), ``n_sync``, and ``samples`` — the (offset, size,
    is_sync) byte map the frame sampler needs, accumulated per ISO
    14496-12 §8.8: ``tfhd`` base-data-offset (explicit, or
    default-base-is-moof per flag 0x020000), ``trun`` data offsets and
    per-sample size/duration/flags with trex → tfhd → per-sample
    default resolution, sync = NOT (sample_flags & 0x10000) with
    ``first_sample_flags`` honored."""
    trex: dict[int, tuple[int, int, int]] = {}  # tid -> (dur, size, flags)

    def read_trex(lo: int, hi: int) -> None:
        for btype, blo, bhi in _walk(data, lo, hi):
            if btype == b"mvex":
                read_trex(blo, bhi)
            elif btype == b"trex":
                tid, _sdi, ddur, dsize, dflags = struct.unpack_from(
                    ">IIIII", data, blo + 4
                )
                trex[tid] = (ddur, dsize, dflags)

    tracks: dict[int, dict] = {}
    for btype, bstart, blo, bhi in _walk_full(data, 0, len(data)):
        if btype == b"moov":
            read_trex(blo, bhi)
        elif btype == b"moof":
            # offsets are relative to the BOX start — taken from the
            # walk, not body_lo - 8, so a largesize moof (16-byte
            # header) anchors correctly (r13 advice)
            moof_start = bstart
            for t2, l2, h2 in _walk(data, blo, bhi):
                if t2 != b"traf":
                    continue
                tfhd = None
                truns = []
                for t3, l3, h3 in _walk(data, l2, h2):
                    if t3 == b"tfhd":
                        tfhd = (l3, h3)
                    elif t3 == b"trun":
                        truns.append((l3, h3))
                if tfhd is None:
                    raise ValueError("traf without tfhd")
                l3, h3 = tfhd
                flags = int.from_bytes(data[l3 + 1 : l3 + 4], "big")
                (tid,) = struct.unpack_from(">I", data, l3 + 4)
                p = l3 + 8
                base = None
                if flags & 0x01:
                    (base,) = struct.unpack_from(">Q", data, p)
                    p += 8
                if flags & 0x02:
                    p += 4  # sample_description_index
                ddur, dsize, dflags = trex.get(tid, (0, 0, 0))
                if flags & 0x08:
                    (ddur,) = struct.unpack_from(">I", data, p)
                    p += 4
                if flags & 0x10:
                    (dsize,) = struct.unpack_from(">I", data, p)
                    p += 4
                if flags & 0x20:
                    (dflags,) = struct.unpack_from(">I", data, p)
                    p += 4
                if base is None:
                    if not flags & 0x020000:
                        raise ValueError(
                            "tfhd has neither base-data-offset nor "
                            "default-base-is-moof"
                        )
                    base = moof_start
                tr = tracks.setdefault(
                    tid,
                    {"n_samples": 0, "duration": 0, "n_sync": 0, "samples": []},
                )
                cursor = None  # continuation point across this traf's truns
                for l4, h4 in truns:
                    tflags = int.from_bytes(data[l4 + 1 : l4 + 4], "big")
                    (cnt,) = struct.unpack_from(">I", data, l4 + 4)
                    q = l4 + 8
                    if tflags & 0x01:
                        (doff,) = struct.unpack_from(">i", data, q)
                        q += 4
                        off = base + doff
                    elif cursor is not None:
                        # §8.8.8: a run without a data offset starts
                        # immediately after the previous run's data
                        off = cursor
                    else:
                        off = base
                    first_flags = None
                    if tflags & 0x04:
                        (first_flags,) = struct.unpack_from(">I", data, q)
                        q += 4
                    per = 4 * bool(tflags & 0x100) + 4 * bool(tflags & 0x200) \
                        + 4 * bool(tflags & 0x400) + 4 * bool(tflags & 0x800)
                    if q + per * cnt > h4:
                        raise ValueError("trun table overruns its box")
                    if per == 0 and cnt > len(data):
                        # with no per-sample fields the box-bound check
                        # above is vacuous and the untrusted 32-bit
                        # count would drive the append loop unbounded
                        # (r13 advice); every sample occupies >= 1 byte
                        # of mdat, so len(data) is a hard ceiling
                        raise ValueError("trun sample_count exceeds file size")
                    for s in range(cnt):
                        dur, size, sflags = ddur, dsize, dflags
                        if tflags & 0x100:
                            (dur,) = struct.unpack_from(">I", data, q)
                            q += 4
                        if tflags & 0x200:
                            (size,) = struct.unpack_from(">I", data, q)
                            q += 4
                        if tflags & 0x400:
                            (sflags,) = struct.unpack_from(">I", data, q)
                            q += 4
                        if tflags & 0x800:
                            q += 4  # composition time offset
                        if s == 0 and first_flags is not None:
                            sflags = first_flags
                        is_sync = not sflags & 0x10000
                        tr["samples"].append((off, size, is_sync))
                        tr["n_samples"] += 1
                        tr["duration"] += dur
                        tr["n_sync"] += int(is_sync)
                        off += size
                    cursor = off
    return tracks


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


# ---------------------------------------------------------------------------
# sample-table fixture (real mdat + stsc/stco/stss — keyframe sampling)
# ---------------------------------------------------------------------------

#: absolute file offset where the sample fixture's mdat PAYLOAD starts —
#: the header region (ftyp + moov + pad) is free-padded to exactly this
#: minus the 8-byte mdat header, so the oracle's closed-form offsets
#: need no per-doc header arithmetic
MDAT_BASE = 4096


def mp4_sample_fixture_params(doc_id: int) -> tuple[int, int]:
    """(n_samples, sync_step) for the sample-table fixture: sample i is
    ``100 + i`` bytes of fill byte ``(doc_id*7 + i) % 256``, at absolute
    offset ``MDAT_BASE + 100*i + i*(i-1)/2`` (prefix sum of sizes);
    sync samples are every ``sync_step``-th frame from 0 (every 11th
    doc omits stss entirely — all frames sync, per spec)."""
    n = 12 + doc_id % 25
    step = 1 if doc_id % 11 == 0 else 6
    return n, step


def encode_mp4_samples(doc_id: int) -> bytes:
    """Fixture MP4 WITH real coded-sample plumbing: stsz per-sample
    sizes, TWO stsc runs (chunks 1-2 hold 4 samples, chunks 3+ hold 5 —
    so run expansion is exercised, not just a single uniform run),
    stco (co64 on every 5th doc — both widths in the Spark path), stss
    sync samples (absent on every 11th doc — the all-sync default),
    and an mdat whose bytes actually live at the advertised offsets
    (fill byte ``(doc_id*7 + i) % 256`` per sample). The header region
    is free-padded so the mdat payload starts at ``MDAT_BASE``
    exactly — closed-form offsets a SQL oracle re-derives while the
    engine walks the real tables."""
    n, step = mp4_sample_fixture_params(doc_id)
    sizes = [100 + i for i in range(n)]
    payload = b"".join(
        bytes([(doc_id * 7 + i) % 256]) * sizes[i] for i in range(n)
    )
    # chunk layout: 4, 4, 5, 5, ... (two stsc runs)
    counts = []
    left = n
    while left > 0:
        c = 4 if len(counts) < 2 else 5
        counts.append(min(c, left))
        left -= counts[-1]
    offs = []
    pos = MDAT_BASE
    si = 0
    for c in counts:
        offs.append(pos)
        pos += sum(sizes[si : si + c])
        si += c
    use_co64 = doc_id % 5 == 0
    if use_co64:
        stco = _box(b"co64", bytes(4) + struct.pack(">I", len(offs))
                    + b"".join(struct.pack(">Q", o) for o in offs))
    else:
        stco = _box(b"stco", bytes(4) + struct.pack(">I", len(offs))
                    + b"".join(struct.pack(">I", o) for o in offs))
    runs = [(1, 4, 1)] + ([(3, 5, 1)] if len(counts) > 2 else [])
    stsc = _box(b"stsc", bytes(4) + struct.pack(">I", len(runs))
                + b"".join(struct.pack(">III", *r) for r in runs))
    stsz = _box(b"stsz", bytes(4) + struct.pack(">II", 0, n)
                + b"".join(struct.pack(">I", s) for s in sizes))
    stbl_body = stsz + stsc + stco
    if step > 1:
        sync = list(range(1, n + 1, step))  # 1-based sample numbers
        stbl_body += _box(b"stss", bytes(4) + struct.pack(">I", len(sync))
                          + b"".join(struct.pack(">I", s) for s in sync))
    tkhd = bytes(4) + b"\x00" * 72 + struct.pack(">II", 640 << 16, 352 << 16)
    hdlr = bytes(4) + bytes(4) + b"vide" + b"\x00" * 12
    mdia = _box(b"hdlr", hdlr) + _box(b"minf", _box(b"stbl", stbl_body))
    trak = _box(b"trak", _box(b"tkhd", tkhd) + _box(b"mdia", mdia))
    mvhd = bytes(4) + b"\x00" * 8 + struct.pack(">II", 600, 600 * n // 24)
    mvhd += b"\x00" * 80
    head = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    head += _box(b"moov", _box(b"mvhd", mvhd) + trak)
    pad = MDAT_BASE - 8 - len(head) - 8  # free box header + mdat header
    if pad < 0:
        raise ValueError("sample fixture header outgrew MDAT_BASE")
    head += _box(b"free", b"\x00" * pad)
    return head + _box(b"mdat", payload)


# ---------------------------------------------------------------------------
# MJPEG fixture (round 13): an MP4 whose coded samples are REAL
# baseline JPEGs — the end-to-end proof that the keyframe work-list
# (stsz/stsc/stco walk -> engine-side blob slice) actually feeds a
# decoder. Motion-JPEG is the one real-world codec whose frames the
# repo's pure-stdlib JPEG decoder can decode natively, so the whole
# container -> frame -> pixel chain runs with zero new codec work.
# ---------------------------------------------------------------------------


def mjpeg_fixture_params(doc_id: int) -> tuple[int, int, int]:
    """(n_frames, width, height) — dims are multiples of 8 so every
    JPEG block is full and the per-frame pixel sum is exactly
    ``64 * sum(block grays)`` in the SQL oracle."""
    n = 3 + doc_id % 5
    w = 16 + (doc_id % 2) * 8
    h = 8 + (doc_id % 3) * 8
    return n, w, h


def mjpeg_block_gray(doc_id: int, frame: int, block: int) -> int:
    """Closed-form gray level of MCU ``block`` in frame ``frame``."""
    return (doc_id * 31 + frame * 7 + block) % 256


def encode_mp4_mjpeg(doc_id: int) -> bytes:
    """Fixture Motion-JPEG MP4: each mdat sample is a REAL baseline
    JPEG (constant 8x8 blocks, ``mjpeg_block_gray`` closed form; even
    doc_ids grayscale, odd 3-component color — both through the real
    entropy decoder downstream). Samples pack 2 per chunk (single stsc
    run; odd counts leave a short final chunk, exercising the
    ``si >= n`` clamp), stco offsets are real prefix sums from
    ``MDAT_BASE``, and stss is ABSENT — every MJPEG frame is
    independently decodable, the spec's all-sync default."""
    from ais_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_constant_blocks,
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
    sizes = [len(fr) for fr in frames]
    n_chunks = (n + 1) // 2
    offs = []
    pos = MDAT_BASE
    for ci in range(n_chunks):
        offs.append(pos)
        pos += sum(sizes[ci * 2 : ci * 2 + 2])
    stbl_body = _box(
        b"stsz",
        bytes(4)
        + struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stbl_body += _box(
        b"stsc", bytes(4) + struct.pack(">I", 1) + struct.pack(">III", 1, 2, 1)
    )
    stbl_body += _box(
        b"stco",
        bytes(4)
        + struct.pack(">I", n_chunks)
        + b"".join(struct.pack(">I", o) for o in offs),
    )
    tkhd = bytes(4) + b"\x00" * 72 + struct.pack(">II", w << 16, h << 16)
    hdlr = bytes(4) + bytes(4) + b"vide" + b"\x00" * 12
    mdia = _box(b"hdlr", hdlr) + _box(b"minf", _box(b"stbl", stbl_body))
    trak = _box(b"trak", _box(b"tkhd", tkhd) + _box(b"mdia", mdia))
    mvhd = bytes(4) + b"\x00" * 8 + struct.pack(">II", 600, 600 * n // 24)
    mvhd += b"\x00" * 80
    head = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"mp41")
    head += _box(b"moov", _box(b"mvhd", mvhd) + trak)
    pad = MDAT_BASE - 8 - len(head) - 8  # free box header + mdat header
    if pad < 0:
        raise ValueError("MJPEG fixture header outgrew MDAT_BASE")
    head += _box(b"free", b"\x00" * pad)
    return head + _box(b"mdat", b"".join(frames))


def fmp4_fixture_params(doc_id: int) -> tuple[int, int, int, int]:
    """(n_fragments, samples_per_fragment, media_timescale,
    sample_duration) for the fragmented fixture — closed form."""
    return 2 + doc_id % 3, 3 + doc_id % 4, 1000 * (1 + doc_id % 2), 40


def encode_fmp4(doc_id: int) -> bytes:
    """Minimal valid fragmented MP4: ftyp + moov (mvhd duration 0,
    video trak with EMPTY stsz + mdhd timescale, mvex/trex defaults)
    + per-fragment moof (mfhd, traf: tfhd default-base-is-moof, trun
    with per-sample sizes + first-sample sync flags) + mdat. The first
    sample of each fragment is sync (first_sample_flags clears the
    0x10000 non-sync bit; the trex default sets it), sizes are
    100 + fragment + sample so offsets are closed-form checkable."""
    nfrag, spf, mts, sdur = fmp4_fixture_params(doc_id)
    w, h = 64 + doc_id % 5, 48 + doc_id % 3
    full0 = bytes(4)
    mvhd = _box(b"mvhd", full0 + struct.pack(">IIII", 0, 0, 600, 0) + bytes(76))
    tkhd = _box(
        b"tkhd",
        full0 + struct.pack(">III", 0, 0, 1) + bytes(4)
        + struct.pack(">I", 0) + bytes(8) + bytes(8) + bytes(36)
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _box(b"mdhd", full0 + struct.pack(">IIII", 0, 0, mts, 0) + bytes(4))
    hdlr = _box(b"hdlr", full0 + bytes(4) + b"vide" + bytes(12) + b"\x00")
    stsz = _box(b"stsz", full0 + struct.pack(">II", 0, 0))
    stbl = _box(b"stbl", stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    # trex default flags mark samples NON-sync (0x10000); the trun's
    # first_sample_flags override marks fragment leaders sync
    trex = _box(
        b"trex", full0 + struct.pack(">IIIII", 1, 1, sdur, 0, 0x00010000)
    )
    mvex = _box(b"mvex", trex)
    moov = _box(b"moov", mvhd + trak + mvex)
    out = bytearray(_box(b"ftyp", b"iso5" + struct.pack(">I", 0) + b"iso5cmfc"))
    out += moov
    for f in range(nfrag):
        sizes = [100 + f + s for s in range(spf)]
        mfhd = _box(b"mfhd", full0 + struct.pack(">I", f + 1))
        # tfhd flags: default-base-is-moof (0x020000) only
        tfhd = _box(b"tfhd", b"\x00\x02\x00\x00" + struct.pack(">I", 1))
        # trun flags: data-offset (0x01) + first-sample-flags (0x04) +
        # per-sample size (0x200)
        trun_body = bytearray(b"\x00\x00\x02\x05" + struct.pack(">I", spf))
        data_offset_pos = len(trun_body)
        trun_body += struct.pack(">i", 0)  # patched below
        trun_body += struct.pack(">I", 0)  # first_sample_flags: sync
        for sz in sizes:
            trun_body += struct.pack(">I", sz)
        trun = _box(b"trun", bytes(trun_body))
        traf = _box(b"traf", tfhd + trun)
        moof = _box(b"moof", mfhd + traf)
        # data_offset is relative to the moof BOX start: moof + mdat hdr
        patched = bytearray(moof)
        # locate the placeholder: moof -> traf -> trun body
        idx = patched.index(b"trun") + 4 + 4 + 4
        patched[idx : idx + 4] = struct.pack(">i", len(moof) + 8)
        out += patched
        out += _box(b"mdat", b"".join(bytes([f + s]) * sz for s, sz in enumerate(sizes)))
    return bytes(out)
