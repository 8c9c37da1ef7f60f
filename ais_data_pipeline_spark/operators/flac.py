"""Pure-stdlib compressed-audio CONTAINER parsers: FLAC STREAMINFO and
Ogg (Vorbis / Opus) identification headers.

Round-12 stretch (verdict item 8): the audio tier routes compressed
formats to real metadata the way the video tier routes coded MP4s to
``parse_mp4_meta`` — the fixed-layout header fields (rate, channels,
bit depth, total samples) are container work a ``struct`` parser can
own exactly, while SAMPLE decode of FLAC subframes / Vorbis floors /
Opus SILK stays the honest codec line, exactly the PIL-hook convention
of the image tier.

Layouts from the public specs: FLAC format (xiph.org — ``fLaC`` magic,
metadata-block headers, the 34-byte STREAMINFO bit packing), Ogg RFC
3533 (page header, segment table), Vorbis I spec §4.2.2
(identification header), RFC 7845 §5.1 (OpusHead).

Reference parity: the reference pipeline has no audio handling; this
module is part of the mandated LLM-data-pipeline multimodal tier.
"""

from __future__ import annotations

import struct


def parse_flac_streaminfo(data: bytes) -> dict:
    """FLAC bytes -> STREAMINFO dict: ``sample_rate``, ``n_channels``,
    ``bits_per_sample``, ``total_samples``, ``duration_ms`` (None when
    total_samples is 0 = unknown, per spec), ``min_block``/
    ``max_block``. Walks the metadata-block chain only as far as the
    mandatory first STREAMINFO block; raises ``ValueError`` on corrupt
    streams."""
    if len(data) < 8 or data[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    header = data[4]
    btype = header & 0x7F
    if btype != 0:
        raise ValueError("FLAC first metadata block must be STREAMINFO")
    (length,) = struct.unpack(">I", b"\x00" + data[5:8])
    if length != 34:
        raise ValueError("bad STREAMINFO length")
    body = data[8 : 8 + 34]
    if len(body) != 34:
        raise ValueError("truncated STREAMINFO block")
    min_block, max_block = struct.unpack_from(">HH", body, 0)
    # sample_rate(20) | channels-1(3) | bps-1(5) | total_samples(36),
    # packed big-endian across 8 bytes after the 24-bit frame sizes
    packed = int.from_bytes(body[10:18], "big")
    rate = packed >> 44
    nch = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        raise ValueError("STREAMINFO sample rate is zero")
    return {
        "sample_rate": rate,
        "n_channels": nch,
        "bits_per_sample": bps,
        "total_samples": total,
        "duration_ms": total * 1000 // rate if total else None,
        "min_block": min_block,
        "max_block": max_block,
    }


def _first_ogg_packet(data: bytes) -> bytes:
    """First logical packet of the first Ogg page (RFC 3533 page
    grammar: fixed 27-byte header + segment table); enough for both
    codecs' identification headers, which must be packet 1 alone."""
    if len(data) < 28 or data[:4] != b"OggS":
        raise ValueError("not an Ogg payload")
    if data[4] != 0:
        raise ValueError("unsupported Ogg version")
    nsegs = data[26]
    table = data[27 : 27 + nsegs]
    if len(table) != nsegs:
        raise ValueError("truncated Ogg segment table")
    body = data[27 + nsegs :]
    # packet 1 ends at the first lacing value < 255
    plen = 0
    for lace in table:
        plen += lace
        if lace < 255:
            break
    if len(body) < plen:
        raise ValueError("truncated Ogg packet")
    return body[:plen]


def _ogg_last_granule(data: bytes) -> int | None:
    """Granule position of the last COMPLETE Ogg page (forward page
    walk — ``rfind(b"OggS")`` would false-match capture patterns
    inside packet payloads). Pages whose granule is -1 ("no packet
    ends here", RFC 3533 §6) are skipped; a truncated final page
    (header or body cut off mid-transfer) is ignored so the walk
    reports the last granule the payload actually COMMITS. Returns
    None when no complete page carries a granule > 0 (headers-only
    stream)."""
    pos = 0
    best: int | None = None
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != b"OggS" or data[pos + 4] != 0:
            break  # desynced: trust only the committed prefix
        (granule,) = struct.unpack_from("<q", data, pos + 6)
        nsegs = data[pos + 26]
        table = data[pos + 27 : pos + 27 + nsegs]
        if len(table) != nsegs:
            break  # truncated segment table
        body_len = sum(table)
        end = pos + 27 + nsegs + body_len
        if end > len(data):
            break  # truncated page body
        if granule > 0:
            best = granule
        pos = end
    return best


def parse_ogg_audio_meta(data: bytes) -> dict:
    """Ogg bytes -> codec identification dict: ``codec`` ('vorbis' or
    'opus'), ``sample_rate`` (Vorbis: the stream rate; Opus: the
    informational input rate — Opus always decodes at 48 kHz),
    ``n_channels``, and ``duration_ms`` from the LAST complete page's
    granule position (round 13 — the r12 cut returned None; the value
    was one page walk away). Vorbis granules count PCM samples at the
    stream rate; Opus granules count 48 kHz samples and include the
    pre-skip, which is subtracted per RFC 7845 §4.1. ``duration_ms``
    stays None (honest unknown) when no complete page carries a
    positive granule — headers-only or truncated-before-first-audio
    payloads. Raises ``ValueError`` on corrupt pages and
    ``NotImplementedError`` for non-audio Ogg payloads (Theora,
    Speex, ...)."""
    pkt = _first_ogg_packet(data)
    if pkt[:7] == b"\x01vorbis":
        if len(pkt) < 30:
            raise ValueError("truncated Vorbis identification header")
        (version,) = struct.unpack_from("<I", pkt, 7)
        if version != 0:
            raise ValueError("bad Vorbis version")
        nch = pkt[11]
        (rate,) = struct.unpack_from("<I", pkt, 12)
        if nch == 0 or rate == 0:
            raise ValueError("Vorbis header with zero channels or rate")
        granule = _ogg_last_granule(data)
        return {
            "codec": "vorbis",
            "sample_rate": rate,
            "n_channels": nch,
            "duration_ms": granule * 1000 // rate if granule else None,
        }
    if pkt[:8] == b"OpusHead":
        if len(pkt) < 19:
            raise ValueError("truncated OpusHead")
        if pkt[8] >> 4 != 0:  # major version (RFC 7845 §5.1)
            raise ValueError("bad Opus version")
        nch = pkt[9]
        (preskip,) = struct.unpack_from("<H", pkt, 10)
        (rate,) = struct.unpack_from("<I", pkt, 12)
        if nch == 0:
            raise ValueError("OpusHead with zero channels")
        granule = _ogg_last_granule(data)
        return {
            "codec": "opus",
            "sample_rate": rate or 48000,
            "n_channels": nch,
            "duration_ms": (
                max(0, granule - preskip) * 1000 // 48000 if granule else None
            ),
        }
    raise NotImplementedError(
        "Ogg payload is not Vorbis or Opus audio"
    )


# ---------------------------------------------------------------------------
# fixture encoders (closed-form headers a SQL oracle / pytest re-derives)
# ---------------------------------------------------------------------------

FIXTURE_RATES = [8000, 16000, 22050, 44100, 48000]


def flac_fixture_params(doc_id: int) -> tuple[int, int, int, int]:
    """(sample_rate, n_channels, bits_per_sample, total_samples)."""
    rate = FIXTURE_RATES[doc_id % 5]
    nch = 1 + doc_id % 3
    bps = [16, 24, 8][doc_id % 3]
    total = 1000 + doc_id % 777
    return rate, nch, bps, total


def encode_flac_header(doc_id: int) -> bytes:
    """Fixture FLAC: magic + last-flagged STREAMINFO with the
    ``flac_fixture_params`` closed forms (no audio frames — the parser
    under test reads metadata only, like a real corpus sniffer)."""
    rate, nch, bps, total = flac_fixture_params(doc_id)
    packed = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | total
    body = struct.pack(">HH", 4096, 4096)  # min/max blocksize
    body += b"\x00" * 6  # min/max framesize (unknown)
    body += packed.to_bytes(8, "big")
    body += bytes(16)  # unset MD5
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + body


#: fixture OpusHead pre-skip (RFC 7845 recommends 3840 = 80 ms; the
#: fixture uses a smaller value so tiny granules stay positive)
OPUS_FIXTURE_PRESKIP = 312


def ogg_fixture_granule(doc_id: int) -> int:
    """Closed-form granule position of the fixture EOS page — always
    above the Opus pre-skip so both codecs' durations are positive."""
    return 1312 + (doc_id * 997) % 123457


def encode_ogg_header(doc_id: int) -> bytes:
    """Fixture Ogg: a BOS page whose single packet is a Vorbis
    identification header (even doc_id) or an OpusHead (odd), plus an
    EOS page committing the ``ogg_fixture_granule`` closed form (one
    empty terminating packet; CRCs left zero — the parser under test
    reads structure, not checksums)."""
    rate = FIXTURE_RATES[doc_id % 5]
    nch = 1 + doc_id % 2
    if doc_id % 2 == 0:
        pkt = b"\x01vorbis" + struct.pack("<IB I iii", 0, nch, rate, -1, 128000, -1)
        pkt += bytes([0xB8, 0x01])  # blocksizes + framing bit
    else:
        pkt = b"OpusHead" + bytes([1, nch]) + struct.pack(
            "<HIhB", OPUS_FIXTURE_PRESKIP, rate, 0, 0
        )
    head = b"OggS" + bytes([0, 0x02])  # version 0, BOS flag
    head += struct.pack("<qIII", 0, 0xABCD0000 + doc_id, 0, 0)
    head += bytes([1, len(pkt)])  # one segment
    eos = b"OggS" + bytes([0, 0x04])  # EOS flag
    eos += struct.pack("<qIII", ogg_fixture_granule(doc_id), 0xABCD0000 + doc_id, 1, 0)
    eos += bytes([1, 0])  # one zero-length packet ends on this page
    return head + pkt + eos
