"""Pure-stdlib TIFF parser — baseline document-corpus tier.

Round-13 widening: TIFF is the document/scan staple (multi-page scans,
satellite tiles, OCR pipelines) the image tier didn't route. Scope is
the TIFF 6.0 baseline a ``struct`` walk can own exactly: both byte
orders (``II``/``MM``), the magic-42 header, the first IFD's 12-byte
entries with inline-or-offset values, the geometry/layout tags (width,
height, bits per sample, samples per pixel, compression, photometric,
strip offsets/byte-counts/rows-per-strip), and NATIVE pixel decode of
UNCOMPRESSED (compression 1) 8-bit grayscale and RGB strips — the
layout uncompressed scanners and intermediate pipelines actually emit.
Compressed codecs (LZW, PackBits, JPEG-in-TIFF, CCITT) raise the
honest ``NotImplementedError`` and fall through to the PIL hook in
``multimodal.decode_pixels_array`` — the image tier's exotic-variant
convention.

Reference parity: the reference pipeline has no image handling; this
module is part of the mandated LLM-data-pipeline multimodal tier.
"""

from __future__ import annotations

import struct

#: IFD entry value type -> (struct code, byte size); baseline subset
_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4)}


def _read_ifd(data: bytes, e: str) -> dict[int, list[int]]:
    """First IFD -> {tag: [values...]} for the baseline-typed tags
    (BYTE/SHORT/LONG); other value types are skipped, not errors."""
    (off,) = struct.unpack_from(e + "I", data, 4)
    if off + 2 > len(data):
        raise ValueError("TIFF IFD offset out of range")
    (n,) = struct.unpack_from(e + "H", data, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        ent = off + 2 + 12 * i
        if ent + 12 > len(data):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ = struct.unpack_from(e + "HH", data, ent)
        (cnt,) = struct.unpack_from(e + "I", data, ent + 4)
        if typ not in _TYPES:
            continue
        code, size = _TYPES[typ]
        total = size * cnt
        if total <= 4:
            voff = ent + 8
        else:
            (voff,) = struct.unpack_from(e + "I", data, ent + 8)
        if voff + total > len(data):
            raise ValueError(f"TIFF tag {tag} values out of range")
        tags[tag] = list(struct.unpack_from(e + code * cnt, data, voff))
    return tags


def parse_tiff_meta(data: bytes) -> dict:
    """TIFF bytes -> {width, height, bits_per_sample, n_samples,
    compression, photometric, byte_order} from the first IFD. Raises
    ``ValueError`` on corrupt containers."""
    if len(data) < 8:
        raise ValueError("not a TIFF payload")
    if data[:4] == b"II\x2a\x00":
        e = "<"
    elif data[:4] == b"MM\x00\x2a":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    tags = _read_ifd(data, e)
    if 256 not in tags or 257 not in tags:
        raise ValueError("TIFF missing width/height tags")
    bits = tags.get(258, [1])
    return {
        "width": tags[256][0],
        "height": tags[257][0],
        "bits_per_sample": bits[0],
        "n_samples": tags.get(277, [len(bits)])[0],
        "compression": tags.get(259, [1])[0],
        "photometric": tags.get(262, [1])[0],
        "byte_order": "little" if e == "<" else "big",
    }


def parse_tiff(data: bytes):
    """TIFF bytes -> HxWx3 uint8 RGB array. Native scope: compression
    1 (none), 8 bits per sample, photometric 0/1 (gray, 0 = white-is-
    zero inverted per spec) or 2 (RGB), strip layout via tags
    273/278/279 (any strip split, incl. the single-strip default).
    Everything else raises ``NotImplementedError`` for the PIL hook."""
    import numpy as np

    m = parse_tiff_meta(data)
    e = "<" if m["byte_order"] == "little" else ">"
    tags = _read_ifd(data, e)
    w, h = m["width"], m["height"]
    if w == 0 or h == 0:
        raise ValueError("TIFF with zero dimension")
    if m["compression"] != 1:
        raise NotImplementedError(
            f"TIFF compression {m['compression']} not supported natively "
            "(uncompressed strips only)"
        )
    spp = m["n_samples"]
    if m["bits_per_sample"] != 8 or any(b != 8 for b in tags.get(258, [8])):
        raise NotImplementedError("only 8-bit TIFF samples supported")
    if m["photometric"] not in (0, 1, 2) or spp not in (1, 3):
        raise NotImplementedError(
            "only baseline grayscale/RGB TIFF supported"
        )
    if 273 not in tags:
        raise ValueError("TIFF missing strip offsets")
    offsets = tags[273]
    counts = tags.get(279)
    rps = tags.get(278, [h])[0] or h
    row_bytes = w * spp
    if counts is None:
        # spec allows omitting 279 for a single uncompressed strip
        if len(offsets) != 1:
            raise ValueError("TIFF multi-strip image missing byte counts")
        counts = [row_bytes * h]
    if len(counts) != len(offsets):
        raise ValueError("TIFF strip offset/count tables disagree")
    buf = bytearray()
    remaining = h
    for off, cnt, si in zip(offsets, counts, range(len(offsets))):
        rows = min(rps, remaining)
        if cnt != rows * row_bytes:
            raise ValueError("TIFF strip byte count mismatch")
        if off + cnt > len(data):
            raise ValueError("TIFF strip out of range")
        buf += data[off : off + cnt]
        remaining -= rows
    if remaining:
        raise ValueError("TIFF strips cover fewer rows than the image")
    arr = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(h, w, spp)
    if spp == 1:
        if m["photometric"] == 0:  # WhiteIsZero: invert to normal gray
            arr = 255 - arr
        return np.repeat(arr, 3, axis=2)
    return arr.copy()


# ---------------------------------------------------------------------------
# fixture encoder (closed-form raster a SQL oracle re-derives)
# ---------------------------------------------------------------------------


def encode_tiff(
    doc_id: int,
    w: int,
    h: int,
    gray: bool = False,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Real baseline TIFF of the shared closed-form raster
    (``synth_pixel_value``): header, one IFD with the geometry/strip
    tags, uncompressed strip data split at ``rows_per_strip``."""
    from ais_data_pipeline_spark.operators.multimodal import synth_pixel_value

    e = ">" if big_endian else "<"
    spp = 1 if gray else 3
    raster = bytes(
        synth_pixel_value(doc_id, k) for k in range(w * h * spp)
    )
    rps = rows_per_strip or h
    row_bytes = w * spp
    strips = [
        raster[r * row_bytes : min(r + rps, h) * row_bytes]
        for r in range(0, h, rps)
    ]

    def entry(tag: int, typ: int, vals: list[int], extra_off: int) -> tuple[bytes, bytes]:
        code, size = _TYPES[typ]
        total = size * len(vals)
        packed = struct.pack(e + code * len(vals), *vals)
        if total <= 4:
            return (
                struct.pack(e + "HHI", tag, typ, len(vals))
                + packed + b"\x00" * (4 - total),
                b"",
            )
        return (
            struct.pack(e + "HHII", tag, typ, len(vals), extra_off),
            packed,
        )

    # layout: header(8) + IFD + extras + strips
    tags = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [8] * spp),
        (259, 3, [1]),
        (262, 3, [1 if gray else 2]),
        (277, 3, [spp]),
        (278, 4, [rps]),
    ]
    n = len(tags) + 2  # + strip offsets + strip counts
    ifd_off = 8
    extras_off = ifd_off + 2 + 12 * n + 4
    # first pass to size the extras (strip tags need final offsets)
    entries = []
    extras = bytearray()
    for tag, typ, vals in tags:
        ent, ext = entry(tag, typ, vals, extras_off + len(extras))
        entries.append(ent)
        extras += ext
    # strip tables: place AFTER we know where strips start
    counts = [len(s) for s in strips]
    probe_counts_ext = 4 * len(strips) if 4 * len(strips) > 4 else 0
    probe_offsets_ext = 4 * len(strips) if 4 * len(strips) > 4 else 0
    strips_start = extras_off + len(extras) + probe_counts_ext + probe_offsets_ext
    offs = []
    pos = strips_start
    for s in strips:
        offs.append(pos)
        pos += len(s)
    ent, ext = entry(273, 4, offs, extras_off + len(extras))
    entries.append(ent)
    extras += ext
    ent, ext = entry(279, 4, counts, extras_off + len(extras))
    entries.append(ent)
    extras += ext
    entries.sort(key=lambda b: struct.unpack_from(e + "H", b, 0)[0])
    out = bytearray()
    out += (b"II\x2a\x00" if e == "<" else b"MM\x00\x2a")
    out += struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", n)
    for ent in entries:
        out += ent
    out += struct.pack(e + "I", 0)  # next-IFD terminator
    out += extras
    assert len(out) == strips_start, (len(out), strips_start)
    for s in strips:
        out += s
    return bytes(out)
