"""Pure-stdlib TIFF parser — baseline document-corpus tier.

Round-13 widening: TIFF is the document/scan staple (multi-page scans,
satellite tiles, OCR pipelines) the image tier didn't route. Scope is
the TIFF 6.0 baseline a ``struct`` walk can own exactly: both byte
orders (``II``/``MM``), the magic-42 header, the first IFD's 12-byte
entries with inline-or-offset values, the geometry/layout tags (width,
height, bits per sample, samples per pixel, compression, photometric,
strip offsets/byte-counts/rows-per-strip), and NATIVE pixel decode of
8-bit grayscale and RGB strips under compression 1 (none), 5 (the
TIFF LZW flavor — MSB bit packing, early-change width bumps) and
32773 (PackBits RLE) or 8/32946 ((Adobe) Deflate via stdlib zlib),
each optionally behind the horizontal-differencing predictor
(tag 317 = 2). Round 14: MULTI-PAGE chains decode every IFD, the
TILED layout (tags 322-325, TIFF 6.0 §15 — full right/bottom-padded
edge tiles, per-tile compression and predictor) decodes natively, and
SUB-BYTE grayscale/bilevel (1/2/4-bit, MSB packing, per-row byte
padding, WhiteIsZero inversion — the scanned-document staple) decodes
under every strip codec. Round 15: NEW-STYLE JPEG-IN-TIFF
(compression 7, TIFF TechNote 2 — shared JPEGTables tag 347 +
abbreviated per-strip/tile streams spliced through the full
``operators.jpeg`` decoder; gray + YCbCr photometrics) decodes
natively as a composition of the existing JPEG decoder with the
strip/tile walk, PLANAR CONFIGURATION 2 (separate component
planes, component-major strip/tile tables, per-plane predictor)
decodes for every raster codec, and the FULL CCITT FAX FAMILY
(``operators.ccitt``, spec-vector-pinned mode/run tables): Group 4 /
T.6 MMR (compression 4, strips with per-strip reference reset AND
tiles), Group 3 / T.4 (compression 3, 1-D and 2-D per T4Options,
EOL + fill framing), and byte-aligned 1-D Modified Huffman
(compression 2) all decode the scanned-document tier natively.
Remaining codecs (old-style JPEG compression 6, RGB/CMYK-coded or
planar-2 JPEG-in-TIFF, CCITT uncompressed-mode extensions) raise the
honest ``NotImplementedError`` and fall through to the PIL hook in
``multimodal.decode_pixels_array`` — the image tier's exotic-variant
convention.

Reference parity: the reference pipeline has no image handling; this
module is part of the mandated LLM-data-pipeline multimodal tier.
"""

from __future__ import annotations

import struct

#: IFD entry value type -> (struct code, byte size); baseline subset
#: type 7 (UNDEFINED, byte-sized) carries the JPEGTables stream (tag
#: 347) in new-style JPEG-in-TIFF (r15)
_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4), 7: ("B", 1)}


def _unpackbits(src: bytes, expect: int) -> bytes:
    """PackBits RLE (TIFF 6.0 §9, the Macintosh scheme): control byte
    n in 0..127 copies n+1 literals, 129..255 repeats the next byte
    257-n times, 128 is a no-op. Decodes to EXACTLY ``expect`` bytes
    or raises."""
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expect:
        n = src[i]
        i += 1
        if n < 128:
            if i + n + 1 > len(src):
                raise ValueError("truncated PackBits literal run")
            out += src[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(src):
                raise ValueError("truncated PackBits repeat run")
            out += bytes([src[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) != expect:
        raise ValueError("PackBits output length mismatch")
    return bytes(out)


def _lzw_decode_tiff(src: bytes, expect: int) -> bytes:
    """TIFF-flavor LZW (TIFF 6.0 §13): MSB-first bit packing (the
    OPPOSITE of GIF), 8-bit symbols, Clear=256, EOI=257, first table
    code 258, and the EARLY-CHANGE convention — the code width bumps
    when the table reaches 2^w - 1 (one entry EARLIER than GIF),
    capped at 12 bits until the next Clear."""
    CLEAR, EOI = 256, 257

    def fresh() -> list[bytes]:
        return [bytes([i]) for i in range(256)] + [b"", b""]

    table = fresh()
    width = 9
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(src):
                raise ValueError("TIFF LZW stream truncated before EOI")
            acc = (acc << 8) | src[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        if code == CLEAR:
            table = fresh()
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("TIFF LZW first code after clear undefined")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW code beyond table end")
        out += entry
        if len(out) > expect:
            raise ValueError("TIFF LZW output exceeds the strip size")
        prev = entry
        # EARLY CHANGE, decoder side: the decoder's table lags the
        # encoder's by exactly one entry (the encoder adds before the
        # decoder can infer), so it widens at 2^w - 2 where the
        # encoder widened at 2^w - 1 — the same off-by-one libtiff
        # carries (free_entp > maxcodep - 1)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) != expect:
        raise ValueError("TIFF LZW output shorter than the strip size")
    return bytes(out)


#: Decode-side raster cap (r15 fuzz finding): a corrupt width/height/
#: tile-geometry tag can request a multi-GiB ``np.zeros`` BEFORE any
#: data-length check can reject it — one 30k-mutation sweep produced a
#: near-OOM allocation that thrashed the box for seconds. 512 MiB
#: comfortably covers any real scan/satellite page at this tier; a
#: legitimate larger raster belongs in a tiled reader that never
#: materializes the full frame anyway.
_RASTER_CAP_BYTES = 512 * 1024 * 1024


def _check_raster(n_bytes: int) -> None:
    if n_bytes > _RASTER_CAP_BYTES or n_bytes < 0:
        raise ValueError(
            f"TIFF raster of {n_bytes} bytes exceeds the "
            f"{_RASTER_CAP_BYTES >> 20} MiB decode cap (corrupt geometry?)"
        )


def _read_ifd(data: bytes, e: str) -> dict[int, list[int]]:
    """First IFD -> {tag: [values...]} for the baseline-typed tags
    (BYTE/SHORT/LONG); other value types are skipped, not errors."""
    (off,) = struct.unpack_from(e + "I", data, 4)
    return _read_ifd_at(data, e, off)


def _ifd_offsets(data: bytes, e: str) -> list[int]:
    """All IFD offsets in chain order (multi-page scans chain IFDs via
    the trailing next-IFD pointer). A visited-set bounds corrupt
    circular chains; range/truncation errors raise ``ValueError``."""
    offsets: list[int] = []
    (off,) = struct.unpack_from(e + "I", data, 4)
    seen: set[int] = set()
    while off and off not in seen:
        seen.add(off)
        if off + 2 > len(data):
            raise ValueError("TIFF IFD offset out of range")
        (cnt,) = struct.unpack_from(e + "H", data, off)
        nxt_pos = off + 2 + 12 * cnt
        if nxt_pos + 4 > len(data):
            raise ValueError("truncated TIFF IFD chain")
        offsets.append(off)
        (off,) = struct.unpack_from(e + "I", data, nxt_pos)
    return offsets


def _read_ifd_at(data: bytes, e: str, off: int) -> dict[int, list[int]]:
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
        if typ not in _TYPES or cnt == 0:
            # non-baseline value types are skipped, and a zero-count
            # entry carries no values (fuzz: downstream [0] indexing
            # must see the tag as ABSENT, not as an empty list)
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
    n_pages = len(_ifd_offsets(data, e))
    return {
        "width": tags[256][0],
        "height": tags[257][0],
        "bits_per_sample": bits[0],
        "n_samples": tags.get(277, [len(bits)])[0],
        "compression": tags.get(259, [1])[0],
        "photometric": tags.get(262, [1])[0],
        "byte_order": "little" if e == "<" else "big",
        "n_pages": n_pages,
    }


def _decode_ifd(data: bytes, e: str, tags: dict[int, list[int]]):
    """Decode ONE page (one IFD's raster) -> HxWx3 uint8 RGB array —
    the shared body of ``parse_tiff`` / ``parse_tiff_pages``."""
    import numpy as np

    if 256 not in tags or 257 not in tags:
        raise ValueError("TIFF missing width/height tags")
    w, h = tags[256][0], tags[257][0]
    bits = tags.get(258, [1])
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    spp = tags.get(277, [len(bits)])[0]
    if w == 0 or h == 0:
        raise ValueError("TIFF with zero dimension")
    # corrupt-geometry guard before any alloc. Every decode path
    # presents HxWx3 RGB regardless of spp (gray/bilevel replicate to
    # three channels; JPEG-in-TIFF always converts to RGB), so the cap
    # must count the OUTPUT bytes — w*h*spp under-counted 3x for
    # single-sample images (r16 ADVICE finding on the gray
    # JPEG-in-TIFF dispatch; same expansion on every gray path).
    _check_raster(w * h * 3)
    if compression == 7:
        # new-style JPEG-in-TIFF (r15, TIFF TechNote 2): shared
        # tables in tag 347 + one abbreviated JPEG stream per
        # strip/tile — a composition of the existing JPEG decoder
        # with the strip/tile walk, not a new codec
        return _decode_jpeg_ifd(data, tags, w, h, photometric)
    if compression == 6:
        # old-style JPEG-in-TIFF (r16, TIFF 6.0 §22 — deprecated by
        # TechNote 2 in 1995): the restricted subset real scanner
        # firmware emitted — one complete interchange stream via the
        # JPEGInterchangeFormat tags; everything else stays the hook
        return _decode_jpeg_old_ifd(data, tags, w, h, photometric)
    if compression in (2, 3, 4):
        # CCITT family (r15): Group 4 / T.6 MMR (4, the document-scan
        # staple), Group 3 / T.4 (3, 1-D and 2-D per T4Options), and
        # pure 1-D modified Huffman (2, byte-aligned rows) all decode
        # natively through operators.ccitt
        if bits[0] != 1 or spp != 1 or photometric not in (0, 1):
            raise ValueError("CCITT TIFF must be 1-bit single-sample bilevel")
        if tags.get(266, [1])[0] != 1:
            # FillOrder 2 (LSB-first, common in Class-F scanner output)
            # would usually fail with an opaque bad-run-code error but
            # can occasionally decode WRONG bits without one (r16
            # ADVICE finding) — fail loudly so the PIL hook takes it
            raise NotImplementedError(
                "CCITT TIFF with FillOrder 2 (LSB-first) not supported "
                "natively (MSB-first / FillOrder 1 only)"
            )
        if compression == 3 and tags.get(292, [0])[0] & 2:
            raise NotImplementedError(
                "G3 uncompressed mode (T4Options bit 1) not supported"
            )
        if compression == 4 and tags.get(293, [0])[0] & 2:
            raise NotImplementedError(
                "G4 uncompressed mode (T6Options bit 1) not supported"
            )
        if 322 in tags or 324 in tags:
            if compression != 4:
                raise NotImplementedError("tiled MH/G3 TIFF not supported")
            return _decode_g4_tiles(data, tags, w, h, photometric)
        return _decode_ccitt_strips(data, tags, w, h, compression, photometric)
    if compression not in (1, 5, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF compression {compression} not supported natively "
            "(none/LZW/Deflate/PackBits/JPEG/CCITT only)"
        )
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} not supported")
    if spp == 1 and bits[0] in (1, 2, 4) and photometric in (0, 1):
        # sub-byte grayscale/bilevel (r14): the scanned-document
        # staple — MSB-first packed samples, each row padded to a
        # byte boundary. Predictor-2 and tiled sub-byte stay the
        # honest NotImplementedError line (rare in the wild).
        if predictor != 1:
            raise NotImplementedError("sub-byte TIFF with predictor")
        if 322 in tags or 324 in tags:
            raise NotImplementedError("tiled sub-byte TIFF")
        if tags.get(266, [1])[0] != 1:
            # same MSB-first assumption as the CCITT unpack (r16)
            raise NotImplementedError(
                "sub-byte TIFF with FillOrder 2 (LSB-first) not supported"
            )
        return _decode_subbyte_strips(
            data, tags, w, h, bits[0], compression, photometric
        )
    if bits[0] != 8 or any(b != 8 for b in tags.get(258, [8])):
        raise NotImplementedError("only 8-bit TIFF samples supported")
    if photometric not in (0, 1, 2) or spp not in (1, 3):
        raise NotImplementedError(
            "only baseline grayscale/RGB TIFF supported"
        )
    if (photometric == 2) != (spp == 3):
        # RGB declares 3 samples, grayscale 1 — a mismatch means the
        # raster would decode under the wrong channel model (round-13
        # hardening sweep)
        raise ValueError("TIFF photometric/samples-per-pixel mismatch")
    if tags.get(284, [1])[0] == 2 and spp == 3:
        # planar configuration 2 (r15): each component in its own
        # plane — component-major strip/tile tables, per-plane
        # predictor. Gray planar-2 is indistinguishable from planar-1.
        return _decode_planar2(data, tags, w, h, compression, predictor)
    if 322 in tags or 324 in tags:
        # tiled layout (r14): the strip walk with a 2-D index
        return _decode_tiles(
            data, tags, w, h, spp, compression, predictor, photometric
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
    for off, cnt in zip(offsets, counts):
        rows = min(rps, remaining)
        if off + cnt > len(data):
            raise ValueError("TIFF strip out of range")
        raw = data[off : off + cnt]
        if compression == 1:
            if cnt != rows * row_bytes:
                raise ValueError("TIFF strip byte count mismatch")
        elif compression == 5:
            raw = _lzw_decode_tiff(raw, rows * row_bytes)
        elif compression in (8, 32946):  # (Adobe) Deflate
            import zlib

            try:
                raw = zlib.decompress(raw)
            except zlib.error as exc:
                raise ValueError(f"corrupt TIFF deflate strip: {exc}") from None
            if len(raw) != rows * row_bytes:
                raise ValueError("TIFF deflate strip length mismatch")
        else:  # PackBits
            raw = _unpackbits(raw, rows * row_bytes)
        buf += raw
        remaining -= rows
    if remaining:
        raise ValueError("TIFF strips cover fewer rows than the image")
    arr = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing: stored value = pixel - left neighbor
        # (per channel); invert with a per-row prefix sum mod 256
        arr = np.cumsum(arr.astype(np.int64), axis=1) % 256
        arr = arr.astype(np.uint8)
    if spp == 1:
        if photometric == 0:  # WhiteIsZero: invert to normal gray
            arr = 255 - arr
        return np.repeat(arr, 3, axis=2)
    return arr.copy()


def _decompress_block(data: bytes, off: int, cnt: int, compression: int, expect: int) -> bytes:
    """One strip/tile's decoded bytes — the shared codec dispatch."""
    if off + cnt > len(data):
        raise ValueError("TIFF strip/tile out of range")
    raw = data[off : off + cnt]
    if compression == 1:
        if cnt != expect:
            raise ValueError("TIFF strip/tile byte count mismatch")
        return raw
    if compression == 5:
        return _lzw_decode_tiff(raw, expect)
    if compression in (8, 32946):  # (Adobe) Deflate
        import zlib

        try:
            out = zlib.decompress(raw)
        except zlib.error as exc:
            raise ValueError(f"corrupt TIFF deflate block: {exc}") from None
        if len(out) != expect:
            raise ValueError("TIFF deflate block length mismatch")
        return out
    return _unpackbits(raw, expect)  # PackBits


def _decode_tiles(
    data: bytes,
    tags: dict[int, list[int]],
    w: int,
    h: int,
    spp: int,
    compression: int,
    predictor: int,
    photometric: int,
):
    """Tiled-TIFF raster assembly (r14, TIFF 6.0 §15): tiles of
    TileWidth x TileLength (tags 322/323) laid out left-to-right,
    top-to-bottom via TileOffsets/TileByteCounts (324/325); edge
    tiles are FULL tiles padded right/bottom, cropped after
    placement. Compression and the horizontal-differencing predictor
    apply per tile (each tile row restarts the differencing — same
    rule as strips). Planar configuration 2 (separate planes) stays
    the PIL hook."""
    import numpy as np

    if 322 not in tags or 323 not in tags or 324 not in tags:
        raise ValueError("tiled TIFF missing tile geometry/offset tags")
    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError("planar-configuration-2 TIFF not supported")
    tw, tl = tags[322][0], tags[323][0]
    if tw == 0 or tl == 0:
        raise ValueError("TIFF with zero tile dimension")
    offsets = tags[324]
    counts = tags.get(325)
    across = (w + tw - 1) // tw
    down = (h + tl - 1) // tl
    if counts is None or len(counts) != len(offsets):
        raise ValueError("TIFF tile offset/count tables disagree")
    if len(offsets) != across * down:
        raise ValueError("TIFF tile count does not cover the image")
    tile_bytes = tw * tl * spp
    _check_raster(down * tl * across * tw * spp)
    full = np.zeros((down * tl, across * tw, spp), dtype=np.uint8)
    for ti, (off, cnt) in enumerate(zip(offsets, counts)):
        raw = _decompress_block(data, off, cnt, compression, tile_bytes)
        tile = np.frombuffer(raw, dtype=np.uint8).reshape(tl, tw, spp)
        if predictor == 2:
            tile = (np.cumsum(tile.astype(np.int64), axis=1) % 256).astype(
                np.uint8
            )
        ty, tx = divmod(ti, across)
        full[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw, :] = tile
    arr = full[:h, :w, :]
    if spp == 1:
        if photometric == 0:  # WhiteIsZero
            arr = 255 - arr
        return np.repeat(arr, 3, axis=2)
    return arr.copy()


def _decode_subbyte_strips(
    data: bytes,
    tags: dict[int, list[int]],
    w: int,
    h: int,
    bpp: int,
    compression: int,
    photometric: int,
):
    """1/2/4-bit grayscale strip decode (TIFF 6.0 §4 bilevel / §5
    grayscale): samples pack MSB-first, each row padded to a byte
    boundary; values scale to full 8-bit range (v * 255 / maxval) and
    WhiteIsZero inverts BEFORE scaling. Returns HxWx3 uint8."""
    import numpy as np

    if 273 not in tags:
        raise ValueError("TIFF missing strip offsets")
    offsets = tags[273]
    counts = tags.get(279)
    rps = tags.get(278, [h])[0] or h
    row_bytes = (w * bpp + 7) // 8
    if counts is None:
        if len(offsets) != 1:
            raise ValueError("TIFF multi-strip image missing byte counts")
        counts = [row_bytes * h]
    if len(counts) != len(offsets):
        raise ValueError("TIFF strip offset/count tables disagree")
    buf = bytearray()
    remaining = h
    for off, cnt in zip(offsets, counts):
        rows = min(rps, remaining)
        buf += _decompress_block(data, off, cnt, compression, rows * row_bytes)
        remaining -= rows
    if remaining:
        raise ValueError("TIFF strips cover fewer rows than the image")
    rows8 = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(h, row_bytes)
    unpacked = np.unpackbits(rows8, axis=1)[:, : w * bpp].reshape(h, w, bpp)
    weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.int64)
    vals = (unpacked.astype(np.int64) * weights).sum(axis=2)
    maxv = (1 << bpp) - 1
    if photometric == 0:  # WhiteIsZero
        vals = maxv - vals
    gray = (vals * 255 // maxv).astype(np.uint8)
    return np.repeat(gray[:, :, None], 3, axis=2)


def _bilevel_present(bitarr: "object", photometric: int) -> "object":
    """CCITT-decoded bits (1 = black semantically, per the T.4/T.6 run
    colors) -> HxWx3 luminance presentation. The decoded "white" run
    is stored sample value 0; PhotometricInterpretation then says what
    0 MEANS: 0 = WhiteIsZero (the fax norm — white presents 255),
    1 = BlackIsZero (sample 0 is black, i.e. the presentation is the
    INVERSE — libtiff/PIL invert exactly this way). Treating both
    alike silently flipped photometric-1 fax pixels (r16 ADVICE
    finding, medium)."""
    import numpy as np

    if photometric == 1:  # BlackIsZero: decoded white run presents dark
        gray = (bitarr * np.uint8(255)).astype(np.uint8)
    else:  # WhiteIsZero: white run presents 255 (the fax norm)
        gray = ((1 - bitarr) * np.uint8(255)).astype(np.uint8)
    return np.repeat(gray[:, :, None], 3, axis=2)


def _decode_ccitt_strips(
    data: bytes,
    tags: dict[int, list[int]],
    w: int,
    h: int,
    compression: int,
    photometric: int,
):
    """CCITT strip decode (r15): each strip is an independently-coded
    block of ``rows_per_strip`` rows (reference line resets to
    all-white per strip, per the TIFF spec's strip-independence
    rule). Compression 4 = T.6 MMR, 3 = Group 3 (T4Options bit 0
    selects 2-D), 2 = pure 1-D MH with byte-aligned rows. Strip
    blocks stay (rows, w) uint8 ndarrays end-to-end (1 byte/pixel, so
    the raster cap is the real allocation bound — r16 ADVICE)."""
    import numpy as np

    from ais_data_pipeline_spark.operators.ccitt import (
        decode_g3,
        decode_g4,
        decode_mh,
    )

    if 273 not in tags:
        raise ValueError("TIFF missing strip offsets")
    offsets = tags[273]
    counts = tags.get(279)
    if counts is None or len(counts) != len(offsets):
        raise ValueError("TIFF strip offset/count tables disagree")
    rps = tags.get(278, [h])[0] or h
    two_d = bool(tags.get(292, [0])[0] & 1)
    blocks: list = []
    remaining = h
    for off, cnt in zip(offsets, counts):
        if remaining <= 0:
            raise ValueError("TIFF strips overrun the image height")
        if off + cnt > len(data):
            raise ValueError("TIFF strip out of range")
        rows = min(rps, remaining)
        block = data[off : off + cnt]
        if compression == 4:
            blocks.append(decode_g4(block, w, rows))
        elif compression == 3:
            blocks.append(decode_g3(block, w, rows, two_d=two_d))
        else:
            blocks.append(decode_mh(block, w, rows))
        remaining -= rows
    if remaining:
        raise ValueError("TIFF strips cover fewer rows than the image")
    return _bilevel_present(np.vstack(blocks), photometric)


def _decode_g4_tiles(
    data: bytes, tags: dict[int, list[int]], w: int, h: int, photometric: int
):
    """Tiled G4 (r15): each tile is an independently-coded T.6 block
    of TileLength rows at TileWidth — the tile walk of
    ``_decode_tiles`` over the fax codec."""
    import numpy as np

    from ais_data_pipeline_spark.operators.ccitt import decode_g4

    if 322 not in tags or 323 not in tags or 324 not in tags:
        raise ValueError("tiled TIFF missing tile geometry/offset tags")
    tw, tl = tags[322][0], tags[323][0]
    if tw == 0 or tl == 0:
        raise ValueError("TIFF with zero tile dimension")
    offsets = tags[324]
    counts = tags.get(325)
    across = (w + tw - 1) // tw
    down = (h + tl - 1) // tl
    if counts is None or len(counts) != len(offsets):
        raise ValueError("TIFF tile offset/count tables disagree")
    if len(offsets) != across * down:
        raise ValueError("TIFF tile count does not cover the image")
    _check_raster(down * tl * across * tw)
    full = np.zeros((down * tl, across * tw), dtype=np.uint8)
    for ti, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ValueError("TIFF tile out of range")
        bits = decode_g4(data[off : off + cnt], tw, tl)
        ty, tx = divmod(ti, across)
        full[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = bits
    return _bilevel_present(full[:h, :w], photometric)


def _decode_planar2(
    data: bytes,
    tags: dict[int, list[int]],
    w: int,
    h: int,
    compression: int,
    predictor: int,
):
    """Planar-configuration-2 RGB decode (r15, TIFF 6.0 §14 field
    PlanarConfiguration): each component is stored as its OWN
    single-channel image — the strip (or tile) tables hold
    ``3 × blocks-per-plane`` entries in component-major order (all of
    R's blocks, then G's, then B's), each block holding w-wide
    one-byte samples, and the horizontal-differencing predictor
    applies within each plane independently. Decode each plane with
    the same block walk as grayscale, then stack to HxWx3."""
    import numpy as np

    tiled = 322 in tags or 324 in tags
    if tiled:
        if 322 not in tags or 323 not in tags or 324 not in tags:
            raise ValueError("tiled TIFF missing tile geometry/offset tags")
        tw, tl = tags[322][0], tags[323][0]
        if tw == 0 or tl == 0:
            raise ValueError("TIFF with zero tile dimension")
        offsets, counts = tags[324], tags.get(325)
        across = (w + tw - 1) // tw
        down = (h + tl - 1) // tl
        per_plane = across * down
    else:
        if 273 not in tags:
            raise ValueError("TIFF missing strip offsets")
        offsets, counts = tags[273], tags.get(279)
        rps = tags.get(278, [h])[0] or h
        per_plane = (h + rps - 1) // rps
    if counts is None or len(counts) != len(offsets):
        raise ValueError("TIFF strip/tile offset/count tables disagree")
    if len(offsets) != 3 * per_plane:
        raise ValueError(
            "planar-2 TIFF strip/tile count is not 3x the per-plane count"
        )

    planes = []
    for c in range(3):
        if tiled:
            _check_raster(down * tl * across * tw)
            full = np.zeros((down * tl, across * tw), dtype=np.uint8)
            for ti in range(per_plane):
                off, cnt = offsets[c * per_plane + ti], counts[c * per_plane + ti]
                raw = _decompress_block(data, off, cnt, compression, tw * tl)
                tile = np.frombuffer(raw, dtype=np.uint8).reshape(tl, tw)
                if predictor == 2:
                    tile = (np.cumsum(tile.astype(np.int64), axis=1) % 256).astype(
                        np.uint8
                    )
                ty, tx = divmod(ti, across)
                full[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = tile
            planes.append(full[:h, :w])
        else:
            buf = bytearray()
            remaining = h
            for s in range(per_plane):
                off, cnt = offsets[c * per_plane + s], counts[c * per_plane + s]
                rows = min(rps, remaining)
                buf += _decompress_block(data, off, cnt, compression, rows * w)
                remaining -= rows
            if remaining:
                raise ValueError("TIFF strips cover fewer rows than the image")
            plane = np.frombuffer(bytes(buf), dtype=np.uint8).reshape(h, w)
            if predictor == 2:
                plane = (np.cumsum(plane.astype(np.int64), axis=1) % 256).astype(
                    np.uint8
                )
            planes.append(plane)
    return np.stack(planes, axis=2)


def _decode_jpeg_old_ifd(
    data: bytes, tags: dict[int, list[int]], w: int, h: int, photometric: int
):
    """Old-style JPEG-in-TIFF (TIFF 6.0 §22, compression 6 — r16).

    Native scope is the RESTRICTED subset real scanner firmware
    emitted: tag 513 (JPEGInterchangeFormat) points at ONE complete
    JPEG interchange stream (SOI..EOI, its own tables) covering the
    full image, tag 514 (JPEGInterchangeFormatLength) gives its byte
    length — i.e. "a whole JFIF file embedded in the TIFF". That form
    decodes with zero ambiguity through ``parse_jpeg`` (MCU-padded
    edges cropped, same rule as every JPEG path). The FRAGMENTED
    old-style variant — per-strip entropy data stitched to tags
    515-520 (JPEGProc/QTables/DCTables/ACTables offsets, restart
    state split across strips) — is the part TechNote 2 calls
    unimplementable cross-vendor (vendors disagreed on whether strips
    restart entropy state and where tables bind), so it stays the
    loud-NotImplementedError / PIL-hook line rather than risking
    silently-wrong pixels. Photometrics mirror compression 7: 1
    (MinIsBlack gray) and 6 (YCbCr); RGB/CMYK-coded stay the hook."""
    from ais_data_pipeline_spark.operators.jpeg import parse_jpeg

    if photometric not in (1, 6):
        raise NotImplementedError(
            f"old-style JPEG-in-TIFF photometric {photometric} not "
            "supported natively (gray/YCbCr only)"
        )
    if 513 not in tags or 514 not in tags:
        raise NotImplementedError(
            "old-style JPEG-in-TIFF without a JPEGInterchangeFormat "
            "stream (the fragmented per-strip tag 515-520 form) is "
            "not supported natively — TechNote 2 documents it as "
            "unimplementable cross-vendor; PIL hook"
        )
    off, ln = tags[513][0], tags[514][0]
    if ln <= 0 or off + ln > len(data):
        raise ValueError("JPEGInterchangeFormat stream out of range")
    arr = parse_jpeg(data[off : off + ln])
    if arr.shape[0] < h or arr.shape[1] < w:
        raise ValueError(
            "old-style JPEG stream smaller than the declared raster"
        )
    return arr[:h, :w, :]


def _decode_jpeg_ifd(data: bytes, tags: dict[int, list[int]], w: int, h: int, photometric: int):
    """New-style JPEG-in-TIFF decode (TIFF TechNote 2, compression 7,
    r15): tag 347 (JPEGTables) holds an abbreviated table stream
    ``SOI [DQT/DHT...] EOI``; each strip/tile is an abbreviated JPEG
    image stream sharing those tables (own tables, if present, simply
    re-define — T.81 table-specification semantics). Decoding is the
    standard concatenation: splice the table segments after each
    block's SOI and hand the result to ``parse_jpeg`` — the full
    baseline/progressive decoder, so subsampled chroma, restart
    markers, and 12-bit precision all come along for free. Native
    scope: photometric 1 (MinIsBlack gray) and 6 (YCbCr — what
    ``parse_jpeg``'s JFIF convert already returns as RGB); RGB-coded
    (2) / CMYK JPEG need the Adobe-transform dance and stay the PIL
    hook. Strips must tile the height; edge blocks may be MCU-padded
    (cropped after placement, same rule as the tiled layout)."""
    import numpy as np

    from ais_data_pipeline_spark.operators.jpeg import parse_jpeg

    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError("planar-configuration-2 TIFF not supported")
    if photometric not in (1, 6):
        raise NotImplementedError(
            f"JPEG-in-TIFF photometric {photometric} not supported "
            "natively (gray/YCbCr only)"
        )
    tbody = b""
    if 347 in tags:
        t = bytes(tags[347])
        if len(t) < 4 or t[:2] != b"\xff\xd8" or t[-2:] != b"\xff\xd9":
            raise ValueError("malformed JPEGTables stream")
        tbody = t[2:-2]

    def block_arr(off: int, cnt: int) -> "np.ndarray":
        if off + cnt > len(data):
            raise ValueError("TIFF strip/tile out of range")
        blk = data[off : off + cnt]
        if blk[:2] != b"\xff\xd8":
            raise ValueError("JPEG-in-TIFF block missing SOI")
        return parse_jpeg(b"\xff\xd8" + tbody + blk[2:])

    if 322 in tags or 324 in tags:
        if 322 not in tags or 323 not in tags or 324 not in tags:
            raise ValueError("tiled TIFF missing tile geometry/offset tags")
        tw, tl = tags[322][0], tags[323][0]
        if tw == 0 or tl == 0:
            raise ValueError("TIFF with zero tile dimension")
        offsets = tags[324]
        counts = tags.get(325)
        across = (w + tw - 1) // tw
        down = (h + tl - 1) // tl
        if counts is None or len(counts) != len(offsets):
            raise ValueError("TIFF tile offset/count tables disagree")
        if len(offsets) != across * down:
            raise ValueError("TIFF tile count does not cover the image")
        _check_raster(down * tl * across * tw * 3)
        full = np.zeros((down * tl, across * tw, 3), dtype=np.uint8)
        for ti, (off, cnt) in enumerate(zip(offsets, counts)):
            tile = block_arr(off, cnt)
            if tile.shape[0] < tl or tile.shape[1] < tw:
                raise ValueError("JPEG-in-TIFF tile smaller than tile geometry")
            ty, tx = divmod(ti, across)
            full[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw, :] = tile[:tl, :tw]
        return full[:h, :w, :].copy()

    if 273 not in tags:
        raise ValueError("TIFF missing strip offsets")
    offsets = tags[273]
    counts = tags.get(279)
    if counts is None or len(counts) != len(offsets):
        raise ValueError("TIFF strip offset/count tables disagree")
    rps = tags.get(278, [h])[0] or h
    out = np.zeros((h, w, 3), dtype=np.uint8)
    y = 0
    for off, cnt in zip(offsets, counts):
        if y >= h:
            raise ValueError("TIFF strips overrun the image height")
        rows = min(rps, h - y)
        arr = block_arr(off, cnt)
        if arr.shape[0] < rows or arr.shape[1] < w:
            raise ValueError("JPEG-in-TIFF strip smaller than its region")
        out[y : y + rows, :, :] = arr[:rows, :w, :]
        y += rows
    if y < h:
        raise ValueError("TIFF strips cover fewer rows than the image")
    return out


def _byte_order(data: bytes) -> str:
    if len(data) >= 8 and data[:4] == b"II\x2a\x00":
        return "<"
    if len(data) >= 8 and data[:4] == b"MM\x00\x2a":
        return ">"
    raise ValueError("not a TIFF payload")


def parse_tiff(data: bytes, page: int = 0):
    """TIFF bytes -> HxWx3 uint8 RGB array of page ``page`` (default
    first — the pre-r14 behavior). Native scope per page: compression
    1 (none), 5 (LZW — MSB packing, early-change width bumps), 8 and
    32946 ((Adobe) Deflate, stdlib zlib) and
    32773 (PackBits), each with the optional horizontal-differencing
    predictor (tag 317 = 2: per-row per-channel prefix sums after
    decompression); 8 bits per sample, photometric 0/1 (gray, 0 =
    white-is-zero inverted per spec) or 2 (RGB), strip layout via tags
    273/278/279 (any strip split, incl. the single-strip default) OR
    the tiled layout via tags 322-325 (r14). Everything else
    (JPEG-in-TIFF, CCITT, planar-configuration-2) raises
    ``NotImplementedError`` for the PIL hook."""
    e = _byte_order(data)
    offs = _ifd_offsets(data, e)
    if page >= len(offs):
        raise ValueError(f"TIFF has {len(offs)} page(s); page {page} requested")
    return _decode_ifd(data, e, _read_ifd_at(data, e, offs[page]))


def parse_tiff_pages(data: bytes) -> list:
    """Decode EVERY page of a (multi-page) TIFF — one HxWx3 array per
    chained IFD, in chain order (r14: the document-corpus staple;
    pages may differ in dims, compression, and photometric). Same
    native scope per page as ``parse_tiff``."""
    e = _byte_order(data)
    return [
        _decode_ifd(data, e, _read_ifd_at(data, e, off))
        for off in _ifd_offsets(data, e)
    ]


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
    compression: int = 1,
    predictor: int = 1,
    tile: tuple[int, int] | None = None,
    planar: int = 1,
    t4_2d: bool = False,
) -> bytes:
    """Real baseline TIFF of the shared closed-form raster
    (``synth_pixel_value``): header, one IFD with the geometry/strip
    tags, strip data split at ``rows_per_strip`` and stored raw
    (compression 1), TIFF-LZW (5) or PackBits (32773), optionally
    horizontally differenced first (predictor 2). ``tile=(tw, tl)``
    (r14) writes the TILED layout instead — tags 322-325, full
    right/bottom-padded edge tiles. ``planar=2`` (r15) stores each
    RGB component as its own plane (component-major strip/tile
    tables, per-plane predictor) — the SAME logical raster, so every
    closed-form oracle is layout-independent."""
    e = ">" if big_endian else "<"
    hdr = (b"II\x2a\x00" if e == "<" else b"MM\x00\x2a") + struct.pack(e + "I", 8)
    return hdr + _encode_tiff_page(
        doc_id, w, h, gray, e, rows_per_strip, compression, predictor,
        base=8, next_ifd=0, tile=tile, planar=planar, t4_2d=t4_2d,
    )


def encode_tiff_multipage(
    doc_id: int,
    page_specs: list[dict],
    big_endian: bool = False,
) -> bytes:
    """Multi-page TIFF (r14): one chained IFD per entry of
    ``page_specs`` (dict kwargs per page: ``seed_id``, ``w``, ``h``,
    ``gray``, ``rows_per_strip``, ``compression``, ``predictor``).
    Page blocks are laid out sequentially after the 8-byte header;
    each page's trailing next-IFD pointer targets the following
    block (0 on the last). Page lengths are offset-independent, so a
    measuring pass with base=0 sizes the layout exactly."""
    e = ">" if big_endian else "<"

    def build(spec: dict, base: int, next_ifd: int) -> bytes:
        return _encode_tiff_page(
            spec.get("seed_id", doc_id),
            spec["w"],
            spec["h"],
            spec.get("gray", False),
            e,
            spec.get("rows_per_strip"),
            spec.get("compression", 1),
            spec.get("predictor", 1),
            base=base,
            next_ifd=next_ifd,
            tile=spec.get("tile"),
        )

    sizes = [len(build(s, 0, 0)) for s in page_specs]
    out = bytearray(
        (b"II\x2a\x00" if e == "<" else b"MM\x00\x2a") + struct.pack(e + "I", 8)
    )
    pos = 8
    for i, spec in enumerate(page_specs):
        nxt = pos + sizes[i] if i + 1 < len(page_specs) else 0
        out += build(spec, pos, nxt)
        pos += sizes[i]
    return bytes(out)


def _compress_blocks(blocks: list[bytes], compression: int) -> list[bytes]:
    if compression == 5:
        return [_lzw_encode_tiff(b) for b in blocks]
    if compression in (8, 32946):
        import zlib as _zlib

        return [_zlib.compress(b) for b in blocks]
    if compression == 32773:
        return [_packbits_encode(b) for b in blocks]
    return blocks


def _split_jpeg_tables(full: bytes) -> tuple[bytes, bytes]:
    """Split an interchange JPEG into (table segments, abbreviated
    image stream): DQT/DHT move to the JPEGTables side, APP0 drops,
    everything else (SOF/DRI/SOS + entropy + EOI) stays. The walk
    stops at SOS, before any entropy bytes, so no unstuffing is
    needed. The fixture encoder uses FIXED Huffman tables and a
    caller-pinned quant table, so every strip/tile of one image
    yields byte-identical table segments — the first block's set is
    the shared JPEGTables stream."""
    pos = 2
    tables = b""
    keep = b""
    while True:
        if pos + 4 > len(full) or full[pos] != 0xFF:
            raise ValueError("malformed fixture JPEG")
        marker = full[pos + 1]
        if marker == 0xDA:  # SOS: entropy tail follows, keep verbatim
            return tables, b"\xff\xd8" + keep + full[pos:]
        (seglen,) = struct.unpack_from(">H", full, pos + 2)
        seg = full[pos : pos + 2 + seglen]
        if marker in (0xDB, 0xC4):
            tables += seg
        elif marker != 0xE0:  # APP0/JFIF is container noise here
            keep += seg
        pos += 2 + seglen


def jpeg_tiff_block_gray(doc_id: int, bx: int, by: int, nbx: int) -> int:
    """Closed-form gray of 8x8 block (bx, by) in a JPEG-in-TIFF
    fixture page — constant blocks make the lossy codec bit-exact
    (DC-only DCT, flat-1 quant), so a SQL oracle re-derives every
    pixel: ``pixel(x, y) = jpeg_tiff_block_gray(doc, x//8, y//8,
    ceil(w/8))``. Reuses the shared ``synth_pixel_value`` closed form
    on the block index."""
    from ais_data_pipeline_spark.operators.multimodal import synth_pixel_value

    return synth_pixel_value(doc_id, by * nbx + bx)


def _encode_jpeg_blocks(
    doc_id: int,
    w: int,
    h: int,
    gray: bool,
    rows_per_strip: int | None,
    tile: tuple[int, int] | None,
) -> tuple[list[bytes], bytes]:
    """Strip/tile payloads for compression-7 pages: each block region
    becomes an ABBREVIATED constant-block JPEG stream (tables
    stripped), sharing one JPEGTables stream (returned second).
    Strip/tile boundaries must land on 8-row multiples so the global
    block grid stays aligned with each block stream's own grid —
    that is what keeps ``jpeg_tiff_block_gray`` a global closed form."""
    from ais_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_constant_blocks,
    )

    nbx = (w + 7) // 8

    def region_stream(y0: int, x0: int, rw: int, rh: int) -> bytes:
        grays = [
            jpeg_tiff_block_gray(doc_id, x0 // 8 + bx, y0 // 8 + by, nbx)
            for by in range((rh + 7) // 8)
            for bx in range((rw + 7) // 8)
        ]
        return encode_jpeg_constant_blocks(rw, rh, grays, color=not gray)

    blocks: list[bytes] = []
    if tile is not None:
        tw, tl = tile
        if tw % 8 or tl % 8:
            raise ValueError("JPEG-in-TIFF tile dims must be multiples of 8")
        for ty in range((h + tl - 1) // tl):
            for tx in range((w + tw - 1) // tw):
                blocks.append(region_stream(ty * tl, tx * tw, tw, tl))
    else:
        rps = rows_per_strip or h
        if rps % 8 and rps < h:
            raise ValueError("JPEG-in-TIFF rows_per_strip must be a multiple of 8")
        for y0 in range(0, h, rps):
            blocks.append(region_stream(y0, 0, w, min(rps, h - y0)))
    tables, _ = _split_jpeg_tables(blocks[0])
    jpeg_tables = b"\xff\xd8" + tables + b"\xff\xd9"
    return [_split_jpeg_tables(b)[1] for b in blocks], jpeg_tables


def _encode_tiff_page(
    doc_id: int,
    w: int,
    h: int,
    gray: bool,
    e: str,
    rows_per_strip: int | None,
    compression: int,
    predictor: int,
    base: int,
    next_ifd: int,
    tile: tuple[int, int] | None = None,
    planar: int = 1,
    t4_2d: bool = False,
) -> bytes:
    """One page block — IFD + out-of-line values + strips OR tiles
    (r14: ``tile=(tw, tl)`` writes tags 322-325 with full padded edge
    tiles) — whose internal offsets assume the block begins at file
    offset ``base``; the trailing next-IFD pointer is ``next_ifd``."""
    import numpy as np

    from ais_data_pipeline_spark.operators.multimodal import synth_pixel_value

    spp = 1 if gray else 3

    def diff(block: bytes, bw: int, bh: int) -> bytes:
        a = np.frombuffer(block, dtype=np.uint8).reshape(bh, bw, spp).astype(np.int64)
        d = a.copy()
        d[:, 1:, :] = (a[:, 1:, :] - a[:, :-1, :]) % 256
        return d.astype(np.uint8).tobytes()

    row_bytes = w * spp
    jpeg_tables: bytes | None = None
    if compression == 7:
        # r15: new-style JPEG-in-TIFF — abbreviated constant-block
        # streams + shared JPEGTables tag; raster is block-constant
        # (jpeg_tiff_block_gray), bit-exact despite the lossy codec
        if predictor != 1:
            raise ValueError("predictor does not apply to JPEG-in-TIFF")
        strips, jpeg_tables = _encode_jpeg_blocks(
            doc_id, w, h, gray, rows_per_strip, tile
        )
    elif compression == 6:
        # r16: OLD-style JPEG — one complete interchange stream of the
        # same block-constant closed form (bit-exact lossy encode),
        # wired through JPEGInterchangeFormat/Length instead of strip
        # tags (the restricted subset the decoder supports)
        from ais_data_pipeline_spark.operators.jpeg import (
            encode_jpeg_constant_blocks,
        )

        if predictor != 1 or tile is not None:
            raise ValueError("old-style JPEG fixture is full-frame only")
        nbx = (w + 7) // 8
        grays = [
            jpeg_tiff_block_gray(doc_id, bx, by, nbx)
            for by in range((h + 7) // 8)
            for bx in range(nbx)
        ]
        strips = [encode_jpeg_constant_blocks(w, h, grays, color=not gray)]
    elif compression in (2, 3, 4):
        # r15: CCITT bilevel fixture — bit (x, y) is black iff
        # synth_pixel_value(doc, y*w + x) >= 128 (a closed form SQL
        # re-derives); strips/tiles are independent coded blocks.
        # 4 = G4/T.6, 3 = G3 (2-D when t4_2d), 2 = byte-aligned MH.
        from ais_data_pipeline_spark.operators.ccitt import (
            encode_g3,
            encode_g4,
            encode_mh,
        )

        if not gray or predictor != 1:
            raise ValueError("CCITT fixture is bilevel only")
        bit_rows = [
            [1 if synth_pixel_value(doc_id, y * w + x) >= 128 else 0 for x in range(w)]
            for y in range(h)
        ]
        if tile is not None:
            if compression != 4:
                raise ValueError("tiled CCITT fixture is G4 only")
            tw, tl = tile
            across = (w + tw - 1) // tw
            down = (h + tl - 1) // tl
            strips = []
            for ty in range(down):
                for tx in range(across):
                    t_rows = [
                        [
                            bit_rows[y][x] if y < h and x < w else 0
                            for x in range(tx * tw, (tx + 1) * tw)
                        ]
                        for y in range(ty * tl, (ty + 1) * tl)
                    ]
                    strips.append(encode_g4(t_rows, tw))
        else:
            rps4 = rows_per_strip or h
            strips = []
            for r in range(0, h, rps4):
                block = bit_rows[r : min(r + rps4, h)]
                if compression == 4:
                    strips.append(encode_g4(block, w))
                elif compression == 3:
                    strips.append(encode_g3(block, w, two_d=t4_2d))
                else:
                    strips.append(encode_mh(block, w))
    elif planar == 2 and not gray:
        # r15: planar configuration 2 — SAME interleaved closed-form
        # raster, stored as three single-channel planes with
        # component-major strip/tile tables and per-plane predictor
        arr = np.array(
            [synth_pixel_value(doc_id, k) for k in range(w * h * 3)],
            dtype=np.uint8,
        ).reshape(h, w, 3)

        def plane_diff(block: "np.ndarray") -> "np.ndarray":
            d2 = block.astype(np.int64).copy()
            d2[:, 1:] = (block[:, 1:].astype(np.int64) - block[:, :-1]) % 256
            return d2.astype(np.uint8)

        strips = []
        if tile is not None:
            tw, tl = tile
            across = (w + tw - 1) // tw
            down = (h + tl - 1) // tl
            for c in range(3):
                padded = np.zeros((down * tl, across * tw), dtype=np.uint8)
                padded[:h, :w] = arr[:, :, c]
                for ty in range(down):
                    for tx in range(across):
                        t = padded[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw]
                        if predictor == 2:
                            t = plane_diff(t)
                        strips.append(t.tobytes())
        else:
            rps = rows_per_strip or h
            for c in range(3):
                plane = arr[:, :, c]
                if predictor == 2:
                    plane = plane_diff(plane)
                for r in range(0, h, rps):
                    strips.append(plane[r : min(r + rps, h), :].tobytes())
        strips = _compress_blocks(strips, compression)
    elif tile is not None:
        raster = bytes(synth_pixel_value(doc_id, k) for k in range(w * h * spp))
        tw, tl = tile
        arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, spp)
        across = (w + tw - 1) // tw
        down = (h + tl - 1) // tl
        padded = np.zeros((down * tl, across * tw, spp), dtype=np.uint8)
        padded[:h, :w, :] = arr
        strips = []
        for ty in range(down):
            for tx in range(across):
                t = padded[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw, :]
                b = t.tobytes()
                if predictor == 2:
                    b = diff(b, tw, tl)
                strips.append(b)
        strips = _compress_blocks(strips, compression)
    else:
        raster = bytes(synth_pixel_value(doc_id, k) for k in range(w * h * spp))
        if predictor == 2:
            raster = diff(raster, w, h)
        rps = rows_per_strip or h
        strips = [
            raster[r * row_bytes : min(r + rps, h) * row_bytes]
            for r in range(0, h, rps)
        ]
        strips = _compress_blocks(strips, compression)

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

    # layout: [header(8) for page 0] + IFD + extras + strips/tiles,
    # with every embedded offset measured from file start = ``base``
    # photometric: JPEG color data is YCbCr (6) per TechNote 2; G4 is
    # min-is-white bilevel (0); raster formats keep the gray/RGB codes
    if compression in (2, 3, 4):
        photometric = 0
    elif gray:
        photometric = 1
    else:
        photometric = 6 if compression in (6, 7) else 2
    tags = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [1] if compression in (2, 3, 4) else [8] * spp),
        (259, 3, [compression]),
        (262, 3, [photometric]),
        (277, 3, [spp]),
        (317, 3, [predictor]),
    ]
    if jpeg_tables is not None:
        tags += [(347, 7, list(jpeg_tables))]
    if planar == 2 and not gray:
        tags += [(284, 3, [2])]
    if compression == 3 and t4_2d:
        tags += [(292, 4, [1])]
    if tile is not None:
        tags += [(322, 4, [tile[0]]), (323, 4, [tile[1]])]
    else:
        tags += [(278, 4, [rows_per_strip or h])]
    n = len(tags) + 2  # + strip offsets + strip counts
    ifd_off = base
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
    # old-style JPEG stores its single stream via the interchange
    # tags, not the strip tables (TIFF 6.0 §22)
    if compression == 6:
        off_tag, cnt_tag = (513, 514)
    else:
        off_tag, cnt_tag = (324, 325) if tile is not None else (273, 279)
    ent, ext = entry(off_tag, 4, offs, extras_off + len(extras))
    entries.append(ent)
    extras += ext
    ent, ext = entry(cnt_tag, 4, counts, extras_off + len(extras))
    entries.append(ent)
    extras += ext
    entries.sort(key=lambda b: struct.unpack_from(e + "H", b, 0)[0])
    out = bytearray()
    out += struct.pack(e + "H", n)
    for ent in entries:
        out += ent
    out += struct.pack(e + "I", next_ifd)  # next-IFD pointer (0 = last)
    out += extras
    assert base + len(out) == strips_start, (base + len(out), strips_start)
    for s in strips:
        out += s
    return bytes(out)


def _packbits_encode(raw: bytes) -> bytes:
    """Fixture PackBits encoder: repeat runs of >= 3 as repeat packets,
    everything else as literal packets of <= 128."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        run = 1
        while i + run < n and run < 128 and raw[i + run] == raw[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, raw[i]])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 2 < n and raw[i] == raw[i + 1] == raw[i + 2])
        ):
            i += 1
        out += bytes([i - lit - 1]) + raw[lit:i]
    return bytes(out)


def _lzw_encode_tiff(raw: bytes) -> bytes:
    """Fixture TIFF-LZW encoder — dictionary build mirroring the
    decoder's early-change width schedule, MSB-first packing, CLEAR
    at start and at the 4094-entry cap, EOI at the end."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(256, width)  # CLEAR
    prev = b""
    for byte in raw:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = nxt
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        if nxt == 4094:
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        prev = bytes([byte])
    if prev:
        emit(table[prev], width)
    emit(257, width)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)
