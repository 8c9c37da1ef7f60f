"""Pure-stdlib GIF decoder (87a/89a) — the image tier's LZW rung.

Round-12 widening: GIF is the remaining web-crawl staple without a
native decode (PPM/BMP/PNG/JPEG all decode in-engine). Scope is the
STILL-image contract a training-data pipeline needs: the FIRST
frame's RENDER, decoded through the real variable-width LZW
(clear/EOI codes, code-table growth to 12 bits), global/local color
tables, and the 4-pass GIF interlace. Round 13 adds first-frame
COMPOSITING — a partial frame blits onto a background-filled canvas
and a GCE transparent index leaves the canvas showing — which is all
a single-frame render needs (disposal methods only affect later
frames), so no GIF raises NotImplementedError anymore. Multi-frame
ANIMATION playback stays out of scope: that is player work, not
corpus-decode work.

Layouts from the public GIF89a specification: header + logical screen
descriptor, 0x21 extension blocks (skipped via their sub-block chain;
0xF9 Graphic Control parsed for the transparency flag/index),
0x2C image descriptor (+ local color table, interlace flag), LZW
minimum code size byte, data sub-blocks.

Reference parity: the reference pipeline has no image handling; this
module is part of the mandated LLM-data-pipeline multimodal tier.
"""

from __future__ import annotations

import struct

#: row order of the four GIF interlace passes: (start, step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """GIF-flavor LZW: variable-width codes packed LSB-first, CLEAR
    resets the table, EOI ends the stream; the code width grows when
    the table reaches 2^width (capped at 12 bits until the next
    CLEAR). Returns exactly ``n_pixels`` indices or raises."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh_table() -> list[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh_table()
    width = min_code_size + 1
    out: list[int] = []
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated before EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = fresh_table()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW first code after clear is undefined")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK special case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code beyond table end")
        out.extend(entry)
        if len(out) > n_pixels:
            raise ValueError("LZW output exceeds the image's pixel count")
        prev = entry
        # width grows when the NEXT appended code would not fit; the
        # 12-bit cap freezes the table until a CLEAR
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) != n_pixels:
        raise ValueError("LZW output shorter than the image's pixel count")
    return out


def parse_gif(data: bytes):
    """GIF bytes → HxWx3 uint8 RGB array of the FIRST frame's render.
    Real decoder: 87a/89a header, logical screen descriptor, global /
    local color tables, variable-width LZW, 4-pass interlace, and
    (round 13) first-frame COMPOSITING: a frame smaller than the
    logical screen blits onto a canvas pre-filled with the screen
    descriptor's background color (black when there is no GCT or the
    index is out of range — the common renderer fallback), and a
    Graphic Control Extension's transparent index leaves the canvas
    showing through (spec §23). Disposal methods only affect frames
    AFTER the one rendered, so the first-frame contract needs no
    inter-frame state; nothing in a GIF raises NotImplementedError
    anymore."""
    import numpy as np

    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    if sw == 0 or sh == 0:
        raise ValueError("GIF with zero-sized logical screen")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(data):
                raise ValueError("truncated GIF sub-block chain")
            size = data[p]
            p += 1
            if size == 0:
                return p
            p += size

    transparent = None  # index from the frame's preceding GCE, if any
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            if pos + 2 > len(data):
                raise ValueError("truncated GIF extension")
            if data[pos + 1] == 0xF9:  # Graphic Control Extension
                # fixed 4-byte body: packed, delay(2), transparent idx
                if pos + 7 > len(data) or data[pos + 2] != 4:
                    raise ValueError("malformed GIF graphic control extension")
                if data[pos + 3] & 0x01:  # transparent color flag
                    transparent = data[pos + 6]
            pos = skip_subblocks(pos + 2)
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                raise ValueError("truncated GIF image descriptor")
            x0, y0, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            lct = None
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                lct = data[pos : pos + 3 * n]
                if len(lct) != 3 * n:
                    raise ValueError("truncated GIF local color table")
                pos += 3 * n
            if w == 0 or h == 0:
                raise ValueError("GIF with zero-sized image")
            if x0 + w > sw or y0 + h > sh:
                raise ValueError("GIF frame exceeds the logical screen")
            palette = lct if lct is not None else gct
            if palette is None:
                raise ValueError("GIF image has no color table")
            if pos >= len(data):
                raise ValueError("truncated GIF image data")
            min_code_size = data[pos]
            pos += 1
            lzw = bytearray()
            while True:
                if pos >= len(data):
                    raise ValueError("truncated GIF sub-block chain")
                size = data[pos]
                pos += 1
                if size == 0:
                    break
                if len(data) < pos + size:
                    raise ValueError("truncated GIF sub-block chain")
                lzw += data[pos : pos + size]
                pos += size
            idx = _lzw_decode(bytes(lzw), min_code_size, w * h)
            pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
            arr = np.asarray(idx, dtype=np.int64)
            if int(arr.max(initial=0)) >= pal.shape[0]:
                raise ValueError("GIF pixel index out of color-table range")
            rows = arr.reshape(h, w)
            if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
                out = np.zeros((h, w), dtype=np.int64)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    n_rows = len(range(start, h, step))
                    out[start::step] = rows[src : src + n_rows]
                    src += n_rows
                rows = out
            frame = pal[rows]
            full = (x0, y0, w, h) == (0, 0, sw, sh)
            if full and transparent is None:
                return frame  # the still-image fast path: no canvas
            # canvas fill: background color from the SCREEN descriptor's
            # index into the GLOBAL table; black when absent/out-of-range
            canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
            if gct is not None and 3 * bg + 3 <= len(gct):
                canvas[:, :] = np.frombuffer(
                    gct[3 * bg : 3 * bg + 3], dtype=np.uint8
                )
            if transparent is None:
                canvas[y0 : y0 + h, x0 : x0 + w] = frame
            else:
                opaque = rows != transparent
                canvas[y0 : y0 + h, x0 : x0 + w][opaque] = frame[opaque]
            return canvas
        elif block == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image frame")
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF ended without a trailer or image")


# ---------------------------------------------------------------------------
# fixture encoder (real LZW — a SQL oracle / pytest re-derives the raster)
# ---------------------------------------------------------------------------


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Real GIF LZW encoder (dictionary build, CLEAR on table
    overflow, LSB-first variable-width packing) — exists so fixtures
    exercise genuine multi-width streams, not just literal codes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for ix in indices:
        cur = prev + bytes([ix])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([ix])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    indices, palette: bytes, w: int, h: int, interlace: bool = False,
    version: bytes = b"GIF89a",
) -> bytes:
    """Fixture GIF writer: logical screen + global color table + an
    optional comment extension (sub-block skipping is exercised in the
    decode path) + one full-screen image through the real LZW encoder,
    interlaced on request."""
    import numpy as np

    n_colors = len(palette) // 3
    depth = max(1, (n_colors - 1).bit_length())
    padded = palette + b"\x00" * (3 * ((1 << depth) - n_colors))
    out = bytearray(version)
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += padded
    out += b"\x21\xfe\x07fixture\x00"  # comment extension, 7-byte sub-block
    ipacked = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    arr = np.asarray(indices, dtype=np.int64).reshape(h, w)
    if interlace:  # rows are STORED in pass order
        arr = np.concatenate(
            [arr[start::step] for start, step in _INTERLACE_PASSES]
        )
    min_code_size = max(2, depth)
    out.append(min_code_size)
    lzw = _lzw_encode([int(i) for i in arr.reshape(-1)], min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
