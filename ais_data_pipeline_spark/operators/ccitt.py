"""CCITT fax codecs (ITU-T T.4 / T.6) — pure stdlib.

The full bilevel scanned-document family TIFF wraps:

- **Group 4 / T.6 MMR** (TIFF compression 4): every row coded 2-D
  against the row above (an imaginary all-white row above row 0)
  using three modes — VERTICAL (a1 within ±3 of the reference change
  b1), HORIZONTAL (two T.4 modified-Huffman run lengths), and PASS
  (reference runs with no counterpart on the coding line) — no EOLs,
  optional EOFB.
- **Group 3 / T.4** (compression 3): an EOL (with fill tolerance)
  frames every row; 2-D mode (T4Options bit 0) adds a tag bit per
  EOL selecting 1-D MH or 2-D MMR against the previous row.
- **Modified Huffman** (compression 2): pure 1-D runs, each row
  starting on a byte boundary, no EOLs (TIFF 6.0 §10).

Implemented from the public ITU-T T.4 §2.4.1/2.4.2 code tables
(terminating + makeup + shared extended makeup codes) and the T.6
§2.2 coding procedure. Both directions ship: ``decode_g4`` for the
TIFF strip path and ``encode_g4`` as the fixture twin, with the
mode/run codes additionally pinned against hand-assembled spec
vectors in pytest (a shared-table typo cannot hide behind the
roundtrip). Bit order is MSB-first (TIFF FillOrder 1, the default);
uncompressed-mode extension codes (T.6 §2.2.4 / T6Options bit 1) are
out of scope and raise.

Reference parity: the reference pipeline has no image handling; this
module extends the LLM-data-pipeline multimodal tier (document-scan
corpora are overwhelmingly G4-in-TIFF).
"""

from __future__ import annotations

#: T.4 white run codes: run length -> bit string (terminating 0..63,
#: then makeup 64..1728).
_WHITE_CODES: dict[int, str] = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011",
    14: "110100", 15: "110101", 16: "101010", 17: "101011",
    18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011",
    26: "0010011", 27: "0100100", 28: "0011000", 29: "00000010",
    30: "00000011", 31: "00011010", 32: "00011011", 33: "00010010",
    34: "00010011", 35: "00010100", 36: "00010101", 37: "00010110",
    38: "00010111", 39: "00101000", 40: "00101001", 41: "00101010",
    42: "00101011", 43: "00101100", 44: "00101101", 45: "00000100",
    46: "00000101", 47: "00001010", 48: "00001011", 49: "01010010",
    50: "01010011", 51: "01010100", 52: "01010101", 53: "00100100",
    54: "00100101", 55: "01011000", 56: "01011001", 57: "01011010",
    58: "01011011", 59: "01001010", 60: "01001011", 61: "00110010",
    62: "00110011", 63: "00110100",
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100",
    512: "01100101", 576: "01101000", 640: "01100111",
    704: "011001100", 768: "011001101", 832: "011010010",
    896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}

#: T.4 black run codes (terminating 0..63, makeup 64..1728).
_BLACK_CODES: dict[int, str] = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101",
    1152: "0000001110110", 1216: "0000001110111",
    1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101",
    1536: "0000001011010", 1600: "0000001011011",
    1664: "0000001100100", 1728: "0000001100101",
}

#: Shared extended makeup codes, both colors (T.4 §2.4.2, 1792..2560).
_EXT_MAKEUP: dict[int, str] = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

#: T.6 mode codes.
_MODE_V0 = "1"
_MODE_VR = {1: "011", 2: "000011", 3: "0000011"}
_MODE_VL = {1: "010", 2: "000010", 3: "0000010"}
_MODE_H = "001"
_MODE_PASS = "0001"
_EOL = "000000000001"


def _invert(codes: dict[int, str]) -> dict[str, int]:
    return {v: k for k, v in codes.items()}

_WHITE_DECODE = _invert(_WHITE_CODES) | _invert(_EXT_MAKEUP)
_BLACK_DECODE = _invert(_BLACK_CODES) | _invert(_EXT_MAKEUP)
_MAX_CODE_LEN = 13


class _BitReader:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("truncated G4 stream")
        bit = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def peek_bits(self, n: int) -> str:
        out = []
        p = self.pos
        for _ in range(n):
            byte = p >> 3
            if byte >= len(self.data):
                break
            out.append(str((self.data[byte] >> (7 - (p & 7))) & 1))
            p += 1
        return "".join(out)


def _read_mode(br: _BitReader) -> str:
    """Decode one T.6 mode code. Prefix-free over
    {1, 011, 010, 001, 0001, 000011, 000010, 0000011, 0000010,
    0000001..., 000000000001(EOL)}."""
    bits = ""
    for _ in range(12):
        bits += str(br.read_bit())
        if bits == _MODE_V0:
            return "v0"
        if bits == _MODE_H:
            return "h"
        if bits == _MODE_PASS:
            return "pass"
        if bits in ("011", "010"):
            return "vr1" if bits == "011" else "vl1"
        if bits in ("000011", "000010"):
            return "vr2" if bits == "000011" else "vl2"
        if bits in ("0000011", "0000010"):
            return "vr3" if bits == "0000011" else "vl3"
        if bits == "0000001":
            raise NotImplementedError(
                "G4 uncompressed-mode extension (T.6 2.2.4) not supported"
            )
        if bits == _EOL:
            return "eol"
    raise ValueError(f"bad G4 mode code {bits!r}")


def _read_run(br: _BitReader, white: bool) -> int:
    """One complete run length: zero or more makeup codes + one
    terminating code (T.4: a run >= 64 is coded makeup + terminating;
    runs >= 2624 chain extended makeup codes)."""
    table = _WHITE_DECODE if white else _BLACK_DECODE
    total = 0
    while True:
        bits = ""
        val = None
        for _ in range(_MAX_CODE_LEN):
            bits += str(br.read_bit())
            if bits in table:
                val = table[bits]
                break
        if val is None:
            raise ValueError(f"bad G4 {'white' if white else 'black'} run code {bits!r}")
        total += val
        if val < 64:  # terminating code ends the run
            return total


def _row_changes(bits: list[int]) -> list[int]:
    """Positions where the row's color changes (pixel differs from the
    one before; the row starts imaginary-white)."""
    changes = []
    prev = 0
    for x, b in enumerate(bits):
        if b != prev:
            changes.append(x)
            prev = b
    return changes


def _b1_b2(ref: list[int], a0: int, color: int) -> tuple[int, int, int]:
    """(b1, b2, index of b1): b1 is the first changing element on the
    reference line strictly right of a0 whose color is OPPOSITE a0's
    color; changes at even index are white->black (black), odd are
    black->white (white). b2 is the next change after b1."""
    # need a change to color (1 - color): to-black changes are even idx
    j = 0
    n = len(ref)
    while j < n and ref[j] <= a0:
        j += 1
    # parity: change j flips TO black if j even, TO white if j odd.
    # We need the first change > a0 flipping to the opposite of the
    # current coding color.
    want_parity = 0 if color == 0 else 1  # to-black if coding white
    if (j & 1) != want_parity:
        j += 1
    b1 = ref[j] if j < n else -1
    b2 = ref[j + 1] if j + 1 < n else -1
    return b1, b2, j


def _bits_and_changes(raw_changes: list[int], w: int) -> "tuple[object, list[int]]":
    """(row bits as a numpy uint8 array, NORMALIZED sorted change
    positions) from the decoded transition list. Numpy XOR-accumulate
    instead of a per-pixel Python loop (r15 fuzz finding: a corrupt
    huge-width tag under the byte cap made the O(w) Python fill burn
    seconds per row); duplicate transitions cancel, out-of-range ones
    drop, and the normalized changes feed the next row's reference
    directly — no O(w) re-scan. The row stays an ndarray end-to-end
    (r16 ADVICE finding: ``.tolist()`` rows cost ~8 bytes/pixel in
    Python int lists, letting a crafted under-cap stream allocate ~8×
    the 512 MiB raster cap the byte check intends to enforce)."""
    import numpy as np

    row = np.zeros(w, dtype=np.uint8)
    for c in raw_changes:
        if 0 <= c < w:
            row[c] ^= 1
    bits = np.bitwise_xor.accumulate(row)
    changes = np.flatnonzero(np.diff(bits, prepend=np.uint8(0))).tolist()
    return bits, changes


def _decode_2d_row(br: _BitReader, ref: list[int], w: int) -> "tuple[object, list[int]]":
    """One 2-D (MMR) coded row against reference changes ``ref`` —
    shared by G4 and 2-D-coded G3 rows. Returns the row's
    (bits, normalized change positions)."""
    cur: list[int] = []
    a0 = -1
    color = 0
    while True:
        if a0 >= w:
            raise ValueError("2-D row overruns the image width")
        mode = _read_mode(br)
        if mode == "eol":
            raise ValueError("unexpected EOL inside a 2-D coded row")
        b1, b2, _j = _b1_b2(ref, a0, color)
        if b1 < 0:
            b1 = w
        if b2 < 0:
            b2 = w
        if mode == "pass":
            a0 = b2  # color unchanged, no transition recorded
        elif mode == "h":
            r1 = _read_run(br, white=color == 0)
            r2 = _read_run(br, white=color != 0)
            start = 0 if a0 < 0 else a0
            a1 = start + r1
            a2 = a1 + r2
            if a2 > w or a1 > w:
                raise ValueError("horizontal runs overrun the row")
            cur.append(a1)
            cur.append(a2)
            a0 = a2
        else:
            dv = {"v0": 0, "vr1": 1, "vr2": 2, "vr3": 3,
                  "vl1": -1, "vl2": -2, "vl3": -3}[mode]
            a1 = b1 + dv
            if a1 < 0 or a1 > w:
                raise ValueError("vertical mode lands outside the row")
            cur.append(a1)
            a0 = a1
            color ^= 1
        if a0 >= w:
            break
    return _bits_and_changes(cur, w)


def _decode_mh_row(br: _BitReader, w: int) -> "tuple[object, list[int]]":
    """One T.4 1-D modified-Huffman row: alternating white/black run
    lengths starting white, totalling exactly ``w``. Returns
    (bits, normalized changes), like ``_decode_2d_row``."""
    total = 0
    white = True
    changes: list[int] = []
    while total < w:
        run = _read_run(br, white=white)
        total += run
        if total > w:
            raise ValueError("MH runs overrun the row")
        changes.append(total)
        white = not white
    return _bits_and_changes(changes, w)


def _stack_rows(rows: list, w: int) -> "object":
    """Row arrays -> one (h, w) uint8 ndarray — exactly 1 byte/pixel,
    so the TIFF layer's byte-count raster cap is the real bound."""
    import numpy as np

    if not rows:
        return np.zeros((0, w), dtype=np.uint8)
    return np.vstack(rows)


def decode_g4(data: bytes, w: int, h: int) -> "object":
    """G4 stream -> (h, w) uint8 ndarray of bits (1 = black).
    Tolerates (and stops at) a trailing EOFB; raises on truncation,
    overruns, or the unsupported uncompressed extension."""
    br = _BitReader(data)
    rows: list = []
    ref: list[int] = []  # imaginary all-white reference row: no changes
    for _y in range(h):
        bits, ref = _decode_2d_row(br, ref, w)
        rows.append(bits)
    return _stack_rows(rows, w)


def decode_mh(data: bytes, w: int, h: int) -> "object":
    """TIFF compression 2 (pure 1-D modified Huffman, no EOLs): each
    row's code words start on a BYTE boundary (TIFF 6.0 §10).
    Returns an (h, w) uint8 ndarray (1 = black)."""
    br = _BitReader(data)
    rows: list = []
    for _y in range(h):
        br.pos = (br.pos + 7) & ~7  # byte-align per row
        rows.append(_decode_mh_row(br, w)[0])
    return _stack_rows(rows, w)


def _expect_eol(br: _BitReader) -> None:
    """Consume fill zeros + one EOL (eleven+ 0s then a 1)."""
    zeros = 0
    while True:
        bit = br.read_bit()
        if bit == 1:
            if zeros < 11:
                raise ValueError("G3 EOL expected")
            return
        zeros += 1
        if zeros > 64 + 11:
            raise ValueError("G3 fill run too long")


def decode_g3(data: bytes, w: int, h: int, two_d: bool = False) -> "object":
    """TIFF compression 3 (Group 3 / T.4): an EOL precedes every row
    (fill bits tolerated); with ``two_d`` (T4Options bit 0) each EOL
    carries a tag bit — 1 = the next row is 1-D MH, 0 = 2-D coded
    against the previous row. Returns an (h, w) uint8 ndarray."""
    br = _BitReader(data)
    rows: list = []
    ref: list[int] = []
    for _y in range(h):
        _expect_eol(br)
        one_d = True
        if two_d:
            one_d = br.read_bit() == 1
        if one_d:
            bits, ref = _decode_mh_row(br, w)
        else:
            if not rows:
                raise ValueError("2-D G3 row with no reference row")
            bits, ref = _decode_2d_row(br, ref, w)
        rows.append(bits)
    return _stack_rows(rows, w)


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[str] = []
        self.n_bits = 0  # running length: encode_mh byte-aligns per row

    def write(self, s: str) -> None:
        self.bits.append(s)
        self.n_bits += len(s)

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        pad = (-len(s)) % 8
        s += "0" * pad
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _write_run(bw: _BitWriter, run: int, white: bool) -> None:
    table = _WHITE_CODES if white else _BLACK_CODES
    while run >= 2624:
        bw.write(_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        if run >= 1792:
            makeup = (run // 64) * 64
            if makeup > 2560:
                makeup = 2560
            src = _EXT_MAKEUP if makeup >= 1792 else table
            bw.write(src[makeup])
            run -= makeup
        else:
            makeup = (run // 64) * 64
            bw.write(table[makeup])
            run -= makeup
    bw.write(table[run])


def _encode_2d_row(bw: _BitWriter, cur: list[int], ref: list[int], w: int) -> None:
    """One 2-D (MMR) row against reference changes ``ref`` (standard
    T.6 coding decisions: pass when b2 < a1, vertical when
    |a1 - b1| <= 3, else horizontal)."""
    a0 = -1
    color = 0
    ci = 0  # index into cur of the next change > a0
    while a0 < w:
        b1, b2, _j = _b1_b2(ref, a0, color)
        if b1 < 0:
            b1 = w
        if b2 < 0:
            b2 = w
        a1 = cur[ci] if ci < len(cur) else w
        if b2 < a1:
            bw.write(_MODE_PASS)
            a0 = b2
            continue
        d = a1 - b1
        if -3 <= d <= 3:
            if d == 0:
                bw.write(_MODE_V0)
            elif d > 0:
                bw.write(_MODE_VR[d])
            else:
                bw.write(_MODE_VL[-d])
            a0 = a1
            color ^= 1
            ci += 1
        else:
            a2 = cur[ci + 1] if ci + 1 < len(cur) else w
            bw.write(_MODE_H)
            start = 0 if a0 < 0 else a0
            _write_run(bw, a1 - start, white=color == 0)
            _write_run(bw, a2 - a1, white=color != 0)
            a0 = a2
            ci += 2


def _encode_mh_row(bw: _BitWriter, cur: list[int], w: int) -> None:
    """One T.4 1-D row: alternating white/black runs starting white
    (a leading black pixel codes as white run 0)."""
    prev = 0
    white = True
    for c in [*cur, w]:
        _write_run(bw, c - prev, white=white)
        prev = c
        white = not white
        if prev == w:
            break


def encode_g4(rows: "list[list[int]]", w: int, with_eofb: bool = True) -> bytes:
    """Rows of w bits (1 = black) -> G4 stream (the fixture twin of
    ``decode_g4``)."""
    bw = _BitWriter()
    ref: list[int] = []
    for bits in rows:
        if len(bits) != w:
            raise ValueError("row width mismatch")
        cur = _row_changes(bits)
        _encode_2d_row(bw, cur, ref, w)
        ref = cur
    if with_eofb:
        bw.write(_EOL)
        bw.write(_EOL)
    return bw.tobytes()


def encode_mh(rows: "list[list[int]]", w: int) -> bytes:
    """TIFF compression-2 fixture twin: 1-D MH rows, each starting on
    a byte boundary."""
    bw = _BitWriter()
    for bits in rows:
        if len(bits) != w:
            raise ValueError("row width mismatch")
        # byte-align the row start (pad the previous row with zeros);
        # the running counter keeps this O(1) per row (a per-row
        # re-sum was quadratic on tall images)
        pad = (-bw.n_bits) % 8
        if pad:
            bw.write("0" * pad)
        _encode_mh_row(bw, _row_changes(bits), w)
    return bw.tobytes()


def encode_g3(rows: "list[list[int]]", w: int, two_d: bool = False, k: int = 4) -> bytes:
    """TIFF compression-3 fixture twin: EOL before every row; with
    ``two_d``, the tag bit selects 1-D for every ``k``-th row (and
    row 0) and 2-D against the previous row otherwise — the standard
    G3 K-factor shape."""
    bw = _BitWriter()
    ref: list[int] = []
    for y, bits in enumerate(rows):
        if len(bits) != w:
            raise ValueError("row width mismatch")
        cur = _row_changes(bits)
        bw.write(_EOL)
        if two_d:
            one_d = y % max(k, 1) == 0
            bw.write("1" if one_d else "0")
        else:
            one_d = True
        if one_d:
            _encode_mh_row(bw, cur, w)
        else:
            _encode_2d_row(bw, cur, ref, w)
        ref = cur
    return bw.tobytes()
