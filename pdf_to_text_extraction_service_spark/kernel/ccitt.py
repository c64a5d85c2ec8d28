"""CCITT Group 3 / Group 4 fax codec (ITU-T T.4 / T.6), from spec.

The reference pipeline handles scanned PDFs through poppler's text
layer plus OCR escalation (internal/extractor/poppler.go:112-121,
internal/hybrid/hybrid.go:113-123); it never decodes fax images
itself.  This engine drives the needs-ocr decision from REAL pixel
content (kernel/pdfk.page_images), and CCITT Group 4 is the dominant
codec of the scanned-document class, so decoding it extends the
blank-page OCR pruning to exactly the PDFs that need OCR most.

Implements, per the public ITU-T specs:

- **T.6 (Group 4 / MMR)** decode + encode: pass / horizontal /
  vertical(±3) modes against a reference line, EOFB terminated.
- **T.4 one-dimensional (Group 3 1-D / MH)** decode: per-line
  modified-Huffman white/black run lengths, optional EOL markers.
- **T.4 two-dimensional (Group 3 2-D)** decode: EOL + tag bit
  selecting a 1-D or 2-D coded line.

PDF integration (CCITTFaxDecode, PDF 32000-1:2008 §7.4.6): ``K < 0``
selects pure 2-D (G4), ``K = 0`` pure 1-D, ``K > 0`` mixed 2-D.
``EncodedByteAlign`` restarts each coded line on a byte boundary.
``BlackIs1`` only chooses the raw *bit* representation of the
1-bit-per-pixel output; this module returns semantic black/white
directly (bool array, True = black), so the flag is irrelevant to
pixel statistics (callers mapping to 1-bit samples must apply it).
``/Decode`` inversion is likewise a caller concern.

All errors raise :class:`ValueError` (the untrusted-bytes decoder
contract shared with kernel/imgcodec.py); iteration/size budgets
bound hostile inputs.
"""

from __future__ import annotations

import numpy as np

MAX_PIXELS = 64_000_000  # same ceiling as imgcodec.MAX_PIXELS

# --- modified-Huffman run-length tables (ITU-T T.4 tables 2/3/4) ------
# code strings are MSB-first bit patterns.

_WHITE_TERM = {
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
}
_WHITE_MAKEUP = {
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
_BLACK_TERM = {
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
}
_BLACK_MAKEUP = {
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
# extended makeup codes shared by both colors (T.4 table 4)
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_EOL = "000000000001"


def _decode_table(*tables: dict[int, str]) -> dict[str, int]:
    out: dict[str, int] = {}
    for t in tables:
        for run, code in t.items():
            out[code] = run
    return out


_WHITE_DEC = _decode_table(_WHITE_TERM, _WHITE_MAKEUP, _EXT_MAKEUP)
_BLACK_DEC = _decode_table(_BLACK_TERM, _BLACK_MAKEUP, _EXT_MAKEUP)
_MAX_CODE_BITS = 14


class _BitReader:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0           # bit position, MSB-first
        self.n = len(data) * 8

    def eof(self) -> bool:
        return self.pos >= self.n

    def peek_bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("ccitt: truncated stream")
        byte = self.data[self.pos >> 3]
        return (byte >> (7 - (self.pos & 7))) & 1

    def read_bit(self) -> int:
        b = self.peek_bit()
        self.pos += 1
        return b

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def try_match(self, pattern: str) -> bool:
        """Consume ``pattern`` if the next bits equal it."""
        if self.pos + len(pattern) > self.n:
            return False
        p = self.pos
        for ch in pattern:
            byte = self.data[p >> 3]
            if ((byte >> (7 - (p & 7))) & 1) != (ch == "1"):
                return False
            p += 1
        self.pos = p
        return True


def _read_mh_run(br: _BitReader, white: bool) -> int:
    """One complete run length: zero or more makeup codes then a
    terminating code (T.4 §4.1; makeup codes may repeat for runs
    beyond 2560)."""
    table = _WHITE_DEC if white else _BLACK_DEC
    total = 0
    for _ in range(64):  # ≥64 chained makeups is hostile
        code = ""
        run = None
        for _ in range(_MAX_CODE_BITS):
            code += "1" if br.read_bit() else "0"
            run = table.get(code)
            if run is not None:
                break
        if run is None:
            raise ValueError("ccitt: bad run-length code")
        total += run
        if run < 64:  # terminating code
            return total
    raise ValueError("ccitt: runaway makeup chain")


def _transitions_to_row(trans: list[int], columns: int) -> np.ndarray:
    """Changing-element positions → bool row (True = black).  The
    color before the first transition is white."""
    row = np.zeros(columns, dtype=bool)
    for i in range(0, len(trans), 2):
        start = trans[i]
        end = trans[i + 1] if i + 1 < len(trans) else columns
        row[start:min(end, columns)] = True
    return row


def _row_to_transitions(row: np.ndarray) -> list[int]:
    d = np.flatnonzero(np.diff(
        np.concatenate(([False], row)).astype(np.int8)))
    return d.tolist()


def _decode_1d_line(br: _BitReader, columns: int) -> list[int]:
    """One MH-coded line → transition positions."""
    trans: list[int] = []
    pos = 0
    white = True
    while pos < columns:
        run = _read_mh_run(br, white)
        pos += run
        if pos > columns:
            raise ValueError("ccitt: run overflows line")
        # every run END is a color-change position — except the final
        # boundary at the line end, dropped below
        trans.append(pos)
        white = not white
    if trans and trans[-1] == columns:
        trans.pop()
    return trans


def _decode_2d_line(br: _BitReader, ref: list[int],
                    columns: int) -> list[int]:
    """One T.6/T.4-2D coded line against reference transitions."""
    cur: list[int] = []
    a0 = -1
    white = True
    guard = 0
    while a0 < columns:
        guard += 1
        if guard > 4 * columns + 64:
            raise ValueError("ccitt: runaway 2-D line")
        # locate b1/b2 on the reference line: b1 = first changing
        # element > a0 whose color change matches the current color
        # (white→black changes sit at even indices)
        i = 0
        while i < len(ref) and ref[i] <= a0:
            i += 1
        if (i & 1) != (0 if white else 1):
            i += 1
        b1 = ref[i] if i < len(ref) else columns
        b2 = ref[i + 1] if i + 1 < len(ref) else columns

        if br.try_match("0001"):            # pass mode
            a0 = b2
            continue
        if br.try_match("001"):             # horizontal mode
            start = a0 if a0 > 0 else 0
            r1 = _read_mh_run(br, white)
            r2 = _read_mh_run(br, not white)
            if start + r1 + r2 > columns:
                raise ValueError("ccitt: horizontal runs overflow")
            cur.append(start + r1)
            cur.append(start + r1 + r2)
            a0 = start + r1 + r2
            continue
        # vertical modes V0 / VR / VL
        a1 = None
        for pat, off in (("1", 0), ("011", 1), ("010", -1),
                         ("000011", 2), ("000010", -2),
                         ("0000011", 3), ("0000010", -3)):
            if br.try_match(pat):
                a1 = b1 + off
                break
        if a1 is None:
            raise ValueError("ccitt: bad 2-D mode code")
        if a1 < 0 or a1 > columns or (cur and a1 < cur[-1]):
            raise ValueError("ccitt: vertical mode out of range")
        cur.append(a1)
        a0 = a1
        white = not white
    if cur and cur[-1] == columns:
        # trailing transition at the right edge carries no pixels;
        # keep it (it is a legitimate changing element for the NEXT
        # line's b-search) — normalize by dropping only a duplicate
        if len(cur) >= 2 and cur[-2] == columns:
            cur.pop()
    return cur


def decode_g4(data: bytes, columns: int, rows: int | None = None,
              byte_align: bool = False) -> np.ndarray:
    """Group 4 (T.6) → bool array (True = black), shape (rows, cols).

    Decodes until ``rows`` lines, EOFB, or stream exhaustion (when
    ``rows`` is None the EOFB/exhaustion point defines the height).
    """
    if columns <= 0 or columns > 1 << 20:
        raise ValueError("ccitt: bad columns")
    if rows is not None and rows * columns > MAX_PIXELS:
        raise ValueError("ccitt: dimensions exceed decode budget")
    br = _BitReader(data)
    ref: list[int] = []
    out: list[np.ndarray] = []
    max_rows = rows if rows is not None else MAX_PIXELS // columns
    while len(out) < max_rows:
        if byte_align:
            br.align()
        if br.eof():
            break
        save = br.pos
        if br.try_match(_EOL):
            br.try_match(_EOL)  # EOFB = two EOLs
            break
        br.pos = save
        try:
            cur = _decode_2d_line(br, ref, columns)
        except ValueError:
            if rows is None and out:
                break  # trailing padding after the last line
            raise
        out.append(_transitions_to_row(cur, columns))
        ref = cur
    if rows is not None and len(out) < rows:
        raise ValueError("ccitt: truncated image")
    if not out:
        raise ValueError("ccitt: empty image")
    return np.vstack(out)


def decode_g3(data: bytes, columns: int, rows: int | None = None,
              two_dim: bool = False,
              byte_align: bool = False) -> np.ndarray:
    """Group 3 (T.4) → bool array.  ``two_dim`` selects K>0 mixed
    mode (EOL + tag bit per line); otherwise pure 1-D.  EOL markers
    are optional in the 1-D PDF profile (EndOfLine false) and
    mandatory in mixed mode."""
    if columns <= 0 or columns > 1 << 20:
        raise ValueError("ccitt: bad columns")
    if rows is not None and rows * columns > MAX_PIXELS:
        raise ValueError("ccitt: dimensions exceed decode budget")
    br = _BitReader(data)
    ref: list[int] = []
    out: list[np.ndarray] = []
    max_rows = rows if rows is not None else MAX_PIXELS // columns
    while len(out) < max_rows:
        if byte_align:
            br.align()
        # skip fill bits + EOL(s); remember whether we saw one
        saw_eol = False
        while True:
            save = br.pos
            if br.try_match(_EOL):
                saw_eol = True
                break
            # fill: zero bits preceding an EOL — probe cautiously
            if br.eof():
                break
            if br.peek_bit() == 0:
                # could be fill or a code starting with 0; only
                # treat as fill if a lookahead finds EOL within 64
                # zero bits
                zeros = 0
                p = br.pos
                while (p < br.n and zeros <= 64
                       and (br.data[p >> 3] >> (7 - (p & 7))) & 1 == 0):
                    p += 1
                    zeros += 1
                if zeros >= 11 and p < br.n:
                    br.pos = p - 11
                    if br.try_match(_EOL):
                        saw_eol = True
                        break
                br.pos = save
                break
            br.pos = save
            break
        if br.eof():
            break
        if two_dim:
            if not saw_eol:
                if out:
                    break
                raise ValueError("ccitt: 2-D G3 line missing EOL")
            one_d = br.read_bit() == 1
        else:
            one_d = True
        try:
            if one_d:
                cur = _decode_1d_line(br, columns)
            else:
                cur = _decode_2d_line(br, ref, columns)
        except ValueError:
            if rows is None and out:
                break
            raise
        out.append(_transitions_to_row(cur, columns))
        ref = cur
    if rows is not None and len(out) < rows:
        raise ValueError("ccitt: truncated image")
    if not out:
        raise ValueError("ccitt: empty image")
    return np.vstack(out)


def ccitt_decode(data: bytes, k: int, columns: int,
                 rows: int | None = None,
                 byte_align: bool = False) -> np.ndarray:
    """PDF CCITTFaxDecode dispatch: K<0 → G4, K=0 → G3 1-D,
    K>0 → G3 mixed 2-D (PDF 32000-1:2008 §7.4.6)."""
    if k < 0:
        return decode_g4(data, columns, rows, byte_align)
    return decode_g3(data, columns, rows, two_dim=k > 0,
                     byte_align=byte_align)


# --- encoder (fixtures / round-trip tests) ----------------------------


class _BitWriter:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: list[str] = []

    def write(self, pattern: str) -> None:
        self.bits.append(pattern)

    def align(self) -> None:
        n = sum(len(b) for b in self.bits)
        pad = (-n) % 8
        if pad:
            self.bits.append("0" * pad)

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        s += "0" * ((-len(s)) % 8)
        return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def _mh_code(run: int, white: bool) -> str:
    term = _WHITE_TERM if white else _BLACK_TERM
    makeup = _WHITE_MAKEUP if white else _BLACK_MAKEUP
    out = ""
    while run >= 64:
        m = min(2560, (run // 64) * 64)
        out += (_EXT_MAKEUP.get(m) or makeup[m]) if m > 1728 \
            else makeup[m]
        run -= m
    return out + term[run]


def encode_g4(img: np.ndarray, byte_align: bool = False) -> bytes:
    """Group 4 (T.6) encode of a bool array (True = black), EOFB
    terminated.  The fixture-side counterpart of :func:`decode_g4`."""
    a = np.ascontiguousarray(img, dtype=bool)
    if a.ndim != 2 or a.size == 0:
        raise ValueError("ccitt: encoder needs a 2-D nonempty array")
    rows, columns = a.shape
    bw = _BitWriter()
    ref: list[int] = []
    for r in range(rows):
        if byte_align:
            bw.align()
        cur = _row_to_transitions(a[r])
        a0 = -1
        white = True
        ci = 0  # index into cur of the next transition > a0
        while a0 < columns:
            while ci < len(cur) and cur[ci] <= a0:
                ci += 1
            a1 = cur[ci] if ci < len(cur) else columns
            i = 0
            while i < len(ref) and ref[i] <= a0:
                i += 1
            if (i & 1) != (0 if white else 1):
                i += 1
            b1 = ref[i] if i < len(ref) else columns
            b2 = ref[i + 1] if i + 1 < len(ref) else columns
            if b2 < a1:
                bw.write("0001")            # pass
                a0 = b2
            elif abs(a1 - b1) <= 3:         # vertical
                bw.write({0: "1", 1: "011", -1: "010", 2: "000011",
                          -2: "000010", 3: "0000011",
                          -3: "0000010"}[a1 - b1])
                a0 = a1
                white = not white
            else:                           # horizontal
                a2 = cur[ci + 1] if ci + 1 < len(cur) else columns
                start = a0 if a0 > 0 else 0
                bw.write("001")
                bw.write(_mh_code(a1 - start, white))
                bw.write(_mh_code(a2 - a1, not white))
                a0 = a2
        ref = cur
    bw.write(_EOL)
    bw.write(_EOL)
    return bw.tobytes()


def encode_g3_1d(img: np.ndarray, with_eol: bool = False,
                 byte_align: bool = False) -> bytes:
    """Group 3 1-D (MH) encode of a bool array (True = black)."""
    a = np.ascontiguousarray(img, dtype=bool)
    if a.ndim != 2 or a.size == 0:
        raise ValueError("ccitt: encoder needs a 2-D nonempty array")
    rows, columns = a.shape
    bw = _BitWriter()
    for r in range(rows):
        if byte_align:
            bw.align()
        if with_eol:
            bw.write(_EOL)
        # run boundaries: line start, every transition, line end.  A
        # row starting black yields a leading zero-length white run —
        # the mandatory T.4 convention (lines always start white).
        bounds = [0] + _row_to_transitions(a[r]) + [columns]
        white = True
        for i in range(len(bounds) - 1):
            bw.write(_mh_code(bounds[i + 1] - bounds[i], white))
            white = not white
    return bw.tobytes()
