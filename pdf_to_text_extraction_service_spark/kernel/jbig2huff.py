"""JBIG2 Huffman-coded variants (ITU-T T.88 Annex B + 6.5.9/7.4.3).

Extends kernel/jbig2.py with the OTHER production encoder shape:
Huffman symbol dictionaries and text regions (SDHUFF=1 / SBHUFF=1).
The reference pipeline sees these inside scanned PDFs exactly like
the arithmetic form (it shells the whole page to poppler —
internal/extractor/poppler.go); here they decode from spec so the
pixel-driven needs-ocr pruning covers them too.

Everything STRUCTURAL is implemented in full from the published
spec text:

- Annex B.3 canonical prefix-code assignment over table lines
  (normal / 32-bit lower-range / 32-bit upper-range / OOB),
- custom Huffman TABLE SEGMENTS (type 53, Annex B.2: HTPS/HTRS
  field widths, [HTLOW, HTHIGH) line synthesis, lower/upper/OOB),
- runcode-coded symbol-ID code lengths (7.4.3.1.7: 35 runcodes of
  5 raw bits each; 32 repeat-prev 2+3, 33 repeat-zero 3+3,
  34 repeat-zero 7+11; byte-aligned afterwards),
- Huffman height classes with collective bitmaps (6.5.9): BMSIZE=0
  row-padded raw bitmaps or MMR (T.6 through kernel/ccitt.py),
  EXFLAGS runs over standard Table B.1,
- the Huffman text-region value reads (FS/DS/DT tables, raw
  ceil(log2(SBSTRIPS)) CURT bits).

Standard-table boundary (documented, honest): this sandbox has no
network and no copy of T.88, so only standard tables whose rows I
can re-derive with full confidence ship: **B.1-B.5** (each is
verified self-consistent — the recalled rows form a COMPLETE
canonical prefix tree, see tests).  Selections of B.6-B.15 raise
ValueError → callers fall back to size-only needs-ocr, exactly the
out-of-subset contract the arithmetic path uses for refinement
coding.  Custom-table streams (selection 3) are fully supported, so
the machinery is exercised end-to-end without those constants.

All errors raise ValueError (untrusted-bytes contract).
"""

from __future__ import annotations

import struct

import numpy as np

OOB = object()          # distinct sentinel (module-local)

LOWER, UPPER = -1, -2   # rangelen markers for the 32-bit range lines


class HBitReader:
    """MSB-first bit reader over a bytes payload."""

    __slots__ = ("data", "pos", "bitpos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bitpos = 0

    def bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("jbig2: huffman bit stream exhausted")
        b = (self.data[self.pos] >> (7 - self.bitpos)) & 1
        self.bitpos += 1
        if self.bitpos == 8:
            self.bitpos = 0
            self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.pos += 1


class HBitWriter:
    """MSB-first bit writer (fixture encoders)."""

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def bit(self, b: int) -> None:
        self.cur = (self.cur << 1) | (b & 1)
        self.nbits += 1
        if self.nbits == 8:
            self.out.append(self.cur)
            self.cur = 0
            self.nbits = 0

    def bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def align(self) -> None:
        while self.nbits:
            self.bit(0)

    def payload(self) -> bytes:
        self.align()
        return bytes(self.out)


class HuffTable:
    """One Huffman table: ``lines`` = [(preflen, rangelen, low)]
    where rangelen LOWER/UPPER mark the 32-bit range lines (value =
    low - offset for LOWER, low + offset for UPPER) and ``oob_len``
    is the OOB prefix length (0 = no OOB).  Prefix codes are
    assigned canonically per Annex B.3: shorter lengths first, table
    order within a length."""

    def __init__(self, lines, oob_len: int = 0):
        self.lines = list(lines)
        self.oob_len = oob_len
        entries = [(pl, i) for i, (pl, _rl, _lo)
                   in enumerate(self.lines) if pl > 0]
        if oob_len:
            entries.append((oob_len, -1))
        if not entries:
            raise ValueError("jbig2: empty huffman table")
        maxlen = max(pl for pl, _ in entries)
        if maxlen > 32:
            raise ValueError("jbig2: huffman prefix too long")
        cnt = [0] * (maxlen + 1)
        for pl, _ in entries:
            cnt[pl] += 1
        first = [0] * (maxlen + 2)
        for ln in range(1, maxlen + 1):
            first[ln + 1] = (first[ln] + cnt[ln]) << 1
        nxt = list(first)
        self.codes: dict[tuple[int, int], int] = {}
        self.enc: dict[int, tuple[int, int]] = {}
        for pl, idx in entries:          # table order within a length
            code = nxt[pl]
            if code >= (1 << pl):
                raise ValueError("jbig2: over-full huffman table")
            self.codes[(pl, code)] = idx
            self.enc[idx] = (pl, code)
            nxt[pl] += 1

    def read(self, r: HBitReader):
        """Decode one value (int or the module OOB sentinel)."""
        length = 0
        code = 0
        while True:
            code = (code << 1) | r.bit()
            length += 1
            if length > 32:
                raise ValueError("jbig2: bad huffman code")
            idx = self.codes.get((length, code))
            if idx is None:
                continue
            if idx == -1:
                return OOB
            pl, rl, lo = self.lines[idx]
            if rl == LOWER:
                return lo - r.bits(32)
            if rl == UPPER:
                return lo + r.bits(32)
            return lo + r.bits(rl)

    # ---- fixture-encoder side
    def write(self, w: HBitWriter, value) -> None:
        if value is OOB:
            if not self.oob_len:
                raise ValueError("jbig2: table has no OOB")
            pl, code = self.enc[-1]
            w.bits(code, pl)
            return
        for idx, (pl, rl, lo) in enumerate(self.lines):
            if pl <= 0:
                continue
            if rl == LOWER:
                if value <= lo:
                    epl, code = self.enc[idx]
                    w.bits(code, epl)
                    w.bits(lo - value, 32)
                    return
            elif rl == UPPER:
                if value >= lo:
                    epl, code = self.enc[idx]
                    w.bits(code, epl)
                    w.bits(value - lo, 32)
                    return
            elif lo <= value < lo + (1 << rl):
                epl, code = self.enc[idx]
                w.bits(code, epl)
                w.bits(value - lo, rl)
                return
        raise ValueError("jbig2: value %r not encodable" % (value,))


# ---- standard tables (T.88 Annex B) within the offline-verifiable
# subset.  Each is a complete canonical prefix tree (tested), which
# independently corroborates the recalled rows.
STANDARD_TABLES: dict[int, HuffTable] = {
    1: HuffTable([(1, 4, 0), (2, 8, 16), (3, 16, 272),
                  (3, UPPER, 65808)]),
    2: HuffTable([(1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3),
                  (5, 6, 11), (6, UPPER, 75)], oob_len=6),
    3: HuffTable([(8, 8, -256), (1, 0, 0), (2, 0, 1), (3, 0, 2),
                  (4, 3, 3), (5, 6, 11), (8, LOWER, -257),
                  (7, UPPER, 75)], oob_len=6),
    4: HuffTable([(1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 3, 4),
                  (5, 6, 12), (5, UPPER, 76)]),
    5: HuffTable([(7, 8, -255), (1, 0, 1), (2, 0, 2), (3, 0, 3),
                  (4, 3, 4), (5, 6, 12), (7, LOWER, -256),
                  (6, UPPER, 76)]),
}


def std_table(n: int) -> HuffTable:
    t = STANDARD_TABLES.get(n)
    if t is None:
        raise ValueError(
            "jbig2: standard huffman table B.%d outside the "
            "offline-verified subset" % n)
    return t


# ------------------------------------------ table segments (B.2)
def parse_table_segment(payload: bytes) -> HuffTable:
    """Custom Huffman table segment (type 53) → HuffTable."""
    if len(payload) < 9:
        raise ValueError("jbig2: truncated table segment")
    flags = payload[0]
    htoob = flags & 1
    htps = ((flags >> 1) & 7) + 1
    htrs = ((flags >> 4) & 7) + 1
    htlow, hthigh = struct.unpack(">ii", payload[1:9])
    if hthigh <= htlow:
        raise ValueError("jbig2: bad table range")
    r = HBitReader(payload, 9)
    lines = []
    cur = htlow
    guard = 0
    while cur < hthigh:
        guard += 1
        if guard > 1 << 12:
            raise ValueError("jbig2: table line runaway")
        pl = r.bits(htps)
        rl = r.bits(htrs)
        if rl > 31:
            raise ValueError("jbig2: table range length too wide")
        lines.append((pl, rl, cur))
        cur += 1 << rl
    lines.append((r.bits(htps), LOWER, htlow - 1))
    lines.append((r.bits(htps), UPPER, hthigh))
    oob_len = r.bits(htps) if htoob else 0
    return HuffTable(lines, oob_len=oob_len)


def encode_table_segment(lines, htlow: int, hthigh: int,
                         lower_len: int, upper_len: int,
                         oob_len: int = 0,
                         htps: int = 6, htrs: int = 6) -> bytes:
    """Fixture encoder: serialize the (preflen, rangelen) line list
    covering [htlow, hthigh) into a type-53 payload."""
    w = HBitWriter()
    cur = htlow
    body = bytearray()
    body.append((int(bool(oob_len)))
                | ((htps - 1) << 1) | ((htrs - 1) << 4))
    body += struct.pack(">ii", htlow, hthigh)
    for pl, rl in lines:
        w.bits(pl, htps)
        w.bits(rl, htrs)
        cur += 1 << rl
    if cur != hthigh:
        raise ValueError("jbig2: table lines do not cover range")
    w.bits(lower_len, htps)
    w.bits(upper_len, htps)
    if oob_len:
        w.bits(oob_len, htps)
    return bytes(body) + w.payload()


def table_from_spec(lines, htlow: int, hthigh: int,
                    lower_len: int, upper_len: int,
                    oob_len: int = 0) -> HuffTable:
    """Build the HuffTable an encode_table_segment() call produces
    (encoder-side mirror of parse_table_segment)."""
    full = []
    cur = htlow
    for pl, rl in lines:
        full.append((pl, rl, cur))
        cur += 1 << rl
    full.append((lower_len, LOWER, htlow - 1))
    full.append((upper_len, UPPER, hthigh))
    return HuffTable(full, oob_len=oob_len)


# ------------------------------- symbol-ID runcodes (7.4.3.1.7)
def read_symbol_id_lengths(r: HBitReader, nsyms: int) -> list[int]:
    """Decode the runcode-coded symbol-ID code lengths, then
    byte-align (7.4.3.1.7)."""
    runlens = [r.bits(5) for _ in range(35)]
    runtab = HuffTable([(pl, 0, i) for i, pl in enumerate(runlens)])
    lengths: list[int] = []
    prev = 0
    guard = 0
    while len(lengths) < nsyms:
        guard += 1
        if guard > 2 * nsyms + 35:
            raise ValueError("jbig2: runcode runaway")
        c = runtab.read(r)
        if c < 32:
            lengths.append(c)
            prev = c
        elif c == 32:
            lengths.extend([prev] * (3 + r.bits(2)))
        elif c == 33:
            lengths.extend([0] * (3 + r.bits(3)))
        else:
            lengths.extend([0] * (11 + r.bits(7)))
    if len(lengths) != nsyms:
        raise ValueError("jbig2: runcode length overflow")
    r.align()
    return lengths


def write_symbol_id_lengths(w: HBitWriter, lengths: list[int]) \
        -> None:
    """Fixture mirror of :func:`read_symbol_id_lengths`: give every
    USED length a 1..5-bit runcode and emit one code per symbol."""
    used = sorted(set(lengths))
    if len(used) > 31 or (used and used[-1] > 31):
        raise ValueError("jbig2: too many distinct lengths")
    width = max(1, (len(used) - 1).bit_length()) if len(used) > 1 \
        else 1
    runlens = [0] * 35
    for ln in used:
        runlens[ln] = width
    for v in runlens:
        w.bits(v, 5)
    runtab = HuffTable([(pl, 0, i) for i, pl in enumerate(runlens)])
    for ln in lengths:
        runtab.write(w, ln)
    w.align()


def symbol_code_table(lengths: list[int]) -> HuffTable:
    """Canonical symbol-ID prefix table from per-id code lengths
    (ids with length 0 are unassigned)."""
    return HuffTable([(pl, 0, i) for i, pl in enumerate(lengths)])


# ------------------------------------------------ np padding helper
def pack_rows(bitmap: np.ndarray) -> bytes:
    """Row-byte-padded packing of a bool bitmap (BMSIZE=0 collective
    bitmaps, 6.5.9)."""
    return np.packbits(bitmap, axis=1).tobytes()


def unpack_rows(data: bytes, w: int, h: int) -> np.ndarray:
    stride = (w + 7) // 8
    if len(data) < stride * h:
        raise ValueError("jbig2: truncated raw collective bitmap")
    a = np.frombuffer(data[:stride * h], dtype=np.uint8)
    bits = np.unpackbits(a.reshape(h, stride), axis=1)[:, :w]
    return bits.astype(bool)
