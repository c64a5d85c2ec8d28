"""JBIG2 (ITU-T T.88) — embedded-stream decoder, from spec.

Scanned PDFs use two bilevel codecs: CCITT G4 (kernel/ccitt.py, r6)
and JBIG2.  This module decodes JBIG2 as embedded in PDF streams
(PDF 32000-1:2008 §7.4.7: no file header, sequential segment
organization):

- segment headers (number / flags / referred-to segment lists / page
  association / data length),
- page information (type 48) and end markers (49/50/51),
- immediate (lossless) generic regions (types 38/39) coded either
  with **MMR** (T.6, routed through kernel/ccitt.decode_g4) or with
  the **MQ arithmetic coder** (T.88 Annex E) over generic-region
  template 0, including TPGDON typical-prediction rows,
- **symbol coding** — the jbig2enc/production-encoder shape:
  arithmetic symbol dictionaries (type 0; height classes via
  IADH/IADW, shared generic-region state per T.88 6.5.8.1, IAEX
  export runs, symbols accumulated across referred-to dictionaries
  incl. /JBIG2Globals) and immediate text regions (types 6/7; strip
  decoding with IADT/IAFS/IADS/IAIT, IAID symbol-id trees, all four
  REFCORNER modes, TRANSPOSED placement, SBDSOFFSET),
- region composition onto the page bitmap (OR/AND/XOR/XNOR/REPLACE).

- **halftone coding**: pattern dictionaries (type 16, arithmetic or
  MMR) and immediate halftone regions (types 22/23; gray-coded
  bitplanes over the 8.8 fixed-point skewable grid, pattern
  stamping with the region combinators).

- **Huffman coding** (r7, kernel/jbig2huff.py): custom table
  segments (type 53, Annex B.2), Annex B.3 canonical prefix
  assignment, Huffman symbol dictionaries (6.5.9 height classes
  with MMR / raw collective bitmaps, B.1 export runs) and Huffman
  text regions (runcode symbol-ID lengths, FS/DS/DT table reads,
  raw CURT bits).  Standard tables B.1-B.5 ship; **B.6-B.15
  selections raise ValueError** — their rows cannot be re-verified
  against T.88 in this offline sandbox, and a guessed table would
  silently desync real streams (jbig2huff.py docstring).

Out of the subset (raise ValueError → size-only needs-ocr entries):
standard-table selections B.6-B.15, refinement/aggregate coding,
halftone skip coding, intermediate regions.  The MQ coder, the
IAx/IAID procedures, and the Huffman tables all ship with ENCODERS
so dictionary/text/generic round-trips are testable without
external tools.

All errors raise ValueError; dimensions are budget-capped before
allocation.  Bit order inside the arithmetic decoder follows T.88's
flowcharts (INITDEC / DECODE / BYTEIN with 0xFF stuffing).
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXELS = 1 << 26
# The MQ generic-region decoder is a per-pixel Python loop (~µs/px):
# a claimed 64 MP arithmetic region would burn minutes on one row of
# one document — the decode-bomb shape the reference's per-file
# timeout exists for (config.go:120-127).  Arithmetic regions get a
# tighter budget; MMR regions ride kernel/ccitt.py's run-length walk
# and keep the full pixel cap.
ARITH_MAX_PIXELS = 1 << 22

# T.88 Table E.1 — MQ-coder probability state machine
# (Qe, NMPS, NLPS, SWITCH); identical table in JPEG 2000.
_QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


class MQDecoder:
    """T.88 Annex E arithmetic decoder (software conventions)."""

    __slots__ = ("data", "bp", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein_init()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i: int) -> int:
        return self.data[i] if i < len(self.data) else 0xFF

    def _bytein_init(self) -> None:
        self._bytein()

    def _bytein(self) -> None:
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8
        self.c &= 0xFFFFFFFF

    def decode(self, cx: list) -> int:
        """Decode one bit with context state cx = [index, mps]."""
        icx, mps = cx
        qe = _QE[icx][0]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if self.a < qe:
                d = mps
                cx[0] = _QE[icx][1]
            else:
                d = 1 - mps
                if _QE[icx][3]:
                    cx[1] = 1 - mps
                cx[0] = _QE[icx][2]
            self.a = qe
            # renormalize
            while True:
                if self.ct == 0:
                    self._bytein()
                self.a = (self.a << 1) & 0xFFFF
                self.c = (self.c << 1) & 0xFFFFFFFF
                self.ct -= 1
                if self.a & 0x8000:
                    break
            return d
        self.c = (self.c - (qe << 16)) & 0xFFFFFFFF
        if (self.a & 0x8000) == 0:
            # MPS exchange path
            if self.a < qe:
                d = 1 - mps
                if _QE[icx][3]:
                    cx[1] = 1 - mps
                cx[0] = _QE[icx][2]
            else:
                d = mps
                cx[0] = _QE[icx][1]
            while True:
                if self.ct == 0:
                    self._bytein()
                self.a = (self.a << 1) & 0xFFFF
                self.c = (self.c << 1) & 0xFFFFFFFF
                self.ct -= 1
                if self.a & 0x8000:
                    break
            return d
    # fast path: no renormalization needed
        return mps


class MQEncoder:
    """T.88 Annex E arithmetic encoder (software conventions — the
    same BYTEOUT/FLUSH structure as the public openjpeg/jasper MQ
    coders): fixture-side mirror of :class:`MQDecoder`."""

    __slots__ = ("buf", "c", "a", "ct")

    def __init__(self):
        # buf[0] is the INITENC scratch byte (BP = BPST - 1, B = 0);
        # it absorbs a possible first carry and is dropped on flush
        self.buf = bytearray([0])
        self.c = 0
        self.a = 0x8000
        self.ct = 12

    def _byteout(self) -> None:
        if self.buf[-1] == 0xFF:
            self.buf.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self.buf.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            self.buf[-1] += 1             # carry propagation
            if self.buf[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                self.buf.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self.buf.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def _renorm(self) -> None:
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, cx: list, d: int) -> None:
        icx, mps = cx
        qe = _QE[icx][0]
        if d == mps:                      # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe              # fast path, no renorm
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            cx[0] = _QE[icx][1]
            self._renorm()
        else:                             # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if _QE[icx][3]:
                cx[1] = 1 - mps
            cx[0] = _QE[icx][2]
            self._renorm()

    def flush(self) -> bytes:
        # SETBITS
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        return bytes(self.buf[1:])        # drop the INITENC scratch


# ------------------------------------------------- generic region (GB)

# template-0 context: 10 fixed neighbors + 4 adaptive (nominal AT
# positions per T.88 6.2.5.3); the context layout follows the spec's
# figure ordering so encoder and decoder agree bit-for-bit.
_AT_DEFAULT = ((3, -1), (-3, -1), (2, -2), (-2, -2))
_TPGDON_CTX0 = 0x9B25


def _gb_context(bitmap: np.ndarray, x: int, y: int, w: int,
                at: tuple) -> int:
    def px(dx, dy):
        xx, yy = x + dx, y + dy
        if yy < 0 or xx < 0 or xx >= w:
            return 0
        return int(bitmap[yy, xx])

    a1, a2, a3, a4 = at
    return (
        (px(*a4) << 15) | (px(-1, -2) << 14) | (px(0, -2) << 13)
        | (px(1, -2) << 12) | (px(*a3) << 11)
        | (px(*a2) << 10) | (px(-2, -1) << 9) | (px(-1, -1) << 8)
        | (px(0, -1) << 7) | (px(1, -1) << 6) | (px(2, -1) << 5)
        | (px(*a1) << 4)
        | (px(-4, 0) << 3) | (px(-3, 0) << 2) | (px(-2, 0) << 1)
        | px(-1, 0)
    )


def _decode_generic_core(dec: "MQDecoder", cx: list, w: int, h: int,
                         tpgdon: bool = False,
                         at: tuple = _AT_DEFAULT,
                         budget: list | None = None) -> np.ndarray:
    """Generic-region decoding procedure over an EXISTING decoder and
    GB context set — symbol dictionaries decode every symbol bitmap
    through one shared arithmetic state (T.88 6.5.8.1).

    ``budget`` is a single-element mutable pixel pool shared across
    ALL arithmetic decodes of one embedded stream: per-bitmap caps
    alone do not stop a bomb that decodes thousands of cheap all-white
    bitmaps (MQ-coded uniform regions cost ~0 stream bits each)."""
    if w <= 0 or h <= 0 or w * h > ARITH_MAX_PIXELS:
        raise ValueError("jbig2: region exceeds arithmetic budget")
    if budget is not None:
        budget[0] -= w * h
        if budget[0] < 0:
            raise ValueError(
                "jbig2: stream exceeds aggregate arithmetic budget")
    out = np.zeros((h, w), dtype=np.uint8)
    ltp = 0
    for y in range(h):
        if tpgdon:
            if dec.decode(cx[_TPGDON_CTX0]):
                ltp ^= 1
            if ltp:
                if y > 0:
                    out[y] = out[y - 1]
                continue
        for x in range(w):
            ctx = _gb_context(out, x, y, w, at)
            out[y, x] = dec.decode(cx[ctx])
    return out.astype(bool)


def decode_generic_region(data: bytes, w: int, h: int,
                          tpgdon: bool = False,
                          at: tuple = _AT_DEFAULT) -> np.ndarray:
    """MQ-coded generic region, template 0 → bool array."""
    dec = MQDecoder(data)
    cx = [[0, 0] for _ in range(1 << 16)]
    return _decode_generic_core(dec, cx, w, h, tpgdon, at)


def _encode_generic_core(enc: "MQEncoder", cx: list, a: np.ndarray,
                         tpgdon: bool = False,
                         at: tuple = _AT_DEFAULT) -> None:
    h, w = a.shape
    ltp = 0
    for y in range(h):
        if tpgdon:
            typical = y > 0 and bool((a[y] == a[y - 1]).all())
            want_ltp = 1 if typical else 0
            enc.encode(cx[_TPGDON_CTX0], 1 if want_ltp != ltp else 0)
            ltp = want_ltp
            if ltp:
                continue
        for x in range(w):
            ctx = _gb_context(a, x, y, w, at)
            enc.encode(cx[ctx], int(a[y, x]))


def encode_generic_region(img: np.ndarray, tpgdon: bool = False,
                          at: tuple = _AT_DEFAULT) -> bytes:
    """MQ-coded generic region (template 0) — fixture encoder."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim != 2 or a.size == 0:
        raise ValueError("jbig2: encoder needs a 2-D nonempty array")
    enc = MQEncoder()
    cx = [[0, 0] for _ in range(1 << 16)]
    _encode_generic_core(enc, cx, a, tpgdon, at)
    return enc.flush()


# ------------------------------ integer arithmetic decoding (A.2/A.3)

OOB = object()          # out-of-band sentinel (T.88 A.2 step 4)

# (prefix-path, value-bit-count, offset) buckets of the IAx tree
_IA_BUCKETS = ((2, 0), (4, 4), (6, 20), (8, 84), (12, 340),
               (32, 4436))


class _IntCtx:
    """One IAx procedure's 512-entry context set."""

    __slots__ = ("cx",)

    def __init__(self):
        self.cx = [[0, 0] for _ in range(512)]


def _ia_decode(dec: MQDecoder, ic: _IntCtx):
    """IAx integer decoding procedure (T.88 A.2) → int or OOB."""
    prev = 1

    def bit() -> int:
        nonlocal prev
        b = dec.decode(ic.cx[prev])
        prev = ((prev << 1) | b) if prev < 256 \
            else ((((prev << 1) | b) & 511) | 256)
        return b

    s = bit()
    for i, (nbits, offset) in enumerate(_IA_BUCKETS):
        if i < len(_IA_BUCKETS) - 1 and bit():
            continue
        v = 0
        for _ in range(nbits):
            v = (v << 1) | bit()
        v += offset
        break
    if s and v == 0:
        return OOB
    return -v if s else v


def _ia_encode(enc: MQEncoder, ic: _IntCtx, value) -> None:
    """IAx integer encoding — inverse of :func:`_ia_decode`."""
    prev = 1

    def bit(b: int) -> None:
        nonlocal prev
        enc.encode(ic.cx[prev], b)
        prev = ((prev << 1) | b) if prev < 256 \
            else ((((prev << 1) | b) & 511) | 256)

    if value is OOB:
        s, v = 1, 0
    else:
        s = 1 if value < 0 else 0
        v = -value if value < 0 else value
    bit(s)
    for i, (nbits, offset) in enumerate(_IA_BUCKETS):
        last = i == len(_IA_BUCKETS) - 1
        upper = offset + (1 << nbits)
        if v < upper or last:
            if not last:
                bit(0)
            rem = v - offset
            if rem < 0 or rem >= (1 << nbits):
                raise ValueError("jbig2: IA value out of range")
            for k in range(nbits - 1, -1, -1):
                bit((rem >> k) & 1)
            return
        bit(1)


def _iaid_decode(dec: MQDecoder, cx: list, codelen: int) -> int:
    """IAID decoding procedure (T.88 A.3)."""
    prev = 1
    for _ in range(codelen):
        prev = (prev << 1) | dec.decode(cx[prev])
    return prev - (1 << codelen)


def _iaid_encode(enc: MQEncoder, cx: list, codelen: int,
                 value: int) -> None:
    prev = 1
    for k in range(codelen - 1, -1, -1):
        b = (value >> k) & 1
        enc.encode(cx[prev], b)
        prev = (prev << 1) | b


def _ceil_log2(n: int) -> int:
    return max(0, (n - 1).bit_length())


# --------------------------------------- symbol dictionary (T.88 6.5)


def _decode_symbol_dict(payload: bytes,
                        input_syms: list[np.ndarray],
                        budget: list | None = None,
                        tables: list | None = None) -> list:
    """Symbol dictionary (SDREFAGG=0) → exported symbol bitmaps:
    arithmetic (SDHUFF=0) or Huffman (SDHUFF=1, 6.5.9 height classes
    with MMR/raw collective bitmaps)."""
    if len(payload) < 2:
        raise ValueError("jbig2: truncated symbol dictionary")
    flags = struct.unpack(">H", payload[:2])[0]
    sdhuff = flags & 1
    sdrefagg = (flags >> 1) & 1
    template = (flags >> 10) & 3
    if sdrefagg:
        raise ValueError("jbig2: refinement/aggregate symbol coding")
    if sdhuff:
        return _decode_symbol_dict_huff(payload, flags, input_syms,
                                        tables or [], budget=budget)
    if template != 0:
        raise ValueError("jbig2: only GB template 0 supported")
    pos = 2
    at = tuple(
        (struct.unpack("b", payload[pos + i:pos + i + 1])[0],
         struct.unpack("b", payload[pos + i + 1:pos + i + 2])[0])
        for i in range(0, 8, 2))
    pos += 8
    num_ex, num_new = struct.unpack(">II", payload[pos:pos + 8])
    pos += 8
    if num_new > 1 << 16 or num_ex > 1 << 16:
        raise ValueError("jbig2: symbol count exceeds budget")

    dec = MQDecoder(payload[pos:])
    gb_cx = [[0, 0] for _ in range(1 << 16)]
    iadh, iadw, iaex, iaai = (_IntCtx() for _ in range(4))
    new_syms: list[np.ndarray] = []
    hcheight = 0
    guard = 0
    while len(new_syms) < num_new:
        guard += 1
        if guard > num_new + 8:
            raise ValueError("jbig2: runaway height classes")
        dh = _ia_decode(dec, iadh)
        if dh is OOB:
            raise ValueError("jbig2: OOB height delta")
        hcheight += dh
        if hcheight <= 0 or hcheight > 1 << 14:
            raise ValueError("jbig2: bad symbol height")
        symwidth = 0
        while True:
            dw = _ia_decode(dec, iadw)
            if dw is OOB:
                break
            symwidth += dw
            if symwidth <= 0 or symwidth > 1 << 14:
                raise ValueError("jbig2: bad symbol width")
            if len(new_syms) >= num_new:
                raise ValueError("jbig2: too many symbols")
            new_syms.append(_decode_generic_core(
                dec, gb_cx, symwidth, hcheight, at=at,
                budget=budget))
    # export flags: alternating IAEX run lengths over input ∪ new
    allsyms = list(input_syms) + new_syms
    exported: list[np.ndarray] = []
    i = 0
    cur = 0
    guard = 0
    while i < len(allsyms):
        guard += 1
        if guard > 2 * len(allsyms) + 8:
            # zero-length runs are legal but a crafted stream of
            # them must not spin forever
            raise ValueError("jbig2: runaway export runs")
        run = _ia_decode(dec, iaex)
        if run is OOB or run < 0:
            raise ValueError("jbig2: bad export run")
        if cur:
            exported.extend(allsyms[i:i + run])
        i += run
        cur ^= 1
    if len(exported) != num_ex:
        raise ValueError("jbig2: export count mismatch")
    return exported


def _decode_symbol_dict_huff(payload: bytes, flags: int,
                             input_syms: list, tables: list,
                             budget: list | None = None) -> list:
    """Huffman symbol dictionary (6.5.9): DH/DW/BMSIZE via Annex B
    tables (standard B.1-B.5 or referred custom segments), height
    classes carried as collective bitmaps — BMSIZE=0 row-padded raw,
    else MMR through kernel/ccitt.py — split by accumulated widths;
    EXFLAGS runs over standard Table B.1."""
    from . import ccitt
    from . import jbig2huff as HF

    sel_dh = (flags >> 2) & 3
    sel_dw = (flags >> 4) & 3
    sel_bm = (flags >> 6) & 1
    sel_ag = (flags >> 7) & 1
    if sel_dh == 2 or sel_dw == 2:
        raise ValueError("jbig2: reserved huffman table selection")
    pos = 2                              # no AT pixels when SDHUFF=1
    if len(payload) < pos + 8:
        raise ValueError("jbig2: truncated symbol dictionary")
    num_ex, num_new = struct.unpack(">II", payload[pos:pos + 8])
    pos += 8
    if num_new > 1 << 16 or num_ex > 1 << 16:
        raise ValueError("jbig2: symbol count exceeds budget")

    it = iter(tables)

    def custom():
        t = next(it, None)
        if t is None:
            raise ValueError("jbig2: missing referred huffman table")
        return t

    tdh = custom() if sel_dh == 3 else HF.std_table(4 + sel_dh)
    tdw = custom() if sel_dw == 3 else HF.std_table(2 + sel_dw)
    tbm = custom() if sel_bm else HF.std_table(1)
    if sel_ag:
        custom()                         # selected, unread (REFAGG=0)

    r = HF.HBitReader(payload, pos)
    new_syms: list[np.ndarray] = []
    hcheight = 0
    guard = 0
    # per-segment sanity pool PLUS the stream-wide shared budget
    # (ADVICE r7: a stream of many SDHUFF dictionaries must not
    # allocate N x the whole-stream decode budget)
    pixel_pool = MAX_PIXELS
    while len(new_syms) < num_new:
        guard += 1
        if guard > num_new + 8:
            raise ValueError("jbig2: runaway height classes")
        dh = tdh.read(r)
        if dh is HF.OOB:
            raise ValueError("jbig2: OOB height delta")
        hcheight += dh
        if hcheight <= 0 or hcheight > 1 << 14:
            raise ValueError("jbig2: bad symbol height")
        symwidth = 0
        totwidth = 0
        widths: list[int] = []
        while True:
            dw = tdw.read(r)
            if dw is HF.OOB:
                break
            symwidth += dw
            if symwidth <= 0 or symwidth > 1 << 14:
                raise ValueError("jbig2: bad symbol width")
            if len(new_syms) + len(widths) >= num_new:
                raise ValueError("jbig2: too many symbols")
            widths.append(symwidth)
            totwidth += symwidth
        if not widths:
            raise ValueError("jbig2: empty huffman height class")
        pixel_pool -= totwidth * hcheight
        if pixel_pool < 0:
            raise ValueError("jbig2: dictionary exceeds pixel budget")
        if budget is not None:
            budget[0] -= totwidth * hcheight
            if budget[0] < 0:
                raise ValueError(
                    "jbig2: stream exceeds aggregate arithmetic "
                    "budget")
        bmsize = tbm.read(r)
        if bmsize is HF.OOB or bmsize < 0:
            raise ValueError("jbig2: bad collective bitmap size")
        r.align()
        if bmsize == 0:
            stride = (totwidth + 7) // 8
            need = stride * hcheight
            coll = HF.unpack_rows(payload[r.pos:r.pos + need],
                                  totwidth, hcheight)
            r.pos += need
        else:
            if r.pos + bmsize > len(payload):
                raise ValueError("jbig2: truncated collective bitmap")
            coll = ccitt.decode_g4(payload[r.pos:r.pos + bmsize],
                                   totwidth, hcheight)
            r.pos += bmsize
        x = 0
        for wd in widths:
            new_syms.append(coll[:, x:x + wd])
            x += wd

    # export flags: alternating run lengths over standard Table B.1
    texp = HF.std_table(1)
    allsyms = list(input_syms) + new_syms
    exported: list[np.ndarray] = []
    i = 0
    cur = 0
    guard = 0
    while i < len(allsyms):
        guard += 1
        if guard > 2 * len(allsyms) + 8:
            raise ValueError("jbig2: runaway export runs")
        run = texp.read(r)
        if run is HF.OOB or run < 0:
            raise ValueError("jbig2: bad export run")
        if cur:
            exported.extend(allsyms[i:i + run])
        i += run
        cur ^= 1
    if len(exported) != num_ex:
        raise ValueError("jbig2: export count mismatch")
    return exported


# --------------------------------------------- text region (T.88 6.4)


def _place_instance(out: np.ndarray, sym: np.ndarray, curs: int,
                    ti: int, refcorner: int, transposed: int,
                    sbcombop: int) -> int:
    """Draw one symbol instance per 6.4.5 step 3(c)(x) and return the
    advanced CURS (shared by the arithmetic and Huffman loops)."""
    hi, wi = sym.shape
    if not transposed:
        if refcorner in (2, 3):       # BOTTOMRIGHT / TOPRIGHT
            curs += wi - 1
        x0 = curs - (wi - 1) if refcorner in (2, 3) else curs
        y0 = ti if refcorner in (1, 3) else ti - (hi - 1)
        _draw(out, sym, x0, y0, sbcombop)
        if refcorner in (0, 1):       # BOTTOMLEFT / TOPLEFT
            curs += wi - 1
    else:
        if refcorner in (0, 2):       # BOTTOM corners
            curs += hi - 1
        y0 = curs - (hi - 1) if refcorner in (0, 2) else curs
        x0 = ti if refcorner in (0, 1) else ti - (wi - 1)
        _draw(out, sym, x0, y0, sbcombop)
        if refcorner in (1, 3):       # TOP corners
            curs += hi - 1
    return curs


def _decode_text_region(payload: bytes, syms: list,
                        tables: list | None = None) -> tuple:
    """Text region (SBREFINE=0) → (bitmap, x, y, combop): arithmetic
    (SBHUFF=0) or Huffman (SBHUFF=1, kernel/jbig2huff.py tables)."""
    rw, rh, rx, ry, combop = _region_info(payload)
    pos = 17
    if len(payload) < pos + 2:
        raise ValueError("jbig2: truncated text region")
    flags = struct.unpack(">H", payload[pos:pos + 2])[0]
    pos += 2
    sbhuff = flags & 1
    sbrefine = (flags >> 1) & 1
    logstrips = (flags >> 2) & 3
    refcorner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    sbcombop = (flags >> 7) & 3
    defpixel = (flags >> 9) & 1
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32                    # 5-bit two's complement
    if sbrefine:
        raise ValueError("jbig2: refinement text region")
    strips = 1 << logstrips
    if sbhuff:
        if len(payload) < pos + 2:
            raise ValueError("jbig2: truncated huffman flags")
        hflags = struct.unpack(">H", payload[pos:pos + 2])[0]
        pos += 2
    num_instances = struct.unpack(">I", payload[pos:pos + 4])[0]
    pos += 4
    if num_instances > 1 << 20:
        raise ValueError("jbig2: instance count exceeds budget")
    if not syms:
        raise ValueError("jbig2: text region without symbols")
    if rw <= 0 or rh <= 0 or rw * rh > ARITH_MAX_PIXELS:
        raise ValueError("jbig2: region exceeds arithmetic budget")
    if sbhuff:
        return _decode_text_region_huff(
            payload, pos, syms, tables or [], hflags, rw, rh, rx, ry,
            combop, strips, logstrips, refcorner, transposed,
            sbcombop, defpixel, dsoffset, num_instances)
    codelen = _ceil_log2(len(syms))

    dec = MQDecoder(payload[pos:])
    iadt, iafs, iads, iait = (_IntCtx() for _ in range(4))
    iaid_cx = [[0, 0] for _ in range(1 << (codelen + 1))]
    out = np.full((rh, rw), bool(defpixel), dtype=bool)

    dt0 = _ia_decode(dec, iadt)
    if dt0 is OOB:
        raise ValueError("jbig2: OOB strip T")
    stript = -dt0 * strips
    firsts = 0
    ninst = 0
    guard = 0
    while ninst < num_instances:
        guard += 1
        if guard > num_instances + 8:
            raise ValueError("jbig2: runaway strips")
        dt = _ia_decode(dec, iadt)
        if dt is OOB:
            raise ValueError("jbig2: OOB strip delta")
        stript += dt * strips
        dfs = _ia_decode(dec, iafs)
        if dfs is OOB:
            raise ValueError("jbig2: OOB first S")
        firsts += dfs
        curs = firsts
        first = True
        while ninst < num_instances:
            if not first:
                ids = _ia_decode(dec, iads)
                if ids is OOB:
                    break                 # end of strip
                curs += ids + dsoffset
            first = False
            curt = _ia_decode(dec, iait) if strips > 1 else 0
            if curt is OOB:
                raise ValueError("jbig2: OOB T offset")
            ti = stript + curt
            sid = _iaid_decode(dec, iaid_cx, codelen)
            if sid >= len(syms):
                raise ValueError("jbig2: symbol id out of range")
            curs = _place_instance(out, syms[sid], curs, ti,
                                   refcorner, transposed, sbcombop)
            ninst += 1
    return out, rx, ry, combop


def _decode_text_region_huff(payload, pos, syms, tables, hflags,
                             rw, rh, rx, ry, combop, strips,
                             logstrips, refcorner, transposed,
                             sbcombop, defpixel, dsoffset,
                             num_instances) -> tuple:
    """Huffman text region body (7.4.3 value reads over the 6.4.5
    loop): FS/DS/DT via Annex B tables (standard B.1-B.5 or custom
    segments; B.6-B.13 selections raise — offline-unverifiable,
    kernel/jbig2huff.py docstring), runcode-coded symbol-ID lengths,
    raw log2(SBSTRIPS) CURT bits."""
    from . import jbig2huff as HF

    sel_fs = hflags & 3
    sel_ds = (hflags >> 2) & 3
    sel_dt = (hflags >> 4) & 3
    it = iter(tables)

    def custom():
        t = next(it, None)
        if t is None:
            raise ValueError("jbig2: missing referred huffman table")
        return t

    if sel_fs == 2:
        raise ValueError("jbig2: reserved SBHUFFFS selection")
    tfs = custom() if sel_fs == 3 else HF.std_table(
        6 if sel_fs == 0 else 7)
    tds = custom() if sel_ds == 3 else HF.std_table(8 + sel_ds)
    tdt = custom() if sel_dt == 3 else HF.std_table(11 + sel_dt)
    # RDW/RDH/RDX/RDY/RSIZE are selected but unread with SBREFINE=0;
    # custom selections still consume referred tables in order
    for shift in (6, 8, 10, 12):
        if (hflags >> shift) & 3 == 3:
            custom()
    if (hflags >> 14) & 1:
        custom()

    r = HF.HBitReader(payload, pos)
    lengths = HF.read_symbol_id_lengths(r, len(syms))
    symtab = HF.symbol_code_table(lengths)

    out = np.full((rh, rw), bool(defpixel), dtype=bool)
    dt0 = tdt.read(r)
    if dt0 is HF.OOB:
        raise ValueError("jbig2: OOB strip T")
    stript = -dt0 * strips
    firsts = 0
    ninst = 0
    guard = 0
    while ninst < num_instances:
        guard += 1
        if guard > num_instances + 8:
            raise ValueError("jbig2: runaway strips")
        dt = tdt.read(r)
        if dt is HF.OOB:
            raise ValueError("jbig2: OOB strip delta")
        stript += dt * strips
        dfs = tfs.read(r)
        if dfs is HF.OOB:
            raise ValueError("jbig2: OOB first S")
        firsts += dfs
        curs = firsts
        first = True
        while ninst < num_instances:
            if not first:
                ids = tds.read(r)
                if ids is HF.OOB:
                    break                 # end of strip
                curs += ids + dsoffset
            first = False
            curt = r.bits(logstrips) if strips > 1 else 0
            ti = stript + curt
            sid = symtab.read(r)
            if sid is HF.OOB or sid >= len(syms):
                raise ValueError("jbig2: symbol id out of range")
            curs = _place_instance(out, syms[sid], curs, ti,
                                   refcorner, transposed, sbcombop)
            ninst += 1
    return out, rx, ry, combop


def _decode_pattern_dict(payload: bytes,
                         budget: list | None = None) -> list:
    """Pattern dictionary (T.88 6.7, arithmetic or MMR): one wide
    generic region sliced into HDPATS = GRAYMAX+1 patterns."""
    if len(payload) < 7:
        raise ValueError("jbig2: truncated pattern dictionary")
    flags = payload[0]
    hdmmr = flags & 1
    template = (flags >> 1) & 3
    hdpw = payload[1]
    hdph = payload[2]
    graymax = struct.unpack(">I", payload[3:7])[0]
    if hdpw == 0 or hdph == 0:
        raise ValueError("jbig2: bad pattern size")
    if graymax > 1 << 12:
        raise ValueError("jbig2: pattern count exceeds budget")
    if not hdmmr and template != 0:
        raise ValueError("jbig2: only GB template 0 supported")
    total_w = (graymax + 1) * hdpw
    body = payload[7:]
    if hdmmr:
        from . import ccitt

        big = ccitt.decode_g4(body, total_w, hdph)
    else:
        # fixed AT positions per 6.7.5: AT1 = (-HDPW, 0)
        at = ((-hdpw, 0), (-3, -1), (2, -2), (-2, -2))
        dec = MQDecoder(body)
        cx = [[0, 0] for _ in range(1 << 16)]
        big = _decode_generic_core(dec, cx, total_w, hdph, at=at,
                                   budget=budget)
    return [big[:, i * hdpw:(i + 1) * hdpw]
            for i in range(graymax + 1)]


def _decode_halftone_region(payload: bytes, patterns: list,
                            budget: list | None = None) -> tuple:
    """Halftone region (T.88 6.6): gray-coded bitplanes select a
    pattern per grid cell; cells stamp onto the region bitmap."""
    rw, rh, rx, ry, combop = _region_info(payload)
    pos = 17
    if len(payload) < pos + 1 + 16 + 4:
        raise ValueError("jbig2: truncated halftone region")
    flags = payload[pos]
    pos += 1
    hmmr = flags & 1
    template = (flags >> 1) & 3
    enable_skip = (flags >> 3) & 1
    hcombop = (flags >> 4) & 7
    defpixel = (flags >> 7) & 1
    if enable_skip:
        raise ValueError("jbig2: halftone skip coding unsupported")
    if hcombop > 4:
        raise ValueError("jbig2: reserved halftone combination op")
    if not hmmr and template != 0:
        raise ValueError("jbig2: only GB template 0 supported")
    hgw, hgh = struct.unpack(">II", payload[pos:pos + 8])
    hgx, hgy = struct.unpack(">ii", payload[pos + 8:pos + 16])
    hrx, hry = struct.unpack(">HH", payload[pos + 16:pos + 20])
    pos += 20
    if not patterns:
        raise ValueError("jbig2: halftone region without patterns")
    if rw <= 0 or rh <= 0 or rw * rh > ARITH_MAX_PIXELS             or hgw * hgh > ARITH_MAX_PIXELS:
        raise ValueError("jbig2: region exceeds arithmetic budget")
    bits = max(1, _ceil_log2(len(patterns)))
    body = payload[pos:]
    # grayscale image: BITS bitplanes, MSB first (Annex C); arith
    # planes share one decoder + stats, MMR planes share one stream
    planes = []
    if hmmr:
        from . import ccitt

        big = ccitt.decode_g4(body, hgw, hgh * bits)
        for j in range(bits):
            planes.append(big[j * hgh:(j + 1) * hgh])
    else:
        dec = MQDecoder(body)
        cx = [[0, 0] for _ in range(1 << 16)]
        for _ in range(bits):
            planes.append(_decode_generic_core(
                dec, cx, hgw, hgh, budget=budget))
    gray = planes[0].astype(np.int64)
    for j in range(1, bits):
        gray = (gray << 1) | (planes[j] ^ (gray & 1))
    if int(gray.max(initial=0)) >= len(patterns):
        raise ValueError("jbig2: gray value out of pattern range")
    # stamping work is cells x pattern area — budget it like the
    # arith decode, or a few hundred payload bytes could demand
    # ~1e11 pixel writes (decode-bomb class the shared budget closes)
    pat_h, pat_w = patterns[0].shape
    if hgw * hgh * pat_h * pat_w > 4 * ARITH_MAX_PIXELS:
        raise ValueError("jbig2: halftone stamping exceeds budget")
    out = np.full((rh, rw), bool(defpixel), dtype=bool)
    for m in range(hgh):
        for n in range(hgw):
            # 8.8 fixed-point skewable grid (spec 6.6.5)
            x = (hgx + m * hry + n * hrx) >> 8
            y = (hgy + m * hrx - n * hry) >> 8
            _draw(out, patterns[int(gray[m, n])], x, y, hcombop)
    return out, rx, ry, combop


def _draw(page: np.ndarray, sym: np.ndarray, x0: int, y0: int,
          op: int) -> None:
    """Compose a symbol bitmap at (x0, y0), clipped to the region."""
    h, w = sym.shape
    ph, pw = page.shape
    sx0, sy0 = max(0, -x0), max(0, -y0)
    x1, y1 = min(pw, x0 + w), min(ph, y0 + h)
    if x1 <= max(0, x0) or y1 <= max(0, y0):
        return
    tgt = page[max(0, y0):y1, max(0, x0):x1]
    src = sym[sy0:sy0 + tgt.shape[0], sx0:sx0 + tgt.shape[1]]
    if op == 0:
        tgt |= src
    elif op == 1:
        tgt &= src
    elif op == 2:
        tgt ^= src
    elif op == 3:
        tgt[...] = ~(tgt ^ src)
    else:
        tgt[...] = src


# ------------------------------------------------------ segment layer


def _region_info(data: bytes) -> tuple[int, int, int, int, int]:
    if len(data) < 17:
        raise ValueError("jbig2: truncated region info")
    w, h, x, y = struct.unpack(">IIII", data[:16])
    return w, h, x, y, data[16] & 0x7


def _parse_segment_headers(data: bytes):
    """Yield (seg_num, seg_type, referred, payload) for each segment
    in an embedded (PDF) JBIG2 stream — sequential organization, no
    file header (T.88 Annex D / PDF §7.4.7)."""
    pos = 0
    n = len(data)
    count = 0
    while pos + 11 <= n:
        count += 1
        if count > 1 << 16:
            raise ValueError("jbig2: too many segments")
        seg_num = struct.unpack(">I", data[pos:pos + 4])[0]
        flags = data[pos + 4]
        seg_type = flags & 0x3F
        page_assoc_4 = bool(flags & 0x40)
        pos += 5
        rts = data[pos]
        ref_count = rts >> 5
        if ref_count == 7:
            ref_count = struct.unpack(
                ">I", data[pos:pos + 4])[0] & 0x1FFFFFFF
            if ref_count > 1 << 16:
                raise ValueError("jbig2: too many referred segments")
            pos += 4 + (ref_count + 8) // 8   # long form + retain bits
        else:
            pos += 1
        ref_size = 1 if seg_num <= 256 else (
            2 if seg_num <= 65536 else 4)
        referred = []
        for _ in range(ref_count):
            chunk = data[pos:pos + ref_size]
            if len(chunk) < ref_size:
                raise ValueError("jbig2: truncated referred list")
            referred.append(int.from_bytes(chunk, "big"))
            pos += ref_size
        if page_assoc_4:
            page = struct.unpack(">I", data[pos:pos + 4])[0]
            pos += 4
        else:
            page = data[pos] if pos < n else 0
            pos += 1
        if pos + 4 > n:
            raise ValueError("jbig2: truncated segment header")
        length = struct.unpack(">I", data[pos:pos + 4])[0]
        pos += 4
        if length == 0xFFFFFFFF:
            raise ValueError("jbig2: unknown-length segment")
        if pos + length > n:
            raise ValueError("jbig2: truncated segment payload")
        yield seg_num, seg_type, referred, data[pos:pos + length]
        pos += length


_UNSUPPORTED = {
    4: "intermediate text region", 20: "intermediate halftone region",
    36: "intermediate generic region", 40: "refinement region",
    42: "refinement region", 43: "refinement region",
}


def decode_embedded(data: bytes,
                    globals_data: bytes | None = None) -> np.ndarray:
    """PDF-embedded JBIG2 stream (+ optional /JBIG2Globals) → bool
    page bitmap (True = black).  Decodes generic regions (MMR and MQ
    arithmetic) AND the symbol-coding shape (arithmetic symbol
    dictionaries + immediate text regions); Huffman variants,
    refinement/aggregate coding, halftone and intermediate regions
    raise ValueError.  ValueError-only contract (untrusted bytes):
    every structural failure surfaces as ValueError."""
    try:
        return _decode_embedded(data, globals_data)
    except ValueError:
        raise
    except (struct.error, IndexError, KeyError, OverflowError,
            MemoryError, RecursionError) as exc:
        raise ValueError(
            f"jbig2: malformed stream ({type(exc).__name__})")


def _decode_embedded(data: bytes,
                     globals_data: bytes | None = None) -> np.ndarray:
    page_w = page_h = None
    page = None
    default_pixel = 0
    sym_store: dict[int, list] = {}
    table_store: dict[int, object] = {}   # custom Huffman tables
    arith_budget = [ARITH_MAX_PIXELS]     # shared across the stream
    streams = ([globals_data] if globals_data else []) + [data]
    for blob in streams:
        for seg_num, seg_type, referred, payload \
                in _parse_segment_headers(blob):
            if seg_type in _UNSUPPORTED:
                raise ValueError(
                    f"jbig2: unsupported segment "
                    f"({_UNSUPPORTED[seg_type]})")
            if seg_type == 16:            # pattern dictionary
                sym_store[seg_num] = _decode_pattern_dict(
                    payload, budget=arith_budget)
                continue
            if seg_type in (22, 23):      # immediate halftone region
                if page is None:
                    raise ValueError("jbig2: region before page info")
                pats: list = []
                for r in referred:
                    pats.extend(sym_store.get(r, []))
                bitmap, rx, ry, combop = _decode_halftone_region(
                    payload, pats, budget=arith_budget)
                rh2, rw2 = bitmap.shape
                if rx + rw2 > page.shape[1] \
                        or ry + rh2 > page.shape[0]:
                    raise ValueError("jbig2: region outside page")
                _draw(page, bitmap, rx, ry, combop)
                continue
            if seg_type == 0:             # symbol dictionary
                input_syms: list = []
                ref_tabs: list = []
                for r in referred:
                    input_syms.extend(sym_store.get(r, []))
                    if r in table_store:
                        ref_tabs.append(table_store[r])
                sym_store[seg_num] = _decode_symbol_dict(
                    payload, input_syms, budget=arith_budget,
                    tables=ref_tabs)
                continue
            if seg_type in (6, 7):        # immediate text region
                if page is None:
                    raise ValueError("jbig2: region before page info")
                syms: list = []
                ref_tabs = []
                for r in referred:
                    syms.extend(sym_store.get(r, []))
                    if r in table_store:
                        ref_tabs.append(table_store[r])
                bitmap, rx, ry, combop = _decode_text_region(
                    payload, syms, tables=ref_tabs)
                rh, rw = bitmap.shape
                if rx + rw > page.shape[1] or ry + rh > page.shape[0]:
                    raise ValueError("jbig2: region outside page")
                _draw(page, bitmap, rx, ry, combop)
                continue
            if seg_type == 48:            # page information
                if len(payload) < 19:
                    raise ValueError("jbig2: truncated page info")
                page_w, page_h = struct.unpack(">II", payload[:8])
                if page_h == 0xFFFFFFFF:
                    raise ValueError("jbig2: striped unknown height")
                if page_w * page_h > MAX_PIXELS:
                    raise ValueError(
                        "jbig2: page exceeds decode budget")
                default_pixel = (payload[16] >> 2) & 1
                page = np.full((page_h, page_w), bool(default_pixel),
                               dtype=bool)
            elif seg_type in (38, 39):    # immediate generic region
                if page is None:
                    raise ValueError("jbig2: region before page info")
                rw, rh, rx, ry, combop = _region_info(payload)
                body = payload[17:]
                if len(body) < 1:
                    raise ValueError("jbig2: truncated region")
                gflags = body[0]
                mmr = gflags & 1
                template = (gflags >> 1) & 3
                tpgdon = bool(gflags & 8)
                body = body[1:]
                if mmr:
                    from . import ccitt

                    bitmap = ccitt.decode_g4(body, rw, rh)
                else:
                    if template != 0:
                        raise ValueError(
                            "jbig2: only GB template 0 supported")
                    if len(body) < 8:
                        raise ValueError("jbig2: truncated AT pixels")
                    at = tuple(
                        (struct.unpack("b", body[i:i + 1])[0],
                         struct.unpack("b", body[i + 1:i + 2])[0])
                        for i in range(0, 8, 2))
                    bitmap = decode_generic_region(
                        body[8:], rw, rh, tpgdon=tpgdon, at=at)
                if rx + rw > page.shape[1] or ry + rh > page.shape[0]:
                    raise ValueError("jbig2: region outside page")
                tgt = page[ry:ry + rh, rx:rx + rw]
                if combop == 0:
                    page[ry:ry + rh, rx:rx + rw] = tgt | bitmap
                elif combop == 1:
                    page[ry:ry + rh, rx:rx + rw] = tgt & bitmap
                elif combop == 2:
                    page[ry:ry + rh, rx:rx + rw] = tgt ^ bitmap
                elif combop == 3:
                    page[ry:ry + rh, rx:rx + rw] = ~(tgt ^ bitmap)
                else:
                    page[ry:ry + rh, rx:rx + rw] = bitmap
            elif seg_type in (49, 50, 51, 62):
                continue                  # end/extension markers
            elif seg_type == 53:          # custom Huffman table
                from . import jbig2huff

                table_store[seg_num] = \
                    jbig2huff.parse_table_segment(payload)
            else:
                raise ValueError(
                    f"jbig2: unsupported segment type {seg_type}")
    if page is None:
        raise ValueError("jbig2: no page information segment")
    return page


# ------------------------------------------------- fixture stream gen


def encode_symbol_dict(symbols: list[np.ndarray]) -> bytes:
    """Arithmetic symbol-dictionary payload exporting ``symbols``
    (fixture encoder; symbols MUST be sorted by ascending height —
    the height-class delta coding requires it)."""
    heights = [s.shape[0] for s in symbols]
    if heights != sorted(heights):
        raise ValueError("jbig2: symbols must be height-sorted")
    flags = 0                              # SDHUFF=0 SDREFAGG=0 T0
    out = struct.pack(">H", flags)
    out += b"".join(struct.pack("bb", dx, dy) for dx, dy in _AT_DEFAULT)
    out += struct.pack(">II", len(symbols), len(symbols))
    enc = MQEncoder()
    gb_cx = [[0, 0] for _ in range(1 << 16)]
    iadh, iadw, iaex, iaai = (_IntCtx() for _ in range(4))
    hcheight = 0
    i = 0
    while i < len(symbols):
        j = i
        while j < len(symbols) and symbols[j].shape[0] \
                == symbols[i].shape[0]:
            j += 1
        _ia_encode(enc, iadh, symbols[i].shape[0] - hcheight)
        hcheight = symbols[i].shape[0]
        symwidth = 0
        for k in range(i, j):
            _ia_encode(enc, iadw, symbols[k].shape[1] - symwidth)
            symwidth = symbols[k].shape[1]
            _encode_generic_core(
                enc, gb_cx, np.ascontiguousarray(
                    symbols[k], dtype=np.uint8))
        _ia_encode(enc, iadw, OOB)
        i = j
    # export all symbols: run of 0 unexported, then run of N exported
    _ia_encode(enc, iaex, 0)
    _ia_encode(enc, iaex, len(symbols))
    return out + enc.flush()


def encode_text_region(w: int, h: int, sym_widths: list[int],
                       instances: list[tuple[int, int, int]]) -> bytes:
    """Arithmetic text-region payload placing symbol ids at top-left
    (x, y) positions (fixture encoder: SBSTRIPS=1, REFCORNER=TOPLEFT,
    OR composition).  ``instances`` = [(x, y, sym_id)], any order;
    ``sym_widths`` are the dictionary symbols' widths in id order
    (needed because the decoder advances CURS by width-1 per draw)."""
    flags = (1 << 4)                       # REFCORNER=TOPLEFT
    out = struct.pack(">IIII", w, h, 0, 0) + b"\x00"
    out += struct.pack(">H", flags)
    out += struct.pack(">I", len(instances))
    codelen = _ceil_log2(len(sym_widths))
    enc = MQEncoder()
    iadt, iafs, iads, iait = (_IntCtx() for _ in range(4))
    iaid_cx = [[0, 0] for _ in range(1 << (codelen + 1))]
    rows: dict[int, list[tuple[int, int]]] = {}
    for x, y, sid in instances:
        rows.setdefault(y, []).append((x, sid))
    stript = 0
    _ia_encode(enc, iadt, 0)               # initial STRIPT = 0
    firsts = 0
    for y in sorted(rows):
        _ia_encode(enc, iadt, y - stript)
        stript = y
        insts = sorted(rows[y])
        curs = 0
        for k, (x, sid) in enumerate(insts):
            if k == 0:
                _ia_encode(enc, iafs, x - firsts)
                firsts = x
            else:
                _ia_encode(enc, iads, x - curs)
            _iaid_encode(enc, iaid_cx, codelen, sid)
            # decoder post-advances CURS by width-1 after a TOPLEFT
            # draw; mirror it so the next delta lines up
            curs = x + sym_widths[sid] - 1
        _ia_encode(enc, iads, OOB)
    return out + enc.flush()


def _segment(num: int, styp: int, payload: bytes,
             refs: tuple = ()) -> bytes:
    """One segment with short-form referred-to list (1-byte numbers —
    valid while segment numbers stay <= 256)."""
    if len(refs) > 4:
        raise ValueError("jbig2: fixture refs limited to short form")
    head = struct.pack(">IB", num, styp)
    head += bytes([len(refs) << 5])
    head += bytes(refs)
    head += b"\x01"                              # page 1
    return head + struct.pack(">I", len(payload)) + payload


def encode_pattern_dict(patterns: list[np.ndarray],
                        mmr: bool = False) -> bytes:
    """Pattern-dictionary payload (fixture encoder): equal-sized
    patterns packed side by side into one generic region."""
    hdph, hdpw = patterns[0].shape
    if any(pt.shape != (hdph, hdpw) for pt in patterns):
        raise ValueError("jbig2: patterns must share one size")
    big = np.concatenate([np.ascontiguousarray(pt, dtype=np.uint8)
                          for pt in patterns], axis=1)
    out = bytes([1 if mmr else 0, hdpw, hdph])
    out += struct.pack(">I", len(patterns) - 1)
    if mmr:
        from . import ccitt

        return out + ccitt.encode_g4(big.astype(bool))
    at = ((-hdpw, 0), (-3, -1), (2, -2), (-2, -2))
    enc = MQEncoder()
    cx = [[0, 0] for _ in range(1 << 16)]
    _encode_generic_core(enc, cx, big, at=at)
    return out + enc.flush()


def encode_halftone_region(rw: int, rh: int, gray: np.ndarray,
                           n_patterns: int, cell: int,
                           mmr: bool = False) -> bytes:
    """Halftone-region payload (fixture encoder): axis-aligned grid
    of ``cell``-pixel square spacing, gray-coded bitplanes."""
    hgh, hgw = gray.shape
    if int(np.asarray(gray).max(initial=0)) >= n_patterns:
        raise ValueError("jbig2: gray value out of pattern range")
    bits = max(1, _ceil_log2(n_patterns))
    # binary → gray planes, MSB first
    planes = []
    prev = None
    for j in range(bits - 1, -1, -1):
        b = (gray >> j) & 1
        planes.append(b if prev is None else (b ^ prev))
        prev = b
    flags = 1 if mmr else 0
    out = struct.pack(">IIII", rw, rh, 0, 0) + b"\x00"
    out += bytes([flags])
    out += struct.pack(">II", hgw, hgh)
    out += struct.pack(">ii", 0, 0)
    out += struct.pack(">HH", cell << 8, 0)
    if mmr:
        from . import ccitt

        big = np.concatenate([pl.astype(bool) for pl in planes],
                             axis=0)
        return out + ccitt.encode_g4(big)
    enc = MQEncoder()
    cx = [[0, 0] for _ in range(1 << 16)]
    for pl in planes:
        _encode_generic_core(enc, cx, pl.astype(np.uint8))
    return out + enc.flush()


def build_embedded_halftone(rw: int, rh: int,
                            patterns: list[np.ndarray],
                            gray: np.ndarray, cell: int,
                            mmr: bool = False) -> bytes:
    """Embedded stream: page info + pattern dictionary + immediate
    halftone region referring to it."""
    page_info = struct.pack(">IIII", rw, rh, 0, 0) + b"\x00\x00\x00"
    out = _segment(0, 48, page_info)
    out += _segment(1, 16, encode_pattern_dict(patterns, mmr=mmr))
    out += _segment(2, 22, encode_halftone_region(
        rw, rh, gray, len(patterns), cell, mmr=mmr), refs=(1,))
    out += _segment(3, 49, b"")
    return out


def build_embedded(img: np.ndarray, mmr: bool = False,
                   tpgdon: bool = False) -> bytes:
    """Minimal embedded JBIG2 stream: page info + one immediate
    lossless generic region covering the page."""
    a = np.ascontiguousarray(img, dtype=bool)
    h, w = a.shape
    segment = _segment

    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x00\x00\x00"
    out = segment(0, 48, page_info)
    if mmr:
        from . import ccitt

        body = b"\x01" + ccitt.encode_g4(a)
    else:
        gflags = 0x08 if tpgdon else 0x00
        at_bytes = b"".join(struct.pack("bb", dx, dy)
                            for dx, dy in _AT_DEFAULT)
        body = bytes([gflags]) + at_bytes \
            + encode_generic_region(a, tpgdon=tpgdon)
    region = struct.pack(">IIII", w, h, 0, 0) + b"\x00" + body
    out += segment(1, 39, region)
    out += segment(2, 49, b"")            # end of page
    return out


def build_embedded_text(w: int, h: int, symbols: list[np.ndarray],
                        instances: list[tuple[int, int, int]]) -> bytes:
    """Embedded JBIG2 stream using SYMBOL coding (the jbig2enc
    shape): page info + arithmetic symbol dictionary + immediate
    text region referring to it."""
    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x00\x00\x00"
    out = _segment(0, 48, page_info)
    out += _segment(1, 0, encode_symbol_dict(symbols))
    widths = [sym.shape[1] for sym in symbols]
    out += _segment(2, 6, encode_text_region(w, h, widths, instances),
                    refs=(1,))
    out += _segment(3, 49, b"")
    return out


# ------------------------------------ Huffman fixture encoders (r7)
def _huff_fixture_tables():
    """The three custom tables the Huffman fixtures use: a 0..31
    value table (DH / FS / DT), an OOB variant (DW / DS), and a
    0..65535 table (BMSIZE).  All complete canonical trees; the
    32-bit lower/upper lines make every int encodable."""
    from . import jbig2huff as HF

    plain = ([(1, 5)], 0, 32, 2, 2, 0)
    oob = ([(1, 5)], 0, 32, 2, 3, 3)
    wide = ([(1, 16)], 0, 1 << 16, 2, 2, 0)
    segs = [HF.encode_table_segment(*spec)
            for spec in (plain, oob, wide)]
    tabs = [HF.table_from_spec(*spec) for spec in (plain, oob, wide)]
    return segs, tabs


def encode_huff_symbol_dict(symbols: list[np.ndarray],
                            mmr: bool = True) -> bytes:
    """Huffman symbol-dictionary payload (SDHUFF=1) exporting
    ``symbols`` (height-sorted) with custom DH/DW/BMSIZE tables —
    collective bitmaps MMR-coded (default) or BMSIZE=0 raw."""
    from . import ccitt
    from . import jbig2huff as HF

    heights = [s.shape[0] for s in symbols]
    if heights != sorted(heights):
        raise ValueError("jbig2: symbols must be height-sorted")
    _segs, (tdh, tdw, tbm) = _huff_fixture_tables()
    # SDHUFF=1, SDHUFFDH=3, SDHUFFDW=3, SDHUFFBMSIZE=1(custom)
    flags = 1 | (3 << 2) | (3 << 4) | (1 << 6)
    out = struct.pack(">H", flags)
    out += struct.pack(">II", len(symbols), len(symbols))
    w = HF.HBitWriter()
    hcheight = 0
    i = 0
    while i < len(symbols):
        j = i
        while j < len(symbols) and symbols[j].shape[0] \
                == symbols[i].shape[0]:
            j += 1
        tdh.write(w, symbols[i].shape[0] - hcheight)
        hcheight = symbols[i].shape[0]
        symwidth = 0
        for k in range(i, j):
            tdw.write(w, symbols[k].shape[1] - symwidth)
            symwidth = symbols[k].shape[1]
        tdw.write(w, HF.OOB)
        coll = np.concatenate(
            [np.ascontiguousarray(s, dtype=bool)
             for s in symbols[i:j]], axis=1)
        body = ccitt.encode_g4(coll) if mmr else HF.pack_rows(coll)
        tbm.write(w, len(body) if mmr else 0)
        w.align()
        w.out += body
        i = j
    # export all: run 0 unexported, run N exported (Table B.1)
    texp = HF.std_table(1)
    texp.write(w, 0)
    texp.write(w, len(symbols))
    return out + w.payload()


def encode_huff_text_region(w: int, h: int, sym_widths: list[int],
                            instances: list[tuple[int, int, int]]) \
        -> bytes:
    """Huffman text-region payload (SBHUFF=1): custom FS/DS/DT
    tables, runcode-coded equal-length symbol IDs, SBSTRIPS=1,
    REFCORNER=TOPLEFT, OR composition."""
    from . import jbig2huff as HF

    _segs, (tplain, toob, _wide) = _huff_fixture_tables()
    flags = 1 | (1 << 4)                  # SBHUFF, REFCORNER=TOPLEFT
    # SBHUFFFS=3, SBHUFFDS=3, SBHUFFDT=3; RD*/RSIZE standard (unread)
    hflags = 3 | (3 << 2) | (3 << 4)
    out = struct.pack(">IIII", w, h, 0, 0) + b"\x00"
    out += struct.pack(">H", flags)
    out += struct.pack(">H", hflags)
    out += struct.pack(">I", len(instances))
    bw = HF.HBitWriter()
    n = len(sym_widths)
    codelen = max(1, _ceil_log2(n))
    HF.write_symbol_id_lengths(bw, [codelen] * n)
    symtab = HF.symbol_code_table([codelen] * n)
    rows: dict[int, list[tuple[int, int]]] = {}
    for x, y, sid in instances:
        rows.setdefault(y, []).append((x, sid))
    tplain.write(bw, 0)                   # initial STRIPT = 0
    stript = 0
    firsts = 0
    for y in sorted(rows):
        tplain.write(bw, y - stript)      # DT (FS/DT share a table)
        stript = y
        insts = sorted(rows[y])
        curs = 0
        for k, (x, sid) in enumerate(insts):
            if k == 0:
                tplain.write(bw, x - firsts)
                firsts = x
            else:
                toob.write(bw, x - curs)
            symtab.write(bw, sid)
            curs = x + sym_widths[sid] - 1
        toob.write(bw, HF.OOB)
    return out + bw.payload()


def build_embedded_text_huff(w: int, h: int,
                             symbols: list[np.ndarray],
                             instances: list[tuple[int, int, int]],
                             mmr: bool = True) -> bytes:
    """Embedded JBIG2 stream in the HUFFMAN production shape: page
    info + three custom table segments + Huffman symbol dictionary +
    Huffman immediate text region."""
    segs, _tabs = _huff_fixture_tables()
    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x00\x00\x00"
    out = _segment(0, 48, page_info)
    out += _segment(1, 53, segs[0])       # plain (DH / FS / DT)
    out += _segment(2, 53, segs[1])       # OOB   (DW / DS)
    out += _segment(3, 53, segs[2])       # wide  (BMSIZE)
    out += _segment(4, 0, encode_huff_symbol_dict(symbols, mmr=mmr),
                    refs=(1, 2, 3))
    widths = [sym.shape[1] for sym in symbols]
    # text region custom order FS, DS, DT -> plain, oob, plain
    out += _segment(5, 6, encode_huff_text_region(
        w, h, widths, instances), refs=(4, 1, 2, 1))
    out += _segment(6, 49, b"")
    return out
