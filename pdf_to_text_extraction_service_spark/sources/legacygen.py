"""Legacy binary Office fixture generators (.doc / .xls / .ppt).

From-scratch MS-CFB writer + minimal-but-conformant MS-DOC / BIFF8 /
MS-PPT payload builders, the legacy analog of sources/officegen.py
(OOXML) and sources/pdfgen.py. Small streams go through the REAL
ministream/miniFAT path (cutoff 4096), so reader fixtures exercise
both allocation schemes.
"""

from __future__ import annotations

import struct

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD

SSZ = 512
MSSZ = 64
MINI_CUTOFF = 4096


def _dir_entry(name: str, typ: int, start: int, size: int,
               left: int = -1, right: int = -1, child: int = -1) -> bytes:
    raw16 = name.encode("utf-16-le")
    buf = bytearray(128)
    buf[0:len(raw16)] = raw16
    struct.pack_into("<H", buf, 64, len(raw16) + 2)
    buf[66] = typ
    buf[67] = 1  # black
    struct.pack_into("<iii", buf, 68, left, right, child)
    struct.pack_into("<I", buf, 116, start)
    struct.pack_into("<Q", buf, 120, size)
    return bytes(buf)


def build_cfb(streams: list[tuple[str, bytes]],
              sector_size: int = 512) -> bytes:
    """Assemble a compound file (v3 with 512-byte sectors by default;
    sector_size=4096 emits the v4 layout with the header padded to a
    full sector): streams under 4096 bytes go in the ministream via
    miniFAT, larger ones in regular FAT chains; flat directory as a
    right-sibling chain."""
    SSZ = sector_size
    minis = [(n, b) for n, b in streams if len(b) < MINI_CUTOFF]
    bigs = [(n, b) for n, b in streams if len(b) >= MINI_CUTOFF]

    # ministream + miniFAT
    ministream = bytearray()
    minifat: list[int] = []
    mini_starts: dict[str, int] = {}
    for name, body in minis:
        n_sec = max(1, -(-len(body) // MSSZ))
        first = len(minifat)
        mini_starts[name] = first if body else ENDOFCHAIN
        for i in range(n_sec):
            minifat.append(first + i + 1 if i < n_sec - 1 else ENDOFCHAIN)
        ministream += body + b"\x00" * (n_sec * MSSZ - len(body))

    def sectors_of(n_bytes: int) -> int:
        return -(-n_bytes // SSZ) if n_bytes else 0

    n_dir_entries = 1 + len(streams)
    dir_bytes = -(-(n_dir_entries * 128) // SSZ) * SSZ
    n_dir = dir_bytes // SSZ
    minifat_bytes = -(-(len(minifat) * 4) // SSZ) * SSZ if minifat else 0
    n_minifat_sec = minifat_bytes // SSZ
    n_mini = sectors_of(len(ministream))
    n_big = sum(sectors_of(len(b)) for _, b in bigs)

    # FAT sizing (FAT sectors are themselves FAT-tracked)
    n_fat = 1
    while True:
        total = n_fat + n_dir + n_minifat_sec + n_mini + n_big
        need = -(-total // (SSZ // 4))
        if need <= n_fat:
            break
        n_fat = need

    # sector id assignment, in file order:
    # [FAT][directory][miniFAT][ministream][big streams]
    fat_ids = list(range(n_fat))
    nxt = n_fat
    dir_start = nxt
    nxt += n_dir
    minifat_start = nxt if n_minifat_sec else ENDOFCHAIN
    nxt += n_minifat_sec
    mini_start = nxt if n_mini else ENDOFCHAIN
    nxt += n_mini
    big_starts: dict[str, int] = {}
    for name, body in bigs:
        big_starts[name] = nxt
        nxt += sectors_of(len(body))
    total_sectors = nxt

    fat = [FREESECT] * (n_fat * (SSZ // 4))
    for sid in fat_ids:
        fat[sid] = FATSECT

    def chain(start: int, count: int) -> None:
        for i in range(count):
            fat[start + i] = start + i + 1 if i < count - 1 else ENDOFCHAIN

    chain(dir_start, n_dir)
    if n_minifat_sec:
        chain(minifat_start, n_minifat_sec)
    if n_mini:
        chain(mini_start, n_mini)
    for name, body in bigs:
        chain(big_starts[name], sectors_of(len(body)))

    # directory: root (child -> sid 1), streams chained via right sib
    entries = [_dir_entry(
        "Root Entry", 5,
        mini_start if n_mini else ENDOFCHAIN, len(ministream),
        child=1 if streams else -1)]
    for i, (name, body) in enumerate(streams):
        if len(body) < MINI_CUTOFF:
            start = mini_starts[name]
        else:
            start = big_starts[name]
        right = i + 2 if i + 1 < len(streams) else -1
        entries.append(_dir_entry(name, 2, start, len(body), right=right))
    dirs = b"".join(entries)
    dirs += b"\x00" * (dir_bytes - len(dirs))

    header = bytearray(max(512, SSZ))
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 3 if SSZ == 512 else 4)  # major
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, SSZ.bit_length() - 1)  # shift
    struct.pack_into("<H", header, 32, 6)       # mini shift
    struct.pack_into("<I", header, 44, n_fat)
    if SSZ != 512:  # v4: number of directory sectors
        struct.pack_into("<I", header, 40, n_dir)
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, MINI_CUTOFF)
    struct.pack_into("<I", header, 60,
                     minifat_start if n_minifat_sec else ENDOFCHAIN)
    struct.pack_into("<I", header, 64, n_minifat_sec)
    struct.pack_into("<I", header, 68, ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into("<I", header, 76 + 4 * i,
                         fat_ids[i] if i < len(fat_ids) else FREESECT)

    body = bytearray()
    body += b"".join(struct.pack("<I", v) for v in fat)
    body += dirs
    if n_minifat_sec:
        mf = b"".join(struct.pack("<I", v) for v in minifat)
        body += mf + b"\x00" * (minifat_bytes - len(mf))
    if n_mini:
        pad = sectors_of(len(ministream)) * SSZ - len(ministream)
        body += bytes(ministream) + b"\x00" * pad
    for name, sb in bigs:
        pad = sectors_of(len(sb)) * SSZ - len(sb)
        body += sb + b"\x00" * pad
    assert len(body) == total_sectors * SSZ
    return bytes(header) + bytes(body)


# ------------------------------------------------------------------ .doc


def build_doc(paragraphs: list[str], compressed: bool = False) -> bytes:
    """MS-DOC: FIB + piece table. compressed=True stores cp1252
    single-byte text (fc bit 30 set), else UTF-16LE."""
    text = "\r".join(paragraphs) + "\r"
    fc_text = 0x0800
    word = bytearray(fc_text)
    struct.pack_into("<H", word, 0, 0xA5EC)   # wIdent
    struct.pack_into("<H", word, 2, 0x00C1)   # nFib (Word 97)
    struct.pack_into("<H", word, 0x000A, 0)   # flags: 0Table
    if compressed:
        raw = text.encode("cp1252")
        fc_field = (fc_text * 2) | 0x40000000
    else:
        raw = text.encode("utf-16-le")
        fc_field = fc_text
    word += raw

    n_chars = len(text)
    plc = struct.pack("<II", 0, n_chars)
    plc += struct.pack("<HIH", 0, fc_field, 0)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    table = bytearray()
    fc_clx = len(table)
    table += clx
    struct.pack_into("<I", word, 0x01A2, fc_clx)
    struct.pack_into("<I", word, 0x01A6, len(clx))
    return build_cfb([
        ("WordDocument", bytes(word)),
        ("0Table", bytes(table)),
    ])


# ------------------------------------------------------------------ .xls


def _rec(rid: int, body: bytes) -> bytes:
    return struct.pack("<HH", rid, len(body)) + body


def _bof(dt: int) -> bytes:
    return _rec(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0x2775,
                                    0x07CD, 0, 0x0206))


def _sst(strings: list[str]) -> bytes:
    body = struct.pack("<II", len(strings), len(strings))
    for s in strings:
        enc = s.encode("utf-16-le")
        body += struct.pack("<HB", len(s), 0x01) + enc
    return _rec(0x00FC, body)


class Formula:
    """A FORMULA cell with a cached result: float, str (STRING record
    follows), bool, or an int BIFF error code (e.g. 0x07 #DIV/0!)."""

    def __init__(self, cached: object):
        self.cached = cached


def _formula_recs(r: int, c: int, cached: object) -> bytes:
    # FORMULA: row col ixfe num(8) grbit(2) chn(4) cce(2) + empty rgce
    if isinstance(cached, bool):
        num = bytes([1, 0, int(cached), 0, 0, 0, 0xFF, 0xFF])
    elif isinstance(cached, (int, float)) and not isinstance(cached, bool):
        num = struct.pack("<d", float(cached))
    elif isinstance(cached, str):
        num = bytes([0, 0, 0, 0, 0, 0, 0xFF, 0xFF])
    else:
        raise TypeError(f"unsupported cached formula value {cached!r}")
    out = _rec(0x0006, struct.pack("<HHH", r, c, 0) + num
               + struct.pack("<HIH", 0, 0, 0))
    if isinstance(cached, str):
        body = struct.pack("<HB", len(cached), 0x01) \
            + cached.encode("utf-16-le")
        out += _rec(0x0207, body)
    return out


def _error_formula_recs(r: int, c: int, code: int) -> bytes:
    num = bytes([2, 0, code, 0, 0, 0, 0xFF, 0xFF])
    return _rec(0x0006, struct.pack("<HHH", r, c, 0) + num
                + struct.pack("<HIH", 0, 0, 0))


def build_xls(sheet_name: str, rows: list[list[object]]) -> bytes:
    """BIFF8 workbook: one sheet; str cells via SST/LabelSst, numeric
    cells as Number records, Formula(...) cells as FORMULA records
    with cached results (+ a trailing STRING record for str caches)."""
    strings: list[str] = []
    sidx: dict[str, int] = {}
    for row in rows:
        for v in row:
            if isinstance(v, str) and v not in sidx:
                sidx[v] = len(strings)
                strings.append(v)

    sheet = bytearray(_bof(0x0010))
    for r, row in enumerate(rows):
        for c, v in enumerate(row):
            if isinstance(v, Formula):
                sheet += _formula_recs(r, c, v.cached)
            elif isinstance(v, str):
                sheet += _rec(0x00FD, struct.pack(
                    "<HHHI", r, c, 0, sidx[v]))
            elif v is not None:
                sheet += _rec(0x0203, struct.pack(
                    "<HHHd", r, c, 0, float(v)))
    sheet += _rec(0x000A, b"")

    name_raw = sheet_name.encode("utf-16-le")
    bs_body = struct.pack("<IHBB", 0, 0, len(sheet_name), 0x01) + name_raw
    globals_ = bytearray(_bof(0x0005))
    bs_off = len(globals_)
    globals_ += _rec(0x0085, bs_body)
    globals_ += _sst(strings)
    globals_ += _rec(0x000A, b"")
    struct.pack_into("<I", globals_, bs_off + 4, len(globals_))
    return build_cfb([("Workbook", bytes(globals_ + sheet))])


# ------------------------------------------------------------------ .ppt


def build_ppt(slides: list[list[str]]) -> bytes:
    """MS-PPT: one container per slide holding TextCharsAtom frames."""
    doc = bytearray()
    for frames in slides:
        inner = bytearray()
        for f in frames:
            body = f.encode("utf-16-le")
            inner += struct.pack("<HHI", 0x0000, 0x0FA0, len(body)) + body
        doc += struct.pack("<HHI", 0x000F, 0x03EE, len(inner)) + inner
    return build_cfb([
        ("Current User", struct.pack("<I", 20) + b"\x00" * 16),
        ("PowerPoint Document", bytes(doc)),
    ])
