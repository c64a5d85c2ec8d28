"""PDF text-layer kernel: span assembly, reading-order sort, column
detection, hybrid quality gating.

The reference shells out to poppler pdfinfo/pdftotext per page
(internal/extractor/poppler.go:51-164) and runs the hybrid pipeline of
internal/hybrid/hybrid.go:63-142. Offline we implement a from-scratch
text-layer reader for the corpus generator's uncompressed PDFs
(Tj/TJ/Td/TD/Tm operators), then reproduce the hybrid DECISION
STRUCTURE exactly: per-page cleanText → quality.Score(…, 20) → pages
under 0.50 become ``needs-ocr`` with empty text (hybrid.go:267-271);
ocrRatio ≥ 0.25 would escalate to full OCR (hybrid.go:113-123) — the
OCR leg is an explicit offline failure code, mirroring how the
reference continues with the text layer when OCR fails
(hybrid.go:126-129), and pdf.go:40-60 drops the hybrid error on wrap.

Layout model (north_star "reading-order sort and column detection"):
text spans carry (x, y); spans are clustered into columns by x-gap,
then ordered (column, -y, x); same-line spans (equal y within a
column) are joined left-to-right.
"""

from __future__ import annotations

import re

from . import mdformat, quality, runes, textnorm
from .result import PageResult, Result

MIN_WORDS_THRESHOLD = 20   # config.go:138 DEFAULT_MIN_WORDS
OCR_TRIGGER_RATIO = 0.25   # config.go:139 DEFAULT_OCR_TRIGGER_RATIO
PAGE_SEPARATOR = "\n\n---\n\n"  # config.go:140
MAX_PAGES = 50000          # poppler.go:201-206 sanity gate
MAX_PAGE_TEXT_BYTES = 10 << 20  # poppler.go:107 per-page output cap
MAX_DOC_TEXT_BYTES = 50 << 20   # poppler.go:141 whole-doc output cap

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.DOTALL)
_REF_RE = re.compile(rb"/(\w+)\s+(\d+)\s+0\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+0\s+R)*)\s*\]")
_KID_REF = re.compile(rb"(\d+)\s+0\s+R")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)


class PDFError(ValueError):
    pass


def _objects_scan(data: bytes) -> dict[int, bytes]:
    """Legacy whole-file regex scan (fallback when the xref is broken
    or missing). Object-stream members are expanded afterwards."""
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}


# --- xref-driven object loading (PDF 1.5+ layouts) ---------------------
#
# Modern writers emit cross-reference STREAMS (binary triples, usually
# FlateDecode + PNG predictor) and pack the small dictionary objects
# (catalog, pages tree, page dicts, fonts) into OBJECT STREAMS
# (/Type /ObjStm). poppler handles these natively (poppler.go:51-164
# behavior on any real-world PDF); this loader follows the
# startxref → xref chain (/Prev), slices objects by offset with exact
# /Length stream boundaries (binary-safe even when compressed bytes
# contain 'endobj'), and expands ObjStm members. Any structural
# failure falls back to the regex scan above.


def _skip_literal_string(data: bytes, i: int) -> int:
    """i at '(' — return index just past the matching ')'."""
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth > 0:
        c = data[i]
        if c == 0x5C:  # backslash escape
            i += 2
        elif c == 0x28:  # (
            depth += 1
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            i += 1
        else:
            i += 1
    return i


def _dict_end(data: bytes, i: int) -> int:
    """i at '<<' — return index just past the matching '>>',
    skipping literal strings, hex strings and comments."""
    depth = 0
    n = len(data)
    while i < n:
        two = data[i:i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return i
        elif data[i] == 0x28:  # (
            i = _skip_literal_string(data, i)
        elif data[i] == 0x3C:  # lone '<' → hex string
            j = data.find(b">", i + 1)
            i = j + 1 if j >= 0 else n
        elif data[i] == 0x25:  # % comment
            j = data.find(b"\n", i)
            i = j + 1 if j >= 0 else n
        else:
            i += 1
    raise PDFError("unterminated dictionary")


_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj")
# (?![0-9]) pins the digit run (no backtracking into '/Length 12'3 0 R)
_LENGTH_DIRECT_RE = re.compile(rb"/Length\s+(\d+)(?![0-9]|\s+\d+\s+R)")
_LENGTH_INDIRECT_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R")
_STREAM_KW_RE = re.compile(rb"\s*stream(\r\n|\n|\r)")


def _object_body_at(data: bytes, off: int,
                    length_resolver=None) -> tuple[int, bytes]:
    """Parse the object starting at ``off``; returns (obj_num, body)
    where body spans from after 'N G obj' to before 'endobj' — the
    same slice shape _OBJ_RE captures, but bounded by the declared
    stream /Length instead of the first 'endobj' byte pattern."""
    m = _OBJ_HEAD_RE.match(data, off) or _OBJ_HEAD_RE.match(
        data, off + len(data[off:off + 32])
        - len(data[off:off + 32].lstrip()))
    if m is None:
        raise PDFError(f"no object header at offset {off}")
    num = int(m.group(1))
    i = m.end()
    while i < len(data) and data[i] in b" \t\r\n":
        i += 1
    if data[i:i + 2] == b"<<":
        dend = _dict_end(data, i)
        sm = _STREAM_KW_RE.match(data, dend)
        if sm:
            dict_bytes = data[i:dend]
            lm = _LENGTH_DIRECT_RE.search(dict_bytes)
            if lm is not None:
                length = int(lm.group(1))
            else:
                lm = _LENGTH_INDIRECT_RE.search(dict_bytes)
                if lm is None or length_resolver is None:
                    raise PDFError("stream without resolvable /Length")
                length = length_resolver(int(lm.group(1)))
            end = sm.end() + length
            # body through 'endstream' so _stream_bytes sees it whole
            es = data.find(b"endstream", end)
            if es < 0:
                raise PDFError("missing endstream")
            return num, data[i:es + len(b"endstream")]
        return num, data[i:dend]
    # non-dict object (int, array, …): ends at 'endobj'
    e = data.find(b"endobj", i)
    if e < 0:
        raise PDFError("missing endobj")
    return num, data[i:e]


def _png_unpredict(data: bytes, columns: int) -> bytes:
    """Reverse PNG row filters (predictor >= 10): each row is a filter
    byte + ``columns`` bytes; filters 0-4 = None/Sub/Up/Average/Paeth
    with byte-per-pixel geometry (xref streams always use bpp=1)."""
    row_len = columns + 1
    if row_len <= 1 or len(data) % row_len != 0:
        raise PDFError("bad predictor geometry")
    out = bytearray()
    prev = bytearray(columns)
    for r in range(0, len(data), row_len):
        ft = data[r]
        row = bytearray(data[r + 1:r + row_len])
        if ft == 1:  # Sub
            for i in range(1, columns):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ft == 2:  # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(columns):
                left = row[i - 1] if i > 0 else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(columns):
                a = row[i - 1] if i > 0 else 0
                b = prev[i]
                c = prev[i - 1] if i > 0 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise PDFError(f"unknown PNG filter {ft}")
        out += row
        prev = row
    return bytes(out)


_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)\s*%%EOF", re.DOTALL)
_PREV_RE = re.compile(rb"/Prev\s+(\d+)")
_W_RE = re.compile(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]")
_SIZE_RE = re.compile(rb"/Size\s+(\d+)")
_INDEX_RE = re.compile(rb"/Index\s*\[((?:\s*\d+)+)\s*\]")
_PRED_RE = re.compile(rb"/Predictor\s+(\d+)")
_COLS_RE = re.compile(rb"/Columns\s+(\d+)")


def _read_xref(data: bytes,
               meta: dict | None = None) -> dict[int, tuple]:
    """Follow startxref → xref chain. Entry per object number:
    ('off', byte_offset) or ('objstm', stream_obj_num, index_in_stm).
    Newest section wins (first seen along the /Prev chain). When
    ``meta`` is passed, its 'trailer' key receives the NEWEST
    section's trailer/XRef-dict bytes (the authoritative place for
    /Encrypt and /ID — an older section's entries must not apply,
    e.g. after an incremental update that removed encryption)."""
    matches = list(_STARTXREF_RE.finditer(data[-2048:]))
    if not matches:
        raise PDFError("no startxref")
    off = int(matches[-1].group(1))
    entries: dict[int, tuple] = {}
    seen: set[int] = set()
    while off >= 0 and off not in seen and off < len(data):
        seen.add(off)
        window = data[off:off + 32].lstrip()
        if window.startswith(b"xref"):
            off = _read_xref_table(data, off, entries, meta)
        else:
            off = _read_xref_stream(data, off, entries, meta)
    return entries


def _read_xref_table(data: bytes, off: int, entries: dict,
                     meta: dict | None = None) -> int:
    """Classic 'xref' table section + trailer; returns /Prev or -1."""
    i = data.find(b"xref", off) + 4
    while True:
        m = re.match(rb"\s*(\d+)\s+(\d+)\s*(\r\n|\r|\n)", data[i:i + 64])
        if m is None:
            break
        start, count = int(m.group(1)), int(m.group(2))
        i += m.end()
        for k in range(count):
            raw = data[i:i + 20]
            if len(raw) < 18:
                raise PDFError("truncated xref entry")
            typ = raw[17:18]
            if typ == b"n":
                entries.setdefault(start + k, ("off", int(raw[0:10])))
            else:
                # record free entries too: a newer section's deletion
                # must shadow an older /Prev section's in-use entry
                # (incremental updates), not resurrect the object
                entries.setdefault(start + k, ("free",))
            i += 20
    t = data.find(b"trailer", i)
    if t < 0:
        return -1
    d0 = data.find(b"<<", t)
    trailer = data[d0:_dict_end(data, d0)]
    if meta is not None:
        meta.setdefault("trailer", trailer)  # first seen = newest
    pm = _PREV_RE.search(trailer)
    return int(pm.group(1)) if pm else -1


def _read_xref_stream(data: bytes, off: int, entries: dict,
                      meta: dict | None = None) -> int:
    """XRef STREAM section (PDF 1.5): binary (type, a, b) triples,
    widths per /W, optionally PNG-predicted; returns /Prev or -1."""
    _, body = _object_body_at(data, off)
    marker = body.find(b"stream")
    head = body[:marker]
    if b"/XRef" not in head:
        raise PDFError("startxref does not point at an XRef stream")
    if meta is not None:
        meta.setdefault("trailer", head)  # XRef dict doubles as trailer
    wm = _W_RE.search(head)
    sm = _SIZE_RE.search(head)
    if wm is None or sm is None:
        raise PDFError("XRef stream missing /W or /Size")
    w1, w2, w3 = (int(wm.group(i)) for i in (1, 2, 3))
    size = int(sm.group(1))
    index = [0, size]
    im = _INDEX_RE.search(head)
    if im:
        index = [int(x) for x in im.group(1).split()]
    raw = _stream_bytes(body)
    if raw is None:
        raise PDFError("XRef stream has no data")
    pm = _PRED_RE.search(head)
    if pm and int(pm.group(1)) >= 10:
        cm = _COLS_RE.search(head)
        cols = int(cm.group(1)) if cm else w1 + w2 + w3
        raw = _png_unpredict(raw, cols)
    rec = w1 + w2 + w3
    pos = 0
    for s in range(0, len(index), 2):
        start, count = index[s], index[s + 1]
        for k in range(count):
            if pos + rec > len(raw):
                raise PDFError("truncated XRef stream")
            f1 = int.from_bytes(raw[pos:pos + w1], "big") if w1 else 1
            f2 = int.from_bytes(raw[pos + w1:pos + w1 + w2], "big")
            f3 = int.from_bytes(raw[pos + w1 + w2:pos + rec], "big")
            pos += rec
            num = start + k
            if f1 == 1:
                entries.setdefault(num, ("off", f2))
            elif f1 == 2:
                entries.setdefault(num, ("objstm", f2, f3))
            else:  # type 0 = free — shadows older in-use entries
                entries.setdefault(num, ("free",))
    prevm = _PREV_RE.search(head)
    return int(prevm.group(1)) if prevm else -1


_OBJSTM_N_RE = re.compile(rb"/N\s+(\d+)")
_OBJSTM_FIRST_RE = re.compile(rb"/First\s+(\d+)")


def _expand_objstm(body: bytes, objs: dict[int, bytes]) -> None:
    """Decompress a /Type /ObjStm body and add its member objects
    (pairs of 'num offset' in the header, bodies packed after /First)
    to the object table; direct objects win on conflict."""
    marker = body.find(b"stream")
    head = body[:marker] if marker >= 0 else body
    nm = _OBJSTM_N_RE.search(head)
    fm = _OBJSTM_FIRST_RE.search(head)
    if nm is None or fm is None:
        return
    count, first = int(nm.group(1)), int(fm.group(1))
    data = _stream_bytes(body, objs)
    if data is None:
        return
    nums_offs = data[:first].split()
    pairs = [(int(nums_offs[2 * i]), int(nums_offs[2 * i + 1]))
             for i in range(min(count, len(nums_offs) // 2))]
    for i, (num, o) in enumerate(pairs):
        end = first + pairs[i + 1][1] if i + 1 < len(pairs) else len(data)
        objs.setdefault(num, data[first + o:end])


_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+\d+\s+R")
_ID_HEX_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f\s]*)>")


def _encryption_meta(buf: bytes) -> tuple[int | None, bytes]:
    """(encrypt_obj_num, first /ID element) parsed from ``buf`` —
    normally the NEWEST trailer/XRef dict (so an incremental update
    that removed encryption, or an embedded '/Encrypt' inside some
    unrelated stream, cannot misdetect the document); the regex-scan
    recovery path passes the whole file as best effort."""
    nums = _ENCRYPT_REF_RE.findall(buf)
    ids = _ID_HEX_RE.findall(buf)
    num = int(nums[-1]) if nums else None
    id0 = b""
    if ids:
        hexs = re.sub(rb"\s", b"", ids[-1])
        if len(hexs) % 2 == 0:
            id0 = bytes.fromhex(hexs.decode("latin-1"))
    return num, id0


def _decrypt_objects(objs: dict[int, bytes], dec, skip: set[int]) -> None:
    """Replace every stream payload with its decrypted bytes (head's
    /Length patched to the new direct value) so the rest of the
    reader is encryption-blind. XRef streams are never encrypted
    (PDF 32000 §7.5.8.2) and the /Encrypt object itself is skipped.
    A single undecryptable stream (truncated/zero-length — real
    writers emit them) drops only THAT object, like poppler
    recovering the remaining pages, rather than failing the whole
    document."""
    for num in list(objs):
        if num in skip:
            continue
        body = objs[num]
        marker = body.find(b"stream")
        if marker < 0:
            continue
        head = body[:marker]
        if b"/XRef" in head:
            continue
        start = marker + len(b"stream")
        if body[start:start + 2] == b"\r\n":
            start += 2
        elif body[start:start + 1] == b"\n":
            start += 1
        length = _declared_length(head, objs)
        raw = body[start:start + length] if length is not None else None
        if raw is None:
            sm = _STREAM_RE.search(body)
            if sm is None:
                continue
            raw = sm.group(1)
        try:
            plain = dec.decrypt(num, raw)
        except Exception:
            del objs[num]  # absent object = null; page degrades alone
            continue
        new_head = re.sub(rb"/Length\s+\d+(?:\s+\d+\s+R)?",
                          b"/Length %d" % len(plain), head, count=1)
        objs[num] = new_head + b"stream\n" + plain + b"\nendstream"


def _load_objects(data: bytes) -> dict[int, bytes]:
    """Object table via the xref chain (offset-exact, ObjStm-aware);
    regex-scan fallback on any structural failure. Encrypted
    documents (standard handler, empty user password) are decrypted
    in place; password-protected ones raise — the hybrid pipeline
    routes those to needs-ocr, like poppler failing on a real
    password. Either way, any /Type /ObjStm bodies found get
    expanded."""
    objs: dict[int, bytes] = {}
    xmeta: dict = {}
    from_scan = False
    try:
        xref = _read_xref(data, xmeta)
        if not xref:
            raise PDFError("empty xref")

        def resolve_length(num: int) -> int:
            ent = xref.get(num)
            if ent is None or ent[0] != "off":
                raise PDFError(f"unresolvable /Length {num} 0 R")
            _, b = _object_body_at(data, ent[1])
            return int(b.strip())

        for num, ent in xref.items():
            if ent[0] == "off" and 0 <= ent[1] < len(data):
                try:
                    got, body = _object_body_at(data, ent[1],
                                                resolve_length)
                    objs.setdefault(got, body)
                except PDFError:
                    continue
        if not objs:
            raise PDFError("xref resolved no objects")
    except (PDFError, ValueError, OverflowError):
        # corrupted xref bytes surface as int()/struct conversion
        # errors as readily as structural PDFErrors — either way the
        # regex scan is the recovery path
        objs = _objects_scan(data)
        from_scan = True
    # encryption detection: scoped to the NEWEST trailer when the
    # xref chain parsed; whole-file best effort only on the scan path
    if not from_scan and "trailer" in xmeta:
        enc_num, id0 = _encryption_meta(xmeta["trailer"])
        if enc_num is not None and not id0:
            # /ID sometimes sits only in an older trailer
            _, id0 = _encryption_meta(data)
    else:
        enc_num, id0 = _encryption_meta(data)
    if enc_num is not None:
        from . import pdfcrypt
        enc_body = objs.get(enc_num)
        if enc_body is None:
            raise PDFError("missing /Encrypt dictionary")
        try:
            dec = pdfcrypt.StandardDecryptor(enc_body, id0)
        except pdfcrypt.PDFCryptError as exc:
            raise PDFError(str(exc))
        _decrypt_objects(objs, dec, skip={enc_num})
    for body in list(objs.values()):
        if b"/ObjStm" in body[:256]:
            try:
                _expand_objstm(body, objs)
            except (PDFError, ValueError):
                continue
    return objs


def page_count(data: bytes) -> int:
    """Number of pages (the pdfinfo analog). Raises PDFError on
    structurally broken PDFs."""
    if not data.startswith(b"%PDF-"):
        raise PDFError("not a PDF")
    objs = _load_objects(data)
    pages_obj = _find_pages_obj(objs)
    if pages_obj is None:
        raise PDFError("no /Pages object")
    kids = _kids(pages_obj)
    n = len(kids)
    if n < 1 or n > MAX_PAGES:
        raise PDFError(f"invalid page count: {n}")
    return n


def _find_pages_obj(objs: dict[int, bytes]) -> bytes | None:
    for body in objs.values():
        if b"/Type" in body and b"/Catalog" in body:
            m = _REF_RE.search(body)
            for ref in _REF_RE.finditer(body):
                if ref.group(1) == b"Pages":
                    return objs.get(int(ref.group(2)))
    # Fallback: first object that has /Kids.
    for body in objs.values():
        if b"/Kids" in body:
            return body
    return None


def _kids(pages_obj: bytes) -> list[int]:
    m = _KIDS_RE.search(pages_obj)
    if m is None:
        return []
    return [int(k.group(1)) for k in _KID_REF.finditer(m.group(1))]


class PDFDoc:
    """Parsed object table + page list — built ONCE per document so
    per-page extraction doesn't rescan the file (the poppler analog
    opens the file once per pdftotext call; we do better)."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise PDFError("not a PDF")
        self.objs = _load_objects(data)
        self._font_cache: dict[int, tuple[int, dict[int, str]] | None] = {}
        pages_obj = _find_pages_obj(self.objs)
        if pages_obj is None:
            raise PDFError("no /Pages object")
        self.kids = _kids(pages_obj)
        n = len(self.kids)
        if n < 1 or n > MAX_PAGES:
            raise PDFError(f"invalid page count: {n}")

    @property
    def page_count(self) -> int:
        return len(self.kids)

    def page_text(self, page_num: int) -> str:
        if page_num < 1 or page_num > len(self.kids):
            raise PDFError(f"page {page_num} out of range")
        page_body = self.objs.get(self.kids[page_num - 1])
        if page_body is None:
            raise PDFError("missing page object")
        contents_ref = None
        for ref in _REF_RE.finditer(page_body):
            if ref.group(1) == b"Contents":
                contents_ref = int(ref.group(2))
                break
        if contents_ref is None:
            return ""
        content_body = self.objs.get(contents_ref)
        if content_body is None:
            # a reference to a free/absent object is null (PDF 32000
            # §7.3.10) — poppler renders such a page empty, e.g. a
            # /Contents deleted by an incremental update
            return ""
        stream = _stream_bytes(content_body, self.objs)
        if stream is None:
            return ""
        spans = _parse_content_spans(stream, self._page_fonts(page_body))
        text = assemble_reading_order(spans)
        # poppler.go:107 hard-caps per-page pdftotext output; an
        # oversized page is a per-page failure (→ needs-ocr).
        if len(text.encode("utf-8", errors="replace")) > MAX_PAGE_TEXT_BYTES:
            raise PDFError("page text exceeds 10MB limit")
        return text


    def page_images(self, page_num: int) -> list["ImageStats"]:
        """Per-page embedded-image statistics: image XObjects from the
        page's /Resources (DCTDecode via the from-spec JPEG decoder,
        CCITTFaxDecode via the from-spec G3/G4 fax decoder in
        kernel/ccitt.py, filter-chained raw gray/RGB samples
        otherwise) plus BI/ID/EI inline images from the content
        stream.  Undecodable images (JPX/JBIG2, corrupt payloads)
        yield a size-only entry with ``decoded=False`` — never an
        exception."""
        if page_num < 1 or page_num > len(self.kids):
            raise PDFError(f"page {page_num} out of range")
        page_body = self.objs.get(self.kids[page_num - 1])
        if page_body is None:
            return []
        out: list[ImageStats] = []
        # --- XObjects via /Resources
        res = page_body
        rm = _RES_REF_RE.search(page_body)
        if rm:
            res = self.objs.get(int(rm.group(1)), b"")
        xm = _XOBJ_DICT_RE.search(res)
        if xm is None:
            xr = _XOBJ_REF_RE.search(res)
            xm = _XOBJ_DICT_RE.search(
                b"/XObject <<" + self.objs.get(
                    int(xr.group(1)), b"") + b">>") if xr else None
        if xm is not None:
            for ref in _FONT_REF_RE.finditer(xm.group(1)):
                body = self.objs.get(int(ref.group(2)))
                if body is None:
                    continue
                marker = body.find(b"stream")
                head = body[:marker] if marker >= 0 else body
                if not re.search(rb"/Subtype\s*/Image", head):
                    continue
                raw = _raw_stream_bytes(body, self.objs)
                w = _img_int(head, b"Width", b"W") or 0
                h = _img_int(head, b"Height", b"H") or 0
                try:
                    if raw is None:
                        raise PDFError("image: missing stream")
                    out.append(_decode_image_payload(
                        "xobject", head, raw, _img_filters(head),
                        objs=self.objs))
                except (PDFError, ValueError, OverflowError,
                        MemoryError):
                    out.append(ImageStats("xobject", w, h))
        # --- inline images from the content stream
        contents_ref = None
        for ref in _REF_RE.finditer(page_body):
            if ref.group(1) == b"Contents":
                contents_ref = int(ref.group(2))
                break
        if contents_ref is not None:
            content_body = self.objs.get(contents_ref)
            if content_body is not None:
                try:
                    stream = _stream_bytes(content_body, self.objs)
                except (PDFError, ValueError):
                    stream = None
                if stream:
                    for head, data in _iter_inline_images(stream):
                        w = _img_int(head, b"Width", b"W") or 0
                        h = _img_int(head, b"Height", b"H") or 0
                        try:
                            out.append(_decode_image_payload(
                                "inline", head, data,
                                _img_filters(head)))
                        except (PDFError, ValueError, OverflowError,
                                MemoryError):
                            out.append(ImageStats("inline", w, h))
        return out

    def page_image_stats(self, page_num: int) -> dict:
        """Aggregate of :meth:`page_images` — integer-only so fixture
        oracles stay closed-form."""
        imgs = self.page_images(page_num)
        return {
            "n_images": len(imgs),
            "n_decoded": sum(1 for s in imgs if s.decoded),
            "pixels": sum(s.width * s.height for s in imgs),
            "n_samples": sum(s.n_samples for s in imgs),
            "ink_samples": sum(s.ink_samples for s in imgs),
            "sum_luma": sum(s.sum_luma for s in imgs),
        }

    def _page_fonts(self, page_body: bytes) \
            -> dict[str, tuple[int, dict[int, str]]]:
        """Resolve the page's /Resources /Font entries to their
        ToUnicode CMaps (cached per font object; fonts without a
        ToUnicode map text as identity, like the generator's
        Helvetica)."""
        res = page_body
        rm = _RES_REF_RE.search(page_body)
        if rm:
            res = self.objs.get(int(rm.group(1)), b"")
        fm = _FONT_DICT_RE.search(res)
        if fm is None:
            return {}
        fonts: dict[str, tuple[int, dict[int, str]]] = {}
        for ref in _FONT_REF_RE.finditer(fm.group(1)):
            name = ref.group(1).decode("latin-1")
            cmap = self._font_cmap(int(ref.group(2)))
            if cmap is not None:
                fonts[name] = cmap
        return fonts

    def _font_cmap(self, num: int) -> tuple[int, dict[int, str]] | None:
        if num in self._font_cache:
            return self._font_cache[num]
        val = None
        body = self.objs.get(num)
        if body is not None:
            tm = _TOUNI_RE.search(body)
            if tm is not None:
                cmb = self.objs.get(int(tm.group(1)))
                if cmb is not None:
                    try:
                        data = _stream_bytes(cmb, self.objs)
                        if data:
                            val = _parse_tounicode(data)
                    except (PDFError, ValueError):
                        val = None
            if val is None:
                val = self._font_encoding(body)
        self._font_cache[num] = val
        return val

    def _font_encoding(self, body: bytes) \
            -> tuple[int, dict[int, str]] | None:
        """No-ToUnicode fallback: resolve a simple font's /Encoding
        (base-encoding name, or a dict — inline or referenced — with
        /BaseEncoding + /Differences) to a code->char table via
        kernel/pdfenc.py, the precedence poppler applies.  Type0
        Identity-H/-V fonts map as 2-byte identity.  Fonts with
        neither stay 1-byte identity (the pre-r6 behavior)."""
        from . import pdfenc

        em = _ENC_IDENT_RE.search(body)
        if em is not None and b"/Type0" in body:
            return (2, {})
        enc_src = body
        rm = _ENC_REF_RE.search(body)
        if rm is not None:
            enc_src = self.objs.get(int(rm.group(1)), b"")
        nm = _ENC_NAME_RE.search(enc_src)
        base = pdfenc.base_encoding(
            nm.group(1).decode("latin-1")) if nm else None
        dm = _DIFFERENCES_RE.search(enc_src)
        if dm is None:
            return (1, base) if base is not None else None
        diffs: list[int | str] = []
        for tok in _DIFF_TOKEN_RE.finditer(dm.group(1)):
            if tok.group(1) is not None:
                diffs.append(tok.group(1).decode("latin-1"))
            else:
                diffs.append(int(tok.group(2)))
        return (1, pdfenc.apply_differences(base, diffs))


_RES_REF_RE = re.compile(rb"/Resources\s+(\d+)\s+0\s+R")
_FONT_DICT_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.DOTALL)
_FONT_REF_RE = re.compile(rb"/(\w+)\s+(\d+)\s+0\s+R")
_TOUNI_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+0\s+R")
_ENC_IDENT_RE = re.compile(rb"/Encoding\s*/Identity-[HV]\b")
_ENC_REF_RE = re.compile(rb"/Encoding\s+(\d+)\s+0\s+R")
_ENC_NAME_RE = re.compile(
    rb"/(?:Base)?Encoding\s*/(WinAnsiEncoding|MacRomanEncoding|"
    rb"StandardEncoding|MacExpertEncoding)\b")
_DIFFERENCES_RE = re.compile(rb"/Differences\s*\[(.*?)\]", re.DOTALL)
_DIFF_TOKEN_RE = re.compile(rb"/([^\s/\[\]()<>{}]+)|(\d+)")


# --- embedded images -------------------------------------------------
#
# The reference's hybrid escalation (hybrid.go:113-123) OCRs pages
# whose text layer is absent — keyed purely on absence-of-text because
# poppler gives it no pixel access.  With a from-spec JPEG/raw decoder
# (kernel/imgcodec.py) we can do better: decode each page's image
# XObjects (DCTDecode baseline AND progressive) and BI/ID/EI inline
# images, and drive the needs-ocr decision for IMAGE-ONLY pages from
# real pixel content — a page whose images are uniformly blank paper
# is pruned from the OCR queue (the countOCRPages/savings metric),
# while pages with real ink keep escalating.  Undecodable images
# (JPX/JBIG2, corrupt streams) conservatively keep the reference
# behavior (needs-ocr).  r6: CCITT Group 3/4 fax XObjects — the
# dominant scanned-document codec — decode through kernel/ccitt.py,
# extending the blank-paper pruning to the scanned-PDF class.

INK_LUMA_THRESHOLD = 250   # samples strictly below this are "ink"
_IMG_INT_RE = rb"/%s\s+(\d+)"
_XOBJ_DICT_RE = re.compile(rb"/XObject\s*<<(.*?)>>", re.DOTALL)
_XOBJ_REF_RE = re.compile(rb"/XObject\s+(\d+)\s+0\s+R")
_BI_ID_RE = re.compile(rb"(?<![A-Za-z0-9])ID[\x00\t\n\f\r ]")
_BI_RE = re.compile(rb"(?<![A-Za-z0-9])BI(?![A-Za-z0-9])")


def _img_int(head: bytes, *names: bytes) -> int | None:
    for nm in names:
        m = re.search(_IMG_INT_RE % nm, head)
        if m is not None:
            return int(m.group(1))
    return None


def _img_sint(head: bytes, name: bytes) -> int | None:
    """Signed integer param (CCITTFaxDecode /K may be negative)."""
    m = re.search(rb"/%s\s+(-?\d+)" % name, head)
    return int(m.group(1)) if m is not None else None


def _img_name(head: bytes, *names: bytes) -> str | None:
    for nm in names:
        m = re.search(rb"/%s\s*/(\w+)" % nm, head)
        if m is not None:
            return m.group(1).decode("latin-1")
    return None


def _img_filters(head: bytes) -> list[str]:
    m = re.search(rb"/(?:Filter|F)\s*(?:\[([^\]]*)\]|/([A-Za-z0-9]+))",
                  head)
    if m is None:
        return []
    if m.group(2) is not None:
        return [m.group(2).decode("latin-1")]
    return [n.group(1).decode("latin-1")
            for n in _FILTER_NAME_RE.finditer(m.group(1))]


class ImageStats:
    """Decoded (or size-only) statistics for one embedded image."""

    __slots__ = ("kind", "width", "height", "decoded",
                 "n_samples", "ink_samples", "sum_luma")

    def __init__(self, kind: str, width: int, height: int,
                 decoded: bool = False, n_samples: int = 0,
                 ink_samples: int = 0, sum_luma: int = 0):
        self.kind = kind
        self.width = width
        self.height = height
        self.decoded = decoded
        self.n_samples = n_samples
        self.ink_samples = ink_samples
        self.sum_luma = sum_luma


def _stats_from_array(kind: str, arr) -> ImageStats:
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = a.shape[0], a.shape[1]
    return ImageStats(
        kind, w, h, decoded=True, n_samples=int(a.size),
        ink_samples=int((a < INK_LUMA_THRESHOLD).sum()),
        sum_luma=int(a.astype(np.int64).sum()),
    )


def _decode_image_payload(kind: str, head: bytes, raw: bytes,
                          filters: list[str],
                          objs: dict[int, bytes] | None = None) \
        -> ImageStats:
    """Decode one image stream into pixel stats.  Integer-only stats
    (counts and sums) so a fixture oracle is closed-form.  Raises
    PDFError/ValueError on anything undecodable; callers downgrade to
    a size-only ImageStats."""
    import numpy as np

    from . import imgcodec

    w = _img_int(head, b"Width", b"W")
    h = _img_int(head, b"Height", b"H")
    if w is None or h is None or w <= 0 or h <= 0 \
            or w * h > imgcodec.MAX_PIXELS:
        raise PDFError("image: bad dimensions")
    for i, name in enumerate(filters):
        if name in ("DCTDecode", "DCT"):
            if i != len(filters) - 1:
                raise PDFError("image: DCTDecode not last in chain")
            arr = imgcodec.decode_jpeg(raw)
            return _stats_from_array(kind, arr)
        if name in ("CCITTFaxDecode", "CCF"):
            if i != len(filters) - 1:
                raise PDFError("image: CCITT not last in chain")
            from . import ccitt

            k = _img_sint(head, b"K") or 0
            columns = _img_sint(head, b"Columns")
            columns = 1728 if columns is None else columns
            rows = _img_sint(head, b"Rows") or h
            bits = ccitt.ccitt_decode(
                raw, k, columns, rows,
                byte_align=bool(re.search(
                    rb"/EncodedByteAlign\s+true", head)))
            # fax bits are semantic black/white; map to 8-bit luma
            # (black = 0 ink, white = 255) for the pixel stats —
            # BlackIs1 / /Decode only choose the 1-bit sample
            # representation, which this path never materializes
            arr = np.where(bits, 0, 255).astype("uint8")
            return _stats_from_array(kind, arr)
        if name == "JBIG2Decode":
            if i != len(filters) - 1:
                raise PDFError("image: JBIG2 not last in chain")
            from . import jbig2

            gdata = None
            gm = re.search(rb"/JBIG2Globals\s+(\d+)\s+0\s+R", head)
            if gm is not None and objs is not None:
                gbody = objs.get(int(gm.group(1)))
                if gbody is not None:
                    gdata = _stream_bytes(gbody, objs)
            bits = jbig2.decode_embedded(raw, gdata)
            # JBIG2 bit 1 = black; map to 8-bit luma like the fax path
            arr = np.where(bits, 0, 255).astype("uint8")
            return _stats_from_array(kind, arr)
        if name == "JPXDecode":
            if i != len(filters) - 1:
                raise PDFError("image: JPX not last in chain")
            # real decode inside kernel/jp2k's Part 1 subset
            # (lossless 5/3 + lossy 9/7+ICT); anything outside it
            # (precincts, multi-tile, derived quantization,
            # oversized) still yields truthful dimensions from the
            # JP2/J2K header walk for the size-only entry (the
            # /Width//Height dict keys can lie)
            from . import jp2k, mp4box

            try:
                return _stats_from_array(kind, jp2k.decode_jp2k(raw))
            except ValueError:
                _c, jw, jh, _nc, _d = mp4box.parse_jp2_dims(raw)
                return ImageStats(kind, jw, jh)
        raw = _apply_filter(name, raw)
    # no image codec: raw samples — 8-bit gray/RGB, or sub-byte
    # (1/2/4-bit) gray incl. /ImageMask stencils (scanned PDFs often
    # carry 1-bit rasters without any compression filter)
    bpc = _img_int(head, b"BitsPerComponent", b"BPC")
    cs = _img_name(head, b"ColorSpace", b"CS")
    is_mask = re.search(rb"/(?:ImageMask|IM)\s+true", head) is not None
    if is_mask:
        bpc = 1
        cs = None
    ncomp = {"DeviceGray": 1, "G": 1, "DeviceRGB": 3, "RGB": 3,
             None: 1}.get(cs)
    if ncomp is None or (bpc != 8 and (ncomp != 1
                                       or bpc not in (1, 2, 4))):
        raise PDFError("image: unsupported raw sample format")
    if bpc != 8:
        # rows are padded to byte boundaries (PDF 32000-1 §8.9.3)
        import numpy as np

        stride = (w * bpc + 7) // 8
        need = stride * h
        if len(raw) < need:
            raise PDFError("image: truncated samples")
        rows_bits = np.unpackbits(
            np.frombuffer(raw[:need], dtype=np.uint8).reshape(
                h, stride), axis=1)
        vals = rows_bits[:, :w * bpc].reshape(h, w, bpc)
        weights = (1 << np.arange(bpc - 1, -1, -1)).astype(np.int64)
        samples = (vals * weights).sum(axis=2)
        maxv = (1 << bpc) - 1
        if is_mask:
            # stencil: sample 0 paints (ink) under the default
            # /Decode [0 1]; painted -> luma 0
            arr = np.where(samples == 0, 0, 255).astype("uint8")
        else:
            arr = (samples * 255 // maxv).astype("uint8")
        return _stats_from_array(kind, arr)
    need = w * h * ncomp
    if len(raw) < need:
        raise PDFError("image: truncated samples")
    # reshape so shape[1] is the PIXEL width (channels on axis 2) —
    # otherwise a raw RGB image reports width*3
    arr = np.frombuffer(raw[:need], dtype=np.uint8).reshape(h, w, ncomp) \
        if ncomp > 1 else \
        np.frombuffer(raw[:need], dtype=np.uint8).reshape(h, w)
    return _stats_from_array(kind, arr)


def _iter_inline_images(stream: bytes):
    """Yield ``(params_head, data)`` for each BI…ID…EI inline image,
    using the same delimiter conventions as ``_skip_inline_image``."""
    i, n = 0, len(stream)
    while i < n:
        # offset search, no slicing: a stream with thousands of
        # inline images would otherwise copy its tail per image
        m = _BI_RE.search(stream, i)
        if m is None:
            return
        start = m.end()
        mid = _BI_ID_RE.search(stream, start)
        if mid is None:
            return
        data_start = mid.end()
        m2 = _EI_RE.search(stream, data_start)
        if m2 is None:
            return
        yield stream[start:mid.start()], stream[data_start:m2.start()]
        i = m2.end()


def extract_page_text(data: bytes, page_num: int) -> str:
    """Text of 1-indexed page page_num (the pdftotext-per-page analog)."""
    return PDFDoc(data).page_text(page_num)


def _declared_length(head: bytes,
                     objs: dict[int, bytes] | None) -> int | None:
    """/Length as a direct int, or resolved through an indirect
    'N 0 R' reference; None when undeclared/unresolvable."""
    lm = _LENGTH_DIRECT_RE.search(head)
    if lm is not None:
        return int(lm.group(1))
    ind = _LENGTH_INDIRECT_RE.search(head)
    if ind is not None and objs is not None:
        ref = objs.get(int(ind.group(1)))
        if ref is not None:
            try:
                return int(ref.strip())
            except ValueError:
                return None
    return None


def _stream_bytes(content_body: bytes,
                  objs: dict[int, bytes] | None = None) -> bytes | None:
    """Slice a content stream by its declared /Length (binary-safe —
    compressed data may contain 'endstream' bytes), resolving an
    indirect '/Length N 0 R' through ``objs``, falling back to the
    endstream delimiter; FlateDecode via zlib."""
    raw = _raw_stream_bytes(content_body, objs)
    if raw is None:
        return None
    for name in _filter_chain(content_body[:content_body.find(b"stream")]):
        raw = _apply_filter(name, raw)
    return raw


def _raw_stream_bytes(content_body: bytes,
                      objs: dict[int, bytes] | None = None) \
        -> bytes | None:
    """Stream payload bytes with NO filters applied (image XObject
    streams keep their encoded form for the image decoders)."""
    marker = content_body.find(b"stream")
    if marker < 0:
        return None
    start = marker + len(b"stream")
    if content_body[start:start + 2] == b"\r\n":
        start += 2
    elif content_body[start:start + 1] == b"\n":
        start += 1
    length = _declared_length(content_body[:marker], objs)
    if length is not None:
        return content_body[start:start + length]
    sm = _STREAM_RE.search(content_body)
    if sm is None:
        return None
    return sm.group(1)


# --- stream filters ------------------------------------------------------

_FILTER_RE = re.compile(rb"/Filter\s*(?:\[([^\]]*)\]|/([A-Za-z0-9]+))")
_FILTER_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")


def _filter_chain(head: bytes) -> list[str]:
    m = _FILTER_RE.search(head)
    if m is None:
        return []
    if m.group(2) is not None:
        return [m.group(2).decode("latin-1")]
    return [n.group(1).decode("latin-1")
            for n in _FILTER_NAME_RE.finditer(m.group(1))]


def _apply_filter(name: str, raw: bytes) -> bytes:
    """Decode one /Filter stage. Unsupported filters (DCT/JPX,
    i.e. embedded images, and crypt filters) raise — which the hybrid
    pipeline turns into a needs-ocr page, not garbage text."""
    if name == "FlateDecode" or name == "Fl":
        import zlib
        try:
            return zlib.decompress(raw)
        except zlib.error as exc:
            raise PDFError(f"flate decode failed: {exc}") from exc
    if name == "ASCIIHexDecode" or name == "AHx":
        data = re.sub(rb"\s", b"", raw)
        if data.endswith(b">"):
            data = data[:-1]
        if len(data) % 2:
            data += b"0"
        try:
            return bytes.fromhex(data.decode("ascii"))
        except (ValueError, UnicodeDecodeError) as exc:
            raise PDFError(f"asciihex decode failed: {exc}") from exc
    if name == "ASCII85Decode" or name == "A85":
        return _a85_decode(raw)
    if name == "RunLengthDecode" or name == "RL":
        return _rl_decode(raw)
    if name == "LZWDecode" or name == "LZW":
        return _lzw_decode(raw)
    raise PDFError(f"unsupported stream filter /{name}")


def _a85_decode(raw: bytes) -> bytes:
    data = re.sub(rb"\s", b"", raw)
    if data.startswith(b"<~"):
        data = data[2:]
    if data.endswith(b"~>"):
        data = data[:-2]
    out = bytearray()
    group: list[int] = []
    for ch in data:
        if ch == 0x7A and not group:  # 'z' → four zero bytes
            out += b"\x00\x00\x00\x00"
            continue
        if not (33 <= ch <= 117):
            raise PDFError(f"ascii85: invalid byte {ch}")
        group.append(ch - 33)
        if len(group) == 5:
            n = 0
            for g in group:
                n = n * 85 + g
            if n > 0xFFFFFFFF:
                raise PDFError("ascii85: group overflow")
            out += n.to_bytes(4, "big")
            group = []
    if group:
        k = len(group)
        if k == 1:
            raise PDFError("ascii85: lone trailing digit")
        group += [84] * (5 - k)  # pad with 'u'
        n = 0
        for g in group:
            n = n * 85 + g
        out += n.to_bytes(4, "big")[:k - 1]
    return bytes(out)


def _rl_decode(raw: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        ln = raw[i]
        if ln == 128:  # EOD
            break
        if ln < 128:
            out += raw[i + 1:i + 2 + ln]
            i += 2 + ln
        else:
            if i + 1 >= n:
                raise PDFError("runlength: truncated run")
            out += raw[i + 1:i + 2] * (257 - ln)
            i += 2
    return bytes(out)


def _lzw_decode(raw: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode: MSB-first variable-width codes (9→12 bits),
    256=clear, 257=EOD, EarlyChange=1 by default."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    bitbuf = nbits = 0
    for byte in raw:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise PDFError("lzw: bad first code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise PDFError("lzw: code out of range")
            out += entry
            prev = entry
            if len(table) + early - 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


# --- ToUnicode CMaps (font-encoded text) --------------------------------
#
# Real-world PDFs show text as font CODES (often via hex strings) and
# carry the code→Unicode mapping in each font's /ToUnicode CMap stream
# (poppler resolves these natively). Supported here: 1- and 2-byte
# codespaces, bfchar entries, and bfrange runs (incremental or
# array-destination), UTF-16BE destinations.

_HEXBLOB_RE = re.compile(rb"<([0-9a-fA-F\s]*)>")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_CODESPACE_RE = re.compile(
    rb"begincodespacerange(.*?)endcodespacerange", re.DOTALL)


def _hex_to_int(h: bytes) -> int:
    return int(re.sub(rb"\s", b"", h), 16)


def _hex_to_text(h: bytes) -> str:
    raw = re.sub(rb"\s", b"", h)
    if len(raw) % 2:
        raw += b"0"
    b = bytes.fromhex(raw.decode("ascii", "replace"))
    if len(b) % 2:
        b += b"\x00"
    return b.decode("utf-16-be", errors="replace")


def _parse_tounicode(data: bytes) -> tuple[int, dict[int, str]]:
    """Parse a ToUnicode CMap stream → (code_width_bytes, mapping)."""
    width = 1
    cm = _CODESPACE_RE.search(data)
    if cm:
        blobs = _HEXBLOB_RE.findall(cm.group(1))
        if blobs:
            width = max(1, len(re.sub(rb"\s", b"", blobs[0])) // 2)
    mapping: dict[int, str] = {}
    for body in _BFCHAR_RE.findall(data):
        blobs = _HEXBLOB_RE.findall(body)
        for i in range(0, len(blobs) - 1, 2):
            mapping[_hex_to_int(blobs[i])] = _hex_to_text(blobs[i + 1])
    for body in _BFRANGE_RE.findall(data):
        # two forms: <lo> <hi> <dst>  |  <lo> <hi> [<d0> <d1> ...]
        for m in re.finditer(
                rb"<([0-9a-fA-F\s]+)>\s*<([0-9a-fA-F\s]+)>\s*"
                rb"(<[0-9a-fA-F\s]+>|\[(?:[^\]]*)\])", body):
            lo, hi = _hex_to_int(m.group(1)), _hex_to_int(m.group(2))
            dst = m.group(3)
            if dst.startswith(b"["):
                arr = _HEXBLOB_RE.findall(dst)
                for k, blob in enumerate(arr):
                    if lo + k <= hi:
                        mapping[lo + k] = _hex_to_text(blob)
            else:
                base = _hex_to_text(dst[1:-1])
                if base:
                    start = ord(base[-1])
                    prefix = base[:-1]
                    for k in range(hi - lo + 1):
                        mapping[lo + k] = prefix + chr(start + k)
    return width, mapping


class _Name(str):
    """A /Name token (e.g. the font operand of Tf)."""


def _map_codes(s: str, font: tuple[int, dict[int, str]] | None) -> str:
    """Map a string of raw code bytes (latin-1-decoded) through the
    current font's ToUnicode CMap; identity without a CMap."""
    if font is None:
        return s
    width, mp = font
    if width <= 1:
        return "".join(mp.get(ord(c), c) for c in s)
    out = []
    for i in range(0, len(s) - 1, 2):
        code = (ord(s[i]) << 8) | ord(s[i + 1])
        out.append(mp.get(code, chr(code)))
    return "".join(out)


# --- content-stream tokenizer -----------------------------------------

_PDF_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _parse_content_spans(
    stream: bytes,
    fonts: dict[str, tuple[int, dict[int, str]]] | None = None,
) -> list[tuple[float, float, str]]:
    """Parse Tj/TJ text-showing ops tracking the text matrix set by
    Tm/Td/TD and the current font set by Tf (whose ToUnicode CMap, if
    any, maps code bytes to text). Returns spans as (x, y, text)."""
    spans: list[tuple[float, float, str]] = []
    # Tokenize: strings, numbers, arrays, names, operators.
    tokens = _tokenize(stream)
    x = y = 0.0
    line_x = line_y = 0.0
    cur_font: tuple[int, dict[int, str]] | None = None
    stack: list[object] = []
    for tok in tokens:
        if isinstance(tok, (float, str, list)):
            stack.append(tok)
            continue
        op = tok.decode("latin-1")
        if op == "BT":
            x = y = line_x = line_y = 0.0
            stack.clear()
        elif op == "Tf" and len(stack) >= 2 and fonts is not None:
            name = stack[-2]
            if isinstance(name, _Name):
                cur_font = fonts.get(str(name))
            stack.clear()
        elif op == "Tm" and len(stack) >= 6:
            e, f = stack[-2], stack[-1]
            if isinstance(e, float) and isinstance(f, float):
                x, y = e, f
                line_x, line_y = e, f
            stack.clear()
        elif op in ("Td", "TD") and len(stack) >= 2:
            a, b = stack[-2], stack[-1]
            if isinstance(a, float) and isinstance(b, float):
                line_x += a
                line_y += b
                x, y = line_x, line_y
            stack.clear()
        elif op == "Tj" and stack:
            s = stack[-1]
            if isinstance(s, str) and not isinstance(s, _Name):
                spans.append((x, y, _map_codes(s, cur_font)))
            stack.clear()
        elif op == "TJ" and stack:
            arr = stack[-1]
            if isinstance(arr, list):
                s = "".join(
                    _map_codes(e, cur_font) for e in arr
                    if isinstance(e, str)
                )
                spans.append((x, y, s))
            stack.clear()
        else:
            stack.clear()
    return spans


def _tokenize(stream: bytes):
    i, n = 0, len(stream)
    tokens: list[object] = []
    while i < n:
        c = stream[i:i + 1]
        if c in b" \t\r\n":
            i += 1
        elif c == b"(":
            s, i = _parse_string(stream, i)
            tokens.append(s)
        elif c == b"<" and stream[i:i + 2] != b"<<":
            s, i = _parse_hex_string(stream, i)
            tokens.append(s)
        elif stream[i:i + 2] == b"<<":
            i = _skip_inline_dict(stream, i)
        elif c == b"[":
            j = i + 1
            arr: list[object] = []
            while j < n and stream[j:j + 1] != b"]":
                cj = stream[j:j + 1]
                if cj in b" \t\r\n":
                    j += 1
                elif cj == b"(":
                    s, j = _parse_string(stream, j)
                    arr.append(s)
                elif cj == b"<":
                    s, j = _parse_hex_string(stream, j)
                    arr.append(s)
                else:
                    m = re.match(rb"[-+0-9.][0-9.+-]*", stream[j:])
                    if m:
                        try:
                            arr.append(float(m.group(0)))
                        except ValueError:
                            pass
                        j += m.end()
                    else:
                        j += 1
            tokens.append(arr)
            i = j + 1
        elif c == b"/":
            m = re.match(rb"/[^\s\[\]()<>/]*", stream[i:])
            if m:
                tokens.append(_Name(m.group(0)[1:].decode("latin-1")))
                i += m.end()
            else:
                i += 1
        else:
            m = re.match(rb"[-+0-9.][0-9.+-]*", stream[i:])
            if m:
                try:
                    tokens.append(float(m.group(0)))
                except ValueError:
                    pass
                i += m.end()
                continue
            m = re.match(rb"[A-Za-z'\"*]+", stream[i:])
            if m:
                if m.group(0) == b"BI":
                    # inline image: raw binary follows the ID operator
                    # and would be mis-tokenized (poppler's content
                    # parser likewise consumes BI…ID…EI as one unit) —
                    # skip the whole construct, emitting nothing
                    i = _skip_inline_image(stream, i + m.end())
                    continue
                tokens.append(m.group(0))
                i += m.end()
            else:
                i += 1
    return tokens


_EI_RE = re.compile(rb"[\x00\t\n\f\r ]EI(?=[\x00\t\n\f\r/\[\]<>(]|$)")


def _skip_inline_image(stream: bytes, i: int) -> int:
    """Skip past a BI … ID <binary> EI inline image starting just
    after the BI operator. The binary data may contain any bytes, so
    the terminator is the conventional whitespace-delimited EI; a
    missing terminator consumes the rest of the stream (the same
    stop-at-first-error posture as the other kernels)."""
    # ID is followed by exactly one whitespace byte, but may directly
    # abut a delimiter on the left (e.g. "/F[/AHx]ID ")
    m = re.search(rb"(?<![A-Za-z0-9])ID[\x00\t\n\f\r ]", stream[i:])
    if m is None:
        return len(stream)
    data_start = i + m.end()
    m2 = _EI_RE.search(stream, data_start)
    if m2 is None:
        return len(stream)
    return m2.end()


def _parse_hex_string(stream: bytes, i: int) -> tuple[str, int]:
    """Parse a PDF hex string starting at '<'; returns the code BYTES
    latin-1-decoded (so ord() round-trips each byte) and next index."""
    j = stream.find(b">", i + 1)
    if j < 0:
        return "", len(stream)
    raw = re.sub(rb"[^0-9a-fA-F]", b"", stream[i + 1:j])
    if len(raw) % 2:
        raw += b"0"
    try:
        return (bytes.fromhex(raw.decode("ascii")).decode("latin-1"),
                j + 1)
    except ValueError:
        return "", j + 1


def _skip_inline_dict(stream: bytes, i: int) -> int:
    """Skip an inline '<< … >>' dictionary (BDC property lists etc.)."""
    depth = 0
    n = len(stream)
    while i < n:
        if stream[i:i + 2] == b"<<":
            depth += 1
            i += 2
        elif stream[i:i + 2] == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return i
        else:
            i += 1
    return n


def _parse_string(stream: bytes, i: int) -> tuple[str, int]:
    """Parse a PDF literal string starting at '('; returns (text, next)."""
    out: list[str] = []
    depth = 1
    i += 1
    n = len(stream)
    while i < n and depth > 0:
        c = stream[i:i + 1]
        if c == b"\\":
            nxt = stream[i + 1:i + 2]
            if nxt in _PDF_ESCAPES:
                out.append(_PDF_ESCAPES[nxt])
                i += 2
            elif nxt.isdigit():
                m = re.match(rb"[0-7]{1,3}", stream[i + 1:])
                out.append(chr(int(m.group(0), 8)))
                i += 1 + m.end()
            else:
                i += 2
        elif c == b"(":
            depth += 1
            out.append("(")
            i += 1
        elif c == b")":
            depth -= 1
            if depth > 0:
                out.append(")")
            i += 1
        else:
            out.append(c.decode("latin-1"))
            i += 1
    return "".join(out), i


# --- reading order ----------------------------------------------------

COLUMN_GAP = 100.0  # min x-gap (pts) separating two columns


def assemble_reading_order(spans: list[tuple[float, float, str]]) -> str:
    """Cluster spans into columns by x-gap, order (column, -y, x), join
    same-(column, y) spans with a space and lines with newlines."""
    if not spans:
        return ""
    xs = sorted({s[0] for s in spans})
    boundaries: list[float] = []  # column start x values
    for x in xs:
        if not boundaries or x - boundaries[-1] > COLUMN_GAP:
            boundaries.append(x)

    def col_of(x: float) -> int:
        c = 0
        for i, b in enumerate(boundaries):
            if x >= b:
                c = i
        return c

    keyed = sorted(
        spans, key=lambda s: (col_of(s[0]), -s[1], s[0])
    )
    lines: list[str] = []
    cur_key: tuple[int, float] | None = None
    cur: list[str] = []
    for x, y, text in keyed:
        k = (col_of(x), y)
        if cur_key is None or k != cur_key:
            if cur:
                lines.append(" ".join(cur))
            cur = [text]
            cur_key = k
        else:
            cur.append(text)
    if cur:
        lines.append(" ".join(cur))
    return "\n".join(lines)


# --- hybrid pipeline --------------------------------------------------


def self_blank_page(doc: "PDFDoc", page_num: int) -> bool:
    """True when the page's embedded images ALL decoded and contain
    zero ink samples — a textless page that is genuinely blank paper,
    safe to prune from the OCR queue.  Any decode failure or absence
    of images returns False (conservative: keep needs-ocr)."""
    try:
        st = doc.page_image_stats(page_num)
    except (PDFError, ValueError, OverflowError, MemoryError):
        return False
    return (st["n_images"] > 0
            and st["n_decoded"] == st["n_images"]
            and st["ink_samples"] == 0)


def extract_pdf(b: bytes, mime: str,
                page_list: list[int] | None = None,
                page_separator: str = PAGE_SEPARATOR,
                include_page_nums: bool = False,
                min_words: int = MIN_WORDS_THRESHOLD,
                doc: "PDFDoc | None" = None) -> Result:
    """pdf.go:32-61 + hybrid.go:63-142 decision structure.

    The keyword knobs mirror HybridProcessorOptions (types.go:3-17):
    ``page_list`` = opts.Pages (1-indexed subset; default all pages,
    hybrid.go:89-95), ``page_separator`` / ``include_page_nums`` feed
    format.Combine, ``min_words`` the quality gate. The batch engine
    applies one option set per job (SURVEY.md §1.3). ``doc`` lets a
    caller that already parsed the object table (e.g. the image-stats
    operator) skip the second parse."""
    try:
        if doc is None:
            doc = PDFDoc(b)
        total = doc.page_count
    except (PDFError, ValueError, OverflowError) as exc:
        msg = f"page count failed: {exc}"
        return Result(success=False, method="hybrid",
                      file_type="document/pdf", mime_type=mime, error=msg)
    if total == 0:
        return Result(success=False, method="hybrid",
                      file_type="document/pdf", mime_type=mime,
                      error="PDF has no pages")

    page_nums = page_list if page_list else range(1, total + 1)
    pages: list[PageResult] = []
    needs_ocr_pages: list[int] = []
    for page_num in page_nums:
        pr = PageResult(page_number=page_num, method="text-layer")
        try:
            text = doc.page_text(page_num)
        except (PDFError, ValueError, OverflowError):
            pr.method = "needs-ocr"
            pages.append(pr)
            needs_ocr_pages.append(page_num)
            continue
        text = textnorm.clean_text(text)
        pr.text = text
        decision = quality.score(text, min_words)
        pr.word_count = decision.word_count
        if decision.needs_ocr:
            pr.method = "needs-ocr"
            pr.text = ""
            if not text and self_blank_page(doc, page_num):
                # image-only refinement: every embedded image decoded
                # and contained zero ink — blank paper, pruned from
                # the OCR queue (content-keyed escalation; see the
                # "embedded images" section).  Pages with real pixel
                # content, undecodable images, or garbage TEXT keep
                # the reference's needs-ocr behavior.
                pr.method = "blank"
            else:
                needs_ocr_pages.append(page_num)
        pages.append(pr)

    # hybrid.go:113-132 — the OCR escalation decision is preserved but
    # the OCR leg itself is an offline failure: the reference sets
    # result.Error and continues with the text layer (hybrid.go:126-129)
    # and pdf.go drops that error on wrap, so pages keep method
    # "needs-ocr" with empty text.

    combined = mdformat.combine(pages, page_separator, include_page_nums)
    w, c = runes.build_counts(combined)
    return Result(success=True, text=combined, method="hybrid",
                  file_type="document/pdf", mime_type=mime,
                  pages=pages, word_count=w, char_count=c)
