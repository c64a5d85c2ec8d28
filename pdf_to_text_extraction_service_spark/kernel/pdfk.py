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


def _objects(data: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}


def page_count(data: bytes) -> int:
    """Number of pages (the pdfinfo analog). Raises PDFError on
    structurally broken PDFs."""
    if not data.startswith(b"%PDF-"):
        raise PDFError("not a PDF")
    objs = _objects(data)
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
        self.objs = _objects(data)
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
            raise PDFError("missing content stream")
        stream = _stream_bytes(content_body)
        if stream is None:
            return ""
        spans = _parse_content_spans(stream)
        text = assemble_reading_order(spans)
        # poppler.go:107 hard-caps per-page pdftotext output; an
        # oversized page is a per-page failure (→ needs-ocr).
        if len(text.encode("utf-8", errors="replace")) > MAX_PAGE_TEXT_BYTES:
            raise PDFError("page text exceeds 10MB limit")
        return text


def extract_page_text(data: bytes, page_num: int) -> str:
    """Text of 1-indexed page page_num (the pdftotext-per-page analog)."""
    return PDFDoc(data).page_text(page_num)


_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")


def _stream_bytes(content_body: bytes) -> bytes | None:
    """Slice a content stream by its declared /Length (binary-safe —
    compressed data may contain 'endstream' bytes), falling back to
    the endstream delimiter; FlateDecode via zlib."""
    marker = content_body.find(b"stream")
    if marker < 0:
        return None
    start = marker + len(b"stream")
    if content_body[start:start + 2] == b"\r\n":
        start += 2
    elif content_body[start:start + 1] == b"\n":
        start += 1
    lm = _LENGTH_RE.search(content_body[:marker])
    if lm is not None:
        raw = content_body[start:start + int(lm.group(1))]
    else:
        sm = _STREAM_RE.search(content_body)
        if sm is None:
            return None
        raw = sm.group(1)
    if b"/FlateDecode" in content_body[:marker]:
        import zlib
        try:
            raw = zlib.decompress(raw)
        except zlib.error as exc:
            raise PDFError(f"flate decode failed: {exc}") from exc
    return raw


# --- content-stream tokenizer -----------------------------------------

_PDF_ESCAPES = {
    b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b", b"f": "\f",
    b"(": "(", b")": ")", b"\\": "\\",
}


def _parse_content_spans(stream: bytes) -> list[tuple[float, float, str]]:
    """Parse Tj/TJ text-showing ops tracking the text matrix set by
    Tm/Td/TD. Returns spans as (x, y, text)."""
    spans: list[tuple[float, float, str]] = []
    # Tokenize: strings, numbers, arrays, names, operators.
    tokens = _tokenize(stream)
    x = y = 0.0
    line_x = line_y = 0.0
    stack: list[object] = []
    for tok in tokens:
        if isinstance(tok, (float, str, list)):
            stack.append(tok)
            continue
        op = tok.decode("latin-1")
        if op == "BT":
            x = y = line_x = line_y = 0.0
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
            if isinstance(s, str):
                spans.append((x, y, s))
            stack.clear()
        elif op == "TJ" and stack:
            arr = stack[-1]
            if isinstance(arr, list):
                s = "".join(e for e in arr if isinstance(e, str))
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
            i += m.end() if m else 1
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
                tokens.append(m.group(0))
                i += m.end()
            else:
                i += 1
    return tokens


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


def extract_pdf(b: bytes, mime: str,
                page_list: list[int] | None = None,
                page_separator: str = PAGE_SEPARATOR,
                include_page_nums: bool = False,
                min_words: int = MIN_WORDS_THRESHOLD) -> Result:
    """pdf.go:32-61 + hybrid.go:63-142 decision structure.

    The keyword knobs mirror HybridProcessorOptions (types.go:3-17):
    ``page_list`` = opts.Pages (1-indexed subset; default all pages,
    hybrid.go:89-95), ``page_separator`` / ``include_page_nums`` feed
    format.Combine, ``min_words`` the quality gate. The batch engine
    applies one option set per job (SURVEY.md §1.3)."""
    try:
        doc = PDFDoc(b)
        total = doc.page_count
    except PDFError as exc:
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
        except PDFError:
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
