"""Office / OpenDocument / EPUB kernels (zip + XML containers).

Byte-parity ports of:
- DOCX reference internal/extractors/office/docx.go:34-415
- XLSX reference internal/extractors/office/xlsx.go:27-129 (excelize
  replaced by a minimal sheet reader covering the generator's subset:
  shared strings, inline strings, numeric cells, dense rows)
- PPTX reference internal/extractors/office/pptx.go:30-142
- ODF  reference internal/extractors/opendocument/opendocument.go:27-369
- EPUB reference internal/extractors/ebook/epub.go:26-301

Zip entry caps and their exact error strings (docx.go:320-348,
opendocument.go:329-354, epub.go:263-286) are reproduced.
"""

from __future__ import annotations

import io
import re
import zipfile

from . import goxml, runes
from .goxml import CHARDATA, END, START, Tokens
from .result import Result

MAX_ZIP_ENTRY_BYTES = 32 << 20
MAX_META_ENTRY_BYTES = 2 << 20

_ODF_TEXT_NS = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_ODF_TABLE_NS = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
_DRAWINGML_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"


class ZipEntryError(ValueError):
    pass


def _open_zip(b: bytes) -> zipfile.ZipFile:
    return zipfile.ZipFile(io.BytesIO(b))


def read_zip_file(zf: zipfile.ZipFile, name: str, max_bytes: int,
                  missing_fmt: str = "missing {name}") -> bytes:
    """docx.go:320-348 readZipFile semantics incl. error strings."""
    for info in zf.infolist():
        if info.filename != name:
            continue
        if info.file_size > max_bytes:
            raise ZipEntryError(
                f"{name} exceeds {max_bytes // (1 << 20)}MB uncompressed limit"
            )
        data = zf.read(info)
        if len(data) > max_bytes:
            raise ZipEntryError(
                f"{name} exceeds {max_bytes // (1 << 20)}MB uncompressed limit"
            )
        return data
    raise ZipEntryError(missing_fmt.format(name=name))


# ------------------------------------------------------------------ DOCX


def _read_char_data(toks: Tokens, depth_box: list[int]) -> str:
    """docx.go:298-316 — collect CharData until the element's end tag
    (consumes the end, decrementing the caller's depth)."""
    out: list[str] = []
    while True:
        tok = toks.next()
        if tok is None:
            break
        kind = tok[0]
        if kind == CHARDATA:
            out.append(tok[1])
        elif kind == START:
            depth_box[0] += 1
        elif kind == END:
            depth_box[0] -= 1
            return "".join(out)
    return "".join(out)


def _docx_paragraph(toks: Tokens) -> str:
    """docx.go:101-173."""
    style = ""
    num_id = ""
    num_lvl = ""
    runs: list[str] = []
    depth_box = [1]
    while depth_box[0] > 0:
        tok = toks.next()
        if tok is None:
            break
        kind = tok[0]
        if kind == START:
            depth_box[0] += 1
            local, attrs = tok[1], tok[3]
            if local == "pStyle":
                style = attrs.get("val", style)
            elif local == "numId":
                num_id = attrs.get("val", num_id)
            elif local == "ilvl":
                num_lvl = attrs.get("val", num_lvl)
            elif local == "t":
                runs.append(_read_char_data(toks, depth_box))
            elif local == "tab":
                runs.append("\t")
            elif local == "br":
                runs.append("\n")
        elif kind == END:
            depth_box[0] -= 1
    text = "".join(runs)
    if runes.trim_space(text) == "":
        return ""
    h = _heading_level(style)
    if h > 0:
        return "#" * h + " " + runes.trim_space(text)
    if num_id not in ("", "0"):
        indent = ""
        if num_lvl not in ("", "0"):
            lvl = 0
            for c in num_lvl:
                lvl = lvl * 10 + (ord(c) - ord("0"))
            indent = "  " * lvl
        return indent + "- " + runes.trim_space(text)
    return runes.trim_space(text)


def _heading_level(style: str) -> int:
    """docx.go:176-191."""
    s = style.lower()
    if s == "title":
        return 1
    if s == "subtitle":
        return 2
    if s.startswith("heading"):
        n = s[len("heading"):]
        if len(n) == 1 and "1" <= n <= "6":
            return ord(n) - ord("0")
    return 0


def _markdown_table(rows: list[list[str]]) -> str:
    """Shared pipe-table builder (docx.go:214-241 / odf:199-226), with
    the trailing newline the Go builders keep."""
    if not rows:
        return ""
    max_cols = max(len(r) for r in rows)
    rows = [r + [""] * (max_cols - len(r)) for r in rows]
    out = ["| " + " | ".join(rows[0]) + " |\n"]
    out.append("| " + " | ".join(["---"] * max_cols) + " |\n")
    for row in rows[1:]:
        out.append("| " + " | ".join(row) + " |\n")
    return "".join(out)


def _docx_table_cell(toks: Tokens) -> str:
    """docx.go:272-295."""
    texts: list[str] = []
    depth_box = [0]
    while True:
        tok = toks.next()
        if tok is None:
            break
        kind = tok[0]
        if kind == START:
            depth_box[0] += 1
            if tok[1] == "t":
                texts.append(_read_char_data(toks, depth_box))
        elif kind == END:
            if depth_box[0] == 0:
                break
            depth_box[0] -= 1
    return runes.trim_space(" ".join(texts))


def _docx_table_row(toks: Tokens) -> list[str]:
    """docx.go:245-269."""
    cells: list[str] = []
    depth = 0
    while True:
        tok = toks.next()
        if tok is None:
            break
        kind = tok[0]
        if kind == START:
            depth += 1
            if tok[1] == "tc":
                cells.append(_docx_table_cell(toks))
                depth -= 1  # cell consumed its end tag
        elif kind == END:
            if depth == 0:
                return cells
            depth -= 1
    return cells


def _docx_table(toks: Tokens) -> str:
    """docx.go:194-242."""
    rows: list[list[str]] = []
    depth = 1
    while depth > 0:
        tok = toks.next()
        if tok is None:
            break
        kind = tok[0]
        if kind == START:
            depth += 1
            if tok[1] == "tr":
                row = _docx_table_row(toks)
                depth -= 1  # row consumed its end tag
                rows.append(row)
        elif kind == END:
            depth -= 1
    return _markdown_table(rows)


def _docx_to_markdown(body: bytes) -> str:
    """docx.go:69-98."""
    toks = Tokens(body.decode("utf-8", errors="replace"))
    blocks: list[str] = []
    while True:
        tok = toks.next()
        if tok is None:
            break
        if tok[0] != START:
            continue
        if tok[1] == "p":
            blocks.append(_docx_paragraph(toks))
        elif tok[1] == "tbl":
            blocks.append(_docx_table(toks))
    out = [b for b in (runes.trim_space(x) for x in blocks) if b != ""]
    return "\n\n".join(out)


_CORE_META_TAGS = {
    "title": "title", "creator": "author", "created": "created",
    "modified": "modified", "description": "description",
    "subject": "subject", "lastModifiedBy": "lastModifiedBy",
}


def _parse_core_metadata(zf: zipfile.ZipFile) -> dict[str, str] | None:
    """docx.go:351-399."""
    try:
        b = read_zip_file(zf, "docProps/core.xml", MAX_META_ENTRY_BYTES)
    except ZipEntryError:
        return None
    meta: dict[str, str] = {}
    current = ""
    for tok in goxml.tokenize(b.decode("utf-8", errors="replace")):
        kind = tok[0]
        if kind == START:
            current = tok[1]
        elif kind == CHARDATA:
            val = runes.trim_space(tok[1])
            if val == "":
                continue
            key = _CORE_META_TAGS.get(current)
            if key:
                meta[key] = val
        elif kind == END:
            current = ""
    return meta or None


def _frontmatter(meta: dict[str, str], keys: list[str]) -> str:
    """docx.go:402-415 (key order fixed per call site)."""
    if not meta:
        return ""
    out = ["---\n"]
    for key in keys:
        v = meta.get(key, "")
        if v != "":
            out.append(f"{key}: {v}\n")
    out.append("---\n\n")
    return "".join(out)


_DOCX_FM_KEYS = ["title", "author", "subject", "description", "created",
                 "modified", "lastModifiedBy"]


def extract_docx(b: bytes, mime: str) -> Result:
    try:
        zf = _open_zip(b)
    except Exception as exc:
        return Result(success=False, file_type="document/docx",
                      mime_type=mime, error=str(exc))
    try:
        body = read_zip_file(zf, "word/document.xml", MAX_ZIP_ENTRY_BYTES)
    except ZipEntryError as exc:
        return Result(success=False, file_type="document/docx",
                      mime_type=mime, error=str(exc))
    text = _docx_to_markdown(body)
    meta = _parse_core_metadata(zf)
    if meta:
        text = _frontmatter(meta, _DOCX_FM_KEYS) + text
    text = runes.trim_space(text)
    w, c = runes.build_counts(text)
    return Result(success=True, text=text, method="native",
                  file_type="document/docx", mime_type=mime,
                  metadata=meta, word_count=w, char_count=c)


# ------------------------------------------------------------------ XLSX


def _xlsx_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        b = read_zip_file(zf, "xl/sharedStrings.xml", MAX_ZIP_ENTRY_BYTES)
    except ZipEntryError:
        return []
    strings: list[str] = []
    cur: list[str] | None = None
    in_t = False
    for tok in goxml.tokenize(b.decode("utf-8", errors="replace")):
        kind, local = tok[0], tok[1]
        if kind == START:
            if local == "si":
                cur = []
            elif local == "t":
                in_t = True
        elif kind == CHARDATA:
            if in_t and cur is not None:
                cur.append(tok[1])
        elif kind == END:
            if local == "t":
                in_t = False
            elif local == "si" and cur is not None:
                strings.append("".join(cur))
                cur = None
    return strings


_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")


def _col_index(ref: str) -> int:
    m = _CELL_REF.match(ref)
    if not m:
        return 0
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _xlsx_sheet_rows(body: bytes, shared: list[str]) -> list[list[str]]:
    """Minimal sheet reader (excelize.GetRows analog for the dense
    subset): positions cells by reference, trims trailing empties."""
    rows: list[list[str]] = []
    cur_row: dict[int, str] = {}
    cell_type = ""
    cell_col = 0
    in_v = False
    in_is_t = False
    val_parts: list[str] = []
    for tok in goxml.tokenize(body.decode("utf-8", errors="replace")):
        kind, local = tok[0], tok[1]
        if kind == START:
            attrs = tok[3]
            if local == "row":
                cur_row = {}
            elif local == "c":
                cell_type = attrs.get("t", "")
                cell_col = _col_index(attrs.get("r", ""))
                val_parts = []
            elif local == "v":
                in_v = True
            elif local == "t":
                in_is_t = True
        elif kind == CHARDATA:
            if in_v or in_is_t:
                val_parts.append(tok[1])
        elif kind == END:
            if local == "v":
                in_v = False
            elif local == "t":
                in_is_t = False
            elif local == "c":
                raw = "".join(val_parts)
                if cell_type == "s":
                    try:
                        raw = shared[int(raw)]
                    except (ValueError, IndexError):
                        pass
                cur_row[cell_col] = raw
                val_parts = []
            elif local == "row":
                if cur_row:
                    width = max(cur_row) + 1
                    row = [cur_row.get(i, "") for i in range(width)]
                    while row and row[-1] == "":
                        row.pop()
                    rows.append(row)
                cur_row = {}
    return rows


def _xlsx_sheets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """(sheet name, zip path) in workbook order."""
    try:
        wb = read_zip_file(zf, "xl/workbook.xml", MAX_ZIP_ENTRY_BYTES)
    except ZipEntryError:
        return []
    rels: dict[str, str] = {}
    try:
        rb = read_zip_file(zf, "xl/_rels/workbook.xml.rels",
                           MAX_ZIP_ENTRY_BYTES)
        for tok in goxml.tokenize(rb.decode("utf-8", errors="replace")):
            if tok[0] == START and tok[1] == "Relationship":
                attrs = tok[3]
                rels[attrs.get("Id", "")] = attrs.get("Target", "")
    except ZipEntryError:
        pass
    sheets: list[tuple[str, str]] = []
    idx = 0
    for tok in goxml.tokenize(wb.decode("utf-8", errors="replace")):
        if tok[0] == START and tok[1] == "sheet":
            attrs = tok[3]
            name = attrs.get("name", "")
            target = rels.get(attrs.get("id", ""), "")
            if not target:
                idx += 1
                target = f"worksheets/sheet{idx}.xml"
            if not target.startswith("xl/"):
                target = "xl/" + target.lstrip("/")
            sheets.append((name, target))
    return sheets


def _xlsx_rows_to_markdown(rows: list[list[str]]) -> str:
    """xlsx.go:88-129 — pad, escape pipes, cap at 1001 rows."""
    max_cols = max((len(r) for r in rows), default=0)
    if max_cols == 0:
        return ""
    rows = [
        [c.replace("|", "\\|") for c in r] + [""] * (max_cols - len(r))
        for r in rows
    ]
    truncated = False
    if len(rows) > 1001:
        rows = rows[:1001]
        truncated = True
    out = ["| " + " | ".join(rows[0]) + " |\n"]
    out.append("| " + " | ".join(["---"] * max_cols) + " |\n")
    for row in rows[1:]:
        out.append("| " + " | ".join(row) + " |\n")
    if truncated:
        out.append("\n... truncated to first 1000 data rows\n")
    return "".join(out)


def extract_xlsx(b: bytes, mime: str) -> Result:
    try:
        zf = _open_zip(b)
    except Exception as exc:
        return Result(success=False, file_type="document/xlsx",
                      mime_type=mime, error=str(exc))
    shared = _xlsx_shared_strings(zf)
    sheets = _xlsx_sheets(zf)
    meta = {"sheets": str(len(sheets))}
    sections: list[str] = []
    total_rows = 0
    for name, target in sheets:
        try:
            body = read_zip_file(zf, target, MAX_ZIP_ENTRY_BYTES)
        except ZipEntryError:
            continue
        rows = _xlsx_sheet_rows(body, shared)
        filtered = [
            r for r in rows
            if any(runes.trim_space(c) != "" for c in r)
        ]
        if not filtered:
            continue
        total_rows += len(filtered)
        sections.append(
            "## Sheet: " + name + "\n\n" + _xlsx_rows_to_markdown(filtered)
        )
    text = "\n\n---\n\n".join(sections)
    if runes.trim_space(text) == "":
        text = "(empty workbook)"
    meta["totalRows"] = str(total_rows)
    w, c = runes.build_counts(text)
    return Result(success=True, text=text, method="native",
                  file_type="document/xlsx", mime_type=mime,
                  metadata=meta, word_count=w, char_count=c)


# ------------------------------------------------------------------ PPTX


def _pptx_text_blocks(body: bytes) -> str:
    """pptx.go:102-142."""
    paragraphs: list[str] = []
    current: list[str] = []
    in_para = False
    for tok in goxml.tokenize(body.decode("utf-8", errors="replace")):
        kind, local = tok[0], tok[1]
        if kind == START:
            if local == "p" and tok[2] in (_DRAWINGML_NS, ""):
                in_para = True
                current = []
        elif kind == CHARDATA:
            if in_para:
                s = runes.trim_space(tok[1])
                if s != "":
                    current.append(s)
        elif kind == END:
            if local == "p" and in_para:
                text = runes.trim_space(" ".join(current))
                if text != "":
                    paragraphs.append(text)
                in_para = False
                current = []
    return "\n\n".join(paragraphs)


_PPTX_FM_KEYS = _DOCX_FM_KEYS


def extract_pptx(b: bytes, mime: str) -> Result:
    try:
        zf = _open_zip(b)
    except Exception as exc:
        return Result(success=False, file_type="document/pptx",
                      mime_type=mime, error=str(exc))
    slide_names = sorted(
        f.filename for f in zf.infolist()
        if f.filename.startswith("ppt/slides/slide")
        and f.filename.endswith(".xml")
    )
    meta = _parse_core_metadata(zf) or {}
    meta["slides"] = str(len(slide_names))
    parts: list[str] = []
    for i, name in enumerate(slide_names):
        slide_num = i + 1
        sb = [f"## Slide {slide_num}"]
        try:
            body = read_zip_file(zf, name, MAX_ZIP_ENTRY_BYTES)
        except ZipEntryError:
            continue
        slide_text = _pptx_text_blocks(body)
        if slide_text != "":
            sb.append("\n\n" + slide_text)
        notes_path = f"ppt/notesSlides/notesSlide{slide_num}.xml"
        try:
            nb = read_zip_file(zf, notes_path, MAX_ZIP_ENTRY_BYTES)
        except ZipEntryError:
            nb = None
        if nb is not None:
            notes = runes.trim_space(_pptx_text_blocks(nb))
            if notes != "":
                sb.append("\n\n> **Speaker Notes:**\n> "
                          + notes.replace("\n", "\n> "))
        parts.append("".join(sb))
    text = "\n\n---\n\n".join(parts)
    if meta:
        text = _frontmatter(meta, _PPTX_FM_KEYS) + text
    text = runes.trim_space(text)
    w, c = runes.build_counts(text)
    return Result(success=True, text=text, method="native",
                  file_type="document/pptx", mime_type=mime,
                  metadata=meta, word_count=w, char_count=c)


# ------------------------------------------------------------------- ODF


def _odf_collect_text(toks: Tokens) -> str:
    """opendocument.go:114-140."""
    texts: list[str] = []
    depth = 1
    while depth > 0:
        tok = toks.next()
        if tok is None:
            break
        kind = tok[0]
        if kind == START:
            depth += 1
            if tok[1] == "tab":
                texts.append("\t")
            elif tok[1] == "line-break":
                texts.append("\n")
        elif kind == END:
            depth -= 1
        elif kind == CHARDATA:
            if runes.trim_space(tok[1]) != "":
                texts.append(tok[1])
    return runes.trim_space("".join(texts))


def _odf_collect_list(toks: Tokens, indent_level: int) -> list[str]:
    """opendocument.go:143-172."""
    items: list[str] = []
    depth = 1
    indent = "  " * indent_level
    while depth > 0:
        tok = toks.next()
        if tok is None:
            break
        kind = tok[0]
        if kind == START:
            depth += 1
            if tok[1] == "p":
                text = _odf_collect_text(toks)
                depth -= 1
                if text != "":
                    items.append(indent + "- " + text)
            elif tok[1] == "list":
                sub = _odf_collect_list(toks, indent_level + 1)
                depth -= 1
                items.extend(sub)
        elif kind == END:
            depth -= 1
    return items


def _odf_collect_cell_text(toks: Tokens) -> str:
    """opendocument.go:253-274."""
    texts: list[str] = []
    depth = 1
    while depth > 0:
        tok = toks.next()
        if tok is None:
            break
        kind = tok[0]
        if kind == START:
            depth += 1
        elif kind == END:
            depth -= 1
        elif kind == CHARDATA:
            s = runes.trim_space(tok[1])
            if s != "":
                texts.append(s)
    return " ".join(texts)


def _odf_collect_table_row(toks: Tokens) -> list[str]:
    """opendocument.go:229-251."""
    cells: list[str] = []
    depth = 1
    while depth > 0:
        tok = toks.next()
        if tok is None:
            break
        kind = tok[0]
        if kind == START:
            depth += 1
            if tok[1] == "table-cell":
                cells.append(_odf_collect_cell_text(toks))
                depth -= 1
        elif kind == END:
            depth -= 1
    return cells


def _odf_collect_table(toks: Tokens) -> str:
    """opendocument.go:175-227."""
    rows: list[list[str]] = []
    depth = 1
    while depth > 0:
        tok = toks.next()
        if tok is None:
            break
        kind = tok[0]
        if kind == START:
            depth += 1
            if tok[1] == "table-row":
                row = _odf_collect_table_row(toks)
                depth -= 1
                if row:
                    rows.append(row)
        elif kind == END:
            depth -= 1
    return _markdown_table(rows)


def _odf_to_markdown(body: bytes) -> str:
    """opendocument.go:60-111."""
    toks = Tokens(body.decode("utf-8", errors="replace"))
    blocks: list[str] = []
    while True:
        tok = toks.next()
        if tok is None:
            break
        if tok[0] != START:
            continue
        local, space, attrs = tok[1], tok[2], tok[3]
        if local == "h" and space == _ODF_TEXT_NS:
            level = 1
            v = attrs.get("outline-level", "")
            if len(v) == 1 and "1" <= v <= "6":
                level = ord(v) - ord("0")
            text = _odf_collect_text(toks)
            if text != "":
                blocks.append("#" * level + " " + text)
        elif local == "p" and space == _ODF_TEXT_NS:
            text = _odf_collect_text(toks)
            if text != "":
                blocks.append(text)
        elif local == "list" and space == _ODF_TEXT_NS:
            items = _odf_collect_list(toks, 0)
            if items:
                blocks.append("\n".join(items))
        elif local == "table" and space == _ODF_TABLE_NS:
            table = _odf_collect_table(toks)
            if table != "":
                blocks.append(table)
    return "\n\n".join(blocks)


_ODF_META_TAGS = {
    "title": "title", "initial-creator": "author", "creator": "author",
    "creation-date": "created", "date": "modified",
    "description": "description", "subject": "subject",
}
_ODF_FM_KEYS = ["title", "author", "subject", "description", "created",
                "modified"]


def _odf_parse_metadata(zf: zipfile.ZipFile) -> dict[str, str] | None:
    """opendocument.go:277-327 (entry cap 2 MiB)."""
    try:
        b = read_zip_file(zf, "meta.xml", MAX_META_ENTRY_BYTES,
                          missing_fmt="{name} not found")
    except ZipEntryError:
        return None
    meta: dict[str, str] = {}
    tag = ""
    for tok in goxml.tokenize(b.decode("utf-8", errors="replace")):
        kind = tok[0]
        if kind == START:
            tag = tok[1]
        elif kind == CHARDATA:
            val = runes.trim_space(tok[1])
            if val == "":
                continue
            key = _ODF_META_TAGS.get(tag)
            if key:
                meta[key] = val
        elif kind == END:
            tag = ""
    return meta or None


def extract_opendocument(b: bytes, mime: str) -> Result:
    try:
        zf = _open_zip(b)
    except Exception as exc:
        return Result(success=False, file_type="document/opendocument",
                      mime_type=mime, error=str(exc))
    try:
        content = read_zip_file(zf, "content.xml", MAX_ZIP_ENTRY_BYTES,
                                missing_fmt="{name} not found")
    except ZipEntryError as exc:
        return Result(success=False, file_type="document/opendocument",
                      mime_type=mime, error=str(exc))
    text = _odf_to_markdown(content)
    meta = _odf_parse_metadata(zf)
    if meta:
        text = _frontmatter(meta, _ODF_FM_KEYS) + text
    text = runes.trim_space(text)
    w, c = runes.build_counts(text)
    return Result(success=True, text=text, method="native",
                  file_type="document/opendocument", mime_type=mime,
                  metadata=meta, word_count=w, char_count=c)


# ------------------------------------------------------------------ EPUB


def _find_opf_path(zf: zipfile.ZipFile) -> str:
    """epub.go:97-121."""
    try:
        b = read_zip_file(zf, "META-INF/container.xml",
                          MAX_META_ENTRY_BYTES,
                          missing_fmt="not found: {name}")
    except ZipEntryError:
        return ""
    for tok in goxml.tokenize(b.decode("utf-8", errors="replace")):
        if tok[0] == START and tok[1] == "rootfile":
            fp = tok[3].get("full-path", "")
            if fp:
                return fp
    return ""


_EPUB_META_FIRST_WINS = {"title", "date"}
_EPUB_META_TAGS = {
    "title": "title", "creator": "author", "publisher": "publisher",
    "language": "language", "identifier": "identifier",
    "description": "description", "date": "date",
}
_EPUB_FM_KEYS = ["title", "author", "publisher", "date", "language",
                 "identifier", "description"]


def _parse_opf(data: bytes, opf_dir: str) -> tuple[list[str], dict[str, str]]:
    """epub.go:124-208."""
    manifest: dict[str, str] = {}
    spine_order: list[str] = []
    meta: dict[str, str] = {}
    current = ""
    for tok in goxml.tokenize(data.decode("utf-8", errors="replace")):
        kind = tok[0]
        if kind == START:
            current = tok[1]
            attrs = tok[3]
            if tok[1] == "item":
                iid = attrs.get("id", "")
                href = attrs.get("href", "")
                if iid and href:
                    manifest[iid] = href
            elif tok[1] == "itemref":
                idref = attrs.get("idref", "")
                if idref:
                    spine_order.append(idref)
        elif kind == CHARDATA:
            val = runes.trim_space(tok[1])
            if val == "":
                continue
            key = _EPUB_META_TAGS.get(current)
            if key:
                if key in _EPUB_META_FIRST_WINS and key in meta:
                    continue
                meta[key] = val
        elif kind == END:
            current = ""
    paths = []
    for idref in spine_order:
        href = manifest.get(idref)
        if href:
            if opf_dir not in ("", "."):
                href = opf_dir + "/" + href
            paths.append(href)
    return paths, meta


def _epub_strip_html(s: str) -> str:
    """epub.go:211-261 — string-replacement HTML strip (NOT the DOM
    kernel; the reference deliberately uses a cruder pass here)."""
    for old, new in (("<br>", "\n"), ("<br/>", "\n"), ("<br />", "\n"),
                     ("</p>", "\n\n"), ("</div>", "\n\n")):
        s = s.replace(old, new)
    for level in "123456":
        prefix = "#" * (ord(level) - ord("0"))
        s = s.replace(f"<h{level}>", prefix + " ")
        s = s.replace(f"<h{level} ", prefix + " <")
        s = s.replace(f"</h{level}>", "\n\n")
    s = s.replace("<li>", "- ").replace("</li>", "\n")
    while True:
        i = s.find("<")
        if i < 0:
            break
        j = s.find(">", i)
        if j < 0:
            break
        s = s[:i] + s[j + 1:]
    for old, new in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
                     ("&nbsp;", " ")):
        s = s.replace(old, new)
    out = []
    for line in s.split("\n"):
        line = runes.trim_space(line)
        if line != "":
            out.append(line)
    return "\n\n".join(out)


def extract_epub(b: bytes, mime: str) -> Result:
    try:
        zf = _open_zip(b)
    except Exception as exc:
        return Result(success=False, file_type="document/epub",
                      mime_type=mime, error=str(exc))
    opf_path = _find_opf_path(zf)
    if not opf_path:
        for f in zf.infolist():
            if f.filename.lower().endswith(".opf"):
                opf_path = f.filename
                break
    meta: dict[str, str] = {}
    spine_items: list[str] = []
    if opf_path:
        try:
            opf_data = read_zip_file(zf, opf_path, 4 << 20,
                                     missing_fmt="not found: {name}")
            opf_dir = opf_path.rsplit("/", 1)[0] if "/" in opf_path else "."
            spine_items, meta = _parse_opf(opf_data, opf_dir)
        except ZipEntryError:
            pass
    if not spine_items:
        for f in zf.infolist():
            name = f.filename.lower()
            if name.endswith((".xhtml", ".html", ".htm")):
                spine_items.append(f.filename)
    chapters: list[str] = []
    for i, item in enumerate(spine_items):
        try:
            data = read_zip_file(zf, item, 16 << 20,
                                 missing_fmt="not found: {name}")
        except ZipEntryError:
            continue
        chapter = _epub_strip_html(data.decode("utf-8", errors="replace"))
        if runes.trim_space(chapter) == "":
            continue
        chapters.append(f"## Chapter {i + 1}\n\n{chapter}")
    text = "\n\n---\n\n".join(chapters)
    if meta:
        text = _frontmatter(meta, _EPUB_FM_KEYS) + text
    text = runes.trim_space(text)
    w, c = runes.build_counts(text)
    return Result(success=True, text=text, method="native",
                  file_type="document/epub", mime_type=mime,
                  metadata=meta, word_count=w, char_count=c)
