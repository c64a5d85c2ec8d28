"""Deterministic DOCX/XLSX/PPTX/ODT/EPUB fixture writers.

Minimal but structurally-valid containers for the office kernels'
construct subset: stored (uncompressed) zip entries, fixed timestamps
(no wall clock — zipfile would otherwise stamp 'now')."""

from __future__ import annotations

import io
import zipfile

_FIXED_DATE = (2026, 1, 1, 0, 0, 0)


def _zip(entries: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, data in entries:
            info = zipfile.ZipInfo(name, date_time=_FIXED_DATE)
            zf.writestr(info, data)
    return buf.getvalue()


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


_CORE_XML = """<?xml version="1.0"?>
<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" xmlns:dc="http://purl.org/dc/elements/1.1/">
<dc:title>{title}</dc:title><dc:creator>{author}</dc:creator>
</cp:coreProperties>"""


def make_docx(paragraphs: list[dict], title: str = "",
              author: str = "",
              table: list[list[str]] | None = None) -> bytes:
    """paragraphs: dicts with text, optional style ('Heading1'…,
    'Title'), optional num (numId) and ilvl."""
    body = []
    for p in paragraphs:
        props = []
        if p.get("style"):
            props.append(f'<w:pStyle w:val="{p["style"]}"/>')
        if p.get("num"):
            props.append(
                f'<w:numPr><w:ilvl w:val="{p.get("ilvl", 0)}"/>'
                f'<w:numId w:val="{p["num"]}"/></w:numPr>'
            )
        ppr = f"<w:pPr>{''.join(props)}</w:pPr>" if props else ""
        body.append(
            f"<w:p>{ppr}<w:r><w:t>{_esc(p['text'])}</w:t></w:r></w:p>"
        )
    if table:
        rows = "".join(
            "<w:tr>" + "".join(
                f"<w:tc><w:p><w:r><w:t>{_esc(c)}</w:t></w:r></w:p></w:tc>"
                for c in row
            ) + "</w:tr>"
            for row in table
        )
        body.append(f"<w:tbl>{rows}</w:tbl>")
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        + "".join(body) + "</w:body></w:document>"
    )
    entries = [("word/document.xml", doc.encode())]
    if title or author:
        entries.append((
            "docProps/core.xml",
            _CORE_XML.format(title=_esc(title), author=_esc(author)).encode(),
        ))
    return _zip(entries)


def make_xlsx(sheets: dict[str, list[list[str]]]) -> bytes:
    names = list(sheets)
    wb_sheets = "".join(
        f'<sheet name="{_esc(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats'
        '.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="sheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    entries = [
        ("xl/workbook.xml", workbook.encode()),
        ("xl/_rels/workbook.xml.rels", rels.encode()),
    ]
    for i, name in enumerate(names):
        rows_xml = []
        for ri, row in enumerate(sheets[name], start=1):
            cells = []
            for ci, val in enumerate(row):
                ref = _col_letter(ci) + str(ri)
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t>{_esc(val)}</t>'
                    "</is></c>"
                )
            rows_xml.append(f'<row r="{ri}">{"".join(cells)}</row>')
        sheet = (
            '<?xml version="1.0"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            + "".join(rows_xml) + "</sheetData></worksheet>"
        )
        entries.append((f"xl/worksheets/sheet{i + 1}.xml", sheet.encode()))
    return _zip(entries)


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i > 0:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def make_pptx(slides: list[list[str]],
              notes: dict[int, str] | None = None,
              title: str = "") -> bytes:
    """slides: list of paragraph-text lists; notes: slide#(1-based) →
    note text."""
    entries = []
    for i, paras in enumerate(slides, start=1):
        body = "".join(
            f"<a:p><a:r><a:t>{_esc(t)}</a:t></a:r></a:p>" for t in paras
        )
        slide = (
            '<?xml version="1.0"?>'
            '<p:sld xmlns:p="http://schemas.openxmlformats.org/'
            'presentationml/2006/main" xmlns:a="http://schemas.'
            'openxmlformats.org/drawingml/2006/main">'
            f"<p:cSld><p:spTree>{body}</p:spTree></p:cSld></p:sld>"
        )
        entries.append((f"ppt/slides/slide{i}.xml", slide.encode()))
    for num, note in (notes or {}).items():
        body = f"<a:p><a:r><a:t>{_esc(note)}</a:t></a:r></a:p>"
        ns = (
            '<?xml version="1.0"?>'
            '<p:notes xmlns:p="http://schemas.openxmlformats.org/'
            'presentationml/2006/main" xmlns:a="http://schemas.'
            'openxmlformats.org/drawingml/2006/main">'
            f"{body}</p:notes>"
        )
        entries.append((f"ppt/notesSlides/notesSlide{num}.xml", ns.encode()))
    if title:
        entries.append((
            "docProps/core.xml",
            _CORE_XML.format(title=_esc(title), author="").encode(),
        ))
    return _zip(entries)


def make_odt(blocks: list[dict], title: str = "",
             author: str = "") -> bytes:
    """blocks: {type: 'h'|'p'|'list'|'table', ...}."""
    parts = []
    for blk in blocks:
        t = blk["type"]
        if t == "h":
            parts.append(
                f'<text:h text:outline-level="{blk.get("level", 1)}">'
                f"{_esc(blk['text'])}</text:h>"
            )
        elif t == "p":
            parts.append(f"<text:p>{_esc(blk['text'])}</text:p>")
        elif t == "list":
            items = "".join(
                f"<text:list-item><text:p>{_esc(x)}</text:p></text:list-item>"
                for x in blk["items"]
            )
            parts.append(f"<text:list>{items}</text:list>")
        elif t == "table":
            rows = "".join(
                "<table:table-row>" + "".join(
                    f"<table:table-cell><text:p>{_esc(c)}</text:p>"
                    "</table:table-cell>" for c in row
                ) + "</table:table-row>"
                for row in blk["rows"]
            )
            parts.append(f"<table:table>{rows}</table:table>")
    content = (
        '<?xml version="1.0"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0">'
        "<office:body><office:text>"
        + "".join(parts) + "</office:text></office:body>"
        "</office:document-content>"
    )
    entries = [("content.xml", content.encode())]
    if title or author:
        meta = (
            '<?xml version="1.0"?>'
            '<office:document-meta '
            'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
            'xmlns:dc="http://purl.org/dc/elements/1.1/">'
            f"<office:meta><dc:title>{_esc(title)}</dc:title>"
            f"<dc:creator>{_esc(author)}</dc:creator></office:meta>"
            "</office:document-meta>"
        )
        entries.append(("meta.xml", meta.encode()))
    return _zip(entries)


def make_epub(chapters: list[str], title: str = "",
              author: str = "") -> bytes:
    """chapters: XHTML body snippets."""
    manifest = "".join(
        f'<item id="ch{i}" href="ch{i}.xhtml" '
        'media-type="application/xhtml+xml"/>'
        for i in range(1, len(chapters) + 1)
    )
    spine = "".join(
        f'<itemref idref="ch{i}"/>' for i in range(1, len(chapters) + 1)
    )
    opf = (
        '<?xml version="1.0"?>'
        '<package xmlns="http://www.idpf.org/2007/opf" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/">'
        "<metadata>"
        f"<dc:title>{_esc(title)}</dc:title>"
        f"<dc:creator>{_esc(author)}</dc:creator>"
        "</metadata>"
        f"<manifest>{manifest}</manifest>"
        f"<spine>{spine}</spine></package>"
    )
    container = (
        '<?xml version="1.0"?>'
        '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:'
        'container"><rootfiles>'
        '<rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/>'
        "</rootfiles></container>"
    )
    entries = [
        ("META-INF/container.xml", container.encode()),
        ("OEBPS/content.opf", opf.encode()),
    ]
    for i, body in enumerate(chapters, start=1):
        xhtml = f"<html><body>{body}</body></html>"
        entries.append((f"OEBPS/ch{i}.xhtml", xhtml.encode()))
    return _zip(entries)
