"""Deterministic uncompressed-PDF writer for fixtures and corpus.

Emits the exact construct subset the PDF text-layer kernel
(kernel/pdfk.py) reads: one content stream per page, literal strings,
Tm/Td positioning. Multi-column pages place spans at two x origins so
the reader's column detection + reading-order sort is exercised
(north_star: "reading-order sort and column detection").
"""

from __future__ import annotations

Span = tuple[float, float, str]  # (x, y, text)


def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def page_content(spans: list[Span]) -> bytes:
    ops = ["BT", "/F1 12 Tf"]
    for x, y, text in spans:
        ops.append(f"1 0 0 1 {x:g} {y:g} Tm")
        ops.append(f"({_escape(text)}) Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1", errors="replace")


def single_column_page(lines: list[str], x: float = 72.0,
                       top: float = 720.0, leading: float = 16.0) -> list[Span]:
    return [(x, top - i * leading, ln) for i, ln in enumerate(lines)]


def two_column_page(left: list[str], right: list[str],
                    top: float = 720.0, leading: float = 16.0) -> list[Span]:
    spans = [(72.0, top - i * leading, ln) for i, ln in enumerate(left)]
    spans += [(320.0, top - i * leading, ln) for i, ln in enumerate(right)]
    return spans


def build_pdf(pages: list[list[Span]], compress: bool = False) -> bytes:
    """Assemble a PDF 1.4 file with correct xref; compress=True emits
    FlateDecode content streams (the realistic CC-PDF case)."""
    import zlib

    n_pages = len(pages)
    # Object numbering: 1 catalog, 2 pages, then per page: page obj,
    # content obj.
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, spans in enumerate(pages):
        content = page_content(spans)
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b" /Filter /FlateDecode"
        page_num = 3 + 2 * i
        objs.append(
            (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             f"/Resources << /Font << /F1 {3 + 2 * n_pages} 0 R >> >> "
             f"/Contents {page_num + 1} 0 R >>").encode()
        )
        objs.append(
            b"<< /Length %d%s >>\nstream\n%s\nendstream"
            % (len(content), filt, content)
        )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref_pos))
    return bytes(out)


def simple_pdf(page_lines: list[list[str]]) -> bytes:
    """One single-column page per entry of page_lines."""
    return build_pdf([single_column_page(lines) for lines in page_lines])
