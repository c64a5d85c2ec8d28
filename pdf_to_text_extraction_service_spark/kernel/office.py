"""Office / OpenDocument / EPUB kernels (zip + XML containers).

Ports of:
- DOCX reference internal/extractors/office/docx.go:34-415
- XLSX reference internal/extractors/office/xlsx.go:27-129
- PPTX reference internal/extractors/office/pptx.go:30-142
- ODF  reference internal/extractors/opendocument/opendocument.go:27-369
- EPUB reference internal/extractors/ebook/epub.go:26-301

Implementation status round 1: container plumbing (zip entry caps) is
real; the XML walkers land in a later milestone — until then these
return explicit failure envelopes (the pipeline's failure-code path is
identical either way).
"""

from __future__ import annotations

from .result import Result

# Zip entry caps (docx.go:18-21).
MAX_ZIP_ENTRY_BYTES = 32 << 20
MAX_META_ENTRY_BYTES = 2 << 20


def _todo(name: str, mime: str, what: str) -> Result:
    return Result(success=False, file_type=name, mime_type=mime,
                  error=f"{what} kernel not yet implemented "
                        "(offline engine round-1 stub)")


def extract_docx(b: bytes, mime: str) -> Result:
    return _todo("document/docx", mime, "docx")


def extract_xlsx(b: bytes, mime: str) -> Result:
    return _todo("document/xlsx", mime, "xlsx")


def extract_pptx(b: bytes, mime: str) -> Result:
    return _todo("document/pptx", mime, "pptx")


def extract_opendocument(b: bytes, mime: str) -> Result:
    return _todo("document/opendocument", mime, "opendocument")


def extract_epub(b: bytes, mime: str) -> Result:
    return _todo("document/epub", mime, "epub")
