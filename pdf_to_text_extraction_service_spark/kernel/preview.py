"""Preview mode — the reference's cheap early-exit projection.

Port of handlePreview (cmd/server/main.go:336-483) + ProcessPreview
(internal/hybrid/hybrid.go:144-200):

- allowlist of 16 file types; paid/external paths (image, audio,
  video, legacy office) rejected with the exact message
  ``preview unsupported for this file type`` (main.go:403-405,703-710)
- PDF: first min(PreviewMaxPages=8, total) pages, TEXT-LAYER ONLY
  (never OCR), needs-OCR ratio > 0.25 flag, pages joined "\n\n",
  double byte-truncation (ProcessPreview's PreviewMaxChars then the
  handler's previewMaxChars) with "..." suffix, metadata
  needsOcr/totalPages/textLayerPages, method ``preview-text-layer``
- non-PDF: the NORMAL kernel, then byte-truncate to previewMaxChars
  + "..." and recount (main.go:470-473; Go slices BYTES)
"""

from __future__ import annotations

from . import pdfk, quality, registry, runes, sniff, textnorm
from .registry import ResolveError
from .result import Result
from .router import _dispatch

PREVIEW_MAX_PAGES = 8        # config.go:142
PREVIEW_MAX_CHARS = 20000    # config.go:143
PREVIEW_NEEDS_OCR_RATIO = 0.25  # config.go:144

_PREVIEW_ALLOWED = frozenset((
    "document/pdf", "document/docx", "document/xlsx", "document/pptx",
    "document/opendocument", "document/epub", "document/rtf",
    "document/html", "text", "structured/csv", "structured/json",
    "structured/xml", "structured/yaml", "code/source",
    "code/notebook", "code/latex",
))


def _truncate_bytes(text: str, max_chars: int) -> tuple[str, bool]:
    """Go ``text[:previewMaxChars]`` slices BYTES."""
    raw = text.encode("utf-8")
    if len(raw) <= max_chars:
        return text, False
    return raw[:max_chars].decode("utf-8", errors="replace") + "...", True


def preview_document(
    url: str,
    payload: bytes | None,
    max_chars: int = PREVIEW_MAX_CHARS,
    max_pages: int = PREVIEW_MAX_PAGES,
    min_words: int = pdfk.MIN_WORDS_THRESHOLD,
) -> tuple[Result, str]:
    """Preview one document. Returns (Result, format_kernel_id)."""
    file_name = sniff.url_file_name(url)
    if payload is None:
        return Result(success=False, error="empty payload"), "unknown"
    if len(payload) > registry.MAX_FILE_BYTES:
        return (
            Result(success=False,
                   error=f"file exceeds "
                         f"{registry.MAX_FILE_BYTES // (1 << 20)}MB limit"),
            "unknown",
        )
    mime = sniff.sniff_mime(payload)
    ext = sniff.file_ext(file_name).lower()
    try:
        extractor = registry.resolve(mime, ext)
    except ResolveError as exc:
        return (
            Result(success=False, mime_type=mime, file_type="unknown",
                   error=str(exc)),
            "unknown",
        )

    if extractor.name not in _PREVIEW_ALLOWED:
        return (
            Result(success=False, mime_type=mime,
                   file_type=extractor.name,
                   error="preview unsupported for this file type"),
            extractor.kernel,
        )

    if extractor.name == "document/pdf":
        return _preview_pdf(payload, mime, max_chars, max_pages,
                            min_words), "pdf"

    try:
        res = _dispatch(extractor, payload, file_name, mime)
    except Exception as exc:
        return (
            Result(success=False, file_type=extractor.name,
                   mime_type=mime, error=str(exc)),
            extractor.kernel,
        )
    if res.error is not None:
        res.success = False
        if res.mime_type == "":
            res.mime_type = mime
        return res, extractor.kernel
    if max_chars > 0:
        res.text, truncated = _truncate_bytes(res.text, max_chars)
        if truncated:
            res.word_count, res.char_count = runes.build_counts(res.text)
    res.success = True
    if res.mime_type == "":
        res.mime_type = mime
    if runes.trim_space(res.file_type) == "":
        res.file_type = extractor.name
    return res, extractor.kernel


def _preview_pdf(payload: bytes, mime: str, max_chars: int,
                 max_pages: int, min_words: int) -> Result:
    """hybrid.go:144-200 + the handler's PDF branch
    (main.go:412-446)."""
    try:
        doc = pdfk.PDFDoc(payload)
        total = doc.page_count
    except pdfk.PDFError as exc:
        return Result(success=False, method="preview-text-layer",
                      file_type="document/pdf", mime_type=mime,
                      error=f"page count: {exc}")
    preview_pages = min(max_pages, total)
    if preview_pages < 1:
        preview_pages = 1

    needs_ocr = 0
    text_layer = 0
    total_words = 0
    parts: list[str] = []
    for page_num in range(1, preview_pages + 1):
        try:
            text = doc.page_text(page_num)
        except pdfk.PDFError:
            needs_ocr += 1
            continue
        text = textnorm.clean_text(text)
        decision = quality.score(text, min_words)
        total_words += decision.word_count
        if decision.needs_ocr:
            needs_ocr += 1
        else:
            text_layer += 1
            parts.append(text)

    flag = (needs_ocr / preview_pages) > PREVIEW_NEEDS_OCR_RATIO
    combined = "\n\n".join(parts)
    # ProcessPreview's own cap (hybrid.go:193-195), then the handler's
    # (main.go:433-436) — same default, so one byte-truncation pass
    # reproduces both.
    combined, _ = _truncate_bytes(combined, max_chars)
    w, c = runes.build_counts(combined)
    meta = {
        "needsOcr": "true" if flag else "false",
        "totalPages": str(total),
        "textLayerPages": str(text_layer),
    }
    return Result(success=True, text=combined,
                  method="preview-text-layer", file_type="document/pdf",
                  mime_type=mime, metadata=meta, word_count=w,
                  char_count=c)
