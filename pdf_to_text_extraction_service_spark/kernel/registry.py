"""Format registry + resolution.

Reproduces reference internal/extract/registry.go:22-63 and the
registration order of cmd/server/main.go:98-118 ("more-specific
first"; last registration wins per key — e.g. the XML extractor
(registered 8th) takes ``.svg`` from the image extractor (2nd), and
video takes ``.webm`` from audio).

Resolution precedence (registry.go:38-63, pinned by the reference's
registry_test.go:22-34): extension → exact MIME → MIME with ";"
params stripped → any ``text/*`` falls back to the ``text/plain``
handler → error.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import codefmt, runes

MIB = 1 << 20

# Size caps per config.go:104-109.
MAX_FILE_BYTES = 500 * MIB
MAX_PDF_BYTES = 200 * MIB
MAX_IMAGE_BYTES = 40 * MIB
MAX_AUDIO_BYTES = 100 * MIB
MAX_VIDEO_BYTES = 500 * MIB
MAX_CODE_FILE_BYTES = 10 * MIB


@dataclass(frozen=True)
class Extractor:
    kernel: str           # dispatch key used by the kernel router
    name: str             # Extractor.Name() in the reference
    max_bytes: int
    mimes: tuple[str, ...]
    exts: tuple[str, ...]


_TEXT_EXTS = (
    ".txt", ".text", ".log", ".ini", ".cfg", ".conf", ".env",
    ".properties", ".gitignore", ".dockerignore", ".editorconfig",
    ".env.example", ".md", ".mdx", ".markdown",
)

# Registration order = cmd/server/main.go:98-118.
EXTRACTORS: tuple[Extractor, ...] = (
    Extractor("pdf", "document/pdf", MAX_PDF_BYTES,
              ("application/pdf",), (".pdf",)),
    Extractor("image", "image", MAX_IMAGE_BYTES,
              ("image/jpeg", "image/png", "image/gif", "image/webp",
               "image/bmp", "image/tiff", "image/svg+xml", "image/avif"),
              (".jpg", ".jpeg", ".png", ".gif", ".webp", ".bmp",
               ".tiff", ".tif", ".svg", ".avif")),
    Extractor("text", "text", MAX_CODE_FILE_BYTES,
              ("text/plain", "text/markdown"), _TEXT_EXTS),
    Extractor("html", "document/html", MAX_CODE_FILE_BYTES,
              ("text/html",), (".html", ".htm", ".xhtml", ".mhtml")),
    Extractor("rtf", "document/rtf", MAX_CODE_FILE_BYTES,
              ("application/rtf", "text/rtf"), (".rtf",)),
    Extractor("csv", "structured/csv", MAX_CODE_FILE_BYTES,
              ("text/csv", "text/tab-separated-values"),
              (".csv", ".tsv")),
    Extractor("json", "structured/json", MAX_CODE_FILE_BYTES,
              ("application/json",), (".json", ".jsonl", ".geojson")),
    Extractor("xml", "structured/xml", MAX_CODE_FILE_BYTES,
              ("application/xml", "text/xml"),
              (".xml", ".xsd", ".xsl", ".svg", ".plist")),
    Extractor("yaml", "structured/yaml", MAX_CODE_FILE_BYTES,
              ("application/yaml", "text/yaml", "application/x-yaml"),
              (".yaml", ".yml", ".toml")),
    Extractor("source", "code/source", MAX_CODE_FILE_BYTES,
              (), tuple(sorted(codefmt.SOURCE_EXTENSIONS))),
    Extractor("notebook", "code/notebook", MAX_CODE_FILE_BYTES,
              ("application/x-ipynb+json",), (".ipynb",)),
    Extractor("latex", "code/latex", MAX_CODE_FILE_BYTES,
              ("application/x-tex", "text/x-tex"),
              (".tex", ".sty", ".cls", ".bib")),
    Extractor("docx", "document/docx", MAX_FILE_BYTES,
              ("application/vnd.openxmlformats-officedocument."
               "wordprocessingml.document",), (".docx",)),
    Extractor("xlsx", "document/xlsx", MAX_FILE_BYTES,
              ("application/vnd.openxmlformats-officedocument."
               "spreadsheetml.sheet",), (".xlsx",)),
    Extractor("pptx", "document/pptx", MAX_FILE_BYTES,
              ("application/vnd.openxmlformats-officedocument."
               "presentationml.presentation",), (".pptx",)),
    Extractor("legacy_office", "document/legacy-office", MAX_FILE_BYTES,
              ("application/msword", "application/vnd.ms-excel",
               "application/vnd.ms-powerpoint"),
              (".doc", ".xls", ".ppt")),
    Extractor("opendocument", "document/opendocument", MAX_FILE_BYTES,
              ("application/vnd.oasis.opendocument.text",
               "application/vnd.oasis.opendocument.spreadsheet",
               "application/vnd.oasis.opendocument.presentation"),
              (".odt", ".ods", ".odp")),
    Extractor("epub", "document/epub", MAX_FILE_BYTES,
              ("application/epub+zip",), (".epub",)),
    Extractor("audio", "media/audio", MAX_AUDIO_BYTES,
              ("audio/mpeg", "audio/wav", "audio/x-wav", "audio/mp4",
               "audio/ogg", "audio/flac", "audio/aac", "audio/webm",
               "audio/opus"),
              (".mp3", ".wav", ".m4a", ".ogg", ".flac", ".aac",
               ".wma", ".opus", ".webm")),
    Extractor("video", "media/video", MAX_VIDEO_BYTES,
              ("video/mp4", "video/x-matroska", "video/x-msvideo",
               "video/quicktime", "video/webm", "video/x-flv",
               "video/x-ms-wmv"),
              (".mp4", ".mkv", ".avi", ".mov", ".webm", ".m4v",
               ".flv", ".wmv")),
)

BY_MIME: dict[str, Extractor] = {}
BY_EXT: dict[str, Extractor] = {}
for _e in EXTRACTORS:
    for _mt in _e.mimes:
        _k = _mt.strip().lower()
        if _k:
            BY_MIME[_k] = _e
    for _x in _e.exts:
        _k = _x.strip().lower()
        if _k:
            BY_EXT[_k] = _e


class ResolveError(LookupError):
    def __init__(self, mime: str, ext: str):
        self.mime = mime
        self.ext = ext
        super().__init__(
            f"no extractor registered for mime={runes.go_quote(mime)} "
            f"extension={runes.go_quote(ext)}"
        )


def resolve(mime_type: str, extension: str) -> Extractor:
    """registry.go:38-63."""
    mt = runes.trim_space(mime_type).lower()
    ext = runes.trim_space(extension).lower()
    e = BY_EXT.get(ext)
    if e is not None:
        return e
    e = BY_MIME.get(mt)
    if e is not None:
        return e
    i = mt.find(";")
    if i > 0:
        e = BY_MIME.get(runes.trim_space(mt[:i]))
        if e is not None:
            return e
    if mt.startswith("text/"):
        e = BY_MIME.get("text/plain")
        if e is not None:
            return e
    raise ResolveError(mime_type, extension)
