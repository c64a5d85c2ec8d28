"""MIME sniffing over the first bytes of a payload.

The reference sniffs with the gabriel-vasile/mimetype magic-byte tree
and falls back to Go's http.DetectContentType over the first 512 bytes
(internal/extract/download.go:211-229). Extension-first routing
(registry.go:42-44) makes the sniffer load-bearing only for URLs
without a registered extension; we implement the signature subset the
corpus can produce and fall back to text/plain vs
application/octet-stream exactly like http.DetectContentType's final
rule (valid-looking text vs binary bytes).
"""

from __future__ import annotations

from . import runes

_HTML_SIGS = (
    b"<!doctype html", b"<html", b"<head", b"<script", b"<iframe",
    b"<h1", b"<div", b"<font", b"<table", b"<a", b"<style",
    b"<title", b"<b", b"<body", b"<br", b"<p", b"<!--",
)

# http.DetectContentType's binary-detection byte set complement:
# 0x00-0x08, 0x0B, 0x0E-0x1A, 0x1C-0x1F are "binary" bytes.
_BINARY_BYTES = frozenset(
    list(range(0x00, 0x09)) + [0x0B] + list(range(0x0E, 0x1B))
    + list(range(0x1C, 0x20))
)


def sniff_mime(payload: bytes) -> str:
    """Return a lowercase MIME type for the first 512 bytes."""
    if not payload:
        return ""
    head = payload[:512]
    stripped = head.lstrip(b" \t\n\r")
    low = stripped[:32].lower()
    for sig in _HTML_SIGS:
        if low.startswith(sig) and len(stripped) > len(sig) \
                and stripped[len(sig):len(sig) + 1] in (b" ", b">", b"\n", b"\r", b"\t", b"/"):
            return "text/html; charset=utf-8"
    if head.startswith(b"%PDF-"):
        return "application/pdf"
    if head.startswith(b"%!PS-Adobe-"):
        return "application/postscript"
    if head.startswith(b"\x89PNG\r\n\x1a\n"):
        return "image/png"
    if head.startswith(b"\xff\xd8\xff"):
        return "image/jpeg"
    if head.startswith(b"GIF87a") or head.startswith(b"GIF89a"):
        return "image/gif"
    if head.startswith(b"PK\x03\x04"):
        return "application/zip"
    if head.startswith(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"):
        return _sniff_ole2(payload)
    if head.startswith(b"\x1f\x8b"):
        return "application/x-gzip"
    if head.startswith(b"{\\rtf"):
        return "text/rtf"
    if head.startswith(b"\xef\xbb\xbf"):
        return "text/plain; charset=utf-8"
    if head.startswith(b"\xfe\xff") or head.startswith(b"\xff\xfe"):
        return "text/plain; charset=utf-16"
    if any(b in _BINARY_BYTES for b in head):
        return "application/octet-stream"
    return "text/plain; charset=utf-8"


def _sniff_ole2(payload: bytes) -> str:
    """OLE2 compound file: the reference's mimetype tree resolves the
    concrete type from the ROOT directory's entry names. A bounded
    CFB directory peek (header + FAT + directory sectors, no stream
    payloads) beats a whole-payload UTF-16LE substring scan, which
    mislabels e.g. an .xls carrying an embedded Word OLE object
    (MBD…/WordDocument) as application/msword (ADVICE r3)."""
    try:
        from .cfb import CFB

        names = set(CFB(payload, directory_only=True).top_level_names())
    except Exception:
        # corrupt directory: degrade to the old substring heuristic
        names = set()
        for n in ("WordDocument", "Workbook", "Book",
                  "PowerPoint Document"):
            if n.encode("utf-16-le") in payload:
                names.add(n)
    if "WordDocument" in names:
        return "application/msword"
    if "Workbook" in names or "Book" in names:
        return "application/vnd.ms-excel"
    if "PowerPoint Document" in names:
        return "application/vnd.ms-powerpoint"
    return "application/x-ole-storage"


def file_ext(file_name: str) -> str:
    """Go filepath.Ext: suffix beginning at the final dot of the base
    name ('' when there is no dot)."""
    base = file_name.rsplit("/", 1)[-1]
    i = base.rfind(".")
    return base[i:] if i >= 0 else ""


def url_file_name(url: str) -> str:
    """Base name of a URL's path (query/fragment stripped), the analog
    of the reference's fileName request field; empty → 'input.bin'
    (router.go:34-37)."""
    s = url.split("#", 1)[0].split("?", 1)[0]
    s = s.split("://", 1)[-1]
    name = runes.trim_space(s.rsplit("/", 1)[-1])
    return name if name else "input.bin"
