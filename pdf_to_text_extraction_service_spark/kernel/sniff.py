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
        return _sniff_zip(payload)
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
    mt = _sniff_breadth(head)
    if mt is not None:
        return mt
    if any(b in _BINARY_BYTES for b in head):
        return "application/octet-stream"
    return "text/plain; charset=utf-8"


def _sniff_breadth(head: bytes) -> str | None:
    """The long tail of the reference's mimetype magic tree
    (gabriel-vasile/mimetype, download.go:211-229): common container,
    media, font, archive and executable signatures, checked before
    the generic text/binary fallback.  Types without a registered
    extractor still dispatch better than `application/octet-stream`:
    the router's failure envelope then names the real format, exactly
    as the reference's does."""
    if head.startswith(b"RIFF") and len(head) >= 12:
        sub = head[8:12]
        if sub == b"WEBP":
            return "image/webp"
        if sub == b"WAVE":
            return "audio/wav"
        if sub == b"AVI ":
            return "video/x-msvideo"
    if head.startswith(b"II*\x00") or head.startswith(b"MM\x00*"):
        return "image/tiff"
    if head.startswith(b"BM") and len(head) >= 14 \
            and head[6:10] == b"\x00\x00\x00\x00":
        return "image/bmp"
    if head.startswith(b"\x00\x00\x01\x00"):
        return "image/x-icon"
    if head.startswith(b"fLaC"):
        return "audio/flac"
    if head.startswith(b"OggS"):
        if b"\x01vorbis" in head or b"OpusHead" in head:
            return "audio/ogg"
        if b"\x80theora" in head:
            return "video/ogg"
        return "application/ogg"
    if head.startswith(b"ID3") or (
            len(head) >= 2 and head[0] == 0xFF
            and (head[1] & 0xE6) == 0xE2):
        return "audio/mpeg"
    if len(head) >= 2 and head[0] == 0xFF and (head[1] & 0xF6) == 0xF0:
        return "audio/aac"          # ADTS: 0xFFF sync, layer 00
    if head.startswith(b"FORM") and head[8:12] == b"AIFF":
        return "audio/aiff"
    if head.startswith(b"MThd"):
        return "audio/midi"
    if head.startswith(b"#!AMR"):
        return "audio/amr"
    if head.startswith(b"\x1a\x45\xdf\xa3"):
        # EBML: the doctype string distinguishes webm from matroska
        if b"webm" in head[:64]:
            return "video/webm"
        return "video/x-matroska"
    if head.startswith(b"FLV\x01"):
        return "video/x-flv"
    if head.startswith(b"\x30\x26\xb2\x75\x8e\x66\xcf\x11"):
        return "video/x-ms-asf"
    if len(head) >= 12 and head[4:8] == b"ftyp":
        brand = head[8:12]
        if brand in (b"avif", b"avis"):
            return "image/avif"
        if brand in (b"heic", b"heix", b"mif1"):
            return "image/heic"
        if brand in (b"M4A ", b"M4B "):
            return "audio/mp4"
        if brand == b"qt  ":
            return "video/quicktime"
        if brand[:3] == b"3gp":
            return "video/3gpp"
        return "video/mp4"
    if head.startswith(b"7z\xbc\xaf\x27\x1c"):
        return "application/x-7z-compressed"
    if head.startswith(b"Rar!\x1a\x07"):
        return "application/x-rar-compressed"
    if head.startswith(b"BZh"):
        return "application/x-bzip2"
    if head.startswith(b"\xfd7zXZ\x00"):
        return "application/x-xz"
    if head.startswith(b"\x28\xb5\x2f\xfd"):
        return "application/zstd"
    if head[257:262] == b"ustar":
        return "application/x-tar"
    if head.startswith(b"\x7fELF"):
        return "application/x-elf"
    if head.startswith(b"MZ"):
        return "application/vnd.microsoft.portable-executable"
    if head.startswith(b"\xca\xfe\xba\xbe"):
        return "application/x-java-applet"
    if head.startswith(b"wOFF"):
        return "font/woff"
    if head.startswith(b"wOF2"):
        return "font/woff2"
    if head.startswith(b"\x00\x01\x00\x00"):
        return "font/ttf"
    if head.startswith(b"OTTO"):
        return "font/otf"
    if head.startswith(b"SQLite format 3\x00"):
        return "application/vnd.sqlite3"
    if head.startswith(b"\x00asm"):
        return "application/wasm"
    if head.startswith(b"PAR1"):
        return "application/vnd.apache.parquet"
    if head.startswith(b"\x00\x00\x00\x0cjP  \r\n\x87\n") \
            or head.startswith(b"\xff\x4f\xff\x51"):
        return "image/jp2"
    stripped = head.lstrip(b" \t\n\r")
    if stripped.startswith(b"<?xml"):
        if b"<svg" in head:
            return "image/svg+xml"
        return "text/xml; charset=utf-8"
    if stripped[:4].lower() == b"<svg":
        return "image/svg+xml"
    return None


def _sniff_zip(payload: bytes) -> str:
    """Refine a PK zip by its leading member names, the way the
    reference's mimetype tree does: OOXML ([Content_Types].xml +
    word/ xl/ ppt/ part prefixes), ODF and EPUB (a STORED first
    member literally named 'mimetype' whose body is the type), and
    JAR.  Bounded: only the first 4 KB are examined."""
    head = payload[:4096]
    # first local-file-header name (offset 30, length at 26)
    if len(head) >= 32:
        nlen = int.from_bytes(head[26:28], "little")
        name = head[30:30 + nlen]
        if name == b"mimetype":
            elen = int.from_bytes(head[28:30], "little")
            body = head[30 + nlen + elen:30 + nlen + elen + 64]
            for mt in (b"application/epub+zip",
                       b"application/vnd.oasis.opendocument.text",
                       b"application/vnd.oasis.opendocument.spreadsheet",
                       b"application/vnd.oasis.opendocument.presentation"):
                if body.startswith(mt):
                    return mt.decode()
    # OOXML: classify on the package part prefixes of leading member
    # NAMES (each follows a PK\x03\x04 local header) — the
    # [Content_Types].xml member may sort anywhere, so the part
    # prefix is the robust signal, as in the reference's tree
    names = []
    pos = 0
    while len(names) < 32:
        i = head.find(b"PK\x03\x04", pos)
        if i < 0 or i + 30 > len(head):
            break
        nlen = int.from_bytes(head[i + 26:i + 28], "little")
        names.append(head[i + 30:i + 30 + nlen])
        pos = i + 4
    for prefix, mt in (
            (b"word/", "application/vnd.openxmlformats-officedocument"
                       ".wordprocessingml.document"),
            (b"xl/", "application/vnd.openxmlformats-officedocument"
                     ".spreadsheetml.sheet"),
            (b"ppt/", "application/vnd.openxmlformats-officedocument"
                      ".presentationml.presentation")):
        if any(n.startswith(prefix) for n in names):
            return mt
    if any(n == b"META-INF/MANIFEST.MF" for n in names) \
            or b"META-INF/MANIFEST.MF" in head:
        return "application/jar"
    return "application/zip"


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
