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

import json as _json
import re as _re

from . import gocsv, runes

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
    # breadth checks see a deeper window: ISO9660's volume descriptor
    # sits at 32 KiB, DICOM's magic at 128, the MPEG-TS sync grid at
    # 0/188/376 — all beyond DetectContentType's 512-byte view
    mt = _sniff_breadth(payload[:40960])
    if mt is not None:
        return mt
    if stripped[:1] in (b"{", b"[") and len(payload) <= (1 << 20):
        # mimetype validates the whole (read-limited) payload as JSON
        # before naming application/json; bounded at 1 MiB here
        try:
            v = _json.loads(payload.decode("utf-8"))
            if isinstance(v, (dict, list)):
                return "application/json"
        except (ValueError, UnicodeDecodeError):
            pass
    if any(b in _BINARY_BYTES for b in head):
        return "application/octet-stream"
    mt = _sniff_content_stats(payload)
    if mt is not None:
        return mt
    return "text/plain; charset=utf-8"


def _sniff_content_stats(payload: bytes) -> str | None:
    """Content-statistical detectors the reference's mimetype library
    resolves by PARSING rather than magic bytes: NDJSON (every line a
    standalone JSON object/array), then CSV/TSV (uniform field count
    > 1 over > 1 records).  Bounded at 1 MiB with the final possibly-
    partial line dropped, mirroring the library's read-limit rule.
    Documented subset vs the library: strict Go quoting via
    kernel/gocsv.py (the library turns LazyQuotes on and honors '#'
    comment lines for its csv probe; the reference's actual CSV
    extractor is strict, csv.go:57-68, so strict keeps sniff-name and
    parse-success consistent)."""
    if len(payload) > (1 << 20):
        cut = payload.rfind(b"\n", 0, 1 << 20)
        if cut <= 0:
            return None
        payload = payload[:cut]
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError:
        return None
    # Go's line model: \n (with optional \r) only.  str.splitlines()
    # would also split on U+2028/U+0085/\x0b/\x0c and make this gate
    # disagree with gocsv.read_all, which sees the undivided text.
    lines = [ln for ln in text.replace("\r\n", "\n").split("\n")
             if ln.strip()]
    if len(lines) < 2:
        return None
    if lines[0].lstrip()[:1] in ("{", "["):
        for ln in lines:
            try:
                v = _json.loads(ln)
            except ValueError:
                break
            if not isinstance(v, (dict, list)):
                break
        else:
            return "application/x-ndjson"
    for delim, mt in ((",", "text/csv"),
                      ("\t", "text/tab-separated-values")):
        if delim not in lines[0]:
            continue
        try:
            recs = gocsv.read_all(text, delim)
        except ValueError:
            continue
        if len(recs) > 1 and len(recs[0]) > 1 and all(
                len(r) == len(recs[0]) for r in recs):
            return mt
    return None


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
    if head.startswith(b"\x04\x22\x4d\x18"):
        return "application/x-lz4"
    if head.startswith(b"\x1f\x9d"):
        return "application/x-compress"     # .Z (LZW compress)
    if head.startswith(b"LZIP") and head[4:5] in (b"\x00", b"\x01"):
        return "application/lzip"   # version byte guards prose "LZIP…"
    if head.startswith(b"xar!"):
        return "application/x-xar"
    if head[257:262] == b"ustar":
        return "application/x-tar"
    if head.startswith(b"070707") or head.startswith(b"070701") \
            or head.startswith(b"070702"):
        return "application/x-cpio"
    if head.startswith(b"!<arch>\n"):
        # Unix ar; a Debian package is an ar whose first member is
        # literally named debian-binary
        if head[8:21] == b"debian-binary":
            return "application/vnd.debian.binary-package"
        return "application/x-archive"
    if head.startswith(b"\xed\xab\xee\xdb"):
        return "application/x-rpm"
    if head[0x8001:0x8006] == b"CD001" or head[0x8801:0x8806] == b"CD001" \
            or head[0x9001:0x9006] == b"CD001":
        return "application/x-iso9660-image"
    if head.startswith(b"MSCF"):
        return "application/vnd.ms-cab-compressed"
    if head.startswith(b"ITSF"):
        return "application/vnd.ms-htmlhelp"      # .chm
    if head.startswith(b"Cr24"):
        return "application/x-chrome-extension"
    if head.startswith(b"\x7fELF"):
        return "application/x-elf"
    if head.startswith(b"MZ"):
        return "application/vnd.microsoft.portable-executable"
    if head.startswith(b"\xca\xfe\xba\xbe"):
        # magic collision: Java .class vs fat Mach-O.  A fat header's
        # next field is nfat_arch (a handful); a class file's is
        # minor<<16|major with major >= 45 — so a small big-endian
        # count means Mach-O (the same disambiguation the reference's
        # mimetype tree applies).
        if len(head) >= 8 and int.from_bytes(head[4:8], "big") < 20:
            return "application/x-mach-binary"
        return "application/x-java-applet"
    if head[:4] in (b"\xfe\xed\xfa\xce", b"\xfe\xed\xfa\xcf",
                    b"\xce\xfa\xed\xfe", b"\xcf\xfa\xed\xfe"):
        return "application/x-mach-binary"
    if head.startswith(b"L\x00\x00\x00\x01\x14\x02\x00"):
        return "application/x-ms-shortcut"        # .lnk
    if head[:3] in (b"FWS", b"CWS", b"ZWS") and len(head) > 3 \
            and head[3] < 0x20:
        return "application/x-shockwave-flash"  # small version byte
    if head.startswith(b"wOFF"):
        return "font/woff"
    if head.startswith(b"wOF2"):
        return "font/woff2"
    if head[4:19] in (b"Standard Jet DB", b"Standard ACE DB"):
        # must precede font/ttf: Access files share the
        # \x00\x01\x00\x00 leading bytes with the sfnt version tag
        return "application/x-msaccess"
    if head.startswith(b"\x00\x01\x00\x00") or (
            head.startswith(b"true") and head[4:5] == b"\x00"):
        return "font/ttf"   # 'true' sfnt needs a binary numTables byte
    if head.startswith(b"OTTO"):
        return "font/otf"
    if head.startswith(b"ttcf"):
        return "font/collection"
    if head[34:36] == b"LP" and head[8:12] in (
            b"\x00\x00\x01\x00", b"\x01\x00\x02\x00", b"\x02\x00\x02\x00"):
        return "application/vnd.ms-fontobject"    # .eot magic + version
    if head.startswith(b"SQLite format 3\x00"):
        return "application/vnd.sqlite3"
    if head.startswith(b"\x00asm"):
        return "application/wasm"
    if head.startswith(b"PAR1"):
        return "application/vnd.apache.parquet"
    if head.startswith(b"ORC") and len(head) > 3 and head[3] < 0x09:
        return "application/x-orc"  # magic then binary, guards "ORC…" prose
    if head.startswith(b"Obj\x01"):
        return "application/avro"
    if head.startswith(b"\x89HDF\r\n\x1a\n"):
        return "application/x-hdf"
    if head.startswith(b"SIMPLE  ="):
        return "application/fits"
    if head[:4] in (b"\xd4\xc3\xb2\xa1", b"\xa1\xb2\xc3\xd4"):
        return "application/vnd.tcpdump.pcap"
    if head.startswith(b"\x0a\x0d\x0d\x0a"):
        return "application/x-pcapng"
    if head[128:132] == b"DICM":
        return "application/dicom"
    if head.startswith(b"\x00\x00\x00\x0cjP  \r\n\x87\n") \
            or head.startswith(b"\xff\x4f\xff\x51"):
        return "image/jp2"
    if head.startswith(b"\x00\x00\x00\x0cJXL \r\n\x87\n") \
            or head.startswith(b"\xff\x0a"):
        return "image/jxl"
    if head.startswith(b"\x76\x2f\x31\x01"):
        return "image/x-exr"
    if head.startswith(b"#?RADIANCE"):
        return "image/vnd.radiance"
    if head.startswith(b"8BPS"):
        return "image/vnd.adobe.photoshop"
    if head.startswith(b"gimp xcf"):
        return "image/x-xcf"
    if head.startswith(b"icns"):
        return "image/x-icns"
    if head.startswith(b"\x00\x00\x02\x00"):
        return "image/x-icon"                     # .cur cursor
    if head.startswith(b"AT&TFORM"):
        return "image/vnd.djvu"
    if head.startswith(b"BPG\xfb"):
        return "image/bpg"
    if len(head) >= 3 and head[0] == 0x50 \
            and head[1] in b"1234567" and head[2] in b" \t\n\r":
        return "image/x-portable-anymap"          # P1..P7 netpbm
    if head.startswith(b"glTF"):
        return "model/gltf-binary"
    if head.startswith(b".snd"):
        return "audio/basic"
    if head.startswith(b"MAC ") and len(head) > 4 \
            and (head[4] < 0x09 or head[4] >= 0x7f):
        return "audio/ape"  # binary version u16 guards "MAC address…" prose
    if head.startswith(b"wvpk"):
        return "audio/wavpack"
    if head.startswith(b"MPCK") or head.startswith(b"MP+\x07"):
        return "audio/musepack"
    if head.startswith(b"caff") and head[4:6] == b"\x00\x01":
        return "audio/x-caf"  # version u16 BE guards "caffeine…" prose
    if head.startswith(b".RMF"):
        return "application/vnd.rn-realmedia-vbr"
    if head.startswith(b".ra\xfd"):
        return "audio/x-pn-realaudio"
    if head.startswith(b"\x00\x00\x01\xba") \
            or head.startswith(b"\x00\x00\x01\xb3"):
        return "video/mpeg"
    if len(head) >= 377 and head[0] == 0x47 and head[188] == 0x47 \
            and head[376] == 0x47:
        return "video/mp2t"                       # MPEG-TS sync grid
    if head.startswith(b"\x1f\x07\x00"):
        return "video/dv"
    if head.startswith(b"\x06\x0e\x2b\x34"):
        return "application/mxf"
    if head.startswith(b"d8:announce"):
        return "application/x-bittorrent"
    if head.startswith(b"BLENDER"):
        return "application/x-blender"
    if head.startswith(b"\xf7\x02"):
        return "application/x-dvi"
    stripped = head.lstrip(b" \t\n\r")
    if stripped.startswith(b"<?xml"):
        return _xml_flavor(head)
    flavor = _xml_flavor_root(stripped)
    if flavor is not None:
        return flavor
    return _sniff_text_breadth(head, stripped)


# XML root elements the reference's mimetype tree names specially —
# feeds and geo formats dominate the extensionless-XML crawl tail.
_XML_ROOTS = (
    (b"<svg", "image/svg+xml"),
    (b"<rss", "application/rss+xml"),
    (b"<feed", "application/atom+xml"),
    (b"<kml", "application/vnd.google-earth.kml+xml"),
    (b"<gpx", "application/gpx+xml"),
)


def _xml_flavor_root(stripped: bytes) -> str | None:
    low = stripped[:16].lower()
    for sig, mt in _XML_ROOTS:
        if low.startswith(sig) and len(stripped) > len(sig) \
                and stripped[len(sig):len(sig) + 1] in (
                    b" ", b">", b"\n", b"\r", b"\t", b"/"):
            return mt
    return None


def _xml_flavor(head: bytes) -> str:
    """Refine an <?xml…?> payload by its FIRST root element (a
    substring scan would misname an RSS feed carrying inline <svg>
    in a description)."""
    low = head.lower()
    pos = 0
    for _ in range(16):  # skip prolog: declaration, comments, doctype
        lt = low.find(b"<", pos)
        if lt < 0:
            break
        if low.startswith(b"<?", lt):
            end = low.find(b"?>", lt)
            if end < 0:
                break
            pos = end + 2
            continue
        if low.startswith(b"<!--", lt):
            end = low.find(b"-->", lt)
            if end < 0:
                break
            pos = end + 3
            continue
        if low.startswith(b"<!", lt):
            end = low.find(b">", lt)
            if end < 0:
                break
            pos = end + 1
            continue
        root = low[lt:lt + 64]
        for sig, mt in _XML_ROOTS:
            if root.startswith(sig) and root[len(sig):len(sig) + 1] in (
                    b" ", b">", b"\n", b"\r", b"\t", b"/"):
                return mt
        if root.startswith(b"<html") and b"1999/xhtml" in low:
            return "application/xhtml+xml"
        break
    return "text/xml; charset=utf-8"


_SHEBANGS = (
    (("python",), "text/x-python"),
    (("sh", "bash", "zsh", "ksh", "dash"), "text/x-shellscript"),
    (("perl",), "text/x-perl"),
    (("ruby",), "text/x-ruby"),
    (("node",), "text/javascript"),
)

_MAIL_HEADERS = (b"Received:", b"Return-Path:", b"Delivered-To:",
                 b"X-Original-To:")


def _sniff_text_breadth(head: bytes, stripped: bytes) -> str | None:
    """Text-flavored magic the reference's mimetype tree resolves
    before its generic text fallback: scripts by shebang interpreter,
    playlists, subtitles, calendar/contact cards, WARC records,
    email, PHP."""
    if head.startswith(b"#!"):
        line = head[2:head.find(b"\n") if b"\n" in head else len(head)]
        interp = line.strip().split()
        prog = interp[0].rsplit(b"/", 1)[-1] if interp else b""
        if prog == b"env" and len(interp) > 1:
            prog = interp[1].rsplit(b"/", 1)[-1]
        name = prog.decode("latin-1").rstrip("0123456789.")
        for names, mt in _SHEBANGS:
            if name in names:
                return mt
        return "text/x-script"
    if head.startswith(b"WARC/1."):
        return "application/warc"
    if head.startswith(b"#EXTM3U"):
        return "audio/x-mpegurl"
    if head.startswith(b"[playlist]"):
        return "audio/x-scpls"
    if head.startswith(b"WEBVTT"):
        return "text/vtt"
    if _SRT_RE.match(head) is not None:
        return "application/x-subrip"
    if stripped.startswith(b"BEGIN:VCARD"):
        return "text/vcard"
    if stripped.startswith(b"BEGIN:VCALENDAR"):
        return "text/calendar"
    if stripped[:5].lower() == b"<?php":
        return "text/x-php"
    if head.startswith(b"From ") and b"@" in head.split(b"\n", 1)[0]:
        return "application/mbox"
    for h in _MAIL_HEADERS:
        if head.startswith(h):
            return "message/rfc822"
    return None


_SRT_RE = _re.compile(
    rb"\s*\d+\r?\n\d{2}:\d{2}:\d{2},\d{3}\s+-->\s+\d{2}:\d{2}:\d{2},\d{3}")


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
