"""Charset detection for web payloads (BOM → <meta charset> → UTF-8
validity → windows-1252 fallback).

DIVERGENCE NOTE (docs/NEXT.md #2, deliberate): the reference carries
raw bytes end-to-end and lets Go's JSON encoder replace invalid UTF-8
at the boundary (internal/extract/download.go writes bytes verbatim),
i.e. it performs NO charset handling — a Latin-1 page turns into
U+FFFD runs. For a Common-Crawl-scale corpus that loses a measurable
slice of the text, so this engine detects:

1. BOMs (UTF-8 / UTF-16 LE / BE) — the BOM is consumed, not emitted;
2. an ASCII-cased ``<meta charset=...>`` / ``http-equiv`` declaration
   in the first 1024 bytes (WHATWG prescan subset), for HTML payloads;
3. otherwise strict-UTF-8 validity over the whole payload;
4. otherwise windows-1252 (the WHATWG fallback; iso-8859-1/us-ascii
   labels are aliases of it, per the Encoding Standard label table).

For valid-UTF-8 inputs — the entire parity corpus — the decoded text
is byte-identical to the previous utf-8-with-replacement behavior, so
every byte-parity fixture and oracle is unaffected; the new behavior
is only reachable on payloads the reference would have mangled.
"""

from __future__ import annotations

import re

# WHATWG Encoding Standard label → Python codec (subset: the labels
# that appear in web crawls with any frequency).
_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "iso-8859-1": "windows-1252", "latin1": "windows-1252",
    "latin-1": "windows-1252", "l1": "windows-1252",
    "us-ascii": "windows-1252", "ascii": "windows-1252",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "x-cp1252": "windows-1252", "ansi_x3.4-1968": "windows-1252",
    "iso-8859-15": "iso-8859-15", "latin9": "iso-8859-15",
    "iso-8859-2": "iso-8859-2", "latin2": "iso-8859-2",
    "windows-1250": "windows-1250",
    "windows-1251": "windows-1251", "cp1251": "windows-1251",
    "koi8-r": "koi8-r", "koi8": "koi8-r",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "euc-jp": "euc-jp",
    "gbk": "gbk", "gb2312": "gbk", "gb_2312": "gbk",
    "big5": "big5",
    "euc-kr": "euc-kr",
    # WHATWG: a meta-declared utf-16 is processed as utf-8 (the
    # prescan only sees ASCII-compatible bytes anyway).
    "utf-16": "utf-8", "utf-16le": "utf-8", "utf-16be": "utf-8",
}

_META_CHARSET = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?\s*([a-zA-Z0-9_\-:.]+)",
    re.IGNORECASE | re.DOTALL,
)


def _from_label(label: str) -> str | None:
    return _LABELS.get(label.strip().lower())


def detect(payload: bytes, scan_meta: bool = True) -> str:
    """Detected codec name for ``payload`` (see module docstring for
    precedence). 'utf-8-sig'/'utf-16' returns mean a BOM is present
    and will be consumed by decode()."""
    if payload.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if payload.startswith(b"\xff\xfe") or payload.startswith(b"\xfe\xff"):
        # Python's utf-16 codec consumes the BOM and picks the order.
        return "utf-16"
    if scan_meta:
        m = _META_CHARSET.search(payload[:1024])
        if m:
            codec = _from_label(m.group(1).decode("ascii", "replace"))
            if codec:
                return codec
    try:
        payload.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def decode(payload: bytes, scan_meta: bool = True) -> tuple[str, str]:
    """Decode ``payload`` with the detected charset; never raises.
    Returns (text, codec). Mis-declared pages still decode (replace)
    rather than fail — a crawl row must always produce a row.

    Single-pass on the hot path: the strict-UTF-8 attempt IS the
    decode (no separate validity scan); only BOM/meta hits or
    invalid UTF-8 take a second pass."""
    if payload.startswith(b"\xef\xbb\xbf"):
        return payload.decode("utf-8-sig", errors="replace"), "utf-8-sig"
    if payload.startswith(b"\xff\xfe") or payload.startswith(b"\xfe\xff"):
        return payload.decode("utf-16", errors="replace"), "utf-16"
    if scan_meta:
        m = _META_CHARSET.search(payload[:1024])
        if m:
            codec = _from_label(m.group(1).decode("ascii", "replace"))
            if codec:
                # declared utf-8 stays utf-8 even with invalid bytes
                return payload.decode(codec, errors="replace"), codec
    try:
        return payload.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        return (payload.decode("windows-1252", errors="replace"),
                "windows-1252")
