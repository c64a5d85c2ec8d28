"""Plain-text / markdown / RTF / HTML kernels.

Byte-parity ports of:
- text/markdown reference internal/extractors/plaintext/plaintext.go:41-94
- RTF           reference internal/extractors/plaintext/rtf.go:23-47
- HTML          reference internal/extractors/plaintext/html_strip.go:26-40
"""

from __future__ import annotations

import re

from . import runes, textnorm
from .html_strip import strip_html
from .result import Result

_MD_EXTS = (".md", ".mdx", ".markdown")


def extract_plaintext(b: bytes, file_name: str, mime: str) -> Result:
    # BOM + UTF-8 validity + windows-1252 fallback; no meta prescan
    # for non-HTML payloads (kernel/charset.py divergence note).
    from . import charset

    text, _ = charset.decode(b, scan_meta=False)
    ext = _ext(file_name)
    file_type = "text/plain"
    if ext in _MD_EXTS:
        text = textnorm.strip_front_matter(text)
        file_type = "text/markdown"
    text = textnorm.normalize_text(text)
    w, c = runes.build_counts(text)
    return Result(success=True, text=text, method="native",
                  file_type=file_type, mime_type=mime,
                  word_count=w, char_count=c)


def extract_html(b: bytes, mime: str) -> Result:
    text, meta = strip_html(b)
    w, c = runes.build_counts(text)
    return Result(success=True, text=text, method="native",
                  file_type="document/html", mime_type=mime,
                  metadata=meta or None, word_count=w, char_count=c)


_RTF_PAR = re.compile(r"\\par[d]?")
_RTF_TAB = re.compile(r"\\tab")
_RTF_HEX = re.compile(r"\\'[0-9a-fA-F]{2}")
# Go RE2 \d is ASCII-only; Python re \d is Unicode — pin ASCII.
_RTF_CTRL = re.compile(r"\\[a-zA-Z]+-?[0-9]* ?")
_RTF_3NL = re.compile(r"\n{3,}")


def extract_rtf(b: bytes, mime: str) -> Result:
    """rtf.go:23-47 — regex pipeline in exact order."""
    s = b.decode("utf-8", errors="replace")
    s = _RTF_PAR.sub("\n", s)
    s = _RTF_TAB.sub("\t", s)
    s = _RTF_HEX.sub("", s)
    s = _RTF_CTRL.sub("", s)
    s = s.replace("{", "").replace("}", "")
    s = _RTF_3NL.sub("\n\n", s)
    s = runes.trim_space(s)
    w, c = runes.build_counts(s)
    return Result(success=True, text=s, method="native",
                  file_type="document/rtf", mime_type=mime,
                  word_count=w, char_count=c)


def _ext(file_name: str) -> str:
    base = file_name.rsplit("/", 1)[-1]
    i = base.rfind(".")
    return base[i:].lower() if i >= 0 else ""
