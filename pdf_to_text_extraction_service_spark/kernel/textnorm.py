"""Shared text normalization transforms.

Reproduces, byte-for-byte:
- ``normalizeText``    reference internal/extractors/plaintext/plaintext.go:78-83
- ``stripFrontMatter`` reference internal/extractors/plaintext/plaintext.go:85-94
- ``cleanText``        reference internal/hybrid/hybrid.go:325-375
"""

from __future__ import annotations

import re

from . import runes

_RE_4NL = re.compile(r"\n{4,}")

# cleanText's strip set: zero-width space/joiners, BOM, soft hyphen
# (hybrid.go:329-340)
_ZW_DROP = frozenset("\u200b\u200c\u200d\ufeff\u00ad")


def normalize_text(s: str) -> str:
    """plaintext.go:78-83 — CRLF/CR→LF, collapse 4+ newlines to 3, trim."""
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    s = _RE_4NL.sub("\n\n\n", s)
    return runes.trim_space(s)


def strip_front_matter(s: str) -> str:
    """plaintext.go:85-94 — strip a leading ``---\\n ... \\n---\\n`` block."""
    if not s.startswith("---\n"):
        return s
    idx = s.find("\n---\n", 4)
    if idx < 0:
        return s
    return s[idx + 5 :]


def clean_text(text: str) -> str:
    """hybrid.go:325-375 — the per-page PDF/OCR text cleaner.

    CRLF/CR→LF; drop zero-width chars + soft hyphen; NBSP→space; per
    line: rstrip space/tab, collapse internal whitespace runs to one
    space while preserving the leading space/tab indent width (re-emitted
    as spaces), allow at most 2 consecutive blank lines; final TrimSpace.
    """
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    text = "".join(
        " " if ch == " " else ch for ch in text if ch not in _ZW_DROP
    )

    cleaned: list[str] = []
    consecutive_empty = 0
    for line in text.split("\n"):
        line = runes.trim_right(line, " \t")
        if runes.trim_space(line) == "":
            consecutive_empty += 1
            if consecutive_empty <= 2:
                cleaned.append("")
            continue
        consecutive_empty = 0
        leading = len(line) - len(runes.trim_left(line, " \t"))
        content = runes.trim_space(line)
        normalized = " ".join(runes.fields(content))
        if leading > 0:
            line = " " * leading + normalized
        else:
            line = normalized
        cleaned.append(line)

    return runes.trim_space("\n".join(cleaned))
