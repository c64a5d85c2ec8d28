"""Markdown normalization / page combining.

Byte-parity port of reference internal/format/format.go:
- Combine            format.go:19-53
- stripImages        format.go:56-64
- convertHTMLTables  format.go:67-206
- normalizeMarkdown  format.go:209-298
- finalCleanup       format.go:320-386
"""

from __future__ import annotations

import re

from . import runes
from .result import PageResult

_MULTI_BLANK = re.compile(r"\n{3,}")
_IMAGE = re.compile(r"!\[([^\]]*)\]\([^\)]+\)")
_HTML_COMMENT = re.compile(r"<!--.*?-->")
_IMG_TAG = re.compile(r"<img[^>]*>")
_TH = re.compile(r"<th[^>]*>(.*?)</th>")
_TD = re.compile(r"<td[^>]*>(.*?)</td>")
_ANY_TAG = re.compile(r"<[^>]+>")
# Go RE2 \d is ASCII-only; Python re \d is Unicode — pin ASCII.
_NUM_LIST = re.compile(r"^[0-9]+\.")


def combine(pages: list[PageResult], sep: str, include_page_nums: bool) -> str:
    """format.go:19-53."""
    parts: list[str] = []
    for p in pages:
        txt = normalize_markdown(p.text)
        if txt == "":
            continue
        txt = strip_images(txt)
        txt = convert_html_tables(txt)
        if include_page_nums:
            parts.append(f"[Page {p.page_number}]\n\n{txt}")
        else:
            parts.append(txt)
    if not parts:
        return ""
    if sep == "":
        sep = "\n\n---\n\n"
    return final_cleanup(sep.join(parts))


def strip_images(text: str) -> str:
    text = _IMAGE.sub("", text)
    return _IMG_TAG.sub("", text)


def convert_html_tables(text: str) -> str:
    """format.go:67-112."""
    lines = text.split("\n")
    result: list[str] = []
    in_table = False
    table_rows: list[list[str]] = []
    for line in lines:
        trimmed = runes.trim_space(line)
        if trimmed.startswith("<table"):
            in_table = True
            table_rows = []
            continue
        if trimmed.startswith("</table>"):
            if table_rows:
                result.append(_build_markdown_table(table_rows))
            in_table = False
            table_rows = []
            continue
        if in_table:
            if "<tr>" in trimmed or "<th>" in trimmed or "<td>" in trimmed:
                cells = _extract_table_cells(line)
                if cells:
                    table_rows.append(cells)
            continue
        result.append(line)
    return "\n".join(result)


def _extract_table_cells(line: str) -> list[str]:
    """format.go:115-143 — th cells first, then td cells."""
    line = line.replace("<tr>", "").replace("</tr>", "")
    cells: list[str] = []
    for m in _TH.finditer(line):
        cells.append(runes.trim_space(_strip_html_tags(m.group(1))))
    for m in _TD.finditer(line):
        cells.append(runes.trim_space(_strip_html_tags(m.group(1))))
    return cells


def _strip_html_tags(text: str) -> str:
    text = _ANY_TAG.sub("", text)
    text = text.replace("&nbsp;", " ")
    text = text.replace("&lt;", "<")
    text = text.replace("&gt;", ">")
    text = text.replace("&amp;", "&")
    return text


def _build_markdown_table(rows: list[list[str]]) -> str:
    """format.go:158-206 — note trailing \\n (Go builder keeps it)."""
    if not rows:
        return ""
    max_cols = max(len(r) for r in rows)
    if max_cols == 0:
        return ""
    norm = [r + [""] * (max_cols - len(r)) for r in rows]
    out = ["| " + " | ".join(norm[0]) + " |\n"]
    out.append("| " + " | ".join(["---"] * max_cols) + " |\n")
    for row in norm[1:]:
        out.append("| " + " | ".join(row) + " |\n")
    return "".join(out)


def normalize_markdown(text: str) -> str:
    """format.go:209-259."""
    if runes.trim_space(text) == "":
        return ""
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    cleaned: list[str] = []
    in_code_block = False
    prev_was_blank = False
    for line in text.split("\n"):
        trimmed = runes.trim_space(line)
        if trimmed.startswith("```"):
            in_code_block = not in_code_block
            cleaned.append(line)
            prev_was_blank = False
            continue
        if in_code_block:
            cleaned.append(line)
            prev_was_blank = False
            continue
        line = _clean_line(line)
        if line == "":
            if not prev_was_blank:
                cleaned.append("")
            prev_was_blank = True
            continue
        prev_was_blank = False
        cleaned.append(line)
    return runes.trim_space("\n".join(cleaned))


def _clean_line(line: str) -> str:
    """format.go:263-298 — byte-index semantics on trimmed[0]/[1]."""
    line = runes.trim_right(line, " \t")
    if line.startswith("#"):
        return _normalize_header(line)
    trimmed = runes.trim_left(line, " \t")
    if trimmed:
        first = trimmed[0]
        if first in "-*+":
            indent = len(line) - len(trimmed)
            if len(trimmed) > 1 and trimmed[1] == " ":
                return line
            return " " * indent + first + " " + trimmed[1:]
    if _NUM_LIST.match(trimmed):
        head, _, rest = trimmed.partition(".")
        remainder = runes.trim_left(rest, " ")
        indent = len(line) - len(trimmed)
        return " " * indent + head + ". " + remainder
    return line


def _normalize_header(line: str) -> str:
    """format.go:301-317."""
    hash_count = 0
    for ch in line:
        if ch == "#":
            hash_count += 1
        else:
            break
    if hash_count == 0 or hash_count > 6:
        return line
    rest = runes.trim_left(line[hash_count:], " \t")
    if rest == "":
        return line
    return "#" * hash_count + " " + rest


def final_cleanup(text: str) -> str:
    """format.go:320-335."""
    text = _HTML_COMMENT.sub("", text)
    text = _MULTI_BLANK.sub("\n\n", text)
    text = _ensure_header_spacing(text)
    text = _ensure_code_block_spacing(text)
    return runes.trim_space(text)


def _ensure_header_spacing(text: str) -> str:
    """format.go:338-357 — blank line before headers."""
    lines = text.split("\n")
    result: list[str] = []
    for i, line in enumerate(lines):
        trimmed = runes.trim_space(line)
        if trimmed.startswith("#") and len(trimmed) > 1:
            if i > 0 and result and result[-1] != "":
                result.append("")
        result.append(line)
    return "\n".join(result)


def _ensure_code_block_spacing(text: str) -> str:
    """format.go:360-386 — blank line before code fences."""
    lines = text.split("\n")
    result: list[str] = []
    for line in lines:
        trimmed = runes.trim_space(line)
        if trimmed.startswith("```"):
            if result and result[-1] != "":
                result.append("")
            result.append(line)
            continue
        result.append(line)
    return "\n".join(result)
