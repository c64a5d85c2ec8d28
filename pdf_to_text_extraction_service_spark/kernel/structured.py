"""Structured-format kernels: CSV/TSV, JSON/JSONL, XML, YAML/TOML.

Byte-parity ports of:
- CSV  reference internal/extractors/structured/csv.go:27-110
- JSON reference internal/extractors/structured/json_extract.go:25-71
- XML  reference internal/extractors/structured/xml_extract.go:27-61
- YAML reference internal/extractors/structured/yaml_extract.go:25-50
"""

from __future__ import annotations

import json
import re

from . import gocsv, gojson, runes
from .result import Result

# ---------------------------------------------------------------- CSV

_DELIMS = [",", "\t", ";", "|"]


def _max_cols(recs: list[list[str]]) -> int:
    return max((len(r) for r in recs), default=0)


def _read_records(b: bytes) -> tuple[list[list[str]] | None, str]:
    text = b.decode("utf-8", errors="replace")
    for d in _DELIMS:
        try:
            recs = gocsv.read_all(text, d)
        except gocsv.CSVError:
            continue
        if recs and _max_cols(recs) > 1:
            return recs, d
    return None, ","


def _records_to_markdown(recs: list[list[str]]) -> str:
    """csv.go:80-110 — pad to max width, pipe table capped at 201 rows."""
    if not recs:
        return ""
    mx = _max_cols(recs)
    recs = [r + [""] * (mx - len(r)) for r in recs]
    rows = recs[:201]
    out = ["| " + " | ".join(rows[0]) + " |\n"]
    out.append("| " + " | ".join(["---"] * mx) + " |\n")
    for row in rows[1:]:
        out.append("| " + " | ".join(row) + " |\n")
    if len(recs) > 201:
        out.append(f"\n... and {len(recs) - 201} more rows")
    return runes.trim_space("".join(out))


def extract_csv(b: bytes, mime: str) -> Result:
    recs, delim = _read_records(b)
    if recs is None:
        text = runes.trim_space(b.decode("utf-8", errors="replace"))
        w, c = runes.build_counts(text)
        return Result(success=True, text=text, method="native",
                      file_type="structured/csv", mime_type=mime,
                      word_count=w, char_count=c)
    text = _records_to_markdown(recs)
    w, c = runes.build_counts(text)
    meta = {
        "rows": str(len(recs)),
        "columns": str(_max_cols(recs)),
        "delimiter": delim,
    }
    return Result(success=True, text=text, method="native",
                  file_type="structured/csv", mime_type=mime,
                  metadata=meta, word_count=w, char_count=c)


# --------------------------------------------------------------- JSON


def _pretty_json(b: bytes) -> str:
    """json_extract.go:48-58 — Go-marshal pretty print, raw on failure."""
    try:
        obj = json.loads(b)
    except Exception:
        return b.decode("utf-8", errors="replace") if isinstance(b, bytes) else b
    try:
        return gojson.marshal_indent(obj)
    except Exception:
        return b.decode("utf-8", errors="replace") if isinstance(b, bytes) else b


def _format_jsonl(s: str) -> str:
    """json_extract.go:60-71."""
    parts = []
    for line in s.split("\n"):
        trim = runes.trim_space(line)
        if trim == "":
            continue
        parts.append(_pretty_json(trim.encode("utf-8")))
    return "\n\n---\n\n".join(parts)


def extract_json(b: bytes, file_name: str, mime: str) -> Result:
    if file_name.lower().endswith(".jsonl"):
        text = _format_jsonl(b.decode("utf-8", errors="replace"))
    else:
        text = _pretty_json(b)
    text = runes.trim_space(text)
    w, c = runes.build_counts(text)
    return Result(success=True, text=text, method="native",
                  file_type="structured/json", mime_type=mime,
                  word_count=w, char_count=c)


# ---------------------------------------------------------------- XML

_XML_ENTITIES = {"lt": "<", "gt": ">", "amp": "&", "apos": "'", "quot": '"'}


def _xml_chardata(s: str) -> list[str]:
    """Stream CharData tokens like Go encoding/xml: text between tags
    with entities decoded, CDATA passed through, comments/PIs/directives
    skipped; stop at the first malformed construct (Go's decoder errors
    and the reference breaks the loop keeping partial output,
    xml_extract.go:44-49)."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        lt = s.find("<", i)
        chunk = s[i:] if lt < 0 else s[i:lt]
        if chunk:
            t = runes.trim_space(_decode_xml_entities(chunk))
            if t:
                out.append(t)
        if lt < 0:
            break
        if s.startswith("<!--", lt):
            end = s.find("-->", lt + 4)
            if end < 0:
                break
            i = end + 3
            continue
        if s.startswith("<![CDATA[", lt):
            end = s.find("]]>", lt + 9)
            if end < 0:
                break
            t = runes.trim_space(s[lt + 9:end])
            if t:
                out.append(t)
            i = end + 3
            continue
        if s.startswith("<?", lt) or s.startswith("<!", lt):
            end = s.find(">", lt)
            if end < 0:
                break
            i = end + 1
            continue
        end = s.find(">", lt)
        if end < 0:
            break
        i = end + 1
    return out


def _decode_xml_entities(s: str) -> str:
    if "&" not in s:
        return s

    def repl(m: re.Match) -> str:
        e = m.group(1)
        if e.startswith("#x") or e.startswith("#X"):
            try:
                return chr(int(e[2:], 16))
            except ValueError:
                return m.group(0)
        if e.startswith("#"):
            try:
                return chr(int(e[1:]))
            except ValueError:
                return m.group(0)
        return _XML_ENTITIES.get(e, m.group(0))

    return re.sub(r"&([a-zA-Z]+|#[0-9]+|#[xX][0-9a-fA-F]+);", repl, s)


def extract_xml(b: bytes, mime: str) -> Result:
    text = "\n".join(_xml_chardata(b.decode("utf-8", errors="replace")))
    w, c = runes.build_counts(text)
    return Result(success=True, text=text, method="native",
                  file_type="structured/xml", mime_type=mime,
                  word_count=w, char_count=c)


# --------------------------------------------------------------- YAML


def extract_yaml(b: bytes, file_name: str, mime: str) -> Result:
    """yaml_extract.go:25-50 — .yaml/.yml canonical re-serialization
    (gopkg.in/yaml.v3 round-trip) on the generator's YAML subset; .toml
    and unparseable input pass through trimmed."""
    raw = b.decode("utf-8", errors="replace")
    text = runes.trim_space(raw)
    lower = file_name.lower()
    if lower.endswith(".yaml") or lower.endswith(".yml"):
        out = _yaml_roundtrip(raw)
        if out is not None:
            text = runes.trim_space(out)
    w, c = runes.build_counts(text)
    return Result(success=True, text=text, method="native",
                  file_type="structured/yaml", mime_type=mime,
                  word_count=w, char_count=c)


class _QuotedStr(str):
    """A scalar that was QUOTED in the input — yaml.v3 types it as a
    string, so the emitter must keep it string-typed even when it
    looks like a number/bool (encode.go stringv: resolve() != strTag
    → double-quoted)."""


def _parse_quoted(val: str) -> str | None:
    """Parse a single- or double-quoted YAML scalar (full token, no
    trailing junk except a comment). Returns the decoded string or
    None when outside the subset."""
    if len(val) < 2:
        return None
    q = val[0]
    if q not in ("'", '"') or not val.endswith(q):
        return None
    body = val[1:-1]
    if q == "'":
        # '' is the only escape; an unpaired interior quote means the
        # token actually ended earlier (trailing junk → not subset)
        if "'" in body.replace("''", ""):
            return None
        return body.replace("''", "'")
    out: list[str] = []
    i = 0
    esc = {"n": "\n", "t": "\t", '"': '"', "\\": "\\", "0": "\x00",
           "r": "\r", "a": "\a", "b": "\b", "v": "\v", "f": "\f",
           "e": "\x1b", "/": "/", " ": " ", "N": "\x85", "_": "\xa0",
           "L": " ", "P": " "}
    hexlen = {"x": 2, "u": 4, "U": 8}
    while i < len(body):
        c = body[i]
        if c == "\\":
            if i + 1 >= len(body):
                return None
            e = body[i + 1]
            if e in hexlen:
                k = hexlen[e]
                hexs = body[i + 2:i + 2 + k]
                if len(hexs) < k or not all(
                        h in "0123456789abcdefABCDEF" for h in hexs):
                    return None
                cp = int(hexs, 16)
                if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                    return None
                out.append(chr(cp))
                i += 2 + k
                continue
            if e not in esc:
                return None  # unknown escape: outside the subset
            out.append(esc[e])
            i += 2
        elif c == '"':
            return None  # unescaped quote → token ended earlier
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _parse_block_scalar(lines: list[str], idx: int, indent: int,
                        header: str) -> tuple[str, int] | None:
    """Parse a literal (|) or folded (>) block scalar whose header
    token is ``header`` on line ``idx``; content lines are indented
    more than ``indent``. Handles chomping indicators (strip ``-``,
    clip, keep ``+``) and explicit indentation indicators (``|2`` —
    either modifier order, per c-b-block-header). Returns (string
    value, next line index)."""
    m = re.match(r"^([|>])(?:([1-9])([+-]?)|([+-]?)([1-9])?)$", header)
    if m is None:
        return None
    style = m.group(1)
    digit = m.group(2) or m.group(5)
    chomp = m.group(3) if m.group(3) is not None else (m.group(4) or "")
    body: list[str] = []
    j = idx + 1
    content_indent: int | None = int(digit) + indent if digit else None
    while j < len(lines):
        ln = lines[j]
        if runes.trim_space(ln) == "":
            body.append("")
            j += 1
            continue
        cur = len(ln) - len(ln.lstrip(" "))
        if cur <= indent:
            break
        if content_indent is None:
            content_indent = cur
        if cur < content_indent:
            return None
        body.append(ln[content_indent:])
        j += 1
    # trailing blank lines: chomped unless keep; counted for '+'
    trailing = 0
    while body and body[-1] == "":
        body.pop()
        trailing += 1
    if not body:
        return None
    if style == "|":
        s = "\n".join(body)
    else:
        # Folded style (YAML spec §8.1.3 folding rules): a single
        # break between two NON-more-indented text lines folds to a
        # space; k blank lines between them yield k line feeds (the
        # fold absorbs one break); any break ADJACENT to a
        # more-indented line is kept literally (so more-indented
        # blocks keep their internal breaks exactly), and the extra
        # indentation itself is part of the content.
        out: list[str] = []
        prev: str | None = None   # 'text' | 'indented' | None
        blanks = 0
        for ln in body:
            if ln == "":
                blanks += 1
                continue
            indented = ln.startswith(" ") or ln.startswith("\t")
            if prev is None:
                out.append("\n" * blanks)      # leading blanks literal
            elif prev == "text" and not indented:
                out.append(" " if blanks == 0 else "\n" * blanks)
            else:
                out.append("\n" * (blanks + 1))
            out.append(ln)
            prev = "indented" if indented else "text"
            blanks = 0
        s = "".join(out)
    if chomp == "+":
        s += "\n" * (trailing + 1)
    elif chomp != "-":
        s += "\n"
    return s, j


# yaml.v3 encode.go stringv: strings that RESOLVE to another type get
# double-quoted; this regex covers the resolver subset exercised here
# (bools incl. YAML-1.1 legacy forms, null forms, ints, floats).
_RESOLVES_NONSTR_RE = re.compile(
    r"^(|~|null|Null|NULL|true|True|TRUE|false|False|FALSE|"
    r"y|Y|yes|Yes|YES|n|N|no|No|NO|on|On|ON|off|Off|OFF|"
    r"[-+]?[0-9][0-9_]*|[-+]?(\.[0-9]+|[0-9][0-9_]*\.?[0-9]*)"
    r"([eE][-+]?[0-9]+)?|[-+]?\.(inf|Inf|INF)|\.(nan|NaN|NAN)|"
    # hex/octal/binary ints, sexagesimals, and timestamp-ish forms
    # also resolve to non-string tags in yaml.v3
    r"[-+]?0x[0-9a-fA-F_]+|[-+]?0o?[0-7_]+|[-+]?0b[01_]+|"
    r"[-+]?[0-9][0-9_]*(:[0-5]?[0-9])+(\.[0-9_]*)?|"
    r"[0-9]{4}-[0-9]{1,2}-[0-9]{1,2}([Tt ].*)?)$")

def _line_printable(ln: str) -> bool:
    """Emitter-printable line: every char printable in the libyaml
    sense (str.isprintable is the proxy: excludes controls, NEL/LS/PS
    and other separators — those take the double-quoted escape
    path)."""
    return ln == "" or ln.isprintable()


# libyaml write_double_quoted_scalar shorthand escapes; everything
# else below 0x20 (and DEL) becomes \xXX with uppercase hex.
_DQ_SHORT = {
    "\x00": "\\0", "\a": "\\a", "\b": "\\b", "\t": "\\t",
    "\n": "\\n", "\v": "\\v", "\f": "\\f", "\r": "\\r",
    "\x1b": "\\e", '"': '\\"', "\\": "\\\\", "\x85": "\\N",
    "\xa0": "\\_", " ": "\\L", " ": "\\P",
}


def _dq_escape(s: str) -> str | None:
    """Double-quoted emission with libyaml's escape choices — the
    fallback style for scalars no other style can carry (controls,
    tabs, space-break multilines)."""
    out: list[str] = []
    for ch in s:
        o = ord(ch)
        if ch in _DQ_SHORT:
            out.append(_DQ_SHORT[ch])
        elif o < 0x20 or o == 0x7F:
            out.append("\\x%02X" % o)
        elif ch.isprintable():
            out.append(ch)
        else:
            return None  # exotic non-printables: outside the subset
    return '"' + "".join(out) + '"'


def _emit_string_scalar(s: str, indent: int) -> str | None:
    """Re-emit a STRING-typed scalar the way yaml.v3's encoder +
    libyaml emitter choose styles (encode.go stringv →
    yaml_emitter_analyze_scalar): multiline → literal block (keep
    chomping for trailing blank lines), block-unrepresentable or
    control-bearing → double-quoted with libyaml escapes, resolves-
    to-other-type or empty → double-quoted, plain-unsafe → single-
    quoted, else plain. Returns the emitted fragment (which may span
    lines for literal style) or None outside the subset."""
    if "\n" in s:
        # literal block, v3's 4-space indent step
        if not s.endswith("\n"):
            body, chomp = s, "-"
        elif s.endswith("\n\n"):
            body, chomp = s[:-1], "+"   # keep trailing blank lines
        else:
            body, chomp = s[:-1], ""
        lines = body.split("\n")
        pad = " " * (indent + 4)
        block_ok = not lines[0].startswith(" ") \
            and any(ln != "" for ln in lines) \
            and all(not ln.endswith(" ") and "\t" not in ln
                    and _line_printable(ln) for ln in lines)
        if not block_ok:
            # libyaml: scalars block style can't carry (leading-space
            # first line, space-break, tabs, controls) fall back to
            # single-line double-quoted with escaped breaks
            return _dq_escape(s)
        return "|" + chomp + "\n" + "\n".join(
            (pad + ln) if ln else "" for ln in lines)
    if "\t" in s or not _line_printable(s):
        return _dq_escape(s)
    if s == "" or _RESOLVES_NONSTR_RE.match(s):
        return '"' + s + '"'  # keep string-typed: double-quoted
    if _plain_unsafe(s):
        return "'" + s.replace("'", "''") + "'"
    return s


def _plain_unsafe(s: str) -> bool:
    """Would libyaml's analyze_scalar disallow PLAIN style in block
    context? (leading/trailing space, ': '/' #' sequences, leading
    indicator characters, trailing ':')."""
    if s.startswith(" ") or s.endswith(" "):
        return True
    if ": " in s or s.endswith(":") or " #" in s:
        return True
    if s[0] in "-?:,[]{}#&*!|>'\"%@`":
        # '-'/'?'/':' only block plain when followed by space/EOF
        if s[0] in "-?:" and len(s) > 1 and s[1] != " ":
            return False
        return True
    return False


def _yaml_roundtrip(raw: str) -> str | None:
    """Canonicalize the YAML subset the way yaml.v3's
    Unmarshal→Marshal does: mappings of scalar values (one nesting
    level), lists of scalars (4-space indented ``-`` items), keys
    emitted in sorted order, 4-space nested-map indent. Typed scalars
    round-trip: true/false/null and canonical ints are identity,
    non-canonical floats collapse to Go's shortest decimal ('1.50' →
    '1.5'). Quoted and block (|, >) scalars parse, and string-typed
    values re-emit with yaml.v3's STYLE rules (_emit_string_scalar):
    multiline → literal, number/bool-lookalikes → double-quoted,
    plain-unsafe → single-quoted. Returns None for input outside the
    subset (callers keep the raw text, which matches the reference's
    behavior only for genuinely unparseable YAML)."""
    items: list[tuple[str, object]] = []
    cur_list: list[str] | None = None
    cur_map: list[tuple[str, object]] | None = None
    cur_key: str | None = None
    lines = raw.split("\n")
    if lines and lines[-1] == "":
        # final-newline artifact of split — NOT a blank content line
        # (keep-chomped block scalars would otherwise count it)
        lines.pop()
    li = 0
    while li < len(lines):
        line = lines[li]
        li += 1
        if runes.trim_space(line) == "" or line.lstrip().startswith("#"):
            continue
        if line.startswith("- ") or line.startswith("    - ") \
                or line.startswith("  - "):
            if cur_key is None or cur_map is not None:
                return None
            if cur_list is None:
                cur_list = []
                items.append((cur_key, cur_list))
            item = line.split("- ", 1)[1].strip()
            if item[:1] in ("'", '"'):
                q = _parse_quoted(item)
                if q is None:
                    return None
                cur_list.append(_QuotedStr(q))
            else:
                cur_list.append(item)
            continue
        indented = line.startswith(" ") or line.startswith("\t")
        if ":" not in line:
            return None
        key, _, val = line.partition(":")
        indent = len(key) - len(key.lstrip(" "))
        key = key.strip()
        val = val.strip()
        if not _plain_scalar_ok(key):
            return None
        parsed: object = val
        if re.match(r"^[|>][1-9+-]{0,2}$", val):
            blk = _parse_block_scalar(lines, li - 1, indent, val)
            if blk is None:
                return None
            parsed = _QuotedStr(blk[0])
            li = blk[1]
            val = "\x00block"  # sentinel: value present
        elif val[:1] in ("'", '"'):
            q = _parse_quoted(val)
            if q is None:
                return None
            parsed = _QuotedStr(q)
        if indented:
            # one nesting level: 'parent:' followed by 'sub: val'
            if cur_key is None or cur_list is not None or val == "":
                return None
            if cur_map is None:
                cur_map = []
                items.append((cur_key, cur_map))
            cur_map.append((key, parsed))
            continue
        cur_key = key
        cur_list = None
        cur_map = None
        if val == "":
            continue  # value is the following list / nested block
        items.append((key, parsed))

    def emit_scalar(s: object, indent: int = 0) -> str | None:
        if isinstance(s, _QuotedStr):
            # string-typed regardless of content (was quoted/block)
            return _emit_string_scalar(str(s), indent)
        s = str(s)
        if _TYPED_IDENTITY_RE.match(s):
            return s  # true/false/null and canonical ints round-trip
        fm = _FLOAT_RE.match(s)
        if fm:
            v = float(s)
            r = repr(v)  # shortest round-trip, same as Go 'g' here
            return r if "e" not in r and "E" not in r else None
        return s if _plain_scalar_ok(s) else None

    out: list[str] = []
    # yaml.v3 emits map keys in sorted order (alpha keys; its
    # numeric-aware sorter coincides with plain sort on this subset).
    for key, val in sorted(items, key=lambda kv: kv[0]):
        if isinstance(val, list) and val and isinstance(val[0], tuple):
            out.append(f"{key}:")
            for sk, sv in sorted(val):
                s = emit_scalar(sv, 4)
                if s is None:
                    return None
                out.append(f"    {sk}: {s}")
        elif isinstance(val, list):
            out.append(f"{key}:")
            for item in val:
                s = emit_scalar(item, 4)
                if s is None:
                    return None
                out.append(f"    - {s}")
        else:
            s = emit_scalar(val, 0)
            if s is None:
                return None
            out.append(f"{key}: {s}")
    return "\n".join(out) + "\n"


# apostrophes are plain-safe mid-scalar (the emitter keeps "it's"
# plain, so the parser must accept it back — fixed-point property)
_PLAIN_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9 _./@'-]*$")
# Scalars yaml.v3 re-emits byte-identically: booleans, null, and
# canonical base-10 ints (no leading +/0 — '0042' is 1.1-octal
# territory and '+1' re-marshals as '1', both outside the subset).
_TYPED_IDENTITY_RE = re.compile(r"^(true|false|null|-?(0|[1-9][0-9]*))$")
# Simple decimals re-marshaled via shortest-round-trip formatting.
_FLOAT_RE = re.compile(r"^-?(0|[1-9][0-9]*)\.[0-9]+$")
# All-numeric-looking strings NOT matched by the two canonical forms
# ('0042', '1_000', '+1'): yaml.v3 may retype them — outside the
# subset.
_NUMERICISH_RE = re.compile(r"^[+-]?[0-9][0-9_.]*$")


def _plain_scalar_ok(s: str) -> bool:
    if _TYPED_IDENTITY_RE.match(s) or _FLOAT_RE.match(s):
        return True
    if _NUMERICISH_RE.match(s):
        return False
    if any(ord(ch) > 127 for ch in s):
        # non-ASCII: printable non-space chars are plain-safe in
        # libyaml (emitted literally, not escaped) — project them to
        # a letter so the ASCII positional rules still apply
        if any(ord(ch) > 127 and (not ch.isprintable() or ch.isspace())
               for ch in s):
            return False
        s = "".join("A" if ord(ch) > 127 else ch for ch in s)
    if _PLAIN_RE.match(s) is None:
        return False
    # Values yaml.v3 would quote or retype round-trip differently.
    return s not in ("true", "false", "null", "yes", "no", "on", "off")
