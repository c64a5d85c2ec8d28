"""Streaming XML tokenizer modeled on Go encoding/xml's Token() API.

The office/ODF/EPUB kernels port Go code that walks xml.Decoder token
streams with manual depth counters (docx.go:69-316, pptx.go:102-142,
opendocument.go:60-274). This tokenizer produces the same event shapes:

    (START, local_name, namespace_uri, attrs_dict)
    (END, local_name)
    (CHARDATA, text)

- Namespace prefixes resolve to URIs via xmlns scoping (Go Name.Space).
- Attribute keys are LOCAL names (Go reads a.Name.Local).
- Self-closing elements emit START immediately followed by END.
- Entities decoded in CharData and attribute values; CDATA passed
  through; comments/PIs/directives skipped.
- Stops silently at the first malformed construct (Go returns an error
  and every reference caller breaks the loop keeping partial output).
"""

from __future__ import annotations

import re

START = 0
END = 1
CHARDATA = 2

_ENT = {"lt": "<", "gt": ">", "amp": "&", "apos": "'", "quot": '"'}

_ATTR_RE = re.compile(
    r"([A-Za-z_][\w.:-]*)\s*=\s*(\"([^\"]*)\"|'([^']*)')"
)


def _decode(s: str) -> str:
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
        return _ENT.get(e, m.group(0))

    return re.sub(r"&([A-Za-z]+|#[0-9]+|#[xX][0-9a-fA-F]+);", repl, s)


def tokenize(s: str):
    """Yield Go-style XML tokens; namespace-resolved."""
    ns_stack: list[dict[str, str]] = [{"": ""}]
    open_stack: list[tuple[str, bool]] = []  # (local, pushed_ns)
    i, n = 0, len(s)
    while i < n:
        lt = s.find("<", i)
        chunk = s[i:] if lt < 0 else s[i:lt]
        if chunk:
            yield (CHARDATA, _decode(chunk), None, None)
        if lt < 0:
            return
        if s.startswith("<!--", lt):
            end = s.find("-->", lt + 4)
            if end < 0:
                return
            i = end + 3
            continue
        if s.startswith("<![CDATA[", lt):
            end = s.find("]]>", lt + 9)
            if end < 0:
                return
            yield (CHARDATA, s[lt + 9:end], None, None)
            i = end + 3
            continue
        if s.startswith("<?", lt) or s.startswith("<!", lt):
            end = s.find(">", lt)
            if end < 0:
                return
            i = end + 1
            continue
        end = s.find(">", lt)
        if end < 0:
            return
        tag = s[lt + 1:end]
        i = end + 1
        if tag.startswith("/"):
            name = tag[1:].strip()
            local = name.split(":")[-1]
            yield (END, local, None, None)
            if open_stack:
                _, pushed = open_stack.pop()
                if pushed:
                    ns_stack.pop()
            continue
        self_close = tag.endswith("/")
        if self_close:
            tag = tag[:-1]
        parts = tag.split(None, 1)
        if not parts:
            continue
        qname = parts[0]
        raw_attrs = parts[1] if len(parts) > 1 else ""
        attrs: dict[str, str] = {}
        new_ns: dict[str, str] | None = None
        for m in _ATTR_RE.finditer(raw_attrs):
            k = m.group(1)
            v = _decode(m.group(3) if m.group(3) is not None else m.group(4))
            if k == "xmlns":
                if new_ns is None:
                    new_ns = dict(ns_stack[-1])
                new_ns[""] = v
            elif k.startswith("xmlns:"):
                if new_ns is None:
                    new_ns = dict(ns_stack[-1])
                new_ns[k[6:]] = v
            else:
                attrs[k.split(":")[-1]] = v
        scope = new_ns if new_ns is not None else ns_stack[-1]
        if ":" in qname:
            prefix, local = qname.split(":", 1)
            space = scope.get(prefix, "")
        else:
            local = qname
            space = scope.get("", "")
        yield (START, local, space, attrs)
        if self_close:
            yield (END, local, None, None)
        else:
            pushed = new_ns is not None
            if pushed:
                ns_stack.append(new_ns)
            open_stack.append((local, pushed))


class Tokens:
    """Pull-style wrapper (the Go dec.Token() analog)."""

    def __init__(self, s: str):
        self._it = tokenize(s)

    def next(self):
        try:
            return next(self._it)
        except StopIteration:
            return None
