"""Tolerant HTML tree builder (from scratch, stdlib-only).

The reference strips HTML via a WHATWG-HTML5 parse tree
(golang.org/x/net/html, see internal/extractors/plaintext/html_strip.go:44).
bs4/lxml are not available in this environment, so we implement a
tolerant tree builder covering the construct subset the corpus generator
emits (SURVEY.md §7 hard-part 2): explicit or implied html/head/body,
void elements, ``<p>``/``<li>`` auto-closing, raw-text ``script``/
``style``, RCDATA ``title``, comments, doctype, and HTML5 entity
decoding. Output tree shape is equivalent for the purposes of
``html_strip`` (same pruning set, same document-order text nodes).

Performance note: this parser runs per document inside the extraction
pandas UDF — it is regex-tokenized and allocation-light on purpose.
"""

from __future__ import annotations

import html as _htmlmod
import re

TEXT = 0
ELEMENT = 1
COMMENT = 2
DOCUMENT = 3


class Node:
    __slots__ = ("type", "data", "children")

    def __init__(self, type_: int, data: str = ""):
        self.type = type_
        self.data = data
        self.children: list[Node] = []


_VOID = frozenset((
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
))

# Start tags that implicitly close an open <p> (HTML5 8.2.5.4.7 subset).
_P_CLOSERS = frozenset((
    "address", "article", "aside", "blockquote", "details", "div", "dl",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2",
    "h3", "h4", "h5", "h6", "header", "hr", "main", "menu", "nav", "ol",
    "p", "pre", "section", "table", "ul", "li",
))

_RAWTEXT = frozenset(("script", "style"))

# Table insertion modes (WHATWG "in table"/"in row" subset): content
# that is not table-structural gets FOSTER-PARENTED — inserted into
# the table's parent immediately before the table — matching
# x/net/html's tree for sloppy real-crawl markup like
# <table>oops<tr>....
_TABLE_CTX = frozenset(("table", "thead", "tbody", "tfoot", "tr"))
_TABLE_ALLOWED = frozenset((
    "caption", "colgroup", "col", "thead", "tbody", "tfoot", "tr",
    "td", "th", "script", "style", "template", "form",
))

# Implied-end-tag (names, scope-barrier) constants for _close_up_to.
_ONLY_P = frozenset(("p",))
_P_SCOPE = _TABLE_CTX | frozenset(("td", "th", "caption"))
_ONLY_LI = frozenset(("li",))
_LIST_SCOPE = frozenset(("ul", "ol"))
_DD_DT = frozenset(("dd", "dt"))
_DL_SCOPE = frozenset(("dl",))
_CELLS = frozenset(("td", "th"))
_ROW_SCOPE = frozenset(("tr", "table", "thead", "tbody", "tfoot"))
_ONLY_TR = frozenset(("tr",))
_SECTION_SCOPE = frozenset(("table", "thead", "tbody", "tfoot"))
_SECTIONS = frozenset(("thead", "tbody", "tfoot"))
_TABLE_SCOPE = frozenset(("table",))
_ONLY_TABLE = frozenset(("table",))
_EMPTY = frozenset()

_RAW_CLOSE = {
    t: re.compile(r"</" + t + r"\s*>", re.IGNORECASE)
    for t in ("script", "style", "title")
}

_TAG_RE = re.compile(
    r"<(?:"
    r"(?P<comment>!--)"
    r"|(?P<decl>![^>]*)"
    r"|(?P<pi>\?[^>]*)"
    r"|(?P<end>/[a-zA-Z][^>]*)"
    r"|(?P<start>[a-zA-Z][a-zA-Z0-9:_-]*)"
    r"(?P<attrs>(?:[^>\"']|\"[^\"]*\"|'[^']*')*)"
    r")>"
)

_unescape = _htmlmod.unescape


def parse(data: bytes | str) -> Node:
    """Parse HTML bytes into a Node tree rooted at a DOCUMENT node.
    Bytes are decoded with BOM/<meta charset> detection + UTF-8
    validity check + windows-1252 fallback (kernel/charset.py)."""
    if isinstance(data, bytes):
        from . import charset

        s, _ = charset.decode(data)
    else:
        s = data

    root = Node(DOCUMENT)
    stack: list[Node] = [root]
    open_tags: list[str] = []  # parallel tag-name stack (root excluded)

    def _foster_insert(node: Node) -> None:
        """Insert before the nearest open <table> in its parent."""
        for idx in range(len(stack) - 1, 0, -1):
            st = stack[idx]
            if st.type == ELEMENT and st.data == "table":
                parent = stack[idx - 1]
                try:
                    pos = parent.children.index(st)
                except ValueError:
                    pos = len(parent.children)
                parent.children.insert(pos, node)
                return
        stack[-1].children.append(node)

    def _close_up_to(names: frozenset | set, barriers: frozenset | set) \
            -> None:
        """Implied end tags: pop up to and including the nearest open
        element in ``names``, unless a ``barriers`` element sits
        closer to the top (scope boundary)."""
        for idx in range(len(open_tags) - 1, -1, -1):
            t = open_tags[idx]
            if t in barriers:
                return
            if t in names:
                del open_tags[idx:]
                del stack[idx + 1:]
                return

    def append_text(raw: str, decode: bool = True) -> None:
        if not raw:
            return
        node = Node(TEXT, _unescape(raw) if decode and "&" in raw else raw)
        # inlined table-context check — this runs per text node
        if open_tags and open_tags[-1] in _TABLE_CTX and raw.strip():
            _foster_insert(node)  # non-space chars in table context
        else:
            stack[-1].children.append(node)

    i = 0
    n = len(s)
    while i < n:
        lt = s.find("<", i)
        if lt < 0:
            append_text(s[i:])
            break
        if lt > i:
            append_text(s[i:lt])
        m = _TAG_RE.match(s, lt)
        if m is None:
            # Stray "<" — treat as text (tolerant, like the HTML5
            # tokenizer's parse-error recovery).
            append_text("<")
            i = lt + 1
            continue
        i = m.end()
        # single lastgroup lookup instead of probing all alternatives
        kind = m.lastgroup
        if kind == "comment":
            end = s.find("-->", lt + 4)
            if end < 0:
                stack[-1].children.append(Node(COMMENT, s[lt + 4:]))
                break
            stack[-1].children.append(Node(COMMENT, s[lt + 4:end]))
            i = end + 3
            continue
        if kind == "decl" or kind == "pi":
            continue
        if kind == "end":
            tag = m.group("end")[1:].strip().lower()
            parts = tag.split(None, 1)
            tag = parts[0] if parts else tag
            if tag in open_tags:
                while open_tags:
                    t = open_tags.pop()
                    stack.pop()
                    if t == tag:
                        break
            continue

        tag = m.group("start").lower()
        attrs = m.group("attrs") or ""
        self_closing = attrs.rstrip().endswith("/")

        # Implied end tags (WHATWG subset): p before block starts,
        # li/dd/dt siblings, table cells/rows/sections. Scope sets
        # are module constants (no per-tag set construction).
        if tag in _P_CLOSERS and "p" in open_tags:
            _close_up_to(_ONLY_P, _P_SCOPE)
        if tag == "li":
            _close_up_to(_ONLY_LI, _LIST_SCOPE)
        elif tag in ("dd", "dt"):
            _close_up_to(_DD_DT, _DL_SCOPE)
        elif tag in ("td", "th"):
            _close_up_to(_CELLS, _ROW_SCOPE)
        elif tag == "tr":
            _close_up_to(_ONLY_TR, _SECTION_SCOPE)
        elif tag in ("thead", "tbody", "tfoot"):
            _close_up_to(_SECTIONS, _TABLE_SCOPE)
        elif tag == "table" and "table" in open_tags:
            # a table start inside an open table closes it (the spec
            # reprocesses the token in the enclosing mode)
            _close_up_to(_ONLY_TABLE, _EMPTY)

        el = Node(ELEMENT, tag)
        if open_tags and open_tags[-1] in _TABLE_CTX \
                and tag not in _TABLE_ALLOWED:
            _foster_insert(el)  # foster-parent stray table content
        else:
            stack[-1].children.append(el)

        if tag in _VOID or self_closing:
            continue

        if tag in _RAWTEXT or tag == "title":
            cm = _RAW_CLOSE[tag].search(s, i)
            end = cm.start() if cm else n
            raw = s[i:end]
            if raw:
                # script/style are raw text (no entity decode);
                # title is RCDATA (entities decoded).
                el.children.append(
                    Node(TEXT, _unescape(raw) if tag == "title" else raw)
                )
            i = cm.end() if cm else n
            continue

        stack.append(el)
        open_tags.append(tag)

    return root


def node_text(n: Node) -> str:
    """Concatenated text of all TEXT descendants, document order
    (reference html_strip.go:84-96 htmlStripNodeText)."""
    if n.type == TEXT:
        return n.data
    parts: list[str] = []
    _collect_text(n, parts)
    return "".join(parts)


def _collect_text(n: Node, parts: list[str]) -> None:
    for c in n.children:
        if c.type == TEXT:
            parts.append(c.data)
        elif c.type == ELEMENT:
            _collect_text(c, parts)
