"""HTML → markdown-like text strip kernel.

Byte-parity port of reference
internal/extractors/plaintext/html_strip.go:26-96 — the hot-path kernel
for Common-Crawl pages:

- depth-first walk; PRUNE subtrees at script/style/nav/footer/aside
- ``<title>`` first child → metadata["title"] (TrimSpace'd)
- h1/h2/h3 → ``#``/``##``/``###`` + trimmed recursive text (appended
  even when empty — Go appends unconditionally, html_strip.go:59-62)
- p/li → trimmed recursive text block if non-empty
- blocks joined with ``\\n\\n``; zero blocks → whole-document text
- walk CONTINUES into heading/p/li children (nested blocks duplicate,
  exactly as in the reference)
"""

from __future__ import annotations

from . import htmlparse, runes
from .htmlparse import ELEMENT, Node, node_text

_PRUNE = frozenset(("script", "style", "nav", "footer", "aside"))
_HEADING = {"h1": "#", "h2": "##", "h3": "###"}


def strip_html(data: bytes) -> tuple[str, dict[str, str]]:
    """Return (text, metadata) per htmlStripToMarkdownLike."""
    meta: dict[str, str] = {}
    try:
        root = htmlparse.parse(data)
    except Exception:
        from . import charset

        return charset.decode(data)[0], meta

    lines: list[str] = []

    def walk(n: Node) -> None:
        if n.type == ELEMENT:
            tag = n.data
            if tag in _PRUNE:
                return
            if tag == "title" and n.children:
                meta["title"] = runes.trim_space(_first_child_data(n))
            lvl = _HEADING.get(tag)
            if lvl is not None:
                lines.append(lvl + " " + runes.trim_space(node_text(n)))
            if tag == "p" or tag == "li":
                t = runes.trim_space(node_text(n))
                if t != "":
                    lines.append(t)
        for c in n.children:
            walk(c)

    walk(root)
    if not lines:
        plain = runes.trim_space(node_text(root))
        if plain != "":
            lines.append(plain)
    return "\n\n".join(lines), meta


def _first_child_data(n: Node) -> str:
    """Go reads n.FirstChild.Data regardless of node type
    (html_strip.go:56-58)."""
    return n.children[0].data
