"""Tolerant-parser behavior on messy web HTML — the tree builder must
never raise and must keep html_strip's output sensible on the
construct subset plus common real-world sloppiness."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_to_text_extraction_service_spark.kernel.html_strip import strip_html


class TestMessyHTML:
    def test_unquoted_and_messy_attrs(self):
        text, meta = strip_html(
            b"<body><p class=lead data-x='a>b' checked>text</p></body>")
        assert text == "text"

    def test_gt_inside_quoted_attr(self):
        text, _ = strip_html(b'<body><p title="a>b">keep</p></body>')
        assert text == "keep"

    def test_unclosed_everything(self):
        # li auto-closes on li; <p> NESTS inside the open li (HTML5 +
        # Go tree both do this) → the li block contains "twothree" and
        # the nested p re-emits "three" (reference dup quirk).
        text, _ = strip_html(b"<html><body><ul><li>one<li>two<p>three")
        assert text == "one\n\ntwothree\n\nthree"

    def test_stray_lt_is_text(self):
        text, _ = strip_html(b"<body><p>5 < 6 and 7 > 3</p></body>")
        assert text == "5 < 6 and 7 > 3"

    def test_unterminated_comment_swallows_rest(self):
        text, _ = strip_html(b"<body><p>ok</p><!-- broken <p>gone</p>")
        assert text == "ok"

    def test_script_with_tags_inside(self):
        text, _ = strip_html(
            b"<body><script>if (a<b) { document.write('<p>x</p>'); }"
            b"</script><p>real</p></body>")
        assert text == "real"

    def test_mismatched_close_tags_ignored(self):
        text, _ = strip_html(b"<body><p>one</div></span></p><p>two</p>")
        assert text == "one\n\ntwo"

    def test_uppercase_tags(self):
        text, meta = strip_html(
            b"<BODY><H1>Head</H1><P>Body</P></BODY>")
        assert text == "# Head\n\nBody"

    def test_numeric_and_hex_entities(self):
        text, _ = strip_html(b"<body><p>&#x41;&#66;&nbsp;C</p></body>")
        assert text == "AB\xa0C"

    def test_invalid_utf8_replaced(self):
        text, _ = strip_html(b"<body><p>ok \xff\xfe bytes</p></body>")
        assert "ok" in text and "bytes" in text

    def test_empty_and_whitespace_only(self):
        assert strip_html(b"")[0] == ""
        assert strip_html(b"   \n\t  ")[0] == ""

    def test_deeply_nested_does_not_crash(self):
        html = b"<body>" + b"<div>" * 500 + b"<p>deep</p>" + b"</div>" * 500
        text, _ = strip_html(html)
        assert text == "deep"

    def test_cdata_like_and_pi(self):
        text, _ = strip_html(
            b"<?xml version='1.0'?><!DOCTYPE html><body><p>x</p></body>")
        assert text == "x"


@given(st.binary(max_size=300))
@settings(max_examples=200, deadline=None, derandomize=True)
def test_never_raises_on_arbitrary_bytes(data):
    text, meta = strip_html(data)
    assert isinstance(text, str)
    assert isinstance(meta, dict)


class TestTableFosterParenting:
    """WHATWG table insertion modes (x/net/html behavior on sloppy
    real-crawl markup): non-table content inside <table>/<tr> is
    foster-parented before the table; cells/rows/sections get implied
    end tags with proper scope barriers."""

    def test_stray_text_hoisted_before_table(self):
        from pdf_to_text_extraction_service_spark.kernel.htmlparse import (
            ELEMENT, parse,
        )
        root = parse(b"<body><table>oops<tr><td>cell</td></tr></table>")
        body = root.children[0]
        kinds = [(c.type, getattr(c, "data", "")) for c in body.children]
        assert kinds[0] == (0, "oops")          # text first
        assert kinds[1] == (ELEMENT, "table")   # table after

    def test_stray_element_hoisted_before_table(self):
        from pdf_to_text_extraction_service_spark.kernel.htmlparse import (
            parse,
        )
        root = parse(b"<body><table><div>stray</div><tr><td>c</td></tr>"
                     b"</table>")
        body = root.children[0]
        assert [c.data for c in body.children] == ["div", "table"]

    def test_whitespace_in_table_not_fostered(self):
        from pdf_to_text_extraction_service_spark.kernel.htmlparse import (
            parse,
        )
        root = parse(b"<body><table> \n <tr><td>c</td></tr></table>")
        body = root.children[0]
        assert body.children[0].data == "table"

    def test_cell_and_row_implied_end_tags(self):
        from pdf_to_text_extraction_service_spark.kernel.htmlparse import (
            parse,
        )
        root = parse(b"<table><tr><td>a<td>b<tr><td>c</table>")
        table = root.children[0]
        rows = [c for c in table.children if c.data == "tr"]
        assert len(rows) == 2
        assert [td.data for td in rows[0].children] == ["td", "td"]

    def test_cell_close_respects_nested_div(self):
        from pdf_to_text_extraction_service_spark.kernel.htmlparse import (
            node_text, parse,
        )
        # the second <td> must close the first even though a <div> is
        # the innermost open element
        root = parse(b"<table><tr><td>a<div>x</div><td>b</tr></table>")
        table = root.children[0]
        row = table.children[0]
        assert [td.data for td in row.children] == ["td", "td"]
        assert node_text(row) == "axb"

    def test_nested_table_start_closes_outer(self):
        from pdf_to_text_extraction_service_spark.kernel.htmlparse import (
            parse,
        )
        root = parse(b"<body><table><tr><td>a</td></tr><table>"
                     b"<tr><td>b</td></tr></table></body>")
        body = root.children[0]
        assert [c.data for c in body.children] == ["table", "table"]

    def test_dd_dt_siblings(self):
        from pdf_to_text_extraction_service_spark.kernel.htmlparse import (
            parse,
        )
        root = parse(b"<dl><dt>term<dd>def one<dd>def two</dl>")
        dl = root.children[0]
        assert [c.data for c in dl.children] == ["dt", "dd", "dd"]

    def test_misnested_formatting_text_order(self):
        # adoption-agency cases: text ORDER is what extraction needs,
        # and pop-until-match preserves it
        from pdf_to_text_extraction_service_spark.kernel.htmlparse import (
            node_text, parse,
        )
        assert node_text(parse(b"<b>one<i>two</b>three</i>")) \
            == "onetwothree"
        assert node_text(parse(b"<a>1<b>2</a>3</b>")) == "123"

    def test_strip_html_table_page(self):
        from pdf_to_text_extraction_service_spark.kernel.html_strip import (
            strip_html,
        )
        text, _ = strip_html(
            b"<html><body><p>before</p><table>x<tr><td><p>in cell</p>"
            b"</td></tr></table><p>after</p></body></html>")
        assert text == "before\n\nin cell\n\nafter"


class TestAdoptionAgency:
    """Misnested formatting recovery (WHATWG adoption agency —
    x/net/html behavior class; html_strip.go:42 inherits it)."""

    def _tree(self, s):
        from pdf_to_text_extraction_service_spark.kernel import (
            htmlparse,
        )
        return htmlparse.parse(s)

    def _text(self, s):
        from pdf_to_text_extraction_service_spark.kernel import (
            htmlparse,
        )
        return htmlparse.node_text(htmlparse.parse(s))

    def test_bi_misnest_reconstructs(self):
        t = self._tree("<p><b>one<i>two</b>three</i>four</p>")
        p = t.children[0]
        # browser tree: p > [b > ('one', i > 'two'), i > 'three', 'four']
        assert [c.data for c in p.children] == ["b", "i", "four"]
        assert p.children[1].children[0].data == "three"

    def test_block_survives_misnested_close(self):
        # </b> must not blow away the open <div>; "3" stays in it
        t = self._tree("<b>1<div>2</b>3</div>4")
        div = t.children[1]
        assert div.data == "div"
        texts = [c.data for c in div.children if c.type == 0]
        assert "3" in texts
        # "4" lands outside both
        assert t.children[2].data == "4"

    def test_anchor_does_not_wrap_future_blocks(self):
        # link-density correctness: "3" must NOT be anchor text,
        # "2" must keep its anchor attribution via the clone
        t = self._tree("<a href=x>1<p>2</a>3")
        a0, p = t.children[0], t.children[1]
        assert a0.data == "a" and p.data == "p"
        assert p.children[0].data == "a"  # clone wraps "2"
        assert p.children[1].data == "3"  # sibling, not linked

    def test_formatting_reconstructed_across_paragraphs(self):
        t = self._tree("<p><b>x</p><p>y</p>")
        p2 = t.children[1]
        assert p2.children[0].data == "b"
        assert p2.children[0].children[0].data == "y"

    def test_nested_anchor_implicitly_closes(self):
        t = self._tree("<a>1<a>2</a>3</a>4")
        assert [getattr(c, "data", None) for c in t.children] == \
            ["a", "a", "3", "4"]

    def test_table_marker_blocks_reconstruction(self):
        # formatting outside a table must not leak into cells
        t = self._tree("<b>out<table><tr><td>cell</td></tr></table>x")
        b = t.children[0]
        table = b.children[1]
        td = table.children[0].children[0]
        assert td.children[0].type == 0 and td.children[0].data == "cell"

    def test_text_order_is_stable_under_misnesting(self):
        cases = [
            "<b><i></b></i>plain",
            "<em>1<strong>2</em>3</strong>4",
            "<u><s><b>x</u>y</s>z</b>w",
            "<a>1<div><a>2</div>3",
        ]
        for c in cases:
            flat = "".join(ch for ch in c if ch not in "<>")
            got = self._text(c)
            import re
            want = "".join(re.findall(r"(?<=>)[^<>]+|^[^<]+", c))
            assert got == "".join(
                x for x in re.split(r"<[^>]*>", c) if x), c

    def test_deep_misnesting_never_crashes(self):
        import random
        rng = random.Random(5)
        tags = ["b", "i", "em", "a", "div", "p", "span", "table",
                "tr", "td"]
        for _ in range(200):
            parts = []
            for _ in range(rng.randint(5, 40)):
                t = rng.choice(tags)
                parts.append(rng.choice([f"<{t}>", f"</{t}>", "txt "]))
            s = "".join(parts)
            self._text(s)  # must not raise


def test_self_closing_table_does_not_poison_afe():
    """Regression: <table/> pushed an AFE marker without an element
    to pop, so every later adoption/reconstruction hit the stale
    marker and anchors never closed."""
    from pdf_to_text_extraction_service_spark.kernel import htmlparse

    t = htmlparse.parse("<table/><a href=x>link</a>plain<b>bold</b>tail")
    kinds = [getattr(c, "data", None) for c in t.children
             if c.type == htmlparse.ELEMENT]
    assert kinds == ["table", "a", "b"]
    # 'plain' and 'tail' are TOP-LEVEL text (not swallowed by a/b)
    texts = [c.data for c in t.children if c.type == htmlparse.TEXT]
    assert texts == ["plain", "tail"]


class TestForeignContent:
    """WHATWG foreign-content (SVG/MathML) minimal mode: subtrees are
    pruned deterministically, breakout tags resume HTML parsing, the
    builder never raises (VERDICT r3 #5)."""

    def _text(self, b: bytes) -> str:
        from pdf_to_text_extraction_service_spark.kernel.html_strip import (
            strip_html,
        )

        return strip_html(b)[0]

    def test_svg_subtree_pruned(self):
        t = self._text(b"<p>before</p><svg viewBox='0 0 4 4'>"
                       b"<circle r='4'/><text>svg label</text></svg>"
                       b"<p>after</p>")
        assert "before" in t and "after" in t
        assert "svg label" not in t

    def test_mathml_subtree_pruned(self):
        t = self._text(b"<p>x</p><math><mi>v</mi><mo>+</mo>"
                       b"<mn>1</mn></math><p>y</p>")
        assert "x" in t and "y" in t
        assert "v" not in t

    def test_breakout_tag_resumes_html(self):
        # misnested: <p> inside svg is a WHATWG breakout — parsing
        # must resume, not swallow the rest of the document
        t = self._text(b"<p>a</p><svg><rect/><p>rescued</p><p>more</p>")
        assert "a" in t and "rescued" in t and "more" in t

    def test_nested_svg_depth_counted(self):
        t = self._text(b"<svg><svg></svg><text>inner</text></svg>"
                       b"<p>tail</p>")
        assert "tail" in t and "inner" not in t

    def test_unclosed_svg_no_breakout_prunes_tail(self):
        # stop-at-first-error posture: no close, no breakout tag
        t = self._text(b"<p>kept</p><svg><text>lost forever")
        assert "kept" in t and "lost" not in t

    def test_self_closing_svg_inert(self):
        t = self._text(b"<svg/><p>fine</p><math/><p>also</p>")
        assert "fine" in t and "also" in t

    def test_comments_and_stray_lt_inside_foreign(self):
        t = self._text(b"<p>a</p><svg><!-- <p>hidden</p> -->"
                       b"< notatag <text>x</text></svg><p>b</p>")
        assert "a" in t and "b" in t and "hidden" not in t

    def test_end_tag_without_open_foreign_ignored(self):
        t = self._text(b"<p>one</p></svg><p>two</p>")
        assert "one" in t and "two" in t

    def test_fuzz_never_raises(self):
        import random

        from pdf_to_text_extraction_service_spark.kernel import htmlparse

        rnd = random.Random(31)
        atoms = ["<svg>", "</svg>", "<math>", "</math>", "<svg/>",
                 "<p>", "</p>", "<div>", "text", "<text>", "</text>",
                 "<!--", "-->", "<", ">", "<foreignObject>", "&amp;"]
        for _ in range(300):
            doc = "".join(rnd.choice(atoms)
                          for _ in range(rnd.randint(1, 40)))
            htmlparse.parse(doc.encode())  # must not raise


class TestTemplateInsertionModes:
    """WHATWG <template>: a scope barrier for end tags, implied end
    tags, table-in-table closing, and formatting reconstruction
    (template is in every scope barrier list and is an AFE marker)."""

    def test_end_tag_never_crosses_template_boundary(self):
        from pdf_to_text_extraction_service_spark.kernel.htmlparse import (
            node_text, parse,
        )
        root = parse(b"<body><div>a<template></div>b</template>c</div>"
                     b"</body>")
        body = root.children[0]
        # the stray </div> inside the template must NOT close the
        # outer div: c stays inside it
        assert [c.data for c in body.children] == ["div"]
        div = body.children[0]
        kids = [c.data for c in div.children if c.type == 1]
        assert kids == ["template"]
        assert node_text(div) == "abc"

    def test_template_end_pops_open_contents(self):
        from pdf_to_text_extraction_service_spark.kernel.htmlparse import (
            node_text, parse,
        )
        # unclosed elements inside the template are popped by
        # </template> ("generate all implied end tags thoroughly")
        root = parse(b"<body><template><div><span>x</template>y</body>")
        body = root.children[0]
        assert [c.data for c in body.children if c.type == 1] \
            == ["template"]
        assert node_text(body) == "xy"

    def test_td_inside_template_keeps_outer_cell_open(self):
        from pdf_to_text_extraction_service_spark.kernel.htmlparse import (
            node_text, parse,
        )
        root = parse(b"<table><tr><td>x<template><td>y</td></template>"
                     b"z</td></tr></table>")
        table = root.children[0]
        row = table.children[0]
        # outer row still has exactly one cell; y lives inside the
        # template, z continues in the SAME outer cell
        assert [c.data for c in row.children] == ["td"]
        assert node_text(row) == "xyz"

    def test_table_start_inside_template_keeps_outer_table(self):
        from pdf_to_text_extraction_service_spark.kernel.htmlparse import (
            parse,
        )
        root = parse(b"<body><table><tr><td>a<template><table><tr>"
                     b"<td>b</td></tr></table></template></td></tr>"
                     b"</table></body>")
        body = root.children[0]
        # inner table must not close the outer one across the barrier
        assert [c.data for c in body.children] == ["table"]

    def test_formatting_not_reconstructed_inside_template(self):
        from pdf_to_text_extraction_service_spark.kernel.htmlparse import (
            parse,
        )

        def tags_around_text(n, out, path):
            for c in n.children:
                if c.type == 0 and c.data.strip():
                    out.append((c.data, tuple(path)))
                else:
                    tags_around_text(c, out, path + [c.data])
            return out

        root = parse(b"<body><b>bold<template>plain</template>more"
                     b"</body>")
        found = dict(tags_around_text(root, [], []))
        assert "b" in found["bold"]
        # marker blocks reconstruction INSIDE the template: no new
        # <b> wrapper below the template node (the open outer <b>
        # containing the template element itself is correct tree
        # shape — x/net/html keeps template children on the node)
        path = found["plain"]
        assert "b" not in path[path.index("template"):]
        assert "b" in found["more"]


def test_cdata_in_foreign_content_does_not_break_out():
    from pdf_to_text_extraction_service_spark.kernel.htmlparse import (
        node_text, parse,
    )
    html = (b"<body><svg><style><![CDATA[ .x{fill:red} <div> junk "
            b"]]></style><circle r='1'/></svg><p>after</p></body>")
    root = parse(html)
    body = root.children[0]
    # the whole svg subtree is pruned; the CDATA breakout lookalike
    # must not leak style junk or truncate the skip
    assert node_text(body) == "after"
    assert [c.data for c in body.children if c.type == 1] \
        == ["svg", "p"]  # svg node kept, subtree pruned
