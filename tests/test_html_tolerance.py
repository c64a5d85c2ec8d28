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
