"""Simple-font /Encoding resolution (kernel/pdfenc.py + pdfk's
_font_encoding): WinAnsi/MacRoman/Standard base tables, /Differences
glyph-name remaps, AGL algorithmic names, Identity-H two-byte
fallback, ToUnicode precedence, and the identity fallback for fonts
with no encoding at all (the pre-r6 behavior, which every existing
fixture relies on)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_to_text_extraction_service_spark.kernel import pdfenc, pdfk
from pdf_to_text_extraction_service_spark.sources import pdfgen


def _extract(pdf: bytes) -> str:
    return pdfk.PDFDoc(pdf).page_text(1).strip()


def _encoded(text_lines, encoding_body, encode):
    return pdfgen.build_pdf_encoded(
        [pdfgen.single_column_page(text_lines)], encoding_body, encode)


def test_winansi_roundtrip():
    text = "Smart “quotes” — café, naïve… €99 ±5°"
    pdf = _encoded([text], b"/WinAnsiEncoding",
                   lambda t: t.encode("cp1252"))
    assert _extract(pdf) == text


def test_macroman_roundtrip():
    text = "Café ﬁnance — ≠ approx ≈ π ∞"
    pdf = _encoded([text], b"/MacRomanEncoding",
                   lambda t: t.encode("mac_roman"))
    assert _extract(pdf) == text


def test_standard_encoding():
    inv = {c: k for k, c in pdfenc.STANDARD.items()}
    text = "’‘ﬁﬂÆß–•…‰«»¡¿ƒ—"
    pdf = _encoded([text], b"/StandardEncoding",
                   lambda t: bytes(inv[c] for c in t))
    assert _extract(pdf) == text


def test_differences_remap_and_unknown_name():
    body = (b"<< /BaseEncoding /WinAnsiEncoding /Differences "
            b"[ 128 /aacute /uni0416 /quotedblleft 200 /emdash "
            b"/notarealglyphname ] >>")
    pdf = _encoded(["x"], body,
                   lambda t: bytes([65, 128, 129, 130, 200, 201]))
    # 201 carries an unknown glyph name: mapping removed -> identity
    assert _extract(pdf) == "AáЖ“—" + chr(201)


def test_differences_without_base_encoding():
    body = b"<< /Differences [ 65 /egrave ] >>"
    pdf = _encoded(["x"], body, lambda t: bytes([65, 66]))
    # remapped 65 -> è; 66 has no table entry -> identity 'B'
    assert _extract(pdf) == "èB"


def test_encoding_as_indirect_object():
    # /Encoding N 0 R where N holds the dict
    text = "café — “ok”"
    base = _encoded([text], b"99 0 R", lambda t: t.encode("cp1252"))
    enc_obj = (b"99 0 obj\n<< /Type /Encoding /BaseEncoding "
               b"/WinAnsiEncoding >>\nendobj\n")
    # splice the object before xref and let the recovery scan find it
    pdf = base.replace(b"xref\n0 ", enc_obj + b"xref\n0 ", 1)
    assert _extract(pdf) == text


def test_tounicode_takes_precedence():
    # build_pdf_cmap emits ToUnicode; adding an /Encoding must not
    # change the result
    spans = [pdfgen.single_column_page(["hello world"])]
    pdf = pdfgen.build_pdf_cmap(spans)
    assert "hello world" in _extract(pdf)


def test_identity_h_two_byte_codes():
    body = b"/Identity-H"
    # Type0 marker needed in the font dict for the 2-byte path; the
    # builder emits /TrueType, so patch the subtype
    pdf = _encoded(["x"], body,
                   lambda t: "Ж".encode("utf-16-be") * 2)
    pdf = pdf.replace(b"/Subtype /TrueType", b"/Subtype /Type0")
    assert _extract(pdf) == "ЖЖ"


def test_no_encoding_stays_identity():
    pdf = pdfgen.build_pdf([pdfgen.single_column_page(["plain text"])])
    assert _extract(pdf) == "plain text"


@settings(max_examples=30, deadline=None)
@given(st.text(
    alphabet=st.sampled_from(
        "abc XYZ 019 “”‘’—–…€±°§¶·×÷¼½¾ÀÉÎÕøßçñ†‡‰žŠŒ"),
    min_size=1, max_size=40))
def test_winansi_hypothesis(text):
    pdf = _encoded([text], b"/WinAnsiEncoding",
                   lambda t: t.encode("cp1252"))
    got = pdfk.PDFDoc(pdf).page_text(1)
    # page assembly may trim edge whitespace of the single span
    assert got.strip() == text.strip()


def test_glyph_to_char_algorithmic_forms():
    g = pdfenc.glyph_to_char
    assert g("uni0041") == "A"
    assert g("uni00410042") == "AB"
    assert g("u1F600") == "\U0001F600"
    assert g("uniD800") is None
    assert g("aacute") == "á"
    assert g("Edieresis") == "Ë"
    assert g("zcaron") == "ž"
    assert g("Lslash") == "Ł"
    assert g("quotedblleft") == "“"
    assert g("Euro") == "€"
    assert g("nosuchglyph") is None
    assert g("") is None


def test_base_tables_match_python_codecs():
    for code, ch in pdfenc.WIN_ANSI.items():
        assert ch == bytes([code]).decode("cp1252")
    for code, ch in pdfenc.MAC_ROMAN.items():
        assert ch == bytes([code]).decode("mac_roman")
    for code in (0x81, 0x8D, 0x8F, 0x90, 0x9D, 0x7F):
        assert code not in pdfenc.WIN_ANSI


def test_standard_encoding_spec_vectors():
    # pinned to PDF 32000-1 Annex D rows so the table cannot drift
    # (the round-trip tests alone would accept any self-consistent
    # table)
    S = pdfenc.STANDARD
    assert S[0x27] == "’" and S[0x60] == "‘"
    assert S[0xA9] == "'" and S[0xAA] == "“" and S[0xBA] == "”"
    assert S[0xB1] == "–" and S[0xD0] == "—"
    assert S[0xAE] == "ﬁ" and S[0xAF] == "ﬂ"
    assert S[0xE1] == "Æ" and S[0xF1] == "æ" and S[0xFB] == "ß"
    assert S[0xA4] == "⁄" and S[0xA8] == "¤" and S[0xBD] == "‰"
    for undefined in (0xA0, 0xB0, 0xB5, 0xBE, 0xC0, 0xD1, 0xFF):
        assert undefined not in S


def test_apply_differences_shapes():
    t = pdfenc.apply_differences(pdfenc.WIN_ANSI,
                                 [128, "aacute", "egrave", 200, "fi"])
    assert t[128] == "á" and t[129] == "è" and t[200] == "ﬁ"
    assert t[65] == "A"
    t2 = pdfenc.apply_differences(None, [48, "zero"])
    assert t2 == {48: "0"}
