"""Charset detection (kernel/charset.py): BOM / meta-prescan /
UTF-8-validity / windows-1252 fallback, and end-to-end extraction of
non-UTF-8 pages through the router (the deliberate divergence from
the reference's raw-byte passthrough — docs/NEXT.md #2)."""

from __future__ import annotations

from pdf_to_text_extraction_service_spark.kernel import charset, router


def test_bom_detection_consumes_bom():
    text, codec = charset.decode("﻿hi".encode("utf-8"))
    assert codec == "utf-8-sig" and text == "hi"
    text, codec = charset.decode("héllo".encode("utf-16-le"))
    # no BOM, invalid utf-8 → fallback; with BOM → utf-16
    text, codec = charset.decode("﻿héllo".encode("utf-16-le"))
    assert codec == "utf-16" and text == "héllo"
    text, codec = charset.decode("﻿héllo".encode("utf-16-be"))
    assert codec == "utf-16" and text == "héllo"


def test_meta_charset_prescan():
    page = b'<html><head><meta charset="iso-8859-1"></head>' \
           b"<body>caf\xe9</body></html>"
    text, codec = charset.decode(page)
    assert codec == "windows-1252" and "caf\xe9" in text

    page = (b'<html><head><meta http-equiv="Content-Type" '
            b'content="text/html; charset=Windows-1251"></head>'
            b"<body>\xcf\xf0\xe8\xe2\xe5\xf2</body></html>")
    text, codec = charset.decode(page)
    assert codec == "windows-1251" and "Привет" in text


def test_utf8_validity_beats_fallback():
    text, codec = charset.decode("café utf8".encode("utf-8"))
    assert codec == "utf-8" and text == "café utf8"


def test_windows_1252_fallback():
    # 0x93/0x94 are curly quotes in cp1252 and invalid UTF-8
    text, codec = charset.decode(b"\x93quoted\x94 text")
    assert codec == "windows-1252"
    assert text == "“quoted” text"


def test_meta_utf16_label_means_utf8():
    page = b'<meta charset="utf-16"><p>plain ascii</p>'
    _, codec = charset.decode(page)
    assert codec == "utf-8"


def test_unknown_label_falls_through():
    page = b'<meta charset="klingon"><p>caf\xe9</p>'
    text, codec = charset.decode(page)
    assert codec == "windows-1252" and "caf\xe9" in text


def test_utf8_unchanged_vs_previous_behavior():
    # the parity guarantee: valid UTF-8 decodes exactly as the old
    # utf-8-with-replacement path did
    for b in (b"plain", "unicode — café".encode("utf-8"),
              b"<p>html</p>"):
        assert charset.decode(b)[0] == b.decode("utf-8", errors="replace")


def test_router_extracts_latin1_html_page():
    page = (b'<html><head><meta charset="iso-8859-1">'
            b"<title>caf\xe9</title></head>"
            b"<body><p>le caf\xe9 fran\xe7ais</p></body></html>")
    res, kernel = router.extract_document("https://x.test/a.html", page)
    assert kernel == "html" and res.success
    assert "le café français" in res.text
    assert "�" not in res.text


def test_router_extracts_latin1_plaintext():
    res, kernel = router.extract_document(
        "https://x.test/a.txt", b"na\xefve r\xe9sum\xe9")
    assert kernel == "text" and res.success
    assert res.text == "naïve résumé"
    # char_count counts runes of the DECODED text
    assert res.char_count == len("naïve résumé")


def test_router_utf8_bom_plaintext():
    res, _ = router.extract_document(
        "https://x.test/a.txt", "﻿hello bom".encode("utf-8"))
    assert res.success and res.text == "hello bom"


class TestStatisticalFallback:
    """Unlabeled non-UTF-8 pages: the byte-statistics fallback
    (docs/NEXT.md #2 residual) must pick the right codec for the
    common crawl charsets, and must NEVER flip a genuinely Latin or
    low-evidence page away from windows-1252."""

    CASES = [
        ("Привет мир, это обычная русская страница с текстом.",
         "windows-1251"),
        ("Привет мир, это обычная русская страница с текстом.",
         "koi8-r"),
        ("これは普通の日本語のページです。テキストがたくさんあります。",
         "shift_jis"),
        ("これは普通の日本語のページです。テキストがたくさんあります。",
         "euc-jp"),
        ("这是一个普通的中文网页，包含很多文字内容。", "gbk"),
        ("這是一個普通的中文網頁，包含很多文字內容。", "big5"),
        ("이것은 일반적인 한국어 페이지입니다. 텍스트가 있습니다.",
         "euc-kr"),
    ]

    def test_detects_unlabeled_encodings(self):
        for text, enc in self.CASES:
            raw = ("<html><body>" + text * 5
                   + "</body></html>").encode(enc)
            got, codec = charset.decode(raw, scan_meta=False)
            assert codec == enc, (enc, codec)
            assert text in got

    def test_latin_pages_stay_cp1252(self):
        for text in [
            "Ceci est une page française avec accents: é à ü œ.",
            "Völlig übliche deutsche Seite mit Umlauten: ä ö ü ß.",
        ]:
            raw = (text * 10).encode("windows-1252")
            _, codec = charset.decode(raw, scan_meta=False)
            assert codec == "windows-1252", codec

    def test_low_evidence_keeps_default(self):
        text, codec = charset.decode(b"\x93quoted\x94 text only")
        assert codec == "windows-1252"

    def test_meta_label_still_beats_statistics(self):
        body = "Привет мир, это русская страница с текстом."
        raw = ('<html><meta charset="koi8-r"><body>' + body * 5
               + "</body></html>").encode("koi8-r")
        _, codec = charset.decode(raw)
        assert codec == "koi8-r"


def test_decode_never_raises_fuzz():
    import random

    rng = random.Random(123)
    for _ in range(300):
        n = rng.randint(0, 400)
        blob = bytes(rng.randrange(256) for _ in range(n))
        text, codec = charset.decode(blob)
        assert isinstance(text, str) and isinstance(codec, str)
