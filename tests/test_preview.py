"""Preview-mode parity tests (main.go:336-483, hybrid.go:144-200)."""

from __future__ import annotations

from pdf_to_text_extraction_service_spark.kernel import preview
from pdf_to_text_extraction_service_spark.sources import pdfgen

GOOD = ["The quick brown fox jumps over the lazy dog near the river.",
        "Morning light settles across the quiet valley while birds sing."]
GARBAGE = ["@#$% ^&*()!! ~~ ||", "#### !!!! @@@@ $$$$"]


class TestNonPDF:
    def test_truncation_and_recount(self):
        body = "word " * 100
        r, fmt = preview.preview_document(
            "https://x.test/a.txt", body.encode(), max_chars=23)
        assert r.text == "word word word word wor..."
        # recounted on the truncated text (main.go:471-472)
        assert r.word_count == 5
        assert r.char_count == 26

    def test_no_truncation_under_cap(self):
        r, _ = preview.preview_document(
            "https://x.test/a.txt", b"short text", max_chars=100)
        assert r.text == "short text"
        assert r.word_count == 2

    def test_allowlist_rejects_media(self):
        r, fmt = preview.preview_document(
            "https://x.test/a.mp3", b"\xff\xfb audio")
        assert not r.success
        assert r.error == "preview unsupported for this file type"
        assert r.file_type == "media/audio"

    def test_html_allowed(self):
        r, fmt = preview.preview_document(
            "https://x.test/p.html",
            b"<html><body><p>hello preview</p></body></html>")
        assert r.success and r.text == "hello preview"


class TestPDFPreview:
    def test_text_layer_only_first_pages(self):
        pdf = pdfgen.simple_pdf([GOOD] * 10)  # 10 pages
        r, fmt = preview.preview_document("https://x.test/d.pdf", pdf)
        assert r.success
        assert r.method == "preview-text-layer"
        assert r.metadata["totalPages"] == "10"
        # only first 8 pages examined, all text-layer
        assert r.metadata["textLayerPages"] == "8"
        assert r.metadata["needsOcr"] == "false"
        assert r.text.count(GOOD[0]) == 8  # joined "\n\n", no page caps

    def test_needs_ocr_flag(self):
        pdf = pdfgen.simple_pdf([GARBAGE, GARBAGE, GOOD])
        r, _ = preview.preview_document("https://x.test/d.pdf", pdf)
        # 2/3 pages needs-ocr > 0.25 → flag true; text only good pages
        assert r.metadata["needsOcr"] == "true"
        assert r.metadata["textLayerPages"] == "1"
        assert GOOD[0] in r.text and "@#$%" not in r.text

    def test_char_cap(self):
        pdf = pdfgen.simple_pdf([GOOD] * 8)
        r, _ = preview.preview_document("https://x.test/d.pdf", pdf,
                                        max_chars=50)
        assert r.text.endswith("...")
        assert len(r.text.encode()) == 53

    def test_broken_pdf(self):
        r, _ = preview.preview_document("https://x.test/d.pdf",
                                        b"%PDF-1.4 broken")
        assert not r.success
        assert r.error.startswith("page count: ")
        assert r.method == "preview-text-layer"


def test_preview_equals_extract_when_uncapped():
    """Invariant: for preview-allowed types, preview with a cap larger
    than the text IS the extract result (same kernel, no truncation) —
    ties the two pipelines together (main.go:448-482 runs the normal
    kernel)."""
    from pdf_to_text_extraction_service_spark.kernel import router
    from pdf_to_text_extraction_service_spark.sources import corpus

    rows = corpus.generate_corpus_rows(150, seed=13)
    checked = 0
    for url, _ts, payload, _t, _l in rows:
        pres, pfmt = preview.preview_document(url, payload,
                                              max_chars=10 ** 9)
        eres, efmt = router.extract_document(url, payload)
        if not pres.success:
            continue  # media/unknown rejections
        assert pfmt == efmt
        if efmt == "pdf":
            # PDF preview is text-layer-pages-joined, a different
            # envelope by design (method preview-text-layer)
            assert pres.method == "preview-text-layer"
            continue
        assert pres.text == eres.text, url
        assert pres.word_count == eres.word_count
        checked += 1
    assert checked > 80


def test_spark_preview_udf(spark):
    from pdf_to_text_extraction_service_spark.functions.extract_udf import (
        preview as spark_preview,
    )
    df = spark.createDataFrame(
        [("https://x.test/a.txt", ("word " * 100).encode()),
         ("https://x.test/a.mp3", b"\xff\xfb audio")],
        "url string, html binary",
    )
    rows = {r["url"]: r for r in spark_preview(df, max_chars=23).collect()}
    assert rows["https://x.test/a.txt"]["text"] == "word word word word wor..."
    assert not rows["https://x.test/a.mp3"]["success"]
