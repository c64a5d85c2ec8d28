"""Office/ODF/EPUB kernel parity tests (docx.go / xlsx.go / pptx.go /
opendocument.go / epub.go semantics), incl. the reference's own
zip_limits_test.go coverage."""

from __future__ import annotations

import io
import zipfile

import pytest

from pdf_to_text_extraction_service_spark.kernel import office, router
from pdf_to_text_extraction_service_spark.sources import officegen


class TestDOCX:
    def test_headings_lists_paragraphs(self):
        b = officegen.make_docx([
            {"text": "Main Title", "style": "Title"},
            {"text": "Section", "style": "Heading2"},
            {"text": "Plain paragraph."},
            {"text": "item one", "num": "1"},
            {"text": "nested", "num": "1", "ilvl": "1"},
        ])
        r = office.extract_docx(b, "m")
        # NB: docxToMarkdown TrimSpaces each block (docx.go:90-96), so
        # the ilvl indent built at docx.go:167 is always stripped —
        # reference quirk preserved.
        assert r.text == ("# Main Title\n\n## Section\n\n"
                          "Plain paragraph.\n\n- item one\n\n- nested")

    def test_list_marker_requires_numid(self):
        # numId "0" means not-a-list (docx.go:160); ilvl "0" no indent
        b = officegen.make_docx([
            {"text": "not a list", "num": "0"},
            {"text": "flat item", "num": "5", "ilvl": "0"},
        ])
        r = office.extract_docx(b, "m")
        assert r.text == "not a list\n\n- flat item"

    def test_table(self):
        b = officegen.make_docx(
            [{"text": "Intro"}],
            table=[["h1", "h2"], ["a", "b"]],
        )
        r = office.extract_docx(b, "m")
        assert r.text == ("Intro\n\n| h1 | h2 |\n| --- | --- |\n"
                          "| a | b |")

    def test_metadata_frontmatter(self):
        b = officegen.make_docx([{"text": "Body"}], title="T", author="A")
        r = office.extract_docx(b, "m")
        assert r.text == "---\ntitle: T\nauthor: A\n---\n\nBody"
        assert r.metadata == {"title": "T", "author": "A"}

    def test_not_a_zip(self):
        r = office.extract_docx(b"nope", "m")
        assert not r.success

    def test_missing_document_xml(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("other.xml", "<x/>")
        r = office.extract_docx(buf.getvalue(), "m")
        assert not r.success
        assert r.error == "missing word/document.xml"

    def test_zip_entry_limit(self):
        # zip_limits_test.go parity: oversized uncompressed entry
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("word/document.xml", "x" * 100)
        zf2 = zipfile.ZipFile(io.BytesIO(buf.getvalue()))
        with pytest.raises(office.ZipEntryError, match="exceeds 0MB"):
            office.read_zip_file(zf2, "word/document.xml", 50)
        # under the limit passes
        assert office.read_zip_file(zf2, "word/document.xml", 200)


class TestXLSX:
    def test_sheets_tables(self):
        b = officegen.make_xlsx({
            "Data": [["h1", "h2"], ["1", "x|y"]],
            "Empty": [["", ""]],
        })
        r = office.extract_xlsx(b, "m")
        # xlsx.go:77-85 never TrimSpaces the joined text → trailing \n
        assert r.text == ("## Sheet: Data\n\n"
                          "| h1 | h2 |\n| --- | --- |\n| 1 | x\\|y |\n")
        assert r.metadata == {"sheets": "2", "totalRows": "2"}

    def test_empty_workbook(self):
        b = officegen.make_xlsx({"S": [[""]]})
        r = office.extract_xlsx(b, "m")
        assert r.text == "(empty workbook)"

    def test_row_cap_1001(self):
        rows = [["h"]] + [[f"r{i}"] for i in range(1100)]
        b = officegen.make_xlsx({"Big": rows})
        r = office.extract_xlsx(b, "m")
        assert r.text.endswith("... truncated to first 1000 data rows\n")
        assert "r999" in r.text and "r1000" not in r.text


class TestPPTX:
    def test_slides_and_notes(self):
        b = officegen.make_pptx(
            [["Slide one title", "bullet text"], ["Second slide"]],
            notes={1: "remember this"},
        )
        r = office.extract_pptx(b, "m")
        # slides metadata always present → degenerate frontmatter block
        # (pptx.go:91-93 quirk preserved)
        assert r.text == (
            "---\n---\n\n"
            "## Slide 1\n\nSlide one title\n\nbullet text\n\n"
            "> **Speaker Notes:**\n> remember this"
            "\n\n---\n\n## Slide 2\n\nSecond slide"
        )
        assert r.metadata["slides"] == "2"

    def test_slide10_sorts_before_slide2(self):
        # lexicographic ordering quirk (pptx.go:51): slide10 < slide2,
        # and notes attach by POSITION not filename.
        slides = [[f"content {i}"] for i in range(1, 11)]
        b = officegen.make_pptx(slides)
        r = office.extract_pptx(b, "m")
        # sorted file order: slide1, slide10, slide2, ... → the section
        # labeled "Slide 2" carries slide10.xml's content.
        assert "## Slide 2\n\ncontent 10" in r.text
        assert "## Slide 3\n\ncontent 2" in r.text


class TestODF:
    def test_blocks(self):
        b = officegen.make_odt([
            {"type": "h", "text": "Head", "level": 2},
            {"type": "p", "text": "Para text."},
            {"type": "list", "items": ["a", "b"]},
            {"type": "table", "rows": [["c1", "c2"], ["v1", "v2"]]},
        ], title="Doc", author="Au")
        r = office.extract_opendocument(b, "m")
        assert r.text == (
            "---\ntitle: Doc\nauthor: Au\n---\n\n"
            "## Head\n\nPara text.\n\n- a\n- b\n\n"
            "| c1 | c2 |\n| --- | --- |\n| v1 | v2 |"
        )

    def test_missing_content(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("mimetype", "application/vnd.oasis...")
        r = office.extract_opendocument(buf.getvalue(), "m")
        assert not r.success
        assert r.error == "content.xml not found"


class TestEPUB:
    def test_chapters_via_spine(self):
        b = officegen.make_epub(
            ["<h1>Chapter One</h1><p>First text.</p>",
             "<p>Second chapter body.</p>"],
            title="Book", author="Writer",
        )
        r = office.extract_epub(b, "m")
        assert r.text == (
            "---\ntitle: Book\nauthor: Writer\n---\n\n"
            "## Chapter 1\n\n# Chapter One\n\nFirst text.\n\n---\n\n"
            "## Chapter 2\n\nSecond chapter body."
        )
        assert r.metadata == {"title": "Book", "author": "Writer"}

    def test_entities_and_lists(self):
        b = officegen.make_epub(["<ul><li>a &amp; b</li></ul>"])
        r = office.extract_epub(b, "m")
        assert "- a & b" in r.text


class TestRouterIntegration:
    def test_docx_by_extension(self):
        b = officegen.make_docx([{"text": "hello from docx"}])
        res, fmt = router.extract_document("https://x.test/f.docx", b)
        assert fmt == "docx"
        assert res.success
        assert res.text == "hello from docx"

    def test_all_container_formats_route(self):
        cases = {
            "f.xlsx": ("xlsx", officegen.make_xlsx({"S": [["v"]]})),
            "f.pptx": ("pptx", officegen.make_pptx([["t"]])),
            "f.odt": ("opendocument",
                      officegen.make_odt([{"type": "p", "text": "x"}])),
            "f.epub": ("epub", officegen.make_epub(["<p>x</p>"])),
        }
        for name, (want_fmt, payload) in cases.items():
            res, fmt = router.extract_document(f"https://x.test/{name}",
                                               payload)
            assert fmt == want_fmt, name
            assert res.success, (name, res.error)

    def test_legacy_office_native_kernel(self):
        # since round 3 legacy Office extracts NATIVELY via the CFB
        # kernel; a broken container is a per-row failure, not an
        # unsupported_media code
        res, fmt = router.extract_document("https://x.test/f.doc",
                                           b"\xd0\xcf\x11\xe0old-doc")
        assert fmt == "legacy_office"
        assert not res.success and res.error
        from pdf_to_text_extraction_service_spark.sources import (
            legacygen,
        )
        res2, fmt2 = router.extract_document(
            "https://x.test/f.doc", legacygen.build_doc(["works"]))
        assert fmt2 == "legacy_office" and res2.success
        assert res2.text == "works"
