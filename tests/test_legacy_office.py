"""Legacy binary Office kernel: CFB container reader + .doc piece
table + .xls BIFF8 + .ppt text atoms (reference converts these via
LibreOffice — office/legacy.go:38-59; the engine parses natively)."""

from __future__ import annotations

import struct

import pytest

from pdf_to_text_extraction_service_spark.kernel import legacy, router
from pdf_to_text_extraction_service_spark.kernel.cfb import CFB, CFBError
from pdf_to_text_extraction_service_spark.sources import legacygen


class TestCFB:
    def test_mini_and_big_streams_round_trip(self):
        small = b"tiny stream body"
        big = b"B" * 5000
        blob = legacygen.build_cfb([("Small", small), ("Big", big)])
        c = CFB(blob)
        assert c.stream("Small") == small
        assert c.stream("Big") == big

    def test_many_mini_streams(self):
        streams = [(f"S{i}", bytes([65 + i]) * (i * 37 + 1))
                   for i in range(20)]
        c = CFB(legacygen.build_cfb(streams))
        for name, body in streams:
            assert c.stream(name) == body

    def test_not_ole(self):
        with pytest.raises(CFBError):
            CFB(b"not an ole file" * 100)

    def test_truncated_container(self):
        blob = legacygen.build_cfb([("S", b"x" * 5000)])
        with pytest.raises(CFBError):
            CFB(blob[:700])

    def test_missing_stream(self):
        c = CFB(legacygen.build_cfb([("S", b"x")]))
        with pytest.raises(CFBError):
            c.stream("Nope")


class TestDoc:
    def test_utf16_pieces(self):
        blob = legacygen.build_doc(["First para.", "Second para."])
        r = legacy.extract_legacy_office(blob, "application/msword")
        assert r.success
        assert r.text == "First para.\nSecond para."
        assert r.file_type == "document/legacy-office"
        assert r.method == "native"
        assert (r.word_count, r.char_count) == (4, 24)

    def test_cp1252_compressed_piece(self):
        blob = legacygen.build_doc(["café déjà vu"], compressed=True)
        r = legacy.extract_legacy_office(blob, "application/msword")
        assert r.success and r.text == "café déjà vu"

    def test_control_chars_mapped(self):
        # cell mark -> tab, vertical tab -> newline; a field with no
        # separator has no cached result, so it renders as nothing
        # (soffice behavior — see TestDocFieldsAndTables for the
        # result-keeping cases)
        blob = legacygen.build_doc(["a\x07b\x0bc\x13d\x15e"])
        r = legacy.extract_legacy_office(blob, "application/msword")
        assert r.text == "a\tb\nce"

    def test_corrupt_fib_fails_cleanly(self):
        blob = bytearray(legacygen.build_doc(["x"]))
        c = CFB(bytes(blob))
        assert "WordDocument" in c.streams
        # zero the FIB ident inside the container body
        ident = struct.pack("<H", 0xA5EC)
        i = bytes(blob).find(ident)
        blob[i:i + 2] = b"\x00\x00"
        r = legacy.extract_legacy_office(bytes(blob),
                                         "application/msword")
        assert not r.success and "FIB" in r.error


class TestXls:
    def test_cells_markdown(self):
        blob = legacygen.build_xls(
            "Data", [["name", "score"], ["alice", 91.5], ["bob", 7]])
        r = legacy.extract_legacy_office(blob,
                                         "application/vnd.ms-excel")
        assert r.success
        assert r.text == (
            "## Sheet: Data\n\n"
            "| name | score |\n"
            "| --- | --- |\n"
            "| alice | 91.5 |\n"
            "| bob | 7 |"
        )

    def test_rk_and_mulrk_records(self):
        # hand-build a sheet with RK (int, x100 frac, float) + MulRk
        def rk_int(v):
            return ((v & 0x3FFFFFFF) << 2) | 0x02

        def rk_float(v):
            (bits,) = struct.unpack("<Q", struct.pack("<d", v))
            return (bits >> 32) & ~0x03

        sheet = bytearray(legacygen._bof(0x0010))
        sheet += legacygen._rec(0x027E, struct.pack(
            "<HHHI", 0, 0, 0, rk_int(42)))
        sheet += legacygen._rec(0x027E, struct.pack(
            "<HHHI", 0, 1, 0, rk_int(250) | 0x01))  # 2.5 via /100
        mul = struct.pack("<HH", 1, 0)
        mul += struct.pack("<HI", 0, rk_float(1.25))
        mul += struct.pack("<HI", 0, rk_int(9))
        mul += struct.pack("<H", 1)
        sheet += legacygen._rec(0x00BD, mul)
        sheet += legacygen._rec(0x000A, b"")
        name = "S".encode("utf-16-le")
        glb = bytearray(legacygen._bof(0x0005))
        glb += legacygen._rec(
            0x0085, struct.pack("<IHBB", 0, 0, 1, 0x01) + name)
        glb += legacygen._rec(0x000A, b"")
        blob = legacygen.build_cfb([("Workbook", bytes(glb + sheet))])
        r = legacy.extract_legacy_office(blob,
                                         "application/vnd.ms-excel")
        assert r.success
        assert "| 42 | 2.5 |" in r.text
        assert "| 1.25 | 9 |" in r.text

    def test_sst_continue_record(self):
        # SST split across a Continue record mid-string, fresh grbit
        s1, s2 = "alpha", "betagamma"
        sst_body = struct.pack("<II", 2, 2)
        sst_body += struct.pack("<HB", len(s1), 0x01) \
            + s1.encode("utf-16-le")
        sst_body += struct.pack("<HB", len(s2), 0x01) \
            + s2[:4].encode("utf-16-le")
        cont = bytes([0x01]) + s2[4:].encode("utf-16-le")
        sheet = bytearray(legacygen._bof(0x0010))
        sheet += legacygen._rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0))
        sheet += legacygen._rec(0x00FD, struct.pack("<HHHI", 0, 1, 0, 1))
        sheet += legacygen._rec(0x000A, b"")
        name = "S".encode("utf-16-le")
        glb = bytearray(legacygen._bof(0x0005))
        glb += legacygen._rec(
            0x0085, struct.pack("<IHBB", 0, 0, 1, 0x01) + name)
        glb += legacygen._rec(0x00FC, sst_body)
        glb += legacygen._rec(0x003C, cont)
        glb += legacygen._rec(0x000A, b"")
        blob = legacygen.build_cfb([("Workbook", bytes(glb + sheet))])
        r = legacy.extract_legacy_office(blob,
                                         "application/vnd.ms-excel")
        assert r.success
        assert "alpha" in r.text and "betagamma" in r.text


class TestPpt:
    def test_slides(self):
        blob = legacygen.build_ppt(
            [["Title", "Sub"], ["Body text here"]])
        r = legacy.extract_legacy_office(
            blob, "application/vnd.ms-powerpoint")
        assert r.success
        assert r.text == "Title\n\nSub\n\nBody text here"

    def test_bytes_atom(self):
        body = "latin-1 tëxt".encode("cp1252")
        inner = struct.pack("<HHI", 0, 0x0FA8, len(body)) + body
        doc = struct.pack("<HHI", 0x000F, 0x03EE, len(inner)) + inner
        blob = legacygen.build_cfb([("PowerPoint Document", doc)])
        r = legacy.extract_legacy_office(
            blob, "application/vnd.ms-powerpoint")
        assert r.success and r.text == "latin-1 tëxt"


class TestRouterIntegration:
    def test_extension_routing(self):
        blob = legacygen.build_doc(["Routed by extension."])
        res, kernel = router.extract_document(
            "https://x.test/files/report.doc", blob)
        assert kernel == "legacy_office"
        assert res.success and res.text == "Routed by extension."
        assert res.file_type == "document/legacy-office"

    def test_sniff_routing_without_extension(self):
        for build, frag in [
            (lambda: legacygen.build_doc(["sniffed doc"]), "sniffed doc"),
            (lambda: legacygen.build_xls("S", [["cell"]]), "cell"),
            (lambda: legacygen.build_ppt([["slide"]]), "slide"),
        ]:
            res, kernel = router.extract_document(
                "https://x.test/download", build())
            assert kernel == "legacy_office", res.error
            assert res.success and frag in res.text

    def test_garbage_ole_is_failure_row(self):
        blob = bytearray(legacygen.build_doc(["x"]))
        blob[512:600] = b"\xff" * 88  # corrupt FAT
        res, kernel = router.extract_document(
            "https://x.test/f.doc", bytes(blob))
        assert not res.success and res.error


class TestWord95:
    def test_word95_no_clx(self):
        # Word95-era FIB (nFib < 101): text = [fcMin, fcMac) slice
        text = "Old Word six text.\r"
        raw = text.encode("cp1252")
        fc_min = 0x200
        word = bytearray(fc_min)
        struct.pack_into("<H", word, 0, 0xA5EC)
        struct.pack_into("<H", word, 2, 100)  # nFib pre-97
        struct.pack_into("<I", word, 0x18, fc_min)
        struct.pack_into("<I", word, 0x1C, fc_min + len(raw))
        word += raw
        blob = legacygen.build_cfb([("WordDocument", bytes(word))])
        r = legacy.extract_legacy_office(blob, "application/msword")
        assert r.success and r.text == "Old Word six text."

    def test_word95_bad_range_fails_cleanly(self):
        word = bytearray(0x40)
        struct.pack_into("<H", word, 0, 0xA5EC)
        struct.pack_into("<H", word, 2, 100)
        struct.pack_into("<I", word, 0x18, 0x9999)
        struct.pack_into("<I", word, 0x1C, 0x10)
        blob = legacygen.build_cfb([("WordDocument", bytes(word))])
        r = legacy.extract_legacy_office(blob, "application/msword")
        assert not r.success


class TestLegacyFuzz:
    def test_mutation_fuzz_never_raises_through_router(self):
        import random
        rng = random.Random(77)
        bases = [
            legacygen.build_doc(["fuzz doc body here"]),
            legacygen.build_xls("S", [["a", "b"], ["c", 1.25]]),
            legacygen.build_ppt([["frame one", "frame two"]]),
        ]
        for base in bases:
            for _ in range(60):
                blob = bytearray(base)
                for _ in range(rng.randint(1, 16)):
                    blob[rng.randrange(len(blob))] = rng.randrange(256)
                res, _ = router.extract_document(
                    "https://x.test/f.doc", bytes(blob))
                assert res.success in (True, False)

    def test_truncation_fuzz(self):
        base = legacygen.build_doc(["truncation fuzz body"])
        for frac in (0.1, 0.3, 0.5, 0.7, 0.9, 0.98):
            cut = base[:int(len(base) * frac)]
            res, _ = router.extract_document("https://x.test/f.doc",
                                             cut)
            assert res.success in (True, False)


def test_ppt_cstring_atom():
    body = "Deck title".encode("utf-16-le")
    inner = struct.pack("<HHI", 0, 0x0FBA, len(body)) + body
    doc = struct.pack("<HHI", 0x000F, 0x03EE, len(inner)) + inner
    blob = legacygen.build_cfb([("PowerPoint Document", doc)])
    r = legacy.extract_legacy_office(blob,
                                     "application/vnd.ms-powerpoint")
    assert r.success and r.text == "Deck title"


def test_cfb_v4_sector_layout():
    # v4 (4096-byte sectors, header padded to a full sector) — the
    # sector-offset formula is (sid + 1) << shift, not 512 + sid*ssz
    small, big = b"mini body", b"B" * 9000
    blob = legacygen.build_cfb([("Small", small), ("Big", big)],
                               sector_size=4096)
    c = CFB(blob)
    assert c.ssz == 4096
    assert c.stream("Small") == small and c.stream("Big") == big
    # and a full .doc built into a v4 container extracts
    import re
    v3 = legacygen.build_doc(["v4 container text"])
    streams = [(n, b) for n, b in CFB(v3).streams.items()]
    v4 = legacygen.build_cfb(streams, sector_size=4096)
    r = legacy.extract_legacy_office(v4, "application/msword")
    assert r.success and r.text == "v4 container text"


class TestReviewRegressions:
    def test_parentheses_preserved_in_doc_text(self):
        blob = legacygen.build_doc(["f(x) = y(2) and (parens)."])
        r = legacy.extract_legacy_office(blob, "application/msword")
        assert r.success and r.text == "f(x) = y(2) and (parens)."

    def test_sst_odd_length_terminates(self):
        # odd body length in the SST string area must not hang the
        # parser (regression: take==0 looped forever)
        s1 = "alpha"
        sst_body = struct.pack("<II", 2, 2)
        sst_body += struct.pack("<HB", len(s1), 0x01) \
            + s1.encode("utf-16-le")
        # second string claims 4 chars but segment carries 3 bytes
        sst_body += struct.pack("<HB", 4, 0x01) + b"\x41\x00\x42"
        cont = bytes([0x01]) + "cd".encode("utf-16-le")
        glb = bytearray(legacygen._bof(0x0005))
        name = "S".encode("utf-16-le")
        glb += legacygen._rec(
            0x0085, struct.pack("<IHBB", 0, 0, 1, 0x01) + name)
        glb += legacygen._rec(0x00FC, bytes(sst_body))
        glb += legacygen._rec(0x003C, cont)
        glb += legacygen._rec(0x000A, b"")
        sheet = bytearray(legacygen._bof(0x0010))
        sheet += legacygen._rec(0x000A, b"")
        blob = legacygen.build_cfb([("Workbook", bytes(glb + sheet))])
        r = legacy.extract_legacy_office(blob,
                                         "application/vnd.ms-excel")
        assert r.success in (True, False)  # terminated is the point


class TestOLE2SniffDirectoryPeek:
    """ADVICE r3: OLE2 type must resolve from TOP-LEVEL directory
    entries, not a whole-payload UTF-16LE substring scan."""

    def test_xls_with_embedded_word_marker_sniffs_excel(self):
        from pdf_to_text_extraction_service_spark.kernel import sniff

        # plant an embedded-object marker (the bytes an MBD storage's
        # WordDocument entry would contribute) INSIDE the Workbook
        # stream body — the old substring scan mislabeled this msword
        marker = "WordDocument".encode("utf-16-le")
        glb = bytearray(legacygen._bof(0x0005))
        glb += legacygen._rec(0x00FC, struct.pack("<II", 0, 0))
        glb += legacygen._rec(0x000A, b"")
        body = bytes(glb) + marker + b"\x00" * 64
        blob = legacygen.build_cfb([("Workbook", body)])
        assert sniff.sniff_mime(blob) == "application/vnd.ms-excel"

    def test_plain_legacy_types_still_resolve(self):
        from pdf_to_text_extraction_service_spark.kernel import sniff

        assert sniff.sniff_mime(legacygen.build_doc(["hello doc"])) \
            == "application/msword"
        assert sniff.sniff_mime(
            legacygen.build_xls("S", [["a"]])) \
            == "application/vnd.ms-excel"
        assert sniff.sniff_mime(legacygen.build_ppt([["t"]])) \
            == "application/vnd.ms-powerpoint"

    def test_corrupt_directory_degrades_to_substring_scan(self):
        from pdf_to_text_extraction_service_spark.kernel import sniff

        blob = bytearray(legacygen.build_doc(["x"]))
        # wreck the directory start sector pointer
        struct.pack_into("<I", blob, 48, 0xFFFFFFF0)
        assert sniff.sniff_mime(bytes(blob)) == "application/msword"

    def test_unknown_ole_storage(self):
        from pdf_to_text_extraction_service_spark.kernel import sniff

        blob = legacygen.build_cfb([("SomeCustomStream", b"\x01" * 80)])
        assert sniff.sniff_mime(blob) == "application/x-ole-storage"


class TestMalformedRecordBounds:
    """ADVICE r3: malformed record bodies must surface as failure
    Results (CFBError contract), never struct.error/IndexError."""

    def test_mulrk_corrupt_col_last(self):
        glb = bytearray(legacygen._bof(0x0005))
        glb += legacygen._rec(0x0085, struct.pack(
            "<IHBB", 0, 0, 1, 0x01) + "S".encode("utf-16-le"))
        glb += legacygen._rec(0x00FC, struct.pack("<II", 0, 0))
        glb += legacygen._rec(0x000A, b"")
        sheet = bytearray(legacygen._bof(0x0010))
        # MulRk claiming colLast=500 with body room for ONE rk field
        body = struct.pack("<HH", 0, 0) + struct.pack(
            "<HI", 0, 0x0000003C) + struct.pack("<H", 500)
        sheet += legacygen._rec(0x00BD, body)
        sheet += legacygen._rec(0x000A, b"")
        blob = legacygen.build_cfb([("Workbook", bytes(glb + sheet))])
        r = legacy.extract_legacy_office(blob,
                                         "application/vnd.ms-excel")
        assert r.success  # clamped, one cell parsed, no raise

    def test_truncated_pcdt_header(self):
        # CLX ends right after the 0x02 Pcdt marker: the lcbPlcPcd
        # u32 would read past the end
        blob = legacygen.build_doc(["seed text"])
        container = legacy.CFB(blob)
        word = bytearray(container.streams["WordDocument"])
        table_name = "1Table" if "1Table" in container.streams \
            else "0Table"
        fc_clx = struct.unpack_from("<I", word, 0x01A2)[0]
        # shrink lcbClx so the slice ends 2 bytes after the marker
        struct.pack_into("<I", word, 0x01A6, 3)
        table = container.streams[table_name]
        patched = bytearray(table)
        patched[fc_clx] = 0x02  # make first byte the Pcdt marker
        rebuilt = legacygen.build_cfb(
            [("WordDocument", bytes(word)),
             (table_name, bytes(patched))])
        r = legacy.extract_legacy_office(rebuilt,
                                         "application/msword")
        # Word95 fallback may still salvage text; the point is no raise
        assert r.success in (True, False)


class TestDocFieldsAndTables:
    """VERDICT r3 #3: field instruction text must be dropped (only
    the cached RESULT renders) and 0x07 cell/row marks must shape
    tab-separated rows, matching the soffice text conversion shape."""

    def test_hyperlink_field_renders_result_only(self):
        para = ("Visit \x13HYPERLINK \"https://x.test\"\x14the site\x15"
                " today.")
        blob = legacygen.build_doc([para])
        r = legacy.extract_legacy_office(blob, "application/msword")
        assert r.success
        assert r.text == "Visit the site today."
        assert "HYPERLINK" not in r.text

    def test_field_without_separator_vanishes(self):
        blob = legacygen.build_doc(["Page \x13PAGE\x15 end."])
        r = legacy.extract_legacy_office(blob, "application/msword")
        assert r.text == "Page  end."

    def test_nested_field_inside_instruction_suppressed(self):
        para = ("A\x13IF \x13REF x\x14inner\x15 > 1\x14shown\x15B")
        blob = legacygen.build_doc([para])
        r = legacy.extract_legacy_office(blob, "application/msword")
        assert r.text == "AshownB"

    def test_table_cells_tabs_rows_newlines(self):
        para = "name\x07qty\x07\x07apples\x073\x07\x07after table"
        blob = legacygen.build_doc([para])
        r = legacy.extract_legacy_office(blob, "application/msword")
        assert r.text == "name\tqty\napples\t3\nafter table"


class TestXlsFormulaRecords:
    """VERDICT r3 #3: FORMULA cached results — numeric, string (via
    the following STRING record), boolean, and error codes."""

    def test_cached_kinds_render(self):
        rows = [
            ["label", legacygen.Formula(6.5)],
            [legacygen.Formula("cached text"), legacygen.Formula(True)],
            [legacygen.Formula(False), None],
        ]
        blob = legacygen.build_xls("S1", rows)
        r = legacy.extract_legacy_office(blob,
                                         "application/vnd.ms-excel")
        assert r.success
        assert "6.5" in r.text
        assert "cached text" in r.text
        assert "TRUE" in r.text and "FALSE" in r.text

    def test_error_code_renders(self):
        glb_and_sheet = legacygen.build_xls("S", [["x"]])
        # build manually with an error formula
        import struct as st

        sheet = bytearray(legacygen._bof(0x0010))
        sheet += legacygen._error_formula_recs(0, 0, 0x07)
        sheet += legacygen._rec(0x000A, b"")
        name = "S".encode("utf-16-le")
        glb = bytearray(legacygen._bof(0x0005))
        glb += legacygen._rec(0x0085, st.pack("<IHBB", 0, 0, 1, 0x01) + name)
        glb += legacygen._rec(0x00FC, st.pack("<II", 0, 0))
        glb += legacygen._rec(0x000A, b"")
        blob = legacygen.build_cfb([("Workbook", bytes(glb + sheet))])
        r = legacy.extract_legacy_office(blob,
                                         "application/vnd.ms-excel")
        assert r.success and "#DIV/0!" in r.text

    def test_formula_number_matches_number_record(self):
        a = legacy.extract_legacy_office(
            legacygen.build_xls("S", [[legacygen.Formula(42.0)]]),
            "application/vnd.ms-excel")
        b = legacy.extract_legacy_office(
            legacygen.build_xls("S", [[42.0]]),
            "application/vnd.ms-excel")
        assert a.success and a.text == b.text

    def test_orphan_string_record_ignored(self):
        import struct as st

        sheet = bytearray(legacygen._bof(0x0010))
        # STRING with no preceding FORMULA must be ignored
        sheet += legacygen._rec(0x0207, st.pack("<HB", 4, 0x00) + b"junk")
        sheet += legacygen._rec(0x000A, b"")
        name = "S".encode("utf-16-le")
        glb = bytearray(legacygen._bof(0x0005))
        glb += legacygen._rec(0x0085, st.pack("<IHBB", 0, 0, 1, 0x01) + name)
        glb += legacygen._rec(0x00FC, st.pack("<II", 0, 0))
        glb += legacygen._rec(0x000A, b"")
        blob = legacygen.build_cfb([("Workbook", bytes(glb + sheet))])
        r = legacy.extract_legacy_office(blob,
                                         "application/vnd.ms-excel")
        assert r.success in (True, False)
        assert "junk" not in (r.text or "")


class TestReviewRound4:
    """Round-4 self-review fixes (empty cells, STRING continuations)."""

    def test_trailing_empty_cell_no_stray_tab(self):
        blob = legacygen.build_doc(["a\x07\x07\x07"])
        r = legacy.extract_legacy_office(blob, "application/msword")
        assert r.text == "a"  # trim_space strips the \t\n tail
        blob2 = legacygen.build_doc(["a\x07\x07\x07b\x07\x07"])
        r2 = legacy.extract_legacy_office(blob2, "application/msword")
        assert r2.text == "a\t\nb"

    def test_formula_string_continuation_records(self):
        import struct as st

        long_text = "x" * 40
        # STRING carries the first 10 chars; a Continue carries the rest
        sheet = bytearray(legacygen._bof(0x0010))
        num = bytes([0, 0, 0, 0, 0, 0, 0xFF, 0xFF])
        sheet += legacygen._rec(
            0x0006, st.pack("<HHH", 0, 0, 0) + num + st.pack("<HIH", 0, 0, 0))
        sheet += legacygen._rec(
            0x0207, st.pack("<HB", 40, 0x01)
            + long_text[:10].encode("utf-16-le"))
        sheet += legacygen._rec(
            0x003C, bytes([0x01]) + long_text[10:].encode("utf-16-le"))
        sheet += legacygen._rec(0x000A, b"")
        name = "S".encode("utf-16-le")
        glb = bytearray(legacygen._bof(0x0005))
        glb += legacygen._rec(0x0085, st.pack("<IHBB", 0, 0, 1, 0x01) + name)
        glb += legacygen._rec(0x00FC, st.pack("<II", 0, 0))
        glb += legacygen._rec(0x000A, b"")
        blob = legacygen.build_cfb([("Workbook", bytes(glb + sheet))])
        r = legacy.extract_legacy_office(blob, "application/vnd.ms-excel")
        assert r.success and long_text in r.text
