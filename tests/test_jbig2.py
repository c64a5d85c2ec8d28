"""JBIG2 decoder (kernel/jbig2.py).

The reference routes scanned PDFs through poppler + OCR escalation
(internal/extractor/poppler.go:112-121); this engine decodes the
JBIG2 payloads itself — MQ arithmetic coder per T.88 Annex E,
generic regions (template 0, TPGDON, MMR via kernel/ccitt.py), and
the symbol-coding path real encoders emit (arithmetic symbol
dictionaries + text regions) — so the pixel-driven blank-page
pruning covers both scanned-PDF codecs in their production shapes.
"""

import numpy as np
import pytest

from pdf_to_text_extraction_service_spark.kernel import jbig2


def test_mq_coder_round_trip_bits():
    rng = np.random.default_rng(7)
    for trial in range(25):
        n = int(rng.integers(1, 3000))
        bits = (rng.random(n) < rng.random()).astype(int)
        ctxi = rng.integers(0, 16, n)
        enc = jbig2.MQEncoder()
        cxs = [[0, 0] for _ in range(16)]
        for b, ci in zip(bits, ctxi):
            enc.encode(cxs[ci], int(b))
        data = enc.flush()
        dec = jbig2.MQDecoder(data)
        cxs2 = [[0, 0] for _ in range(16)]
        out = [dec.decode(cxs2[ci]) for ci in ctxi]
        assert out == list(bits), (trial, n)


@pytest.mark.parametrize("tpgdon", [False, True])
def test_generic_region_round_trip(tpgdon):
    rng = np.random.default_rng(11)
    for trial in range(10):
        h = int(rng.integers(1, 26))
        w = int(rng.integers(1, 40))
        kind = trial % 3
        if kind == 0:
            img = rng.random((h, w)) < rng.random()
        elif kind == 1:
            img = np.zeros((h, w), bool)
            img[: h // 2] = True          # typical rows for TPGDON
        else:
            img = np.ones((h, w), bool)
        enc = jbig2.encode_generic_region(img, tpgdon=tpgdon)
        dec = jbig2.decode_generic_region(enc, w, h, tpgdon=tpgdon)
        assert np.array_equal(dec, img), (trial, kind)


@pytest.mark.parametrize("kwargs", [{"mmr": True}, {"mmr": False},
                                    {"tpgdon": True}])
def test_embedded_stream_round_trip(kwargs):
    rng = np.random.default_rng(13)
    for trial in range(6):
        h = int(rng.integers(2, 24))
        w = int(rng.integers(2, 40))
        img = rng.random((h, w)) < 0.3
        page = jbig2.decode_embedded(jbig2.build_embedded(img, **kwargs))
        assert np.array_equal(page, img)


def test_unsupported_segments_raise():
    import struct

    # refinement/aggregate symbol dictionary (flags bit 1) is out of
    # subset (huffman — bit 0 — is IN subset since r7)
    blob = jbig2._segment(0, 0, struct.pack(">H", 2) + b"\x00" * 16)
    with pytest.raises(ValueError, match="refinement"):
        jbig2.decode_embedded(blob)
    # halftone region
    blob = jbig2._segment(0, 20, b"\x00" * 20)
    with pytest.raises(ValueError, match="halftone"):
        jbig2.decode_embedded(blob)
    # garbage symbol dictionary payload fails as a ValueError too
    blob = jbig2._segment(0, 0, b"abcd")
    with pytest.raises(ValueError):
        jbig2.decode_embedded(blob)
    with pytest.raises(ValueError):
        jbig2.decode_embedded(b"")        # no page info
    # region before page info
    img = np.zeros((2, 2), bool)
    stream = jbig2.build_embedded(img, mmr=True)
    # strip the leading page-info segment (11-byte header + 19 bytes)
    with pytest.raises(ValueError):
        jbig2.decode_embedded(stream[11 + 19:])


def test_mutation_fuzz_valueerror_only():
    rng = np.random.default_rng(17)
    img = rng.random((10, 30)) < 0.4
    g = np.ones((2, 2), dtype=bool)
    bases = [bytearray(jbig2.build_embedded(img, mmr=m))
             for m in (False, True)]
    bases.append(bytearray(jbig2.build_embedded_text(
        10, 6, [g], [(0, 0, 0), (4, 2, 0)])))
    for trial in range(300):
        for base in bases:
            data = bytearray(base)
            for _ in range(int(rng.integers(1, 5))):
                op = rng.integers(0, 3)
                if op == 0 and len(data) > 1:
                    del data[int(rng.integers(0, len(data)))]
                elif op == 1:
                    data.insert(int(rng.integers(0, len(data) + 1)),
                                int(rng.integers(0, 256)))
                else:
                    data[int(rng.integers(0, len(data)))] = \
                        int(rng.integers(0, 256))
            try:
                jbig2.decode_embedded(bytes(data))
            except ValueError:
                pass


def test_pdf_jbig2_xobject_and_blank_pruning():
    from pdf_to_text_extraction_service_spark.kernel import pdfk
    from pdf_to_text_extraction_service_spark.sources import pdfgen

    h, w, k = 12, 20, 4
    img = np.zeros((h, w), bool)
    img[:k] = True
    for mmr in (True, False):
        blob = jbig2.build_embedded(img, mmr=mmr)
        head = (b"/Width %d /Height %d /BitsPerComponent 1 "
                b"/ColorSpace /DeviceGray /Filter /JBIG2Decode"
                % (w, h))
        pdf = pdfgen.build_pdf_jpeg_pages([([], [(head, blob)])])
        doc = pdfk.PDFDoc(pdf)
        st = doc.page_image_stats(1)
        assert st == {"n_images": 1, "n_decoded": 1, "pixels": h * w,
                      "n_samples": h * w, "ink_samples": k * w,
                      "sum_luma": (h - k) * w * 255}
        assert pdfk.extract_pdf(pdf, "application/pdf",
                                doc=doc).pages[0].method == "needs-ocr"
    blank = jbig2.build_embedded(np.zeros((h, w), bool), mmr=True)
    pdf = pdfgen.build_pdf_jpeg_pages([
        ([], [(b"/Width %d /Height %d /BitsPerComponent 1 "
               b"/ColorSpace /DeviceGray /Filter /JBIG2Decode"
               % (w, h), blank)])])
    doc = pdfk.PDFDoc(pdf)
    assert pdfk.extract_pdf(pdf, "application/pdf",
                            doc=doc).pages[0].method == "blank"
    # symbol-coded payload degrades to a size-only needs-ocr entry
    bad = (b"\x00\x00\x00\x00\x00\x00\x01\x00\x00\x00\x04abcd")
    pdf = pdfgen.build_pdf_jpeg_pages([
        ([], [(b"/Width 8 /Height 8 /BitsPerComponent 1 "
               b"/ColorSpace /DeviceGray /Filter /JBIG2Decode", bad)])])
    doc = pdfk.PDFDoc(pdf)
    st = doc.page_image_stats(1)
    assert st["n_images"] == 1 and st["n_decoded"] == 0
    assert pdfk.extract_pdf(pdf, "application/pdf",
                            doc=doc).pages[0].method == "needs-ocr"


def test_ia_integer_procedures_round_trip():
    """IAx buckets (2/4/6/8/12/32-bit) + OOB + sign, interleaved
    across procedures on one MQ stream."""
    from pdf_to_text_extraction_service_spark.kernel.jbig2 import (
        OOB,
        MQDecoder,
        MQEncoder,
        _IntCtx,
        _ia_decode,
        _ia_encode,
    )

    values = [0, 1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436,
              100000, -1, -5, -340, OOB, 2, OOB, -4436]
    enc = MQEncoder()
    ca, cb = _IntCtx(), _IntCtx()
    for i, v in enumerate(values):
        _ia_encode(enc, ca if i % 2 else cb, v)
    dec = MQDecoder(enc.flush())
    ca2, cb2 = _IntCtx(), _IntCtx()
    for i, v in enumerate(values):
        got = _ia_decode(dec, ca2 if i % 2 else cb2)
        assert got is v if v is OOB else got == v, (i, v, got)


def test_symbol_dictionary_round_trip():
    rng = np.random.default_rng(23)
    syms = []
    for h in (2, 2, 3, 5):
        w = int(rng.integers(1, 7))
        syms.append(rng.random((h, w)) < 0.5)
    sd = jbig2.encode_symbol_dict(syms)
    out = jbig2._decode_symbol_dict(sd, [])
    assert len(out) == len(syms)
    for a, b in zip(out, syms):
        assert np.array_equal(a, b)
    with pytest.raises(ValueError, match="height-sorted"):
        jbig2.encode_symbol_dict(list(reversed(syms)))


def test_symbol_text_page_round_trip():
    """Full jbig2enc-shaped stream: dictionary + text region with
    repeated glyph placements, multiple rows, overlap clipping."""
    g_o = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]], dtype=bool)
    g_l = np.array([[1, 0], [1, 0], [1, 1]], dtype=bool)
    g_dot = np.array([[1]], dtype=bool)
    syms = [g_dot, g_l, g_o]              # height-sorted 1, 3, 3
    inst = [(0, 0, 2), (4, 0, 1), (7, 0, 2), (11, 0, 0),
            (1, 5, 1), (5, 5, 2), (9, 5, 0), (12, 5, 2),
            (0, 9, 0), (2, 9, 0), (4, 9, 0)]
    w, h = 16, 13
    blob = jbig2.build_embedded_text(w, h, syms, inst)
    page = jbig2.decode_embedded(blob)
    want = np.zeros((h, w), bool)
    for x, y, sid in inst:
        g = syms[sid]
        want[y:y + g.shape[0], x:x + g.shape[1]] |= g
    assert np.array_equal(page, want)


def test_symbol_dict_in_globals_stream():
    """A dictionary carried in /JBIG2Globals feeds a text region in
    the page stream via referred-to segment numbers."""
    import struct

    g = np.array([[1, 1], [1, 1]], dtype=bool)
    syms = [g]
    glob = jbig2._segment(1, 0, jbig2.encode_symbol_dict(syms))
    w, h = 6, 4
    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x00\x00\x00"
    data = jbig2._segment(0, 48, page_info)
    data += jbig2._segment(
        2, 6, jbig2.encode_text_region(w, h, [2], [(1, 1, 0)]),
        refs=(1,))
    page = jbig2.decode_embedded(data, globals_data=glob)
    want = np.zeros((h, w), bool)
    want[1:3, 1:3] = True
    assert np.array_equal(page, want)


def test_pdf_jbig2_symbol_coded_xobject():
    from pdf_to_text_extraction_service_spark.kernel import pdfk
    from pdf_to_text_extraction_service_spark.sources import pdfgen

    g = np.ones((2, 3), dtype=bool)
    blob = jbig2.build_embedded_text(12, 6, [g], [(0, 0, 0), (6, 3, 0)])
    pdf = pdfgen.build_pdf_jpeg_pages([
        ([], [(b"/Width 12 /Height 6 /BitsPerComponent 1 "
               b"/ColorSpace /DeviceGray /Filter /JBIG2Decode",
               blob)])])
    st = pdfk.PDFDoc(pdf).page_image_stats(1)
    assert st["n_decoded"] == 1 and st["ink_samples"] == 12


def test_pdf_jpx_header_dims():
    """JPXDecode stays undecoded but the size-only entry now carries
    the TRUTHFUL JP2/J2K header dimensions, not the dict's claims."""
    from pdf_to_text_extraction_service_spark.kernel import pdfk
    from pdf_to_text_extraction_service_spark.sources import pdfgen

    w2, h2 = 64, 48
    ihdr_body = (h2.to_bytes(4, "big") + w2.to_bytes(4, "big")
                 + (1).to_bytes(2, "big") + bytes([7, 7, 0, 0]))
    ihdr = (8 + len(ihdr_body)).to_bytes(4, "big") + b"ihdr" + ihdr_body
    jp2h = (8 + len(ihdr)).to_bytes(4, "big") + b"jp2h" + ihdr
    payload = b"\x00\x00\x00\x0cjP  \r\n\x87\n" + jp2h
    # dict LIES about the dimensions; the header wins
    pdf = pdfgen.build_pdf_jpeg_pages([
        ([], [(b"/Width 500 /Height 500 /BitsPerComponent 8 "
               b"/ColorSpace /DeviceGray /Filter /JPXDecode",
               payload)])])
    st = pdfk.PDFDoc(pdf).page_image_stats(1)
    assert st["n_images"] == 1 and st["n_decoded"] == 0
    assert st["pixels"] == w2 * h2


def test_halftone_region_round_trip():
    """Pattern dictionary + halftone region (arith and MMR): gray-
    coded bitplanes select ink-density patterns per grid cell."""
    rng = np.random.default_rng(29)
    pats = []
    for k in range(8):                    # 8 patterns → 3 bitplanes
        pt = np.zeros((3, 3), bool)
        pt.flat[:k + 1] = True
        pats.append(pt)
    gray = rng.integers(0, 8, (4, 7))
    for mmr in (False, True):
        blob = jbig2.build_embedded_halftone(21, 12, pats, gray, 3,
                                             mmr=mmr)
        page = jbig2.decode_embedded(blob)
        want = np.zeros((12, 21), bool)
        for m in range(4):
            for n in range(7):
                want[m * 3:(m + 1) * 3, n * 3:(n + 1) * 3] |= \
                    pats[int(gray[m, n])]
        assert np.array_equal(page, want), mmr
    # out-of-range gray value rejected at encode time
    with pytest.raises(ValueError):
        jbig2.build_embedded_halftone(
            9, 6, pats[:2], np.full((2, 3), 5), 3)


def test_halftone_mutation_fuzz():
    rng = np.random.default_rng(31)
    pats = [np.eye(3, dtype=bool), ~np.eye(3, dtype=bool)]
    base = bytearray(jbig2.build_embedded_halftone(
        9, 6, pats, rng.integers(0, 2, (2, 3)), 3))
    for _ in range(200):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            data[int(rng.integers(0, len(data)))] = \
                int(rng.integers(0, 256))
        try:
            jbig2.decode_embedded(bytes(data))
        except ValueError:
            pass


def test_halftone_budget_and_reserved_combop():
    pats = [np.eye(3, dtype=bool), ~np.eye(3, dtype=bool)]
    blob = jbig2.build_embedded_halftone(
        9, 6, pats, np.zeros((2, 3), np.int64), 3)
    # reserved HCOMBOP values (5-7) must raise, not silently REPLACE
    region = bytearray(jbig2.encode_halftone_region(
        9, 6, np.zeros((2, 3), np.int64), 2, 3))
    flags = region[17]
    region[17] = (flags & ~0x70) | (5 << 4)
    with pytest.raises(ValueError, match="reserved halftone"):
        jbig2._decode_halftone_region(bytes(region), pats)
    # grid-cells x pattern-area stamping work is budgeted: an
    # oversized grid must raise before the stamping loop runs
    import struct as _struct

    big = bytearray(region)
    big[17] = flags
    big[18:26] = _struct.pack(">II", 1 << 11, 1 << 11)  # 4.2M cells
    with pytest.raises(ValueError):
        jbig2._decode_halftone_region(bytes(big), pats)
    # the untouched stream still decodes
    assert jbig2.decode_embedded(blob).shape == (6, 9)


# ---------------------------------------- Huffman variants (r7)
def test_standard_tables_complete_and_roundtrip():
    """B.1-B.5: every recalled row set forms a COMPLETE canonical
    prefix tree (Kraft sum exactly 1) — independent corroboration of
    the rows — and encode->decode round-trips assorted values
    including the 32-bit lower/upper ranges and OOB."""
    from pdf_to_text_extraction_service_spark.kernel import (
        jbig2huff as H,
    )

    vals = {1: [0, 5, 16, 100, 272, 70000, 65808, 1 << 20],
            2: [0, 1, 2, 5, 12, 74, 75, 400, H.OOB],
            3: [-256, -100, 0, 3, 11, 74, 75, 900, -257, -5000,
                H.OOB],
            4: [1, 2, 3, 4, 8, 13, 75, 76, 1000],
            5: [-255, -10, 1, 4, 14, 76, 3000, -256, -999]}
    for n, vs in vals.items():
        t = H.std_table(n)
        assert sum(2 ** -pl for (pl, _c) in t.codes) == 1.0
        for v in vs:
            w = H.HBitWriter()
            t.write(w, v)
            got = t.read(H.HBitReader(w.payload()))
            assert (got is H.OOB) if v is H.OOB else got == v
    # B.6+ selections are out of the offline-verifiable subset
    for n in (6, 7, 8, 11, 14, 15):
        with pytest.raises(ValueError, match="B.%d" % n):
            H.std_table(n)


def test_custom_table_segment_mirror():
    from pdf_to_text_extraction_service_spark.kernel import (
        jbig2huff as H,
    )

    specs = [([(1, 5)], 0, 32, 2, 3, 3),
             ([(2, 0), (2, 2), (2, 4)], -3, 18, 3, 3, 0),
             ([(1, 16)], 0, 1 << 16, 2, 2, 0)]
    for spec in specs:
        seg = H.encode_table_segment(*spec)
        t1 = H.parse_table_segment(seg)
        t2 = H.table_from_spec(*spec[:5], oob_len=spec[5])
        lo, hi = spec[1], spec[2]
        probe = [lo, hi - 1, hi, hi + 321, lo - 1, lo - 777]
        if spec[5]:
            probe.append(H.OOB)
        for v in probe:
            w = H.HBitWriter()
            t2.write(w, v)
            got = t1.read(H.HBitReader(w.payload()))
            assert (got is H.OOB) if v is H.OOB else got == v, spec


def test_runcode_symbol_id_lengths():
    from pdf_to_text_extraction_service_spark.kernel import (
        jbig2huff as H,
    )

    for lengths in ([3, 3, 3, 3], [2, 0, 5, 5, 2, 7], [1, 1],
                    [4] * 40, [6] * 3 + [0] * 20 + [6]):
        w = H.HBitWriter()
        H.write_symbol_id_lengths(w, lengths)
        got = H.read_symbol_id_lengths(
            H.HBitReader(w.payload()), len(lengths))
        assert got == lengths


def test_huffman_text_page_matches_arithmetic():
    """The Huffman production shape (custom tables + Huffman symbol
    dict + Huffman text region) decodes pixel-identically to the
    arithmetic shape on the same symbols/placements, for both MMR
    and raw collective bitmaps."""
    rng = np.random.default_rng(5)
    syms = [rng.integers(0, 2, (4, 3)).astype(bool),
            rng.integers(0, 2, (4, 5)).astype(bool),
            rng.integers(0, 2, (6, 4)).astype(bool),
            rng.integers(0, 2, (6, 6)).astype(bool)]
    for s in syms:
        s[0, 0] = True
    insts = [(2, 1, 0), (10, 1, 1), (20, 2, 2), (3, 12, 3),
             (14, 12, 0), (25, 12, 2)]
    ref = jbig2.decode_embedded(
        jbig2.build_embedded_text(40, 24, syms, insts))
    for mmr in (True, False):
        page = jbig2.decode_embedded(
            jbig2.build_embedded_text_huff(40, 24, syms, insts,
                                           mmr=mmr))
        assert (page == ref).all()


def test_huffman_single_symbol_page():
    for fh in (8, 16):
        for k in range(0, fh + 1, 4):
            fax = np.zeros((fh, 16), dtype=bool)
            fax[:k] = True
            for mmr in (True, False):
                st = jbig2.build_embedded_text_huff(
                    16, fh, [fax], [(0, 0, 0)], mmr=mmr)
                assert (jbig2.decode_embedded(st) == fax).all()


def test_huffman_std_table_selection_rejected():
    """A text region selecting SBHUFFFS=0 (standard B.6) raises the
    documented out-of-subset ValueError instead of guessing rows."""
    fax = np.zeros((8, 16), dtype=bool)
    fax[:3] = True
    st = bytearray(jbig2.build_embedded_text_huff(
        16, 8, [fax], [(0, 0, 0)]))
    # locate the text-region huffman flags: segment 5 type 6; its
    # payload starts region info (17) + flags (2), hflags next
    idx = st.find(b"\x00\x00\x00\x05\x06")
    assert idx >= 0
    hoff = idx + 5 + 1 + 4 + 1 + 4 + 17 + 2
    st[hoff:hoff + 2] = (0).to_bytes(2, "big") \
        + b""  # FS=B.6 DS=B.8 DT=B.11
    st[hoff + 1] = st[hoff + 1] & ~0x3F
    with pytest.raises(ValueError, match="B\\.6|B\\.8|B\\.11"):
        jbig2.decode_embedded(bytes(st))


def test_huffman_mutation_fuzz_valueerror_only():
    rng = np.random.default_rng(31)
    syms = [(rng.integers(0, 2, (5, 4)) > 0) for _ in range(3)]
    for s in syms:
        s[0, 0] = True
    base = jbig2.build_embedded_text_huff(
        24, 12, [np.asarray(s) for s in syms],
        [(0, 0, 0), (8, 2, 1), (16, 4, 2)])
    for _trial in range(300):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 5))):
            op = rng.integers(0, 3)
            if op == 0 and len(data) > 1:
                del data[int(rng.integers(0, len(data)))]
            elif op == 1:
                data.insert(int(rng.integers(0, len(data) + 1)),
                            int(rng.integers(0, 256)))
            else:
                data[int(rng.integers(0, len(data)))] = \
                    int(rng.integers(0, 256))
        try:
            jbig2.decode_embedded(bytes(data))
        except ValueError:
            pass


def test_pdf_jbig2_huffman_xobject():
    """Huffman-shape JBIG2 inside a PDF drives the same pixel-stat
    pruning as the arithmetic shape."""
    from pdf_to_text_extraction_service_spark.kernel import pdfk
    from pdf_to_text_extraction_service_spark.sources import pdfgen

    fh = 8
    fax = np.zeros((fh, 16), dtype=bool)
    fax[:3] = True
    blob = jbig2.build_embedded_text_huff(16, fh, [fax], [(0, 0, 0)])
    head = (b"/Width 16 /Height %d /BitsPerComponent 1 "
            b"/ColorSpace /DeviceGray /Filter /JBIG2Decode" % fh)
    pdf = pdfgen.build_pdf_jpeg_pages([([], [(head, blob)])])
    doc = pdfk.PDFDoc(pdf)
    st = doc.page_image_stats(1)
    assert st["n_decoded"] == 1
    assert st["ink_samples"] == 3 * 16
    assert st["sum_luma"] == 255 * (fh - 3) * 16


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(2, 6), st.integers(0, 6)),
                min_size=1, max_size=6),
       st.integers(-40, 40), st.integers(0, 1),
       st.data())
def test_custom_table_hypothesis_mirror(lines, htlow, oob, data):
    """parse(encode(spec)) decodes every encodable value the
    encoder-side table_from_spec writes — arbitrary line shapes,
    negative ranges, OOB on/off."""
    from pdf_to_text_extraction_service_spark.kernel import (
        jbig2huff as H,
    )

    hthigh = htlow + sum(1 << rl for _pl, rl in lines)
    oob_len = 6 if oob else 0
    try:
        seg = H.encode_table_segment(lines, htlow, hthigh, 6, 6,
                                     oob_len=oob_len)
        t_enc = H.table_from_spec(lines, htlow, hthigh, 6, 6,
                                  oob_len=oob_len)
    except ValueError:
        return                      # over-full prefix table: legal
    t_dec = H.parse_table_segment(seg)
    probes = [htlow, hthigh - 1, hthigh, hthigh + 7919,
              htlow - 1, htlow - 5000,
              data.draw(st.integers(htlow, hthigh - 1))]
    if oob:
        probes.append(H.OOB)
    for v in probes:
        w = H.HBitWriter()
        t_enc.write(w, v)
        got = t_dec.read(H.HBitReader(w.payload()))
        assert (got is H.OOB) if v is H.OOB else got == v
