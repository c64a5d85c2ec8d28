"""JBIG2 generic-region subset (kernel/jbig2.py).

The reference routes scanned PDFs through poppler + OCR escalation
(internal/extractor/poppler.go:112-121); this engine decodes the
JBIG2 payloads itself (MQ arithmetic coder per T.88 Annex E, generic
region template 0 with TPGDON, MMR regions via kernel/ccitt.py) so
the pixel-driven blank-page pruning covers both scanned-PDF codecs.
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
    # type 0 = symbol dictionary (the jbig2enc path)
    blob = (b"\x00\x00\x00\x00"      # segment number
            b"\x00"                  # flags: type 0
            b"\x00"                  # no referred segments
            b"\x01"                  # page 1
            b"\x00\x00\x00\x04" b"abcd")
    with pytest.raises(ValueError, match="symbol dictionary"):
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
    bases = [bytearray(jbig2.build_embedded(img, mmr=m))
             for m in (False, True)]
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
