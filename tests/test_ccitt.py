"""CCITT G3/G4 codec (kernel/ccitt.py) — round-trip, hand-built
spec vectors, PDF CCITTFaxDecode integration, and the ValueError-only
untrusted-bytes contract.

The reference handles scanned PDFs via poppler + OCR escalation
(internal/extractor/poppler.go:112-121, internal/hybrid/
hybrid.go:113-123); this engine decodes the fax payload itself so the
pixel-driven blank-page OCR pruning covers the scanned class.
"""

import numpy as np
import pytest

from pdf_to_text_extraction_service_spark.kernel import ccitt


def _bits_to_bytes(s: str) -> bytes:
    s += "0" * ((-len(s)) % 8)
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def _patterns(rng, h, w, kind):
    if kind == 0:
        return np.zeros((h, w), bool)
    if kind == 1:
        return np.ones((h, w), bool)
    if kind == 2:
        return rng.random((h, w)) < rng.random()
    if kind == 3:
        return ((np.arange(h)[:, None] + np.arange(w)[None, :]) % 2
                ).astype(bool)
    img = np.zeros((h, w), bool)
    img[: int(rng.integers(0, h + 1))] = True
    return img


@pytest.mark.parametrize("byte_align", [False, True])
def test_g4_round_trip(byte_align):
    rng = np.random.default_rng(11)
    for trial in range(40):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 90))
        img = _patterns(rng, h, w, trial % 5)
        enc = ccitt.encode_g4(img, byte_align=byte_align)
        assert np.array_equal(
            ccitt.decode_g4(enc, w, h, byte_align=byte_align), img)


@pytest.mark.parametrize("with_eol", [False, True])
def test_g3_1d_round_trip(with_eol):
    rng = np.random.default_rng(13)
    for trial in range(40):
        h = int(rng.integers(1, 30))
        w = int(rng.integers(1, 80))
        img = _patterns(rng, h, w, trial % 5)
        enc = ccitt.encode_g3_1d(img, with_eol=with_eol)
        assert np.array_equal(ccitt.decode_g3(enc, w, h), img)


def test_makeup_codes_wide_runs():
    """Runs past 2560 chain makeup codes (T.4 §4.1)."""
    img = np.zeros((3, 6000), bool)
    img[:, 100:5900] = True
    for enc, dec in ((ccitt.encode_g4,
                      lambda d: ccitt.decode_g4(d, 6000, 3)),
                     (ccitt.encode_g3_1d,
                      lambda d: ccitt.decode_g3(d, 6000, 3))):
        assert np.array_equal(dec(enc(img)), img)


def test_g3_hand_built_spec_vector():
    """Decode a bitstream assembled by hand from the published T.4
    tables (white3=1000, black2=11) — independent of the encoder."""
    bits = "1000" + "11" + "1000"          # 3 white, 2 black, 3 white
    out = ccitt.decode_g3(_bits_to_bytes(bits), 8, 1)
    assert out.astype(int).tolist() == [[0, 0, 0, 1, 1, 0, 0, 0]]
    # line starting black needs the zero-length white run: white0 =
    # 00110101, black5 = 0011, white3 = 1000
    bits2 = "00110101" + "0011" + "1000"
    out2 = ccitt.decode_g3(_bits_to_bytes(bits2), 8, 1)
    assert out2.astype(int).tolist() == [[1, 1, 1, 1, 1, 0, 0, 0]]


def test_g4_hand_built_spec_vector():
    """T.6 modes applied by hand: an all-white line against an
    all-white reference is a single V0 ('1'); a half-black line codes
    horizontal(001) + white0(00110101) + black4(011) then V0."""
    eofb = "000000000001" * 2
    out = ccitt.decode_g4(_bits_to_bytes("1" + "1" + eofb), 8, 2)
    assert not out.any() and out.shape == (2, 8)

    row1 = "001" + "00110101" + "011" + "1"   # H w0 b4, then V0
    row2 = "111"                               # V0 V0 V0 off row 1
    out2 = ccitt.decode_g4(_bits_to_bytes(row1 + row2 + eofb), 8, 2)
    assert out2.astype(int).tolist() == [[1, 1, 1, 1, 0, 0, 0, 0]] * 2
    # the encoder must emit exactly these hand-derived bits
    img = np.array([[1, 1, 1, 1, 0, 0, 0, 0]] * 2, dtype=bool)
    assert ccitt.encode_g4(img) == _bits_to_bytes(row1 + row2 + eofb)


def test_g4_pass_mode():
    """A black run on the reference line skipped entirely by the
    coding line exercises pass mode."""
    img = np.zeros((2, 20), bool)
    img[0, 8:12] = True          # black island on row 0 only
    img[1, 16:] = True           # row 1 black far to the right
    enc = ccitt.encode_g4(img)
    assert np.array_equal(ccitt.decode_g4(enc, 20, 2), img)


def test_g3_2d_mixed_mode():
    """K>0 mixed G3: EOL + tag bit per line (1=1-D).  Build the
    stream by hand from 1-D line codings."""
    eol = "000000000001"
    line = "1000" + "11" + "1000"           # w3 b2 w3
    bits = (eol + "1" + line) * 2
    out = ccitt.decode_g3(_bits_to_bytes(bits), 8, 2, two_dim=True)
    assert out.astype(int).tolist() == [[0, 0, 0, 1, 1, 0, 0, 0]] * 2


def test_ccitt_decode_param_dispatch():
    img = np.array([[0, 1, 1, 0, 0, 0, 1, 0]], dtype=bool)
    assert np.array_equal(
        ccitt.ccitt_decode(ccitt.encode_g4(img), -1, 8, 1), img)
    assert np.array_equal(
        ccitt.ccitt_decode(ccitt.encode_g3_1d(img), 0, 8, 1), img)


def test_ccitt_budgets_and_errors():
    with pytest.raises(ValueError):
        ccitt.decode_g4(b"", 0, 1)
    with pytest.raises(ValueError):
        ccitt.decode_g4(b"\x00" * 8, 1 << 16, 1 << 16)  # budget
    # \xff\xff is a legal degenerate stream: 16 V0 codes = 16
    # all-white lines (each line is one V0 against an empty ref)
    assert not ccitt.decode_g4(b"\xff\xff", 8, 4).any()
    with pytest.raises(ValueError):
        ccitt.decode_g4(b"\x00", 8, 4)  # no valid mode code, rows due
    with pytest.raises(ValueError):
        ccitt.encode_g4(np.zeros((0, 4), bool))


def test_ccitt_never_raises_other_than_valueerror():
    """Mutation fuzz: every decode either returns an array or raises
    ValueError — the shared untrusted-bytes decoder contract."""
    rng = np.random.default_rng(31)
    img = rng.random((12, 40)) < 0.4
    base4 = bytearray(ccitt.encode_g4(img))
    base3 = bytearray(ccitt.encode_g3_1d(img))
    for trial in range(300):
        for base, k in ((base4, -1), (base3, 0)):
            data = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                op = rng.integers(0, 3)
                if op == 0 and len(data) > 1:
                    del data[int(rng.integers(0, len(data)))]
                elif op == 1:
                    data.insert(int(rng.integers(0, len(data) + 1)),
                                int(rng.integers(0, 256)))
                elif len(data) > 0:
                    data[int(rng.integers(0, len(data)))] = \
                        int(rng.integers(0, 256))
            try:
                ccitt.ccitt_decode(bytes(data), k, 40, 12)
            except ValueError:
                pass


def test_pdf_ccitt_xobject_stats_and_blank_pruning():
    """CCITTFaxDecode XObjects decode into page_image_stats and an
    all-white fax page prunes from the OCR queue (method 'blank')."""
    from pdf_to_text_extraction_service_spark.kernel import pdfk
    from pdf_to_text_extraction_service_spark.sources import pdfgen

    h, w, k = 16, 24, 5
    img = np.zeros((h, w), bool)
    img[:k] = True
    for kk, enc in ((-1, ccitt.encode_g4(img)),
                    (0, ccitt.encode_g3_1d(img))):
        pdf = pdfgen.build_pdf_jpeg_pages([
            ([], [pdfgen.ccitt_image_entry(enc, w, h, k=kk)]),
        ])
        doc = pdfk.PDFDoc(pdf)
        st = doc.page_image_stats(1)
        assert st == {"n_images": 1, "n_decoded": 1, "pixels": h * w,
                      "n_samples": h * w, "ink_samples": k * w,
                      "sum_luma": (h - k) * w * 255}
        res = pdfk.extract_pdf(pdf, "application/pdf", doc=doc)
        assert res.pages[0].method == "needs-ocr"

    blank = pdfgen.build_pdf_jpeg_pages([
        ([], [pdfgen.ccitt_image_entry(
            ccitt.encode_g4(np.zeros((h, w), bool)), w, h)]),
    ])
    doc = pdfk.PDFDoc(blank)
    assert doc.page_image_stats(1)["ink_samples"] == 0
    assert pdfk.extract_pdf(blank, "application/pdf",
                            doc=doc).pages[0].method == "blank"


def test_pdf_ccitt_byte_align_and_corrupt_fallback():
    from pdf_to_text_extraction_service_spark.kernel import pdfk
    from pdf_to_text_extraction_service_spark.sources import pdfgen

    img = np.eye(8, dtype=bool)
    enc = ccitt.encode_g4(img, byte_align=True)
    pdf = pdfgen.build_pdf_jpeg_pages([
        ([], [pdfgen.ccitt_image_entry(enc, 8, 8, byte_align=True)]),
    ])
    st = pdfk.PDFDoc(pdf).page_image_stats(1)
    assert st["ink_samples"] == 8 and st["n_decoded"] == 1
    # corrupt payload → size-only entry, needs-ocr kept, no raise
    bad = pdfgen.build_pdf_jpeg_pages([
        ([], [pdfgen.ccitt_image_entry(b"\x07\xff\x00\x12", 8, 8)]),
    ])
    doc = pdfk.PDFDoc(bad)
    st = doc.page_image_stats(1)
    assert st["n_images"] == 1 and st["n_decoded"] == 0
    assert pdfk.extract_pdf(bad, "application/pdf",
                            doc=doc).pages[0].method == "needs-ocr"


def test_ccitt_fax_tiff_round_trip():
    """TIFF compressions 2/3/4 route through the fax codec: strips
    restart coding, photometric 0 maps sample 1 (black) to ink 0."""
    from pdf_to_text_extraction_service_spark.kernel import imgcodec

    rng = np.random.default_rng(23)
    img = rng.random((11, 17)) < 0.35
    want = np.where(img, 0, 255).astype(np.uint8)
    for fax in (2, 3, 4):
        t = imgcodec.encode_tiff(img, fax=fax, rows_per_strip=4)
        assert np.array_equal(imgcodec.decode_tiff(t), want)
    with pytest.raises(ValueError):
        imgcodec.encode_tiff(img, fax=5)
    # corrupt fax payload raises ValueError (never another type)
    t = bytearray(imgcodec.encode_tiff(img, fax=4))
    t[-3] ^= 0x55
    try:
        imgcodec.decode_tiff(bytes(t))
    except ValueError:
        pass
