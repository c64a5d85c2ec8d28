"""JPEG 2000 codec (kernel/jp2k.py).

The reference routes JPX scans through poppler and image bytes to
vision APIs (internal/extractor/poppler.go,
internal/extractors/image/image.go); this engine decodes the
lossless Part 1 subset itself — Tier-2 packet headers with tag
trees, EBCOT Tier-1 on the shared T.88 MQ coder, reversible 5/3
DWT, RCT — so JPXDecode XObjects and crawl .jp2 files yield real
pixel stats instead of size-only rows.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_to_text_extraction_service_spark.kernel import jp2k


def _rt(a, **kw):
    out = jp2k.decode_jp2k(jp2k.encode_lossless(a, **kw))
    assert out.shape == a.shape
    assert out.dtype == np.uint8
    assert np.array_equal(out, a)


@pytest.mark.parametrize("shape,levels,cb", [
    ((1, 1), 0, (2, 2)),
    ((1, 9), 2, (2, 2)),
    ((9, 1), 2, (2, 2)),
    ((5, 3), 3, (2, 2)),
    ((16, 16), 1, (2, 2)),
    ((37, 23), 2, (4, 4)),
    ((64, 64), 3, (4, 4)),
    ((63, 65), 2, (6, 6)),
    ((40, 56), 0, (4, 4)),
])
def test_grey_round_trip(shape, levels, cb):
    rng = np.random.default_rng(sum(shape) + levels)
    _rt(rng.integers(0, 256, size=shape).astype(np.uint8),
        levels=levels, cb=cb)


@pytest.mark.parametrize("rct", [True, False])
def test_rgb_round_trip(rct):
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, size=(33, 47, 3)).astype(np.uint8)
    _rt(a, levels=2, cb=(4, 4), rct=rct)


def test_structured_content_round_trip():
    h, w = 96, 80
    yy, xx = np.mgrid[0:h, 0:w]
    for img in [
        ((xx * 255) // (w - 1)).astype(np.uint8),      # gradient
        np.full((h, w), 255, np.uint8),                # blank paper
        np.zeros((h, w), np.uint8),                    # all ink
        np.where((yy % 12 < 2) & (xx % 5 < 4),
                 20, 245).astype(np.uint8),            # text-like
        (((xx // 8 + yy // 8) % 2) * 255).astype(np.uint8),
    ]:
        _rt(img, levels=3, cb=(4, 4))


def test_jp2_container_round_trip_and_sniff():
    from pdf_to_text_extraction_service_spark.functions.multimodal \
        import sniff_media

    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, size=(21, 34)).astype(np.uint8)
    jb = jp2k.encode_jp2(a, levels=2)
    assert sniff_media(jb) == "jp2"
    assert sniff_media(jp2k.encode_lossless(a)) == "jp2"
    assert np.array_equal(jp2k.decode_jp2k(jb), a)
    # container dims agree with the established header walk
    from pdf_to_text_extraction_service_spark.kernel import mp4box
    fam, w, h, nc, depth = mp4box.parse_jp2_dims(jb)
    assert (fam, w, h, nc, depth) == ("jp2", 34, 21, 1, 8)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 3),
       st.integers(0, 2 ** 31 - 1))
def test_round_trip_property(w, h, levels, seed):
    rng = np.random.default_rng(seed)
    # mixed content: flat background + sparse structure exercises
    # empty blocks, run-length columns, and refinement passes
    a = np.full((h, w), int(rng.integers(0, 256)), np.uint8)
    n = int(rng.integers(0, a.size + 1))
    ys = rng.integers(0, h, n)
    xs = rng.integers(0, w, n)
    a[ys, xs] = rng.integers(0, 256, n)
    _rt(a, levels=levels, cb=(2, 2))


def test_tag_tree_mirror():
    rng = np.random.default_rng(3)
    for _ in range(30):
        nx = int(rng.integers(1, 9))
        ny = int(rng.integers(1, 7))
        vals = [int(v) for v in rng.integers(0, 6, nx * ny)]
        wtr = jp2k._PHWriter()
        enc = jp2k._TTEnc(nx, ny, vals)
        # leaves visited in a scrambled order, full decode each
        order = list(range(nx * ny))
        rng.shuffle(order)
        for k in order:
            enc.encode(wtr, k % nx, k // nx, vals[k] + 1)
        data = wtr.align()
        rdr = jp2k._PHReader(data)
        dec = jp2k._TTDec(nx, ny)
        for k in order:
            assert dec.full(rdr, k % nx, k // nx, 10) == vals[k]


def test_npasses_comma_code():
    for n in list(range(1, 40)) + [100, 164]:
        wtr = jp2k._PHWriter()
        jp2k._write_npasses(wtr, n)
        data = wtr.align()
        assert jp2k._read_npasses(jp2k._PHReader(data)) == n


def test_header_bit_stuffing():
    # a run of 1-bits forces 0xFF bytes and the 7-bit stuffing rule
    wtr = jp2k._PHWriter()
    bits = [1] * 40 + [0, 1, 0, 0, 1] + [1] * 23
    for b in bits:
        wtr.bit(b)
    data = wtr.align()
    assert data[-1] != 0xFF
    rdr = jp2k._PHReader(data)
    assert [rdr.bit() for _ in bits] == bits
    # every 0xFF byte is followed by a byte <= 0x7F
    for i, b in enumerate(data[:-1]):
        if b == 0xFF:
            assert data[i + 1] <= 0x7F


def test_subset_rejections():
    a = np.zeros((8, 8), np.uint8)
    base = bytearray(jp2k.encode_lossless(a, levels=1))

    def _mut(off, val):
        d = bytearray(base)
        d[off] = val
        return bytes(d)

    cod = base.index(b"\xff\x52")
    # transform 0 (9/7) with a no-quantization QCD: inconsistent
    with pytest.raises(ValueError, match="9/7"):
        jp2k.decode_jp2k(_mut(cod + 13, 0))
    with pytest.raises(ValueError, match="layers"):
        jp2k.decode_jp2k(_mut(cod + 7, 2))           # 2 layers
    with pytest.raises(ValueError, match="precinct"):
        jp2k.decode_jp2k(_mut(cod + 4, 1))           # Scod bits
    qcd = base.index(b"\xff\x5c")
    # quantized (expounded) QCD paired with the 5/3 transform
    with pytest.raises(ValueError, match="quantized 5/3"):
        jp2k.decode_jp2k(_mut(qcd + 4, (2 << 5) | 2))
    # oversized SIZ dims rejected before any allocation
    siz = base.index(b"\xff\x51")
    big = _mut(siz + 6, 0x7F)                        # Xsiz high byte
    with pytest.raises(ValueError):
        jp2k.decode_jp2k(big)


def test_mutation_fuzz_valueerror_only():
    rng = np.random.default_rng(17)
    img = (rng.integers(0, 2, size=(14, 18)) * 255).astype(np.uint8)
    bases = [bytearray(jp2k.encode_lossless(img, levels=2)),
             bytearray(jp2k.encode_jp2(img, levels=1))]
    for trial in range(250):
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
                jp2k.decode_jp2k(bytes(data))
            except ValueError:
                pass


def test_truncation_fuzz_valueerror_only():
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(20, 20)).astype(np.uint8)
    base = jp2k.encode_lossless(img, levels=2)
    for cut in range(0, len(base), 7):
        try:
            jp2k.decode_jp2k(base[:cut])
        except ValueError:
            pass


def test_dwt_forward_inverse_exact():
    rng = np.random.default_rng(29)
    for _ in range(40):
        h = int(rng.integers(1, 30))
        w = int(rng.integers(1, 30))
        x = rng.integers(-1000, 1000, size=(h, w)).astype(np.int64)
        if h >= 1 and w >= 1:
            ll, hl, lh, hh = jp2k._fdwt_level(x)
            assert ll.shape == ((h + 1) // 2, (w + 1) // 2)
            assert hh.shape == (h // 2, w // 2)
            back = jp2k._idwt_level(ll, hl, lh, hh)
            assert np.array_equal(back, x)


def test_rct_exact():
    rng = np.random.default_rng(31)
    r, g, b = (rng.integers(-128, 128, size=(3, 64)).astype(np.int64))
    y, u, v = jp2k._rct_fwd(r, g, b)
    r2, g2, b2 = jp2k._rct_inv(y, u, v)
    assert np.array_equal(r, r2)
    assert np.array_equal(g, g2)
    assert np.array_equal(b, b2)


def test_decode_budget_and_bad_payloads():
    with pytest.raises(ValueError):
        jp2k.decode_jp2k(b"")
    with pytest.raises(ValueError):
        jp2k.decode_jp2k(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="budget"):
        jp2k.encode_lossless(np.zeros((1024, 1024), np.uint8))


def test_pdf_jpx_xobject_blank_pruning_and_fallback():
    from pdf_to_text_extraction_service_spark.kernel import pdfk
    from pdf_to_text_extraction_service_spark.sources import pdfgen

    h, w = 16, 24

    def _pdf(cs):
        head = (b"/Width %d /Height %d /BitsPerComponent 8 "
                b"/ColorSpace /DeviceGray /Filter /JPXDecode"
                % (w, h))
        return pdfgen.build_pdf_jpeg_pages([([], [(head, cs)])])

    # dark fill: real decode, full ink, needs-ocr
    dark = _pdf(jp2k.encode_lossless(np.full((h, w), 40, np.uint8)))
    doc = pdfk.PDFDoc(dark)
    st = doc.page_image_stats(1)
    assert st == {"n_images": 1, "n_decoded": 1, "pixels": h * w,
                  "n_samples": h * w, "ink_samples": h * w,
                  "sum_luma": 40 * h * w}
    assert pdfk.extract_pdf(dark, "application/pdf",
                            doc=doc).pages[0].method == "needs-ocr"
    # white fill: real decode, zero ink -> pruned to blank
    blank = _pdf(jp2k.encode_lossless(np.full((h, w), 255, np.uint8)))
    doc = pdfk.PDFDoc(blank)
    assert pdfk.extract_pdf(blank, "application/pdf",
                            doc=doc).pages[0].method == "blank"
    # malformed (9/7 transform byte but no-quantization QCD — an
    # inconsistent stream): size-only entry keeps needs-ocr even for
    # a white fill — pruning requires DECODED pixels
    cs = bytearray(jp2k.encode_lossless(
        np.full((h, w), 255, np.uint8)))
    cs[cs.index(b"\xff\x52") + 13] = 0
    bad = _pdf(bytes(cs))
    doc = pdfk.PDFDoc(bad)
    st = doc.page_image_stats(1)
    assert st["n_images"] == 1 and st["n_decoded"] == 0
    assert st["pixels"] == h * w and st["sum_luma"] == 0
    assert pdfk.extract_pdf(bad, "application/pdf",
                            doc=doc).pages[0].method == "needs-ocr"


# ------------------------------------------- 9/7 irreversible + ICT
def test_lossy_flat_exact():
    """Flat images reconstruct EXACTLY through the 9/7 path: high
    bands quantize to zero, the LL lattice error (Δ/2 bias ≤ 0.125)
    vanishes in the rint — the closed-form oracle anchor."""
    for v in (0, 1, 7, 128, 200, 254, 255):
        img = np.full((40, 56), v, dtype=np.uint8)
        out = jp2k.decode_jp2k(jp2k.encode_lossy_97(img))
        assert out.dtype == np.uint8 and out.shape == img.shape
        assert (out == img).all()
    rgb = np.zeros((32, 24, 3), dtype=np.uint8)
    rgb[...] = (37, 200, 90)
    out = jp2k.decode_jp2k(jp2k.encode_lossy_97(rgb))
    assert (out == rgb).all()
    # ICT off (component-independent 9/7) is also exact on flats
    out = jp2k.decode_jp2k(jp2k.encode_lossy_97(rgb, ict=False))
    assert (out == rgb).all()


@pytest.mark.parametrize("shape,levels,cb", [
    ((16, 16), 1, (4, 4)),
    ((37, 23), 2, (4, 4)),
    ((63, 65), 2, (6, 6)),
    ((96, 80), 3, (6, 6)),
])
def test_lossy_structured_near_exact(shape, levels, cb):
    """At base_eps=10 (Δ = 1/4 on LL) structured content reconstructs
    within ±2 — the quantizer cell, not the transform, is the error."""
    h, w = shape
    yy, xx = np.mgrid[0:h, 0:w]
    for img in [((xx * 255) // max(w - 1, 1)).astype(np.uint8),
                np.where((yy % 12 < 2) & (xx % 5 < 4),
                         20, 245).astype(np.uint8),
                ((xx * 3 + yy * 2) % 251).astype(np.uint8)]:
        out = jp2k.decode_jp2k(
            jp2k.encode_lossy_97(img, levels=levels, cb=cb))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_lossy_rgb_ict_near_exact():
    yy, xx = np.mgrid[0:48, 0:40]
    img = np.dstack([(xx + yy) % 256, (xx * 5) % 256,
                     (yy * 7) % 256]).astype(np.uint8)
    out = jp2k.decode_jp2k(jp2k.encode_lossy_97(img))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_dwt97_forward_inverse_float_exact():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((31, 17)) * 100
    ll, hl, lh, hh = jp2k._fdwt_level97(x)
    back = jp2k._idwt_level97(ll, hl, lh, hh)
    assert np.abs(back - x).max() < 1e-9


def test_ict_matrices_inverse_pair():
    prod = jp2k._ICT_INV @ jp2k._ICT_FWD
    assert np.abs(prod - np.eye(3)).max() < 1e-6


def test_lossy_subset_rejections():
    img = np.full((16, 16), 9, np.uint8)
    good = bytearray(jp2k.encode_lossy_97(img, levels=1))
    qcd = good.index(b"\xff\x5c")
    # style 1 (scalar derived) is out of subset
    d = bytearray(good)
    d[qcd + 4] = (d[qcd + 4] & 0xE0) | 1
    with pytest.raises(ValueError):
        jp2k.decode_jp2k(bytes(d))
    # expounded QCD with the 5/3 transform is inconsistent
    d = bytearray(good)
    d[d.index(b"\xff\x52") + 13] = 1
    with pytest.raises(ValueError):
        jp2k.decode_jp2k(bytes(d))


def test_lossy_mutation_fuzz_valueerror_only():
    rng = np.random.default_rng(29)
    img = (rng.integers(0, 2, size=(14, 18)) * 255).astype(np.uint8)
    base = bytearray(jp2k.encode_lossy_97(img, levels=2))
    for _trial in range(250):
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
            jp2k.decode_jp2k(bytes(data))
        except ValueError:
            pass


def test_pdf_jpx_lossy_scan_pruning():
    """A 9/7+ICT 'scanner output' page drives the same pixel-stat
    needs-ocr decision as the lossless path (hybrid.go:113-123
    escalation semantics)."""
    from pdf_to_text_extraction_service_spark.kernel import pdfk
    from pdf_to_text_extraction_service_spark.sources import pdfgen

    h, w = 16, 24

    def _pdf(cs):
        head = (b"/Width %d /Height %d /BitsPerComponent 8 "
                b"/ColorSpace /DeviceGray /Filter /JPXDecode"
                % (w, h))
        return pdfgen.build_pdf_jpeg_pages([([], [(head, cs)])])

    dark = _pdf(jp2k.encode_lossy_97(np.full((h, w), 40, np.uint8)))
    doc = pdfk.PDFDoc(dark)
    st = doc.page_image_stats(1)
    assert st["n_decoded"] == 1 and st["ink_samples"] == h * w
    assert st["sum_luma"] == 40 * h * w   # flat lossy decode is exact
    assert pdfk.extract_pdf(dark, "application/pdf",
                            doc=doc).pages[0].method == "needs-ocr"
    blank = _pdf(jp2k.encode_lossy_97(np.full((h, w), 255, np.uint8)))
    doc = pdfk.PDFDoc(blank)
    assert pdfk.extract_pdf(blank, "application/pdf",
                            doc=doc).pages[0].method == "blank"
