"""PNG + baseline JPEG codec (kernel/imgcodec.py).

The reference feeds real image bytes to its vision leg
(internal/extractors/image/image.go:39-82); these tests pin the
from-spec decoders that replace the round-3 NotImplementedError stub.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pdf_to_text_extraction_service_spark.kernel import imgcodec as ic

RNG = np.random.RandomState(7)


# ---------------------------------------------------------------- PNG


def _png(ihdr_fields, chunks):
    out = bytearray(ic.PNG_SIG)
    ihdr = struct.pack(">IIBBBBB", *ihdr_fields)
    out += ic._chunk(b"IHDR", ihdr)
    for ctype, body in chunks:
        out += ic._chunk(ctype, body)
    out += ic._chunk(b"IEND", b"")
    return bytes(out)


def _forward_filter(rows: np.ndarray, ftypes: list[int],
                    bpp: int) -> bytes:
    """Independent forward filter (spec definition) for decode tests."""
    h, stride = rows.shape
    out = bytearray()
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        out.append(f)
        prev = rows[y - 1] if y else np.zeros(stride, dtype=np.int32)
        cur = rows[y].astype(np.int32)
        for x in range(stride):
            left = int(cur[x - bpp]) if x >= bpp else 0
            up = int(prev[x])
            ul = int(prev[x - bpp]) if x >= bpp else 0
            if f == 0:
                v = cur[x]
            elif f == 1:
                v = cur[x] - left
            elif f == 2:
                v = cur[x] - up
            elif f == 3:
                v = cur[x] - ((left + up) >> 1)
            else:
                v = cur[x] - ic._paeth(left, up, ul)
            out.append(int(v) & 0xFF)
    return bytes(out)


class TestPNG:
    def test_roundtrip_all_channel_counts(self):
        for ch in (1, 2, 3, 4):
            img = RNG.randint(0, 256, (11, 23, ch), dtype=np.uint8)
            out = ic.decode_png(ic.encode_png(img))
            assert (out == img).all()

    def test_all_filter_types_reverse(self):
        img = RNG.randint(0, 256, (10, 9, 3), dtype=np.uint8)
        rows = img.reshape(10, 27)
        raw = _forward_filter(rows, [0, 1, 2, 3, 4], bpp=3)
        data = _png((9, 10, 8, 2, 0, 0, 0),
                    [(b"IDAT", zlib.compress(raw))])
        out = ic.decode_png(data)
        assert (out == img).all()

    def test_16bit_high_byte(self):
        w, h = 5, 4
        samples = RNG.randint(0, 65536, (h, w), dtype=np.uint16)
        rows = samples.astype(">u2").view(np.uint8).reshape(h, w * 2)
        raw = _forward_filter(rows.astype(np.uint8), [0, 2], bpp=2)
        data = _png((w, h, 16, 0, 0, 0, 0),
                    [(b"IDAT", zlib.compress(raw))])
        out = ic.decode_png(data)
        assert (out[:, :, 0] == (samples >> 8).astype(np.uint8)).all()

    @pytest.mark.parametrize("depth", [1, 2, 4])
    def test_sub_byte_gray_scaled(self, depth):
        w, h = 11, 3
        maxv = (1 << depth) - 1
        vals = RNG.randint(0, maxv + 1, (h, w), dtype=np.uint8)
        per_byte = 8 // depth
        stride = (w * depth + 7) // 8
        rows = np.zeros((h, stride), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                byte_i, slot = divmod(x, per_byte)
                shift = 8 - depth * (slot + 1)
                rows[y, byte_i] |= vals[y, x] << shift
        raw = _forward_filter(rows, [0], bpp=1)
        data = _png((w, h, depth, 0, 0, 0, 0),
                    [(b"IDAT", zlib.compress(raw))])
        out = ic.decode_png(data)[:, :, 0]
        want = ((vals.astype(np.uint16) * 255 + maxv // 2)
                // maxv).astype(np.uint8)
        assert (out == want).all()

    def test_palette_expands_to_rgb(self):
        pal = bytes(RNG.randint(0, 256, 12, dtype=np.uint8))  # 4 colors
        idx = RNG.randint(0, 4, (6, 7), dtype=np.uint8)
        raw = _forward_filter(idx, [0, 1], bpp=1)
        data = _png((7, 6, 8, 3, 0, 0, 0),
                    [(b"PLTE", pal), (b"IDAT", zlib.compress(raw))])
        out = ic.decode_png(data)
        want = np.frombuffer(pal, np.uint8).reshape(4, 3)[idx]
        assert (out == want).all()

    def test_adam7_interlace(self):
        w, h = 10, 9
        img = RNG.randint(0, 256, (h, w), dtype=np.uint8)
        passes = bytearray()
        for (x0, y0, dx, dy) in ic._ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            passes += _forward_filter(sub, [0], bpp=1)
        data = _png((w, h, 8, 0, 0, 0, 1),
                    [(b"IDAT", zlib.compress(bytes(passes)))])
        out = ic.decode_png(data)[:, :, 0]
        assert (out == img).all()

    def test_multiple_idat_chunks(self):
        img = RNG.randint(0, 256, (8, 8, 3), dtype=np.uint8)
        full = ic.encode_png(img)
        # re-split the IDAT into two chunks
        raw = zlib.compress(
            b"".join(b"\x00" + img[y].tobytes() for y in range(8)))
        data = _png((8, 8, 8, 2, 0, 0, 0),
                    [(b"IDAT", raw[:10]), (b"IDAT", raw[10:])])
        assert (ic.decode_png(data) == ic.decode_png(full)).all()

    @pytest.mark.parametrize("mutant", [
        b"notapng" + b"\x00" * 40,
        ic.PNG_SIG + b"\x00\x00\x00\x04IDAT\x00\x00\x00\x00" + b"\x00" * 4,
    ])
    def test_malformed_raises_valueerror(self, mutant):
        with pytest.raises(ValueError):
            ic.decode_png(mutant)

    def test_truncated_idat_raises(self):
        img = RNG.randint(0, 256, (6, 6), dtype=np.uint8)
        good = ic.encode_png(img)
        with pytest.raises(ValueError):
            ic.decode_png(good[:len(good) - 20])

    def test_bad_filter_type_raises(self):
        raw = bytes([9]) + bytes(5)
        data = _png((5, 1, 8, 0, 0, 0, 0),
                    [(b"IDAT", zlib.compress(raw))])
        with pytest.raises(ValueError):
            ic.decode_png(data)

    def test_palette_index_out_of_range_raises(self):
        raw = _forward_filter(np.full((1, 1), 7, np.uint8), [0], 1)
        data = _png((1, 1, 8, 3, 0, 0, 0),
                    [(b"PLTE", bytes(6)), (b"IDAT", zlib.compress(raw))])
        with pytest.raises(ValueError):
            ic.decode_png(data)


# --------------------------------------------------------------- JPEG

Q1 = np.ones((8, 8), dtype=np.int32)


class TestJPEG:
    def test_flat_gray_bit_exact(self):
        for v in (0, 1, 127, 128, 254, 255):
            img = np.full((12, 20), v, dtype=np.uint8)
            out = ic.decode_jpeg(ic.encode_jpeg(img, quant=Q1))
            assert out.shape == (12, 20)
            assert (out == v).all(), v

    def test_gray_q1_within_rounding(self):
        img = RNG.randint(0, 256, (24, 17), dtype=np.uint8)
        out = ic.decode_jpeg(ic.encode_jpeg(img, quant=Q1))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    def test_color_444_q1_close(self):
        img = RNG.randint(0, 256, (16, 16, 3), dtype=np.uint8)
        out = ic.decode_jpeg(ic.encode_jpeg(img, quant=Q1))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 3

    def test_std_quant_smooth_image(self):
        xx, yy = np.meshgrid(np.arange(40), np.arange(24))
        img = ((xx * 2 + yy * 3) % 200 + 20).astype(np.uint8)
        out = ic.decode_jpeg(ic.encode_jpeg(img))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 4

    def test_non_multiple_of_8_dims_cropped(self):
        img = np.full((9, 13), 77, dtype=np.uint8)
        out = ic.decode_jpeg(ic.encode_jpeg(img, quant=Q1))
        assert out.shape == (9, 13)
        assert (out == 77).all()

    def test_restart_markers(self):
        # hand-assemble a 24x8 flat image as 3 MCUs with DRI=1:
        # entropy data is per-MCU segments separated by RST0/RST1
        v = 90
        img = np.full((8, 24), v, dtype=np.uint8)
        base = ic.encode_jpeg(img, quant=Q1)
        # encode each 8x8 MCU independently (DC pred resets at RSTn)
        segs = []
        for _ in range(3):
            bw = ic._BitWriter()
            dc = ic._HuffTable(ic._STD_DC_BITS, ic._STD_DC_VALS)
            ac = ic._HuffTable(ic._STD_AC_BITS, ic._STD_AC_VALS)
            zz = np.zeros(64, dtype=np.int32)
            zz[0] = 8 * (v - 128)
            ic._encode_block(bw, zz, 0, dc, ac)
            bw.flush()
            segs.append(bytes(bw.out))
        entropy = segs[0] + b"\xff\xd0" + segs[1] + b"\xff\xd1" + segs[2]
        # splice: reuse base headers up to SOS payload, add DRI
        sos_at = base.find(b"\xff\xda")
        dri = b"\xff\xdd" + struct.pack(">HH", 4, 1)
        sos_len = struct.unpack_from(">H", base, sos_at + 2)[0]
        header = base[:sos_at] + dri \
            + base[sos_at:sos_at + 2 + sos_len]
        out = ic.decode_jpeg(header + entropy + b"\xff\xd9")
        assert out.shape == (8, 24)
        assert (out == v).all()

    def test_sof2_with_full_band_scan_decodes(self):
        # a full Ss=0..63 Ah=Al=0 scan under SOF2 is valid progressive
        # and must decode identically to the baseline stream
        img = np.full((8, 8), 10, dtype=np.uint8)
        blob = bytearray(ic.encode_jpeg(img, quant=Q1))
        i = blob.find(b"\xff\xc0")
        blob[i + 1] = 0xC2
        assert (ic.decode_jpeg(bytes(blob)) == 10).all()

    def test_arithmetic_and_lossless_rejected(self):
        img = np.full((8, 8), 10, dtype=np.uint8)
        for sof in (0xC3, 0xC9, 0xCA):  # lossless, arith seq/prog
            blob = bytearray(ic.encode_jpeg(img, quant=Q1))
            i = blob.find(b"\xff\xc0")
            blob[i + 1] = sof
            with pytest.raises(ValueError, match="huffman"):
                ic.decode_jpeg(bytes(blob))

    def test_truncated_entropy_raises(self):
        img = RNG.randint(0, 256, (16, 16), dtype=np.uint8)
        blob = ic.encode_jpeg(img, quant=Q1)
        with pytest.raises(ValueError):
            ic.decode_jpeg(blob[:len(blob) // 2])

    def test_bad_soi_raises(self):
        with pytest.raises(ValueError):
            ic.decode_jpeg(b"\x89PNG1234")

    def test_app0_and_fill_bytes_tolerated(self):
        img = np.full((8, 8), 33, dtype=np.uint8)
        blob = ic.encode_jpeg(img, quant=Q1)
        # inject APP0 JFIF segment + a fill byte after SOI
        app0 = b"\xff\xe0" + struct.pack(">H", 16) \
            + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
        patched = blob[:2] + b"\xff" + app0 + blob[2:]
        out = ic.decode_jpeg(patched)
        assert (out == 33).all()


class TestToGray:
    def test_channel_reduction(self):
        g = RNG.randint(0, 256, (4, 5), dtype=np.uint8)
        assert (ic.to_gray(g) == g).all()
        ga = np.stack([g, np.full_like(g, 9)], axis=2)
        assert (ic.to_gray(ga) == g).all()
        rgb = RNG.randint(0, 256, (4, 5, 3), dtype=np.uint8)
        r32 = rgb.astype(np.uint32)
        want = ((77 * r32[:, :, 0] + 150 * r32[:, :, 1]
                 + 29 * r32[:, :, 2] + 128) >> 8).astype(np.uint8)
        assert (ic.to_gray(rgb) == want).all()


class TestResizeAndDhash:
    def test_resize_exact_downscale(self):
        img = np.arange(16, dtype=np.uint8).reshape(4, 4)
        out = ic.resize_area(img, 2, 2)
        # each 2x2 box floor-averaged
        assert out.tolist() == [[(0 + 1 + 4 + 5) // 4, (2 + 3 + 6 + 7) // 4],
                                [(8 + 9 + 12 + 13) // 4,
                                 (10 + 11 + 14 + 15) // 4]]

    def test_resize_upscale_and_identity(self):
        img = np.array([[10, 200]], dtype=np.uint8)
        out = ic.resize_area(img, 4, 2)
        assert out.shape == (2, 4)
        assert (out[:, :2] == 10).all() and (out[:, 2:] == 200).all()
        same = RNG.randint(0, 256, (5, 7), dtype=np.uint8)
        assert (ic.resize_area(same, 7, 5) == same).all()

    def test_dhash_flat_zero_and_gradient_ones(self):
        assert ic.dhash64(np.full((12, 20), 99, dtype=np.uint8)) == 0
        grad = np.tile(np.arange(0, 90, 10, dtype=np.uint8), (9, 1))
        assert ic.dhash64(grad) == (1 << 64) - 1

    def test_dhash_shift_invariance(self):
        # dHash compares neighbor differences: adding a constant
        # (mod-free range) must not change the hash
        base = RNG.randint(0, 200, (10, 12), dtype=np.uint8)
        assert ic.dhash64(base) == ic.dhash64(base + 50)

    def test_dhash_robust_to_mild_noise(self):
        base = np.tile(np.arange(0, 240, 10, dtype=np.uint8), (24, 1))
        noisy = base.copy()
        noisy[5, 5] = 255  # single hot pixel
        h1, h2 = ic.dhash64(base), ic.dhash64(noisy)
        assert bin(h1 ^ h2).count("1") <= 6

    def test_bad_dims_raise(self):
        import pytest

        with pytest.raises(ValueError):
            ic.resize_area(np.zeros((2, 2), np.uint8), 0, 4)


class TestDecodeFuzz:
    """Untrusted-input posture: mutated/truncated/random payloads must
    raise ValueError (→ error rows), never crash or hang."""

    def test_png_mutation_fuzz(self):
        import random

        rnd = random.Random(1234)
        base = ic.encode_png(RNG.randint(0, 256, (9, 13, 3), np.uint8))
        for _ in range(250):
            blob = bytearray(base)
            for _ in range(rnd.randint(1, 8)):
                blob[rnd.randrange(len(blob))] = rnd.randrange(256)
            try:
                out = ic.decode_png(bytes(blob))
                assert out.nbytes <= ic.MAX_PIXELS * 4
            except ValueError:
                pass

    def test_jpeg_mutation_fuzz(self):
        import random

        rnd = random.Random(4321)
        base = ic.encode_jpeg(RNG.randint(0, 256, (16, 16), np.uint8),
                              quant=Q1)
        for _ in range(250):
            blob = bytearray(base)
            for _ in range(rnd.randint(1, 8)):
                blob[rnd.randrange(len(blob))] = rnd.randrange(256)
            try:
                out = ic.decode_jpeg(bytes(blob))
                assert out.nbytes <= ic.MAX_PIXELS * 4
            except ValueError:
                pass

    def test_truncation_fuzz(self):
        png = ic.encode_png(RNG.randint(0, 256, (8, 8), np.uint8))
        jpg = ic.encode_jpeg(RNG.randint(0, 256, (8, 8), np.uint8))
        for blob, dec in ((png, ic.decode_png), (jpg, ic.decode_jpeg)):
            for cut in range(0, len(blob), 7):
                try:
                    dec(blob[:cut])
                except ValueError:
                    pass

    def test_random_bytes_fuzz(self):
        import random

        rnd = random.Random(99)
        for _ in range(150):
            blob = bytes(rnd.randrange(256)
                         for _ in range(rnd.randrange(4, 400)))
            for dec in (ic.decode_png, ic.decode_jpeg):
                try:
                    dec(ic.PNG_SIG + blob if dec is ic.decode_png
                        else b"\xff\xd8" + blob)
                except ValueError:
                    pass


class TestProgressiveJPEG:
    """SOF2 progressive: DC/AC successive approximation + spectral
    selection must reconstruct the SAME quantized coefficients as the
    baseline encoding of the same image (so decodes are identical)."""

    def _pair(self, img, quant=None):
        return (ic.decode_jpeg(ic.encode_jpeg(img, quant=quant)),
                ic.decode_jpeg(ic.encode_jpeg_progressive(
                    img, quant=quant)))

    def test_flat_bit_exact(self):
        for v in (0, 77, 128, 255):
            img = np.full((12, 20), v, dtype=np.uint8)
            out = ic.decode_jpeg(ic.encode_jpeg_progressive(
                img, quant=Q1))
            assert (out == v).all(), v

    def test_gray_equals_baseline(self):
        img = RNG.randint(0, 256, (24, 17), dtype=np.uint8)
        b, p = self._pair(img, Q1)
        assert (b == p).all()

    def test_color_equals_baseline(self):
        img = RNG.randint(0, 256, (16, 16, 3), dtype=np.uint8)
        b, p = self._pair(img, Q1)
        assert (b == p).all()

    def test_std_quant_equals_baseline(self):
        xx, yy = np.meshgrid(np.arange(40), np.arange(24))
        img = ((xx * 2 + yy * 3) % 200 + 20).astype(np.uint8)
        b, p = self._pair(img)
        assert (b == p).all()

    def test_multiblock_eobrun_span(self):
        # hand-build an AC first scan whose EOBRUN covers 4 blocks at
        # once (our encoder flushes per block, so build the span by
        # hand): 4 flat 8x8 blocks -> all AC zero
        v = 60
        img = np.full((8, 32), v, dtype=np.uint8)
        blob = bytearray(ic.encode_jpeg_progressive(img, quant=Q1))
        # EOBn symbols (r>0, s=0) are absent from the Annex-K baseline
        # AC table — progressive encoders ship custom tables for them.
        # Build a 1-symbol table {0x20 -> code '0'} as AC table id 1.
        eob_bits = [1] + [0] * 15
        eob_vals = [0x20]
        dht = ic._dht_segment(1, 1, eob_bits, eob_vals)
        tbl = ic._HuffTable(eob_bits, eob_vals)
        code, length = tbl.enc[0x20]
        bw = ic._BitWriter()
        bw.write(code, length)  # RS=0x20: r=2
        bw.write(1, 1)          # 2 extra bits... r=2 -> read_bits(2)
        bw.write(1, 1)          # EOBRUN = (1<<2)-1 + 0b11 = 6 >= 4
        bw.flush()
        # find SOS with Ss=1,Se=5 header and splice
        i = 0
        while True:
            i = blob.index(b"\xff\xda", i)
            seglen = int.from_bytes(blob[i + 2:i + 4], "big")
            ns = blob[i + 4]
            ss = blob[i + 5 + 2 * ns]
            data_start = i + 2 + seglen
            if ss == 1:
                break
            i = data_start
        # entropy data of this scan ends at the next 0xFF marker that
        # is not stuffing
        j = data_start
        while True:
            j = blob.index(b"\xff", j)
            if blob[j + 1] != 0x00:
                break
            j += 2
        blob[i + 6] = (blob[i + 6] & 0xF0) | 0x01  # scan uses AC tbl 1
        blob[data_start:j] = bytes(bw.out)
        blob[i:i] = dht  # insert the DHT right before the SOS
        out = ic.decode_jpeg(bytes(blob))
        assert (out == v).all()

    def test_progressive_mutation_fuzz(self):
        import random

        rnd = random.Random(777)
        base = ic.encode_jpeg_progressive(
            RNG.randint(0, 256, (16, 16), dtype=np.uint8), quant=Q1)
        for _ in range(200):
            blob = bytearray(base)
            for _ in range(rnd.randint(1, 8)):
                blob[rnd.randrange(len(blob))] = rnd.randrange(256)
            try:
                out = ic.decode_jpeg(bytes(blob))
                assert out.nbytes <= ic.MAX_PIXELS * 4
            except ValueError:
                pass

    def test_truncated_scans_partial_or_error(self):
        img = RNG.randint(0, 256, (16, 16), dtype=np.uint8)
        blob = ic.encode_jpeg_progressive(img, quant=Q1)
        for cut in range(2, len(blob), 11):
            try:
                ic.decode_jpeg(blob[:cut])
            except ValueError:
                pass


class TestSubsampledJPEG:
    def test_420_flat_color_exact(self):
        """Hand-built 4:2:0 stream: Y at 2x2 sampling (4 blocks/MCU),
        Cb/Cr at 1x1 — a flat color decodes exactly (DC-only blocks),
        pinning the interleaved multi-block MCU path and the chroma
        upsample."""
        h = w = 16  # one MCU of 16x16
        y_val, cb_val, cr_val = 90, 20, -30  # level-shifted chroma

        dc = ic._HuffTable(ic._STD_DC_BITS, ic._STD_DC_VALS)
        ac = ic._HuffTable(ic._STD_AC_BITS, ic._STD_AC_VALS)
        bw = ic._BitWriter()
        preds = {1: 0, 2: 0, 3: 0}

        def put_block(cid, dcval):
            zz = np.zeros(64, dtype=np.int64)
            zz[0] = dcval
            preds[cid] = ic._encode_block(bw, zz, preds[cid], dc, ac)

        # MCU order: 4 Y blocks, then Cb, then Cr
        for _ in range(4):
            put_block(1, 8 * (y_val - 128))
        put_block(2, 8 * cb_val)
        put_block(3, 8 * cr_val)
        bw.flush()

        qt_zz = np.ones(64, dtype=np.int64)
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" \
            + bytes(int(v) for v in qt_zz)
        sof = struct.pack(">BHHB", 8, h, w, 3)
        sof += bytes([1, 0x22, 0])  # Y: hs=2, vs=2
        sof += bytes([2, 0x11, 0])
        sof += bytes([3, 0x11, 0])
        out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
        out += ic._dht_segment(0, 0, ic._STD_DC_BITS, ic._STD_DC_VALS)
        out += ic._dht_segment(1, 0, ic._STD_AC_BITS, ic._STD_AC_VALS)
        sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        out += bw.out + b"\xff\xd9"

        img = ic.decode_jpeg(bytes(out))
        assert img.shape == (16, 16, 3)
        # expected JFIF conversion of the flat YCbCr triple
        r = round(y_val + 1.402 * cr_val)
        g = round(y_val - 0.344136 * cb_val - 0.714136 * cr_val)
        b = round(y_val + 1.772 * cb_val)
        want = [max(0, min(255, c)) for c in (r, g, b)]
        assert img[0, 0].tolist() == want
        assert (img == img[0, 0]).all()

    def test_420_cropping_non_mcu_multiple(self):
        # 12x10 frame with 2x2 Y sampling: MCU grid pads to 16x16;
        # decode must crop back to exactly (10, 12)
        h, w = 10, 12
        dc = ic._HuffTable(ic._STD_DC_BITS, ic._STD_DC_VALS)
        ac = ic._HuffTable(ic._STD_AC_BITS, ic._STD_AC_VALS)
        bw = ic._BitWriter()
        preds = {1: 0, 2: 0, 3: 0}

        def put_block(cid, dcval):
            zz = np.zeros(64, dtype=np.int64)
            zz[0] = dcval
            preds[cid] = ic._encode_block(bw, zz, preds[cid], dc, ac)

        for _ in range(4):
            put_block(1, 8 * (140 - 128))
        put_block(2, 0)
        put_block(3, 0)
        bw.flush()
        qt_zz = np.ones(64, dtype=np.int64)
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" \
            + bytes(int(v) for v in qt_zz)
        sof = struct.pack(">BHHB", 8, h, w, 3)
        sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) \
            + bytes([3, 0x11, 0])
        out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
        out += ic._dht_segment(0, 0, ic._STD_DC_BITS, ic._STD_DC_VALS)
        out += ic._dht_segment(1, 0, ic._STD_AC_BITS, ic._STD_AC_VALS)
        sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        out += bw.out + b"\xff\xd9"
        img = ic.decode_jpeg(bytes(out))
        assert img.shape == (10, 12, 3)
        assert (img == 140).all()  # gray: Cb=Cr=0


class TestPngTrns:
    def test_palette_trns_expands_to_rgba(self):
        pal = bytes(range(12))  # 4 colors
        trns = bytes([0, 128])  # first two entries translucent
        idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
        raw = _forward_filter(idx, [0], bpp=1)
        data = _png((2, 2, 8, 3, 0, 0, 0),
                    [(b"PLTE", pal), (b"tRNS", trns),
                     (b"IDAT", zlib.compress(raw))])
        out = ic.decode_png(data)
        assert out.shape == (2, 2, 4)
        assert out[0, 0, 3] == 0 and out[0, 1, 3] == 128
        assert out[1, 0, 3] == 255 and out[1, 1, 3] == 255  # default
        # RGB part unchanged
        want = np.frombuffer(pal, np.uint8).reshape(4, 3)[idx]
        assert (out[:, :, :3] == want).all()

    def test_gray_trns_ignored_cleanly(self):
        img = RNG.randint(0, 256, (4, 4), dtype=np.uint8)
        raw = _forward_filter(img, [0], bpp=1)
        data = _png((4, 4, 8, 0, 0, 0, 0),
                    [(b"tRNS", struct.pack(">H", 7)),
                     (b"IDAT", zlib.compress(raw))])
        out = ic.decode_png(data)
        assert (out[:, :, 0] == img).all()


class TestBmpGif:
    def test_bmp_roundtrip_gray_and_rgb(self):
        rng = np.random.default_rng(5)
        g = rng.integers(0, 256, (13, 17), np.uint8)
        assert np.array_equal(ic.decode_bmp(ic.encode_bmp(g)), g)
        c = rng.integers(0, 256, (9, 11, 3), np.uint8)
        assert np.array_equal(ic.decode_bmp(ic.encode_bmp(c)), c)

    def test_bmp_rejects_malformed(self):
        import pytest
        for bad in (b"", b"BM", b"BM" + b"\x00" * 60,
                    ic.encode_bmp(np.zeros((4, 4), np.uint8))[:40]):
            with pytest.raises(ValueError):
                ic.decode_bmp(bad)

    def test_gif_roundtrip(self):
        rng = np.random.default_rng(7)
        g = rng.integers(0, 256, (10, 14), np.uint8)
        assert np.array_equal(ic.decode_gif(ic.encode_gif(g)), g)
        c = np.zeros((6, 8, 3), np.uint8)
        c[::2] = (255, 0, 0)
        c[1::2] = (0, 0, 255)
        assert np.array_equal(ic.decode_gif(ic.encode_gif(c)), c)

    def test_gif_interlace(self):
        # store rows in interlace pass order, flip the interlace bit:
        # the decoder must un-permute back to the original image
        rng = np.random.default_rng(9)
        x = rng.integers(0, 256, (11, 5), np.uint8)
        order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for r in range(start, 11, step)]
        permuted = x[order]
        blob = bytearray(ic.encode_gif(permuted))
        desc = 13 + 3 * 256          # header+LSD+gray GCT
        assert blob[desc] == 0x2C
        blob[desc + 9] |= 0x40       # interlace flag
        assert np.array_equal(ic.decode_gif(bytes(blob)), x)

    def test_gif_extension_blocks_skipped(self):
        g = np.full((4, 4), 7, np.uint8)
        blob = bytearray(ic.encode_gif(g))
        # splice a graphic-control extension after the color table
        desc = 13 + 3 * 256
        ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        blob[desc:desc] = ext
        assert np.array_equal(ic.decode_gif(bytes(blob)), g)

    def test_bmp_gif_mutation_fuzz(self):
        import random
        rnd = random.Random(21)
        rng = np.random.default_rng(3)
        bases = [ic.encode_bmp(
                     rng.integers(0, 256, (8, 8), np.uint8)),
                 ic.encode_bmp(
                     rng.integers(0, 256, (6, 6, 3), np.uint8)),
                 ic.encode_gif(
                     rng.integers(0, 256, (8, 8), np.uint8))]
        for base in bases:
            for _ in range(80):
                blob = bytearray(base)
                for _ in range(rnd.randint(1, 5)):
                    blob[rnd.randrange(len(blob))] = rnd.randrange(256)
                try:
                    if blob.startswith(b"BM"):
                        ic.decode_bmp(bytes(blob))
                    else:
                        ic.decode_gif(bytes(blob))
                except ValueError:
                    pass  # error envelope; other exceptions fail

    def test_webp_dims_variants(self):
        for v in ("vp8", "vp8l", "vp8x"):
            assert ic.webp_dims(
                ic.encode_webp_header(640, 360, v)) == (v, 640, 360)

    def test_avif_dims(self):
        from pdf_to_text_extraction_service_spark.kernel import mp4box
        assert mp4box.parse_avif_dims(
            mp4box.encode_avif_header(1920, 1080)) == ("avif", 1920, 1080)


class TestTiff:
    def test_roundtrip_endianness_packbits_strips(self):
        rng = np.random.default_rng(9)
        g = rng.integers(0, 256, (13, 17), np.uint8)
        for be in (False, True):
            for pb in (False, True):
                for rps in (None, 4):
                    got = ic.decode_tiff(ic.encode_tiff(
                        g, big_endian=be, packbits=pb,
                        rows_per_strip=rps))
                    assert np.array_equal(got, g), (be, pb, rps)
        c = rng.integers(0, 256, (7, 9, 3), np.uint8)
        assert np.array_equal(
            ic.decode_tiff(ic.encode_tiff(c, packbits=True,
                                          rows_per_strip=3)), c)

    def test_white_is_zero_inverts(self):
        # photometric 0: rewrite the tag in a gray fixture
        g = np.full((4, 4), 10, np.uint8)
        blob = bytearray(ic.encode_tiff(g))
        i = blob.find((262).to_bytes(2, "little"))
        assert i > 0
        blob[i + 8] = 0  # photometric 1 -> 0
        assert np.array_equal(ic.decode_tiff(bytes(blob)),
                              np.full((4, 4), 245, np.uint8))

    def test_rejects_malformed(self):
        for bad in (b"", b"II*\x00", b"MM\x00*\x00\x00\x00\x08",
                    ic.encode_tiff(np.zeros((4, 4), np.uint8))[:30]):
            with pytest.raises(ValueError):
                ic.decode_tiff(bad)

    def test_mutation_fuzz(self):
        import random
        rnd = random.Random(17)
        rng = np.random.default_rng(2)
        base = ic.encode_tiff(rng.integers(0, 256, (8, 8), np.uint8),
                              packbits=True, rows_per_strip=3)
        for _ in range(150):
            blob = bytearray(base)
            for _ in range(rnd.randint(1, 5)):
                blob[rnd.randrange(len(blob))] = rnd.randrange(256)
            try:
                ic.decode_tiff(bytes(blob))
            except ValueError:
                pass  # error envelope; other exceptions fail


def test_tiff_deflate_round_trip():
    """Adobe Deflate (compression 8) strips, with and without the
    horizontal-differencing predictor, both byte orders."""
    rng = np.random.default_rng(2)
    for shape in ((13, 17), (9, 11, 3)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        for pred in (False, True):
            for be in (False, True):
                t = ic.encode_tiff(
                    img, big_endian=be, deflate=True,
                    predictor=pred, rows_per_strip=4)
                assert (ic.decode_tiff(t) == img).all()


def test_tiff_deflate_bomb_guard():
    """A deflate strip inflating past the expected strip size is a
    format error, not an allocation: output is capped at `expect`."""
    import struct as _s
    import zlib

    base = bytearray(ic.encode_tiff(
        np.zeros((4, 4), np.uint8), deflate=True))
    bomb = zlib.compress(b"\x00" * 10_000_000)
    # strip data sits at the end; rebuild with the oversize strip by
    # re-encoding manually is brittle — instead decode a hand-built
    # minimal TIFF whose single strip is the bomb
    def tiff_with_strip(strip: bytes) -> bytes:
        entries = []
        def entry(tag, typ, val):
            fmt = {3: "H", 4: "I"}[typ]
            raw = _s.pack("<" + fmt, val)
            raw += b"\x00" * (4 - len(raw))
            entries.append(_s.pack("<HHI", tag, typ, 1) + raw)
        strip_off = 8 + 2 + 12 * 8 + 4
        entry(256, 4, 4)          # width
        entry(257, 4, 4)          # height
        entry(258, 3, 8)          # bits
        entry(259, 3, 8)          # deflate
        entry(262, 3, 1)          # photometric
        entry(273, 4, strip_off)  # strip offset
        entry(278, 4, 4)          # rows per strip
        entry(279, 4, len(strip))
        body = b"II*\x00" + _s.pack("<I", 8) + _s.pack("<H", 8) \
            + b"".join(entries) + _s.pack("<I", 0) + strip
        return body
    out = ic.decode_tiff(tiff_with_strip(bomb))
    assert out.shape == (4, 4) and (out == 0).all()
    # and a truncated/garbage deflate strip errors cleanly
    with pytest.raises(ValueError):
        ic.decode_tiff(tiff_with_strip(b"\x01\x02\x03"))
