"""Task-safety fuzz: the router must NEVER raise on any payload for
any dispatch route — a kernel exception at 100 TB is a task failure
that can kill the job (the reference's withRecovery guard,
cmd/server/main.go:539-549)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_to_text_extraction_service_spark.kernel import preview, registry, router

ALL_EXTS = sorted(registry.BY_EXT.keys())

payloads = st.one_of(
    st.binary(max_size=400),
    st.text(max_size=200).map(lambda s: s.encode("utf-8")),
    # container-ish prefixes to reach deeper kernel paths
    st.binary(max_size=200).map(lambda b: b"PK\x03\x04" + b),
    st.binary(max_size=200).map(lambda b: b"%PDF-1.4\n" + b),
    st.binary(max_size=200).map(lambda b: b"{" + b),
    st.binary(max_size=200).map(lambda b: b"<html>" + b),
)


@given(ext=st.sampled_from(ALL_EXTS), payload=payloads)
@settings(max_examples=400, deadline=None, derandomize=True)
def test_router_never_raises(ext, payload):
    res, fmt = router.extract_document(f"https://f.test/x{ext}", payload)
    assert isinstance(res.success, bool)
    assert res.success or res.error


@given(ext=st.sampled_from(ALL_EXTS), payload=payloads)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_preview_never_raises(ext, payload):
    res, fmt = preview.preview_document(f"https://f.test/x{ext}", payload)
    assert isinstance(res.success, bool)


def test_all_media_parsers_fuzz_truncation_and_splice():
    """Consolidated exception-type contract across EVERY untrusted-
    byte media parser: point mutations, truncations, and random
    splices must surface as ValueError only (a 44k-case offline
    campaign ran clean in r5; this keeps a fast cross-section in CI)."""
    import random

    import numpy as np

    from pdf_to_text_extraction_service_spark.kernel import (
        audiocodec as ac,
        imgcodec as ic,
        mp4box as m,
        videobox as vb,
    )

    rng = np.random.default_rng(42)
    rnd = random.Random(4242)
    g = rng.integers(0, 256, (12, 16), np.uint8)
    ones = np.ones(64, dtype=np.int64)
    cases = [
        (ic.decode_gif, ic.encode_gif(g)),
        (ic.decode_tiff, ic.encode_tiff(g, packbits=True,
                                        rows_per_strip=3)),
        (ic.decode_bmp, ic.encode_bmp(g)),
        (ic.decode_jpeg, ic.encode_jpeg_progressive(g, quant=ones)),
        (ac.parse_mp3, ac.encode_mp3_frames([128, 160] * 5,
                                            pad_every=2,
                                            id3_bytes=20)),
        (ac.parse_ogg, ac.encode_ogg("opus", 48000, 1,
                                     granule=48312, pages=3)),
        (ac.parse_flac, ac.encode_flac_header(44100, 2, 16, 44100)),
        (m.parse_mp4, m.encode_mp4("isom", 1000, 5000,
                                   [("vide", "avc1", 64, 48)])),
        (vb.parse_matroska, vb.encode_matroska(
            "webm", 9000, [(1, "V_VP9", 64, 48)])),
        (vb.parse_flv, vb.encode_flv(30, 64, 48)),
    ]
    for fn, base in cases:
        for trial in range(150):
            blob = bytearray(base)
            mode = trial % 3
            if mode == 0:
                for _ in range(rnd.randint(1, 8)):
                    blob[rnd.randrange(len(blob))] = rnd.randrange(256)
            elif mode == 1:
                blob = blob[:max(1, rnd.randrange(len(blob)))]
            else:
                at = rnd.randrange(len(blob))
                blob[at:at] = bytes(rnd.randrange(256)
                                    for _ in range(rnd.randint(1, 32)))
            try:
                fn(bytes(blob))
            except ValueError:
                pass  # the one allowed error type
