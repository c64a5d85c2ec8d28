"""kernel/pngmeta.py: PNG tEXt/zTXt/iTXt textual metadata.
Round-trips through the module's own fixture builders on real
encode_png streams plus mutation fuzz for the ValueError-only
contract."""

from __future__ import annotations

import random
import zlib

import numpy as np
import pytest

from pdf_to_text_extraction_service_spark.kernel import (
    imgcodec,
    pngmeta,
)

FIELDS = {"title": "Señal de Prueba", "author": "The Fixtures",
          "description": "Round six test image",
          "copyright": "CC0", "software": "fixturegen 1.0",
          "source": "synthetic", "comment": "hello"}


def _png() -> bytes:
    return imgcodec.encode_png(
        (np.arange(64).reshape(8, 8) * 3 % 256).astype(np.uint8))


@pytest.mark.parametrize("kind", ["tEXt", "zTXt", "iTXt"])
def test_roundtrip_all_chunk_kinds(kind):
    png = pngmeta.inject_before_iend(
        _png(), pngmeta.build_text_chunks(FIELDS, kind))
    got = pngmeta.parse_png_text(png)
    for f, v in FIELDS.items():
        assert got[f] == v, (kind, f)
    assert got["n_text_chunks"] == len(FIELDS)
    # the spliced stream still pixel-decodes
    assert imgcodec.decode_png(png).shape[:2] == (8, 8)


def test_no_text_chunks_is_not_an_error():
    got = pngmeta.parse_png_text(_png())
    assert got["n_text_chunks"] == 0
    assert all(got[f] is None for f in pngmeta.PNG_TEXT_FIELDS)


def test_first_registered_keyword_wins_unknown_only_counts():
    chunks = (pngmeta.build_text_chunks({"title": "first"})
              + pngmeta.build_text_chunks({"title": "second"})
              + imgcodec._chunk(b"tEXt", b"CustomKey\x00whatever"))
    got = pngmeta.parse_png_text(
        pngmeta.inject_before_iend(_png(), chunks))
    assert got["title"] == "first"
    assert got["n_text_chunks"] == 3


def test_non_png_and_malformed_raise_value_error():
    with pytest.raises(ValueError):
        pngmeta.parse_png_text(b"GIF89a" + bytes(16))
    with pytest.raises(ValueError):
        pngmeta.parse_png_text(b"")
    # keyword without NUL separator
    bad = pngmeta.inject_before_iend(
        _png(), imgcodec._chunk(b"tEXt", b"NoSeparatorHere"))
    with pytest.raises(ValueError):
        pngmeta.parse_png_text(bad)
    # zTXt with unknown method byte
    bad = pngmeta.inject_before_iend(
        _png(), imgcodec._chunk(b"zTXt", b"Title\x00\x01xx"))
    with pytest.raises(ValueError):
        pngmeta.parse_png_text(bad)


def test_inflate_budget():
    bomb = zlib.compress(b"x" * (pngmeta.MAX_TEXT_BYTES + 1))
    blob = imgcodec._chunk(b"zTXt", b"Title\x00\x00" + bomb)
    with pytest.raises(ValueError, match="budget"):
        pngmeta.parse_png_text(
            pngmeta.inject_before_iend(_png(), blob))


def test_mutation_fuzz_value_error_only():
    rng = random.Random(23)
    seeds = [pngmeta.inject_before_iend(
        _png(), pngmeta.build_text_chunks(FIELDS, k))
        for k in ("tEXt", "zTXt", "iTXt")]
    for s in seeds:
        for _ in range(150):
            b = bytearray(s)
            for _ in range(rng.randrange(1, 5)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                out = pngmeta.parse_png_text(bytes(b))
                assert isinstance(out, dict)
            except ValueError:
                pass
        for cut in range(0, len(s), 23):
            try:
                pngmeta.parse_png_text(s[:cut])
            except ValueError:
                pass
