"""kernel/audiotags.py: ID3v2 + Vorbis-comment tag parsing.
Round-trips through the module's own fixture builders (v2.3 UTF-16
and v2.4 UTF-8 frames, unsynchronisation, FLAC block injection, Ogg
Vorbis/Opus comment packets) plus mutation fuzz for the
ValueError-only contract."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from pdf_to_text_extraction_service_spark.kernel import (
    audiocodec,
    audiotags,
    flacdec,
)

FIELDS = {"title": "Señal de Prueba", "artist": "The Fixtures",
          "album": "Round Six", "genre": "Electronic",
          "date": "2024", "track": "3/12", "tlen_ms": 187000}


@pytest.mark.parametrize("major", [3, 4])
def test_id3v2_roundtrip(major):
    tag = audiotags.build_id3v2(FIELDS, major=major)
    got = audiotags.parse_tags(tag + b"\xff\xfb" + bytes(64))
    assert got["container"] == "id3v2"
    assert got["title"] == "Señal de Prueba"
    assert got["artist"] == "The Fixtures"
    assert got["album"] == "Round Six"
    assert got["genre"] == "Electronic"
    assert got["date"] == "2024"
    assert got["track"] == "3/12"
    assert got["tlen_ms"] == 187000


def test_id3v2_unsync_roundtrip():
    tag = audiotags.build_id3v2(FIELDS, major=4, unsync=True)
    got = audiotags.parse_id3v2(tag)
    assert got["title"] == "Señal de Prueba"
    assert got["tlen_ms"] == 187000


def test_id3v22_three_byte_frames():
    # hand-built v2.2 frame: TT2, 3-byte size, latin-1 text
    payload = b"\x00Old Title"
    body = b"TT2" + len(payload).to_bytes(3, "big") + payload
    sz = len(body)
    tag = (b"ID3\x02\x00\x00"
           + bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                    (sz >> 7) & 0x7F, sz & 0x7F]) + body)
    got = audiotags.parse_id3v2(tag)
    assert got["title"] == "Old Title"


def test_flac_comment_injection():
    samples = (np.arange(800) % 64 * 100).astype(np.int64)
    flac = flacdec.encode_flac(samples, 8000)
    block = audiotags.build_vorbis_comment_block(FIELDS, vendor="v1")
    tagged = audiotags.inject_flac_comment(flac, block)
    got = audiotags.parse_tags(tagged)
    assert got["container"] == "flac"
    assert got["title"] == "Señal de Prueba"
    assert got["vendor"] == "v1"
    assert got["track"] == "3/12"
    # the tagged stream still fully sample-decodes
    rate, channels, samples = flacdec.decode_flac(tagged)
    assert rate == 8000 and samples.shape[0] == 800
    with pytest.raises(ValueError):
        audiotags.parse_tags(flac)  # untouched stream has no block


def test_ogg_vorbis_and_opus_windows():
    block = audiotags.build_vorbis_comment_block(FIELDS)
    ogg_v = b"OggS" + bytes(40) + b"\x03vorbis" + block + bytes(16)
    got = audiotags.parse_tags(ogg_v)
    assert got["container"] == "ogg-vorbis"
    assert got["artist"] == "The Fixtures"
    ogg_o = b"OggS" + bytes(40) + b"OpusTags" + block
    got = audiotags.parse_tags(ogg_o)
    assert got["container"] == "ogg-opus"
    assert got["album"] == "Round Six"


def test_id3v1_roundtrip_and_genre():
    blk = audiotags.build_id3v1(
        {"title": "Señal", "artist": "The Fixtures", "album": "R6",
         "date": "1997", "track": "7", "genre": "Jazz"})
    got = audiotags.parse_tags(b"\xff\xfb" + bytes(64) + blk)
    assert got["container"] == "id3v1"
    assert got["title"] == "Señal" and got["artist"] == "The Fixtures"
    assert got["date"] == "1997" and got["track"] == "7"
    assert got["genre"] == "Jazz" and got["tlen_ms"] is None
    # unknown genre byte (255) -> NULL, never guessed
    blk = audiotags.build_id3v1({"title": "x", "genre": "NotAGenre"})
    assert audiotags.parse_id3v1(blk)["genre"] is None


def test_id3v2_wins_v1_fills_gaps():
    v2 = audiotags.build_id3v2({"title": "V2 Title"}, major=4)
    v1 = audiotags.build_id3v1({"title": "V1 Title",
                                "artist": "V1 Artist"})
    got = audiotags.parse_tags(v2 + bytes(64) + v1)
    assert got["container"] == "id3v2"
    assert got["title"] == "V2 Title"     # v2 wins
    assert got["artist"] == "V1 Artist"   # v1 fills the gap


def test_riff_info_roundtrip():
    wav = audiotags.build_riff_info(FIELDS)
    got = audiotags.parse_tags(wav)
    assert got["container"] == "riff-info"
    assert got["title"] == "Señal de Prueba"
    assert got["album"] == "Round Six" and got["track"] == "3/12"
    # the built file still walks as a WAV (fmt chunk intact)
    with pytest.raises(ValueError):
        audiotags.parse_tags(audiocodec.encode_wav(
            np.zeros(16, np.int16), 8000))  # no INFO chunk


def test_m4a_ilst_roundtrip():
    m4a = audiotags.build_m4a_ilst(FIELDS)
    got = audiotags.parse_tags(m4a)
    assert got["container"] == "mp4-ilst"
    assert got["title"] == "Señal de Prueba"
    assert got["genre"] == "Electronic" and got["track"] == "3/12"
    # a plain encode_mp4 stream has no ilst
    from pdf_to_text_extraction_service_spark.kernel import mp4box
    with pytest.raises(ValueError):
        audiotags.parse_tags(mp4box.encode_mp4())


def test_partial_fields_and_bad_tlen():
    tag = audiotags.build_id3v2({"title": "Only"}, major=4)
    got = audiotags.parse_id3v2(tag)
    assert got["title"] == "Only" and got["artist"] is None
    tag = audiotags.build_id3v2({"tlen_ms": "notanumber"}, major=4)
    assert audiotags.parse_id3v2(tag)["tlen_ms"] is None


def test_no_tags_raises():
    with pytest.raises(ValueError):
        audiotags.parse_tags(b"RIFF....WAVE")
    with pytest.raises(ValueError):
        audiotags.parse_tags(b"")
    with pytest.raises(ValueError):
        audiotags.parse_tags(b"OggS" + bytes(64))


def test_oversized_structures_rejected():
    big = b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f"  # claims 256 MiB
    with pytest.raises(ValueError):
        audiotags.parse_id3v2(big)
    blk = struct.pack("<I", 4) + b"vend" + struct.pack("<I", 999)
    with pytest.raises(ValueError):
        audiotags._parse_vorbis_comment_block(blk + bytes(64), 0)


def test_mutation_fuzz_value_error_only():
    samples = (np.arange(400) % 32 * 50).astype(np.int64)
    flac = audiotags.inject_flac_comment(
        flacdec.encode_flac(samples, 8000),
        audiotags.build_vorbis_comment_block(FIELDS))
    seeds = [audiotags.build_id3v2(FIELDS, major=4) + bytes(32),
             audiotags.build_id3v2(FIELDS, major=3, unsync=False)
             + bytes(32), flac,
             b"OggS" + bytes(40) + b"\x03vorbis"
             + audiotags.build_vorbis_comment_block(FIELDS),
             bytes(48) + audiotags.build_id3v1(FIELDS),
             audiotags.build_riff_info(FIELDS),
             audiotags.build_m4a_ilst(FIELDS)]
    rng = random.Random(19)
    for s in seeds:
        for _ in range(150):
            b = bytearray(s)
            for _ in range(rng.randrange(1, 5)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                out = audiotags.parse_tags(bytes(b))
                assert isinstance(out, dict)
            except ValueError:
                pass
        for cut in range(0, len(s), 17):
            try:
                audiotags.parse_tags(s[:cut])
            except ValueError:
                pass


def test_oversized_tlen_becomes_null():
    # int64-overflow TLEN must NULL out, not crash the Arrow cast
    tag = audiotags.build_id3v2({"tlen_ms": "1" + "0" * 25}, major=4)
    assert audiotags.parse_id3v2(tag)["tlen_ms"] is None
    tag = audiotags.build_id3v2({"tlen_ms": 187000}, major=4)
    assert audiotags.parse_id3v2(tag)["tlen_ms"] == 187000


def _syncsafe4(n: int) -> bytes:
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])


def test_id3v24_per_frame_unsync_with_ff_bytes():
    # v2.4 + tag-level unsync flag: frame sizes describe the STORED
    # (per-frame unsynchronised) data.  A UTF-16 title (BOM FF FE)
    # forces real FF bytes into the frame — the regression the
    # global-undo walk misaligned on.
    text = "Café ｱｲ"  # multibyte + halfwidth kana -> FF bytes
    payload = b"\x01" + text.encode("utf-16")
    stored = payload.replace(b"\xff", b"\xff\x00")
    assert stored != payload  # the fixture really exercises unsync
    frame = b"TIT2" + _syncsafe4(len(stored)) + b"\x00\x00" + stored
    # second frame AFTER the FF-bearing one proves the walk stays
    # aligned past the unsynchronised frame
    p2 = b"\x03Artist Two"
    frame += b"TPE1" + _syncsafe4(len(p2)) + b"\x00\x00" + p2
    tag = b"ID3\x04\x00\x80" + _syncsafe4(len(frame)) + frame
    got = audiotags.parse_id3v2(tag)
    assert got["title"] == text
    assert got["artist"] == "Artist Two"


def test_id3v24_frame_level_unsync_flag():
    # frame flag 0x0002 without the tag-level flag
    text = "ｱ title"
    payload = b"\x01" + text.encode("utf-16")
    stored = payload.replace(b"\xff", b"\xff\x00")
    frame = b"TIT2" + _syncsafe4(len(stored)) + b"\x00\x02" + stored
    tag = b"ID3\x04\x00\x00" + _syncsafe4(len(frame)) + frame
    got = audiotags.parse_id3v2(tag)
    assert got["title"] == text


def test_id3v24_builder_emits_per_frame_unsync():
    # builder round-trip stays green AND the stored bytes differ from
    # the logical payload when fields contain codepoints that encode
    # with FF bytes in UTF-8 (none here, so just parity + flag check)
    tag = audiotags.build_id3v2(FIELDS, major=4, unsync=True)
    assert tag[5] & 0x80
    got = audiotags.parse_id3v2(tag)
    assert got["title"] == FIELDS["title"]
    assert got["tlen_ms"] == FIELDS["tlen_ms"]


def test_id3v22_compressed_tag_rejected():
    payload = b"\x00Old Title"
    body = b"TT2" + len(payload).to_bytes(3, "big") + payload
    tag = (b"ID3\x02\x00\x40" + _syncsafe4(len(body)) + body)
    with pytest.raises(ValueError, match="compressed ID3v2.2"):
        audiotags.parse_id3v2(tag)


def test_ogg_comment_block_straddles_window():
    # OpusTags header starts inside the 64 KiB window but its body
    # extends past it: must parse, not raise a truncation error
    win = audiotags._OGG_SCAN_WINDOW
    vendor = b"v" * 16
    big_val = "x" * 4096
    entry = f"TITLE=Straddle {big_val}".encode()
    block = (struct.pack("<I", len(vendor)) + vendor
             + struct.pack("<I", 2)
             + struct.pack("<I", len(entry)) + entry
             + struct.pack("<I", 12) + b"ARTIST=after")
    head = b"OggS" + bytes(win - 4 - 8 - 2048)  # header near window end
    data = head + b"OpusTags" + block
    assert len(head) + 8 + len(block) > win  # really straddles
    got = audiotags.parse_tags(data)
    assert got["container"] == "ogg-opus"
    assert got["title"] == f"Straddle {big_val}"
    assert got["artist"] == "after"
