"""MIME sniff breadth (kernel/sniff.py _sniff_breadth/_sniff_zip).

The reference's mimetype tree names 170+ types
(internal/extract/download.go:211-229); this covers the common-crawl
tail so extension-less payloads dispatch (or fail) under their real
name instead of application/octet-stream.
"""

import numpy as np

from pdf_to_text_extraction_service_spark.kernel import sniff


def test_media_and_image_magics():
    from pdf_to_text_extraction_service_spark.kernel import (
        audiocodec,
        imgcodec,
        vp8l,
    )

    img = np.full((4, 4), 7, np.uint8)
    cases = [
        (vp8l.encode_webp_lossless(
            np.zeros((2, 2, 4), np.uint8)), "image/webp"),
        (audiocodec.encode_wav(np.zeros(64, np.int16), 8000),
         "audio/wav"),
        (imgcodec.encode_tiff(img), "image/tiff"),
        (imgcodec.encode_bmp(img), "image/bmp"),
        (audiocodec.encode_mp3_frames([128] * 2), "audio/mpeg"),
        (audiocodec.encode_mp3_frames([128], id3_bytes=4), "audio/mpeg"),
        (audiocodec.encode_adts(2), "audio/aac"),
        (b"fLaC" + b"\x00" * 40, "audio/flac"),
        (b"\x1a\x45\xdf\xa3" + b"\x42\x82\x84webm", "video/webm"),
        (b"\x1a\x45\xdf\xa3" + b"\x42\x82\x88matroska", "video/x-matroska"),
        (b"FLV\x01\x05" + b"\x00" * 10, "video/x-flv"),
        (b"\x00\x00\x00\x18ftypisom" + b"\x00" * 8, "video/mp4"),
        (b"\x00\x00\x00\x18ftypM4A " + b"\x00" * 8, "audio/mp4"),
        (b"\x00\x00\x00\x18ftypavif" + b"\x00" * 8, "image/avif"),
        (b"\x00\x00\x00\x18ftypqt  " + b"\x00" * 8, "video/quicktime"),
        (b"\x00\x00\x01\x00\x01\x00" + b"\x00" * 20, "image/x-icon"),
        (b"MThd\x00\x00\x00\x06" + b"\x00" * 8, "audio/midi"),
    ]
    for payload, want in cases:
        assert sniff.sniff_mime(payload) == want, (want,
                                                   payload[:16])


def test_archive_font_exec_magics():
    cases = [
        (b"7z\xbc\xaf\x27\x1c" + b"\x00" * 8, "application/x-7z-compressed"),
        (b"Rar!\x1a\x07\x00" + b"\x00" * 8, "application/x-rar-compressed"),
        (b"BZh91AY&SY" + b"\x00" * 8, "application/x-bzip2"),
        (b"\xfd7zXZ\x00" + b"\x00" * 8, "application/x-xz"),
        (b"\x28\xb5\x2f\xfd" + b"\x00" * 8, "application/zstd"),
        (b"\x00" * 257 + b"ustar\x00" + b"\x00" * 8, "application/x-tar"),
        (b"\x7fELF\x02\x01\x01" + b"\x00" * 8, "application/x-elf"),
        (b"MZ\x90\x00" + b"\x00" * 8,
         "application/vnd.microsoft.portable-executable"),
        (b"wOFF\x00\x01\x00\x00" + b"\x00" * 8, "font/woff"),
        (b"wOF2\x00\x01\x00\x00" + b"\x00" * 8, "font/woff2"),
        (b"OTTO\x00\x0a" + b"\x00" * 8, "font/otf"),
        (b"SQLite format 3\x00" + b"\x00" * 8,
         "application/vnd.sqlite3"),
        (b"\x00asm\x01\x00\x00\x00", "application/wasm"),
        (b"PAR1" + b"\x00" * 8, "application/vnd.apache.parquet"),
        (b'<?xml version="1.0"?><root/>', "text/xml; charset=utf-8"),
        (b'<?xml version="1.0"?><svg xmlns="x"/>', "image/svg+xml"),
        (b'<svg xmlns="http://www.w3.org/2000/svg"/>',
         "image/svg+xml"),
    ]
    for payload, want in cases:
        assert sniff.sniff_mime(payload) == want, (want,
                                                   payload[:16])


def _zip_with_first_member(name: bytes, body: bytes,
                           extra_names: list[bytes] = ()) -> bytes:
    """Minimal STORED zip: local headers only (enough for the
    sniffer's bounded member peek)."""
    import struct
    import zlib

    out = bytearray()
    for nm, bd in [(name, body)] + [(n, b"x") for n in extra_names]:
        out += struct.pack("<IHHHHHIIIHH", 0x04034B50, 20, 0, 0, 0, 0,
                           zlib.crc32(bd), len(bd), len(bd),
                           len(nm), 0)
        out += nm + bd
    return bytes(out)


def test_zip_refinement():
    assert sniff.sniff_mime(_zip_with_first_member(
        b"mimetype", b"application/epub+zip")) == "application/epub+zip"
    assert sniff.sniff_mime(_zip_with_first_member(
        b"mimetype", b"application/vnd.oasis.opendocument.text")) \
        == "application/vnd.oasis.opendocument.text"
    assert sniff.sniff_mime(_zip_with_first_member(
        b"[Content_Types].xml", b"<xml/>", [b"word/document.xml"])) \
        == ("application/vnd.openxmlformats-officedocument"
            ".wordprocessingml.document")
    assert sniff.sniff_mime(_zip_with_first_member(
        b"[Content_Types].xml", b"<xml/>", [b"xl/workbook.xml"])) \
        == ("application/vnd.openxmlformats-officedocument"
            ".spreadsheetml.sheet")
    assert sniff.sniff_mime(_zip_with_first_member(
        b"META-INF/MANIFEST.MF", b"Manifest-Version: 1.0")) \
        == "application/jar"
    assert sniff.sniff_mime(_zip_with_first_member(
        b"random.txt", b"hello")) == "application/zip"


def test_extensionless_ooxml_dispatches_by_sniff():
    """A real DOCX payload at an extension-less URL must route to the
    DOCX extractor via the refined zip sniff (registry precedence:
    ext > mime)."""
    from pdf_to_text_extraction_service_spark.kernel import router
    from pdf_to_text_extraction_service_spark.sources.officegen import (
        make_docx,
    )

    payload = make_docx([{"text": "Hello sniffed docx world."}])
    res, fmt = router.extract_document("https://x.test/download", payload)
    assert fmt == "docx" and res.success
    assert "Hello sniffed docx world." in res.text


def test_breadth_never_shadows_text_fallback():
    assert sniff.sniff_mime(b"plain ascii words only") \
        == "text/plain; charset=utf-8"
    assert sniff.sniff_mime(b"\x00\x01binary junk") \
        == "application/octet-stream"
