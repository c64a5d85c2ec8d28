"""MIME sniff long-tail breadth (VERDICT r5 missing #5): the
reference detects 170+ types via gabriel-vasile/mimetype before Go's
http.DetectContentType fallback (internal/extract/download.go:211-229).
kernel/sniff.py now carries the crawl-relevant tail; each case below
is one synthetic payload exercising one signature, plus the magic
conflicts the mimetype tree disambiguates (Java class vs fat Mach-O,
Access vs TTF) and prose lookalikes that must NOT match."""

from __future__ import annotations

from pdf_to_text_extraction_service_spark.kernel.sniff import sniff_mime


def _pad(b: bytes, n: int = 64) -> bytes:
    return b + bytes(max(0, n - len(b)))


BINARY_CASES = [
    # archives / compression
    (_pad(b"\x04\x22\x4d\x18\x40\x70\xdf"), "application/x-lz4"),
    (_pad(b"\x1f\x9d\x90abc"), "application/x-compress"),
    (_pad(b"LZIP\x01\x0c"), "application/lzip"),
    (_pad(b"xar!\x00\x1c\x00\x01"), "application/x-xar"),
    (b"070701" + b"0" * 104, "application/x-cpio"),
    (b"!<arch>\ndebian-binary   1714000000  0     0     100644  4",
     "application/vnd.debian.binary-package"),
    (b"!<arch>\nfoo.o/          1714000000  0     0     100644  8",
     "application/x-archive"),
    (_pad(b"\xed\xab\xee\xdb\x03\x00\x00\x00"), "application/x-rpm"),
    (bytes(0x8001) + b"CD001\x01" + bytes(64), "application/x-iso9660-image"),
    (_pad(b"MSCF\x00\x00\x00\x00"), "application/vnd.ms-cab-compressed"),
    (_pad(b"ITSF\x03\x00\x00\x00"), "application/vnd.ms-htmlhelp"),
    (_pad(b"Cr24\x02\x00\x00\x00"), "application/x-chrome-extension"),
    # executables
    (_pad(b"\xca\xfe\xba\xbe\x00\x00\x00\x02"), "application/x-mach-binary"),
    (_pad(b"\xca\xfe\xba\xbe\x00\x03\x00\x34"), "application/x-java-applet"),
    (_pad(b"\xcf\xfa\xed\xfe\x07\x00\x00\x01"), "application/x-mach-binary"),
    (_pad(b"L\x00\x00\x00\x01\x14\x02\x00"), "application/x-ms-shortcut"),
    (_pad(b"CWS\x0a\x12\x34\x00\x00"), "application/x-shockwave-flash"),
    # fonts
    (bytes((0, 1, 0, 0)) + b"Standard Jet DB\x00" + bytes(32),
     "application/x-msaccess"),
    (_pad(b"\x00\x01\x00\x00\x00\x0c"), "font/ttf"),
    (_pad(b"true\x00\x0c\x00\x80"), "font/ttf"),
    (_pad(b"ttcf\x00\x01\x00\x00"), "font/collection"),
    (bytes(8) + b"\x00\x00\x01\x00" + bytes(22) + b"LP" + bytes(16),
     "application/vnd.ms-fontobject"),
    # data / science
    (_pad(b"ORC\x00\x03"), "application/x-orc"),
    (_pad(b"Obj\x01\x04\x14avro.codec"), "application/avro"),
    (_pad(b"\x89HDF\r\n\x1a\n\x00"), "application/x-hdf"),
    (b"SIMPLE  =                    T" + bytes(50), "application/fits"),
    (_pad(b"\xd4\xc3\xb2\xa1\x02\x00\x04\x00"),
     "application/vnd.tcpdump.pcap"),
    (_pad(b"\x0a\x0d\x0d\x0a\x1c\x00\x00\x00"), "application/x-pcapng"),
    (bytes(128) + b"DICM\x02\x00" + bytes(32), "application/dicom"),
    # images
    (_pad(b"\x00\x00\x00\x0cJXL \r\n\x87\n"), "image/jxl"),
    (_pad(b"\xff\x0a\x10\x88"), "image/jxl"),
    (_pad(b"\x76\x2f\x31\x01\x02\x00"), "image/x-exr"),
    (b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n" + bytes(16),
     "image/vnd.radiance"),
    (_pad(b"8BPS\x00\x01"), "image/vnd.adobe.photoshop"),
    (_pad(b"gimp xcf v011\x00"), "image/x-xcf"),
    (_pad(b"icns\x00\x00\x10\x00"), "image/x-icns"),
    (_pad(b"\x00\x00\x02\x00\x01\x00"), "image/x-icon"),
    (_pad(b"AT&TFORM\x00\x01\x02\x03DJVM"), "image/vnd.djvu"),
    (_pad(b"BPG\xfb\x20\x00"), "image/bpg"),
    (b"P6\n4 4\n255\n" + bytes(48), "image/x-portable-anymap"),
    (_pad(b"glTF\x02\x00\x00\x00"), "model/gltf-binary"),
    # audio
    (_pad(b".snd\x00\x00\x00\x18"), "audio/basic"),
    (_pad(b"MAC \x96\x0f\x00\x00"), "audio/ape"),
    (_pad(b"wvpk\x10\x00\x00\x00"), "audio/wavpack"),
    (_pad(b"MPCK\x01\x00"), "audio/musepack"),
    (_pad(b"MP+\x07\x2e"), "audio/musepack"),
    (_pad(b"caff\x00\x01\x00\x00"), "audio/x-caf"),
    (_pad(b".RMF\x00\x00\x00\x12"), "application/vnd.rn-realmedia-vbr"),
    (_pad(b".ra\xfd\x00\x03"), "audio/x-pn-realaudio"),
    # video
    (_pad(b"\x00\x00\x01\xba\x44\x00"), "video/mpeg"),
    (_pad(b"\x00\x00\x01\xb3\x16\x00"), "video/mpeg"),
    (bytes([0x47]) + bytes(187) + bytes([0x47]) + bytes(187)
     + bytes([0x47]) + bytes(187), "video/mp2t"),
    (_pad(b"\x1f\x07\x00\x3f"), "video/dv"),
    (_pad(b"\x06\x0e\x2b\x34\x02\x05\x01\x01\x0d\x01\x02"),
     "application/mxf"),
    # misc
    (b"d8:announce35:https://tracker.example/announce4:info",
     "application/x-bittorrent"),
    (_pad(b"BLENDER-v404RENDH"), "application/x-blender"),
    (_pad(b"\xf7\x02\x01\x83\x92\xc0"), "application/x-dvi"),
]

TEXT_CASES = [
    (b"#!/usr/bin/env python3\nprint('hi')\n", "text/x-python"),
    (b"#!/bin/bash\necho hi\n", "text/x-shellscript"),
    (b"#!/usr/bin/perl -w\nprint 1;\n", "text/x-perl"),
    (b"#!/usr/bin/ruby\nputs 1\n", "text/x-ruby"),
    (b"#!/usr/bin/env node\nconsole.log(1)\n", "text/javascript"),
    (b"#!/opt/weird/frobnicator\nx\n", "text/x-script"),
    (b"WARC/1.0\r\nWARC-Type: response\r\n", "application/warc"),
    (b"#EXTM3U\n#EXTINF:123,Song\nhttp://x/y.mp3\n", "audio/x-mpegurl"),
    (b"[playlist]\nNumberOfEntries=1\nFile1=http://x\n", "audio/x-scpls"),
    (b"WEBVTT\n\n00:00.000 --> 00:01.000\nhi\n", "text/vtt"),
    (b"1\n00:00:01,000 --> 00:00:02,500\nhello there\n",
     "application/x-subrip"),
    (b"BEGIN:VCARD\nVERSION:3.0\nFN:A B\nEND:VCARD\n", "text/vcard"),
    (b"BEGIN:VCALENDAR\nVERSION:2.0\nEND:VCALENDAR\n", "text/calendar"),
    (b"<?php\necho 'hi';\n", "text/x-php"),
    (b"From alice@example.com Mon Apr  1 10:00:00 2024\nSubject: x\n",
     "application/mbox"),
    (b"Received: from mx.example (mx.example [10.0.0.1])\n\tby in;\n",
     "message/rfc822"),
    (b'{"a": 1, "b": [true, null]}', "application/json"),
    (b'[1, 2, {"c": "d"}]', "application/json"),
]

XML_CASES = [
    (b'<?xml version="1.0"?>\n<rss version="2.0"><channel/></rss>',
     "application/rss+xml"),
    (b'<?xml version="1.0"?>\n<feed xmlns="http://www.w3.org/2005/Atom"/>',
     "application/atom+xml"),
    (b'<?xml version="1.0"?>\n<kml xmlns="http://www.opengis.net/kml/2.2"/>',
     "application/vnd.google-earth.kml+xml"),
    (b'<?xml version="1.0"?>\n<gpx version="1.1"><trk/></gpx>',
     "application/gpx+xml"),
    (b'<?xml version="1.0"?>\n<!DOCTYPE html>\n'
     b'<html xmlns="http://www.w3.org/1999/xhtml"><body/></html>',
     "application/xhtml+xml"),
    # root element without an <?xml?> declaration
    (b'<rss version="2.0"><channel><title>t</title></channel></rss>',
     "application/rss+xml"),
    # RSS carrying inline <svg> in a description must stay RSS
    (b'<?xml version="1.0"?>\n<rss version="2.0"><channel><description>'
     b'&lt;svg&gt;<svg width="1"/></description></channel></rss>',
     "application/rss+xml"),
    # plain xml stays xml
    (b'<?xml version="1.0"?>\n<note><to>x</to></note>',
     "text/xml; charset=utf-8"),
]

PROSE_GUARDS = [
    # lookalike text must fall through to text/plain
    (b"MAC addresses are assigned by the IEEE to each vendor block.",
     "text/plain; charset=utf-8"),
    (b"caffeine is a central nervous system stimulant of note.",
     "text/plain; charset=utf-8"),
    (b"ORCHESTRA rehearsals resume on Monday in the main hall.",
     "text/plain; charset=utf-8"),
    (b"LZIP is a lossless data compressor based on LZMA.",
     "text/plain; charset=utf-8"),
    (b"CWS stands for collaborative workspace in this doc.",
     "text/plain; charset=utf-8"),
    (b"true story: the font cache was stale all along.",
     "text/plain; charset=utf-8"),
    (b"From here on out, the protocol is simple text.",
     "text/plain; charset=utf-8"),
    (b"{not json at all", "text/plain; charset=utf-8"),
    (b"P6 is one of the netpbm magic numbers, spelled out.",
     # P6 + space IS the netpbm signature shape; mimetype accepts the
     # same false positive — documented parity, not a guard
     "image/x-portable-anymap"),
]


def test_binary_breadth():
    for payload, want in BINARY_CASES:
        assert sniff_mime(payload) == want, (want, payload[:16])


def test_text_breadth():
    for payload, want in TEXT_CASES:
        assert sniff_mime(payload) == want, (want, payload[:32])


def test_xml_flavors():
    for payload, want in XML_CASES:
        assert sniff_mime(payload) == want, (want, payload[:48])


def test_prose_guards():
    for payload, want in PROSE_GUARDS:
        assert sniff_mime(payload) == want, (want, payload[:32])


def test_existing_types_unchanged():
    assert sniff_mime(b"%PDF-1.7\n%\xe2\xe3") == "application/pdf"
    assert sniff_mime(b"\x89PNG\r\n\x1a\n" + bytes(16)) == "image/png"
    assert sniff_mime(b"<!doctype html><p>x") == "text/html; charset=utf-8"
    assert sniff_mime(bytes([0, 1, 2, 3]) + bytes(16)) \
        == "application/octet-stream"
    assert sniff_mime(b"plain words only here") \
        == "text/plain; charset=utf-8"
    # svg with an xml declaration still resolves via the root element
    assert sniff_mime(b'<?xml version="1.0"?>\n<svg width="1"/>') \
        == "image/svg+xml"
    assert sniff_mime(b'<svg xmlns="http://www.w3.org/2000/svg"/>') \
        == "image/svg+xml"


def test_never_raises_on_mutations():
    import random

    rng = random.Random(7)
    seeds = [p for p, _ in BINARY_CASES + TEXT_CASES + XML_CASES]
    for s in seeds:
        for _ in range(4):
            b = bytearray(s)
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            out = sniff_mime(bytes(b))
            assert isinstance(out, str) and out
        assert isinstance(sniff_mime(bytes(s[:rng.randrange(1, len(s))])),
                          str)


def test_content_statistical_detectors():
    # NDJSON: every line a standalone JSON object/array, >= 2 lines
    assert sniff_mime(b'{"a":1}\n{"b":2}\n{"c":[3]}\n') \
        == "application/x-ndjson"
    assert sniff_mime(b'[1,2]\n[3,4]\n') == "application/x-ndjson"
    # a single JSON document stays application/json (whole-payload rule)
    assert sniff_mime(b'{"a":1}') == "application/json"
    assert sniff_mime(b'{"a": 1,\n "b": 2}\n') == "application/json"
    # scalar lines are NOT ndjson (prose guard)
    assert sniff_mime(b'[intro]\n123\n') == "text/plain; charset=utf-8"
    # CSV/TSV: uniform field count > 1 over > 1 records
    assert sniff_mime(b"a,b,c\n1,2,3\n4,5,6\n") == "text/csv"
    assert sniff_mime(b'x,"quoted, comma"\ny,z\n') == "text/csv"
    assert sniff_mime(b"a\tb\n1\t2\n") == "text/tab-separated-values"
    # prose with ragged commas / strict-quote errors stays text
    assert sniff_mime(b"Hello, world\nGoodbye now\n") \
        == "text/plain; charset=utf-8"
    assert sniff_mime(b'bad "quote, here\nok, row\n') \
        == "text/plain; charset=utf-8"
    # one line is never csv; empty field counts of 1 are never csv
    assert sniff_mime(b"a,b,c\n") == "text/plain; charset=utf-8"
    assert sniff_mime(b"a\nb\nc\n") == "text/plain; charset=utf-8"
    # oversized payloads drop the partial trailing line, still detect
    big = b"k,v\n" + b"\n".join(
        b"row%d,%d" % (i, i) for i in range(120000)) + b",trunc"
    assert len(big) > (1 << 20)
    assert sniff_mime(big) == "text/csv"


def test_unicode_line_separators_use_go_line_model():
    # U+2028 / U+0085 / \x0b / \x0c are NOT line boundaries in the Go
    # reference's \n-based model; str.splitlines() would split on
    # them and let the NDJSON/CSV gates disagree with gocsv.read_all
    # (which sees the undivided text).
    # A U+2028 inside a quoted CSV field: one \n-line pair, valid CSV.
    payload = 'a,"x\u2028y"\nb,c\n'.encode()
    assert sniff_mime(payload) == "text/csv"
    # U+0085 inside a JSON string: still one line per \n, valid NDJSON
    payload = '{"a":"p\u0085q"}\n{"b":1}\n'.encode()
    assert sniff_mime(payload) == "application/x-ndjson"
    # \x0c (form feed) between prose words must not fabricate a
    # second "line" that flips a single-line payload into csv range
    payload = b"only,one\x0cline,here\n"
    assert sniff_mime(payload) == "text/plain; charset=utf-8"
    # \r\n line endings still count as line boundaries
    assert sniff_mime(b"a,b\r\n1,2\r\n") == "text/csv"
