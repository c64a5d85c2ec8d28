"""Audio tag metadata: ID3v2 (MP3) and Vorbis comments (FLAC / Ogg
Vorbis / Ogg Opus).

The audio counterpart of kernel/exif.py: curation metadata a
training-data pipeline wants before an audio payload ships —
title/artist provenance, declared duration, genre/date rollup keys.
The reference's audio leg posts bytes to an ASR service
(internal/extractors/audio/transcribe.go:40-126) and never reads
tags; this is engine-added breadth built from the public ID3v2.2/
2.3/2.4 informal standards and the Vorbis-comment spec only.

Subset posture:

- ID3v2: syncsafe header size; v2.3 (plain-BE frame sizes) and v2.4
  (syncsafe frame sizes) frames, v2.2 three-byte frames; tag-level
  unsynchronisation undone; extended headers skipped.  Text frames
  decode encodings 0 (latin-1), 1 (UTF-16 BOM), 2 (UTF-16BE),
  3 (UTF-8).  Compressed/encrypted frames are skipped, never
  guessed.
- Vorbis comments: the FLAC VORBIS_COMMENT metadata block walked
  from the stream head; for Ogg, the '\\x03vorbis' / 'OpusTags'
  comment packet located within the first 64 KiB (comment headers
  that straddle beyond that window fall back to no-tags).
- Everything is bounded (256 frames / comments, 1 MiB tag size) and
  malformed structures raise ValueError; the operator layer maps
  that to a NULL row.
"""

from __future__ import annotations

import struct

TAG_FIELDS = ("title", "artist", "album", "genre", "date", "track",
              "tlen_ms", "vendor")

# ID3 frame id -> field, per version family
_FRAMES_V34 = {
    b"TIT2": "title", b"TPE1": "artist", b"TALB": "album",
    b"TCON": "genre", b"TYER": "date", b"TDRC": "date",
    b"TRCK": "track", b"TLEN": "tlen_ms",
}
_FRAMES_V2 = {
    b"TT2": "title", b"TP1": "artist", b"TAL": "album",
    b"TCO": "genre", b"TYE": "date", b"TRK": "track",
    b"TLE": "tlen_ms",
}

_VORBIS_KEYS = {
    "TITLE": "title", "ARTIST": "artist", "ALBUM": "album",
    "GENRE": "genre", "DATE": "date", "TRACKNUMBER": "track",
}

MAX_TAG_BYTES = 1 << 20
_OGG_SCAN_WINDOW = 1 << 16


def parse_tags(data: bytes) -> dict:
    """Audio payload -> {container, fields...}.  Raises ValueError
    when the payload carries no recognized tag structure."""
    if data[:3] == b"ID3":
        out = parse_id3v2(data)
        out["container"] = "id3v2"
        return out
    if data[:4] == b"fLaC":
        out = _parse_flac_comments(data)
        out["container"] = "flac"
        return out
    if data[:4] == b"OggS":
        out = _parse_ogg_comments(data)
        return out
    raise ValueError("audiotags: no ID3v2/FLAC/Ogg tag structure")


def _syncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise ValueError("audiotags: non-syncsafe size byte")
    v = 0
    for x in b:
        v = (v << 7) | (x & 0x7F)
    return v


def parse_id3v2(data: bytes) -> dict:
    """ID3v2.2/2.3/2.4 text frames -> field dict."""
    if len(data) < 10 or data[:3] != b"ID3":
        raise ValueError("audiotags: no ID3v2 header")
    major, _rev, flags = data[3], data[4], data[5]
    if major not in (2, 3, 4):
        raise ValueError(f"audiotags: ID3v2.{major} unsupported")
    size = _syncsafe(data[6:10])
    if size > MAX_TAG_BYTES:
        raise ValueError("audiotags: oversized ID3v2 tag")
    body = bytes(data[10:10 + size])
    if len(body) < size:
        raise ValueError("audiotags: truncated ID3v2 tag")
    if flags & 0x80:  # tag-level unsynchronisation: FF 00 -> FF
        body = body.replace(b"\xff\x00", b"\xff")
    pos = 0
    if flags & 0x40 and major in (3, 4):  # extended header
        if len(body) < 4:
            raise ValueError("audiotags: truncated extended header")
        ehs = struct.unpack_from(">I", body, 0)[0]
        if major == 4:
            ehs = _syncsafe(body[0:4])
        else:
            ehs += 4  # v2.3 size excludes its own 4 size bytes
        pos = ehs
    out: dict = {f: None for f in TAG_FIELDS}
    frames = _FRAMES_V2 if major == 2 else _FRAMES_V34
    id_len = 3 if major == 2 else 4
    for _ in range(256):
        if pos + id_len > len(body) or body[pos] == 0:
            break
        fid = body[pos:pos + id_len]
        if major == 2:
            if pos + 6 > len(body):
                break
            fsize = int.from_bytes(body[pos + 3:pos + 6], "big")
            hdr, fflags = 6, 0
        else:
            if pos + 10 > len(body):
                break
            raw = body[pos + 4:pos + 8]
            fsize = _syncsafe(raw) if major == 4 \
                else struct.unpack(">I", raw)[0]
            fflags = struct.unpack_from(">H", body, pos + 8)[0]
            hdr = 10
        if fsize > len(body) - pos - hdr:
            raise ValueError("audiotags: frame overruns tag")
        field = frames.get(fid)
        if major == 3:  # v2.3: compression 0x0080, encryption 0x0040
            skip = bool(fflags & 0x00C0)
        elif major == 4:  # v2.4: compression 0x0008, encryption 0x0004
            skip = bool(fflags & 0x000C)
        else:
            skip = False
        if field is not None and fsize > 0 and not skip:
            out[field] = _decode_text(body[pos + hdr:pos + hdr + fsize])
        pos += hdr + fsize
    if out.get("tlen_ms") is not None:
        try:
            out["tlen_ms"] = int(out["tlen_ms"])
        except ValueError:
            out["tlen_ms"] = None
    return out


def _decode_text(frame: bytes) -> str | None:
    enc = frame[0]
    body = frame[1:]
    try:
        if enc == 0:
            s = body.decode("latin-1")
        elif enc == 1:
            s = body.decode("utf-16")
        elif enc == 2:
            s = body.decode("utf-16-be")
        elif enc == 3:
            s = body.decode("utf-8")
        else:
            return None
    except UnicodeDecodeError:
        return None
    return s.split("\x00", 1)[0] or None


def _parse_vorbis_comment_block(buf: bytes, pos: int) -> dict:
    """vendor_len + vendor + count + count*(len + 'KEY=value')."""
    out: dict = {f: None for f in TAG_FIELDS}
    if pos + 4 > len(buf):
        raise ValueError("audiotags: truncated vorbis comments")
    vlen = struct.unpack_from("<I", buf, pos)[0]
    if vlen > MAX_TAG_BYTES or pos + 4 + vlen + 4 > len(buf):
        raise ValueError("audiotags: truncated vorbis vendor")
    out["vendor"] = buf[pos + 4:pos + 4 + vlen].decode(
        "utf-8", "replace") or None
    pos += 4 + vlen
    count = struct.unpack_from("<I", buf, pos)[0]
    pos += 4
    if count > 256:
        raise ValueError("audiotags: oversized comment list")
    for _ in range(count):
        if pos + 4 > len(buf):
            raise ValueError("audiotags: truncated comment entry")
        clen = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        if clen > MAX_TAG_BYTES or pos + clen > len(buf):
            raise ValueError("audiotags: comment overruns buffer")
        entry = buf[pos:pos + clen].decode("utf-8", "replace")
        pos += clen
        key, _, val = entry.partition("=")
        field = _VORBIS_KEYS.get(key.upper())
        if field is not None and val:
            out[field] = val
    return out


def _parse_flac_comments(data: bytes) -> dict:
    pos = 4
    for _ in range(64):
        if pos + 4 > len(data):
            break
        hdr = data[pos]
        btype, last = hdr & 0x7F, hdr & 0x80
        blen = int.from_bytes(data[pos + 1:pos + 4], "big")
        if pos + 4 + blen > len(data):
            raise ValueError("audiotags: truncated FLAC block")
        if btype == 4:
            return _parse_vorbis_comment_block(
                data[pos + 4:pos + 4 + blen], 0)
        pos += 4 + blen
        if last:
            break
    raise ValueError("audiotags: no FLAC VORBIS_COMMENT block")


def _parse_ogg_comments(data: bytes) -> dict:
    window = bytes(data[:_OGG_SCAN_WINDOW])
    i = window.find(b"\x03vorbis")
    if i >= 0:
        out = _parse_vorbis_comment_block(window, i + 7)
        out["container"] = "ogg-vorbis"
        return out
    i = window.find(b"OpusTags")
    if i >= 0:
        out = _parse_vorbis_comment_block(window, i + 8)
        out["container"] = "ogg-opus"
        return out
    raise ValueError("audiotags: no Ogg comment header in window")


# --- fixture-side builders -------------------------------------------


def build_id3v2(fields: dict, major: int = 4,
                unsync: bool = False) -> bytes:
    """ID3v2.3 / v2.4 tag bytes carrying ``fields`` as UTF-8 (v2.4)
    or UTF-16 (v2.3) text frames.  Fixture/test use only."""
    rev = {v: k for k, v in _FRAMES_V34.items() if k != b"TDRC"}
    body = bytearray()
    for f in TAG_FIELDS:
        if f == "vendor" or fields.get(f) is None:
            continue
        fid = rev[f]
        text = str(fields[f])
        if major == 4:
            payload = b"\x03" + text.encode("utf-8")
            size = bytes([(len(payload) >> 21) & 0x7F,
                          (len(payload) >> 14) & 0x7F,
                          (len(payload) >> 7) & 0x7F,
                          len(payload) & 0x7F])
        else:
            payload = b"\x01" + text.encode("utf-16")
            size = struct.pack(">I", len(payload))
        body += fid + size + b"\x00\x00" + payload
    raw = bytes(body)
    flags = 0
    if unsync:
        raw = raw.replace(b"\xff", b"\xff\x00")
        flags |= 0x80
    sz = len(raw)
    return (b"ID3" + bytes([major, 0, flags])
            + bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                     (sz >> 7) & 0x7F, sz & 0x7F]) + raw)


def build_vorbis_comment_block(fields: dict,
                               vendor: str = "fixture") -> bytes:
    """Raw vorbis-comment payload (vendor + comment list)."""
    rev = {v: k for k, v in _VORBIS_KEYS.items()}
    out = bytearray(struct.pack("<I", len(vendor.encode())))
    out += vendor.encode()
    entries = [(rev[f], str(v)) for f, v in fields.items()
               if f in rev and v is not None]
    out += struct.pack("<I", len(entries))
    for k, v in entries:
        e = f"{k}={v}".encode()
        out += struct.pack("<I", len(e)) + e
    return bytes(out)


def inject_flac_comment(flac: bytes, block: bytes) -> bytes:
    """Insert a VORBIS_COMMENT metadata block after STREAMINFO of an
    encode_flac()-produced stream (whose STREAMINFO is the single,
    last metadata block: header byte 0x80, length 34)."""
    if flac[:4] != b"fLaC" or len(flac) < 42 or (flac[4] & 0x7F) != 0:
        raise ValueError("audiotags: not an encode_flac stream")
    head = bytearray(flac[:42])
    head[4] &= 0x7F  # STREAMINFO no longer the last block
    return (bytes(head)
            + bytes([0x84]) + len(block).to_bytes(3, "big") + block
            + flac[42:])
