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
  (syncsafe frame sizes) frames, v2.2 three-byte frames;
  unsynchronisation undone whole-tag for v2.2/v2.3 and PER FRAME for
  v2.4 (v2.4 frame sizes describe the stored unsynchronised data;
  frame flag 0x0002 honored); compressed v2.2 tags (flag 0x40) are
  rejected per spec; extended headers skipped.  Text frames
  decode encodings 0 (latin-1), 1 (UTF-16 BOM), 2 (UTF-16BE),
  3 (UTF-8).  Compressed/encrypted frames are skipped, never
  guessed.
- Vorbis comments: the FLAC VORBIS_COMMENT metadata block walked
  from the stream head; for Ogg, the '\\x03vorbis' / 'OpusTags'
  comment packet must START within the first 64 KiB (its body may
  extend up to MAX_TAG_BYTES past the window).  Headers starting
  beyond the window, or truncated bodies, surface as their own
  ValueError error rows.
- ID3v1: the trailing 128-byte 'TAG' block (latin-1 fixed fields,
  v1.1 track byte).  Standalone v1 blocks dispatch as container
  'id3v1'; when a payload carries BOTH v2 and v1, v2 wins field-wise
  and v1 fills only the gaps (the mutagen/taglib convention).  The
  genre byte resolves through the 80-entry informal-standard list;
  Winamp extensions (>=80) surface as NULL rather than guessed.
- RIFF/WAVE LIST-INFO: INAM/IART/IPRD/IGNR/ICRD/ITRK subchunks
  (UTF-8 with latin-1 fallback, null-terminated, word-aligned).
- MP4/M4A ilst: moov>udta>meta>ilst items (0xa9nam etc.) with
  UTF-8 'data' atoms plus the binary trkn track/total pair, walked
  on kernel/mp4box.py's bounded box iterator.
- Everything is bounded (256 frames / comments / chunks, 1 MiB tag
  size) and malformed structures raise ValueError; the operator
  layer maps that to a NULL row.
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
        if len(data) >= 138 and data[-128:-125] == b"TAG":
            v1 = parse_id3v1(data)  # v2 wins; v1 fills the gaps
            for f in TAG_FIELDS:
                if out[f] is None:
                    out[f] = v1[f]
        return out
    if data[:4] == b"fLaC":
        out = _parse_flac_comments(data)
        out["container"] = "flac"
        return out
    if data[:4] == b"OggS":
        out = _parse_ogg_comments(data)
        return out
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        out = parse_riff_info(data)
        out["container"] = "riff-info"
        return out
    if len(data) >= 12 and data[4:8] == b"ftyp":
        out = parse_mp4_ilst(data)
        out["container"] = "mp4-ilst"
        return out
    if len(data) >= 128 and data[-128:-125] == b"TAG":
        out = parse_id3v1(data)
        out["container"] = "id3v1"
        return out
    raise ValueError("audiotags: no recognized tag structure")


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
    if major == 2 and flags & 0x40:
        # v2.2 flag 0x40 = whole-tag compression; the informal
        # standard says such tags should be ignored, never guessed
        raise ValueError("audiotags: compressed ID3v2.2 tag")
    tag_unsync = bool(flags & 0x80)
    if tag_unsync and major in (2, 3):
        # v2.2/v2.3: unsynchronisation (FF 00 -> FF) was applied to
        # the whole tag as the LAST encoding step, so frame sizes
        # describe the de-unsynchronised body — undo globally.
        # v2.4 moved unsync to per-frame (sizes describe the STORED
        # frame data), so the v2.4 undo happens inside the walk.
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
            frame = body[pos + hdr:pos + hdr + fsize]
            if major == 4 and (tag_unsync or fflags & 0x0002):
                # v2.4 per-frame unsynchronisation: the tag-level
                # flag means every frame is unsynchronised; frame
                # flag 0x0002 marks individual frames
                frame = frame.replace(b"\xff\x00", b"\xff")
            out[field] = _decode_text(frame)
        pos += hdr + fsize
    if out.get("tlen_ms") is not None:
        try:
            v = int(out["tlen_ms"])
        except ValueError:
            v = None
        # clamp to int64: the operator column is LongType and an
        # oversized Python int would fail the Arrow cast task-wide
        out["tlen_ms"] = v if v is not None and 0 <= v < (1 << 63) \
            else None
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


# ID3v1 genre indices 0-79 per the informal standard's canonical
# list (the v1.1 appendix); Winamp extensions (80+) intentionally
# resolve to NULL — fixtures only exercise indices that also appear
# as ID3v2 TCON text (Rock/Jazz/Electronic), so a mislabeled exotic
# slot could never corrupt an oracle.
_ID3V1_GENRES = (
    "Blues", "Classic Rock", "Country", "Dance", "Disco", "Funk",
    "Grunge", "Hip-Hop", "Jazz", "Metal", "New Age", "Oldies",
    "Other", "Pop", "R&B", "Rap", "Reggae", "Rock", "Techno",
    "Industrial", "Alternative", "Ska", "Death Metal", "Pranks",
    "Soundtrack", "Euro-Techno", "Ambient", "Trip-Hop", "Vocal",
    "Jazz+Funk", "Fusion", "Trance", "Classical", "Instrumental",
    "Acid", "House", "Game", "Sound Clip", "Gospel", "Noise",
    "AlternRock", "Bass", "Soul", "Punk", "Space", "Meditative",
    "Instrumental Pop", "Instrumental Rock", "Ethnic", "Gothic",
    "Darkwave", "Techno-Industrial", "Electronic", "Pop-Folk",
    "Eurodance", "Dream", "Southern Rock", "Comedy", "Cult",
    "Gangsta", "Top 40", "Christian Rap", "Pop/Funk", "Jungle",
    "Native American", "Cabaret", "New Wave", "Psychadelic", "Rave",
    "Showtunes", "Trailer", "Lo-Fi", "Tribal", "Acid Punk",
    "Acid Jazz", "Polka", "Retro", "Musical", "Rock & Roll",
    "Hard Rock",
)


def parse_id3v1(data: bytes) -> dict:
    """Trailing 128-byte ID3v1/'TAG' block -> field dict (latin-1
    fixed-width fields, v1.1 track byte when comment[28] == 0)."""
    if len(data) < 128 or data[-128:-125] != b"TAG":
        raise ValueError("audiotags: no trailing ID3v1 block")
    blk = bytes(data[-128:])

    def text(a: int, b: int) -> str | None:
        s = blk[a:b].split(b"\x00", 1)[0].decode("latin-1").strip()
        return s or None

    out: dict = {f: None for f in TAG_FIELDS}
    out["title"] = text(3, 33)
    out["artist"] = text(33, 63)
    out["album"] = text(63, 93)
    out["date"] = text(93, 97)
    if blk[125] == 0 and blk[126] != 0:  # v1.1 track byte
        out["track"] = str(blk[126])
    if blk[127] < len(_ID3V1_GENRES):
        out["genre"] = _ID3V1_GENRES[blk[127]]
    return out


_RIFF_KEYS = {
    b"INAM": "title", b"IART": "artist", b"IPRD": "album",
    b"IGNR": "genre", b"ICRD": "date", b"ITRK": "track",
}


def _info_text(raw: bytes) -> str | None:
    raw = raw.split(b"\x00", 1)[0]
    try:
        s = raw.decode("utf-8")
    except UnicodeDecodeError:
        s = raw.decode("latin-1")
    return s.strip() or None


def parse_riff_info(data: bytes) -> dict:
    """RIFF/WAVE LIST-INFO subchunks -> field dict.  Chunk sizes are
    little-endian with word alignment; raises when the payload has
    no INFO list."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("audiotags: not a RIFF/WAVE payload")
    end = min(len(data), 8 + int.from_bytes(data[4:8], "little"))
    out: dict = {f: None for f in TAG_FIELDS}
    pos, found = 12, False
    for _ in range(256):
        if pos + 8 > end:
            break
        cid = bytes(data[pos:pos + 4])
        csz = int.from_bytes(data[pos + 4:pos + 8], "little")
        if csz > end - pos - 8:
            raise ValueError("audiotags: RIFF chunk overruns file")
        if cid == b"LIST" and data[pos + 8:pos + 12] == b"INFO":
            found = True
            sub, send = pos + 12, pos + 8 + csz
            for _ in range(256):
                if sub + 8 > send:
                    break
                sid = bytes(data[sub:sub + 4])
                ssz = int.from_bytes(data[sub + 4:sub + 8], "little")
                if ssz > send - sub - 8:
                    raise ValueError(
                        "audiotags: INFO subchunk overruns list")
                field = _RIFF_KEYS.get(sid)
                if field is not None:
                    out[field] = _info_text(data[sub + 8:sub + 8 + ssz])
                sub += 8 + ssz + (ssz & 1)
        pos += 8 + csz + (csz & 1)
    if not found:
        raise ValueError("audiotags: no RIFF INFO chunk")
    return out


_ILST_KEYS = {
    b"\xa9nam": "title", b"\xa9ART": "artist", b"\xa9alb": "album",
    b"\xa9gen": "genre", b"\xa9day": "date", b"trkn": "track",
}


def _find_box(data: bytes, start: int, end: int, walk,
              name: bytes, full: bool = False) -> tuple[int, int] | None:
    from . import mp4box
    for btype, s, e in mp4box._iter_boxes(data, start, end, walk):
        if btype == name:
            return (s + 4 if full else s), e
    return None


def parse_mp4_ilst(data: bytes) -> dict:
    """ISO-BMFF moov>udta>meta>ilst item atoms -> field dict.  Text
    items carry UTF-8 'data' atoms (type indicator 1); trkn is the
    binary track/total pair (type 0).  Raises when no ilst exists."""
    from . import mp4box
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("audiotags: not an ISO-BMFF payload")
    # no byte cap: _iter_boxes skips by size (O(boxes) walk) and
    # mp4box.MAX_BOXES bounds the box count
    w = mp4box._Walk()
    span: tuple[int, int] | None = (0, len(data))
    for name, full in ((b"moov", False), (b"udta", False),
                       (b"meta", True), (b"ilst", False)):
        span = _find_box(data, span[0], span[1], w, name, full)
        if span is None:
            raise ValueError("audiotags: no mp4 ilst box")
    out: dict = {f: None for f in TAG_FIELDS}
    for btype, s, e in mp4box._iter_boxes(data, span[0], span[1], w):
        field = _ILST_KEYS.get(bytes(btype))
        if field is None:
            continue
        d = _find_box(data, s, e, w, b"data")
        if d is None or d[1] - d[0] < 8:
            continue
        dtype = int.from_bytes(data[d[0]:d[0] + 4], "big")
        val = bytes(data[d[0] + 8:d[1]])
        if field == "track":
            if dtype == 0 and len(val) >= 6:
                trk = int.from_bytes(val[2:4], "big")
                tot = int.from_bytes(val[4:6], "big")
                out["track"] = (f"{trk}/{tot}" if tot
                                else str(trk) if trk else None)
        elif dtype == 1:
            out[field] = val.decode("utf-8", "replace") or None
    return out


def _parse_ogg_comments(data: bytes) -> dict:
    # The comment header must START inside the 64 KiB scan window,
    # but once found its body may extend past the window (bounded by
    # MAX_TAG_BYTES inside _parse_vorbis_comment_block) — so a block
    # that merely straddles the window boundary still parses instead
    # of surfacing a truncation error row.
    window = bytes(data[:_OGG_SCAN_WINDOW])
    buf = bytes(data[:_OGG_SCAN_WINDOW + MAX_TAG_BYTES + 8])
    i = window.find(b"\x03vorbis")
    if i >= 0:
        out = _parse_vorbis_comment_block(buf, i + 7)
        out["container"] = "ogg-vorbis"
        return out
    i = window.find(b"OpusTags")
    if i >= 0:
        out = _parse_vorbis_comment_block(buf, i + 8)
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
            if unsync:
                # v2.4: unsync is PER FRAME and the frame size
                # describes the stored (unsynchronised) data
                payload = payload.replace(b"\xff", b"\xff\x00")
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
        if major != 4:
            # v2.3: whole-tag unsync as the last encoding step
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


def build_id3v1(fields: dict) -> bytes:
    """128-byte trailing ID3v1.1 block.  Fixture/test use only;
    track must be a bare number (no '/total'), genre a name from the
    canonical list (else 255)."""
    def fixed(key: str, width: int) -> bytes:
        v = fields.get(key)
        raw = b"" if v is None else str(v).encode("latin-1")
        return raw[:width].ljust(width, b"\x00")

    track = int(str(fields.get("track") or 0).partition("/")[0])
    genre = fields.get("genre")
    gidx = (_ID3V1_GENRES.index(genre)
            if genre in _ID3V1_GENRES else 255)
    return (b"TAG" + fixed("title", 30) + fixed("artist", 30)
            + fixed("album", 30) + fixed("date", 4)
            + bytes(28) + bytes([0, track & 0xFF, gidx]))


def build_riff_info(fields: dict) -> bytes:
    """Minimal RIFF/WAVE file whose LIST-INFO chunk carries
    ``fields`` as UTF-8 subchunks.  Fixture/test use only."""
    rev = {v: k for k, v in _RIFF_KEYS.items()}
    sub = bytearray()
    for f in TAG_FIELDS:
        v = fields.get(f)
        if f not in rev or v is None:
            continue
        raw = str(v).encode("utf-8") + b"\x00"
        sub += rev[f] + struct.pack("<I", len(raw)) + raw
        if len(raw) & 1:
            sub += b"\x00"
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    info = b"LIST" + struct.pack("<I", 4 + len(sub)) + b"INFO" + sub
    body = b"WAVE" + fmt + info + b"data" + struct.pack("<I", 0)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def build_m4a_ilst(fields: dict) -> bytes:
    """Minimal M4A (ftyp + moov>udta>meta>ilst) whose item atoms
    carry ``fields``.  Fixture/test use only."""
    from . import mp4box
    rev = {v: k for k, v in _ILST_KEYS.items()}
    items = bytearray()
    for f in TAG_FIELDS:
        v = fields.get(f)
        if f not in rev or v is None:
            continue
        if f == "track":
            trk, _, tot = str(v).partition("/")
            payload = (bytes(4) + bytes(4) + bytes(2)
                       + int(trk).to_bytes(2, "big")
                       + int(tot or 0).to_bytes(2, "big") + bytes(2))
        else:
            payload = ((1).to_bytes(4, "big") + bytes(4)
                       + str(v).encode("utf-8"))
        items += mp4box._box(rev[f], mp4box._box(b"data", payload))
    hdlr = mp4box._full(b"hdlr", 0,
                        bytes(4) + b"mdir" + b"appl" + bytes(9))
    meta = mp4box._full(b"meta", 0, hdlr + mp4box._box(
        b"ilst", bytes(items)))
    moov = mp4box._box(b"moov", mp4box._box(b"udta", meta))
    ftyp = mp4box._box(b"ftyp", b"M4A " + bytes(4) + b"M4A mp42isom")
    return ftyp + moov


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
