"""Video container walks: Matroska/WebM (EBML), AVI (RIFF), ASF/WMV.

With kernel/mp4box.py this covers the reference's video extension
list (video/transcribe.go:30-41: .mp4 .mkv .avi .mov .webm .m4v .flv
.wmv) header-first — codec decode is out of scope, but duration,
track inventory, and dimensions come straight from the container
structure (public specs: Matroska/EBML RFC 8794, AVI RIFF, ASF).
FLV is parsed too (:func:`parse_flv`): the onMetaData AMF0 script
tag yields duration/dimensions and the tag walk counts audio/video
tags.  Malformed input raises ValueError.
"""

from __future__ import annotations

import struct

MAX_EBML_ELEMENTS = 1 << 16

# EBML element ids (with marker bits, as they appear in the stream)
_EBML_HEADER = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA


def _read_vint(data: bytes, pos: int, keep_marker: bool) \
        -> tuple[int, int]:
    """EBML variable-length integer at ``pos`` -> (value, next_pos).
    Element IDs keep the marker bit; sizes strip it."""
    if pos >= len(data):
        raise ValueError("ebml: truncated vint")
    first = data[pos]
    if first == 0:
        raise ValueError("ebml: invalid vint")
    length = 8 - first.bit_length() + 1
    if pos + length > len(data):
        raise ValueError("ebml: truncated vint")
    raw = int.from_bytes(data[pos:pos + length], "big")
    if not keep_marker:
        raw &= (1 << (7 * length)) - 1
    return raw, pos + length


def _iter_ebml(data: bytes, start: int, end: int, budget: list) \
        -> "list[tuple[int, int, int]]":
    """Children of an EBML master element: (id, body_start, body_end).
    Unknown-size elements run to the enclosing end."""
    out = []
    pos = start
    while pos < end:
        budget[0] += 1
        if budget[0] > MAX_EBML_ELEMENTS:
            raise ValueError("ebml: too many elements")
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size_start = pos
        size, pos = _read_vint(data, pos, keep_marker=False)
        size_len = pos - size_start
        if size == (1 << (7 * size_len)) - 1:
            body_end = end   # all-value-bits-ones = unknown size
        else:
            body_end = pos + size
        if body_end > end:
            raise ValueError("ebml: element overruns scope")
        out.append((eid, pos, body_end))
        pos = body_end
    return out


def _ebml_uint(data: bytes, s: int, e: int) -> int:
    if e - s > 8:
        raise ValueError("ebml: oversized uint")
    return int.from_bytes(data[s:e], "big")


def _ebml_float(data: bytes, s: int, e: int) -> float:
    if e - s == 4:
        return struct.unpack(">f", data[s:e])[0]
    if e - s == 8:
        return struct.unpack(">d", data[s:e])[0]
    raise ValueError("ebml: bad float size")


def parse_matroska(data: bytes) -> dict:
    """Matroska/WebM -> ``(doctype, duration_ms, n_tracks,
    has_video, has_audio, width, height, codecs)``.  duration_ms =
    Duration x TimestampScale / 1e6 (exact for integral fixture
    durations at the default 1 ms scale)."""
    if len(data) < 8:
        raise ValueError("ebml: too short")
    budget = [0]
    top = _iter_ebml(data, 0, len(data), budget)
    doctype = None
    timescale = 1_000_000
    duration = None
    n_tracks = 0
    has_video = has_audio = False
    width = height = 0
    codecs: set[str] = set()
    for eid, s, e in top:
        if eid == _EBML_HEADER:
            for cid, cs, ce in _iter_ebml(data, s, e, budget):
                if cid == _DOCTYPE:
                    doctype = data[cs:ce].decode("latin-1")
        elif eid == _SEGMENT:
            for cid, cs, ce in _iter_ebml(data, s, e, budget):
                if cid == _INFO:
                    for iid, is_, ie in _iter_ebml(
                            data, cs, ce, budget):
                        if iid == _TIMESCALE:
                            timescale = _ebml_uint(data, is_, ie)
                        elif iid == _DURATION:
                            duration = _ebml_float(data, is_, ie)
                elif cid == _TRACKS:
                    for tid, ts, te in _iter_ebml(
                            data, cs, ce, budget):
                        if tid != _TRACK_ENTRY:
                            continue
                        n_tracks += 1
                        ttype = None
                        t_w = t_h = 0
                        for fid, fs, fe in _iter_ebml(
                                data, ts, te, budget):
                            if fid == _TRACK_TYPE:
                                ttype = _ebml_uint(data, fs, fe)
                            elif fid == _CODEC_ID:
                                codecs.add(
                                    data[fs:fe].decode("latin-1"))
                            elif fid == _VIDEO:
                                for vid, vs, ve in _iter_ebml(
                                        data, fs, fe, budget):
                                    if vid == _PIXEL_W:
                                        t_w = _ebml_uint(data, vs, ve)
                                    elif vid == _PIXEL_H:
                                        t_h = _ebml_uint(data, vs, ve)
                        if ttype == 1:
                            has_video = True
                            if t_w * t_h >= width * height:
                                width, height = t_w, t_h
                        elif ttype == 2:
                            has_audio = True
    if doctype is None:
        raise ValueError("ebml: missing doctype")
    if timescale == 0:
        raise ValueError("ebml: zero timescale")
    if duration is None:
        dur_ms = 0
    else:
        # EBML duration is a float: inf/nan would escape as
        # OverflowError at int(), and huge values would crash the
        # operator's Arrow int64 cast — sanity-bound both
        scaled = duration * timescale / 1_000_000
        if not (0 <= scaled < float(1 << 63)):
            raise ValueError("ebml: implausible duration")
        dur_ms = int(scaled)
    if not (0 <= width < (1 << 31) and 0 <= height < (1 << 31)):
        raise ValueError("ebml: implausible dimensions")
    return {
        "doctype": doctype,
        "duration_ms": dur_ms,
        "n_tracks": n_tracks,
        "has_video": has_video,
        "has_audio": has_audio,
        "width": width,
        "height": height,
        "codecs": ",".join(sorted(codecs)),
    }


def parse_avi(data: bytes) -> dict:
    """AVI (RIFF) -> signals from the mandatory ``avih`` main header:
    duration = total_frames x usec_per_frame, dims, stream count."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("avi: bad RIFF/AVI header")
    idx = data.find(b"avih")
    if idx < 0 or idx + 8 + 40 > len(data):
        raise ValueError("avi: missing avih header")
    size = struct.unpack_from("<I", data, idx + 4)[0]
    if size < 40:
        raise ValueError("avi: truncated avih")
    (usec_per_frame, _maxbps, _pad, _flags, total_frames,
     _init, streams, _buf, w, h) = struct.unpack_from(
        "<10I", data, idx + 8)
    if usec_per_frame == 0:
        raise ValueError("avi: zero frame period")
    if w >= (1 << 31) or h >= (1 << 31):
        # u32 dims feed IntegerType columns — sanity-bound
        raise ValueError("avi: implausible dimensions")
    return {
        "duration_ms": total_frames * usec_per_frame // 1000,
        "n_streams": streams,
        "width": w,
        "height": h,
        "fps_x1000": 1_000_000_000 // usec_per_frame,
    }


_ASF_HEADER_GUID = bytes.fromhex("3026b2758e66cf11a6d900aa0062ce6c")
_ASF_FILE_PROPS_GUID = bytes.fromhex("a1dcab8c47a9cf118ee400c00c205365")


def parse_asf(data: bytes) -> dict:
    """ASF/WMV -> duration from the File Properties object: play
    duration (100 ns units) minus preroll (ms), per the ASF spec."""
    if len(data) < 30 or data[:16] != _ASF_HEADER_GUID:
        raise ValueError("asf: bad header guid")
    idx = data.find(_ASF_FILE_PROPS_GUID)
    if idx < 0 or idx + 24 + 64 > len(data):
        raise ValueError("asf: missing file properties")
    base = idx + 24          # skip guid + object size
    play_100ns = struct.unpack_from("<Q", data, base + 40)[0]
    preroll_ms = struct.unpack_from("<Q", data, base + 56)[0]
    dur = max(0, play_100ns // 10_000 - preroll_ms)
    packets = struct.unpack_from("<Q", data, base + 32)[0]
    if packets >= (1 << 63):
        # u64 feeding an int64 column — sanity-bound
        raise ValueError("asf: implausible packet count")
    return {"duration_ms": dur, "n_packets": packets}


# --------------------------------------------------------- fixtures


def _ebml_elem(eid: int, body: bytes) -> bytes:
    id_len = (eid.bit_length() + 7) // 8
    out = eid.to_bytes(id_len, "big")
    n = len(body)
    # encode size in the fewest bytes with the marker bit
    for ln in range(1, 9):
        if n < (1 << (7 * ln)) - 1:
            out += ((1 << (7 * ln)) | n).to_bytes(ln, "big")
            break
    return out + body


def encode_matroska(doctype: str = "matroska",
                    duration_ms: int = 0,
                    tracks: list[tuple[int, str, int, int]]
                    | None = None) -> bytes:
    """Synthetic Matroska/WebM: EBML header + Segment(Info, Tracks);
    ``tracks`` entries are (type 1=video/2=audio, codec_id, w, h).
    TimestampScale = 1e6 ns so Duration (float) is the millisecond
    count — every parse output closed-form from the arguments."""
    header = _ebml_elem(_EBML_HEADER, _ebml_elem(
        _DOCTYPE, doctype.encode("latin-1")))
    info = _ebml_elem(_INFO,
                      _ebml_elem(_TIMESCALE,
                                 (1_000_000).to_bytes(3, "big"))
                      + _ebml_elem(_DURATION, struct.pack(
                          ">d", float(duration_ms))))
    entries = b""
    for (ttype, codec, w, h) in (tracks or []):
        body = (_ebml_elem(_TRACK_TYPE, bytes([ttype]))
                + _ebml_elem(_CODEC_ID, codec.encode("latin-1")))
        if ttype == 1:
            body += _ebml_elem(
                _VIDEO,
                _ebml_elem(_PIXEL_W, w.to_bytes(2, "big"))
                + _ebml_elem(_PIXEL_H, h.to_bytes(2, "big")))
        entries += _ebml_elem(_TRACK_ENTRY, body)
    seg = _ebml_elem(_SEGMENT,
                     info + _ebml_elem(_TRACKS, entries))
    return header + seg


def encode_avi(usec_per_frame: int = 33333, total_frames: int = 0,
               streams: int = 1, w: int = 0, h: int = 0) -> bytes:
    avih = struct.pack("<10I", usec_per_frame, 0, 0, 0, total_frames,
                       0, streams, 0, w, h) + b"\x00" * 16
    hdrl = (b"LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrl"
            + b"avih" + struct.pack("<I", len(avih)) + avih)
    return (b"RIFF" + struct.pack("<I", 4 + len(hdrl)) + b"AVI "
            + hdrl)


def encode_asf(play_ms: int = 0, preroll_ms: int = 0,
               packets: int = 0) -> bytes:
    body = (b"\x00" * 16                      # file id
            + struct.pack("<Q", 0)            # file size
            + struct.pack("<Q", 0)            # creation
            + struct.pack("<Q", packets)
            + struct.pack("<Q", (play_ms + preroll_ms) * 10_000)
            + struct.pack("<Q", 0)            # send duration
            + struct.pack("<Q", preroll_ms)
            + b"\x00" * 12)
    obj = (_ASF_FILE_PROPS_GUID
           + struct.pack("<Q", 24 + len(body)) + body)
    hdr = (_ASF_HEADER_GUID
           + struct.pack("<Q", 30 + len(obj))
           + struct.pack("<I", 1) + b"\x01\x02" + obj)
    return hdr


# ----------------------------------------------------------- FLV

def parse_flv(data: bytes) -> dict:
    """FLV -> signals from the onMetaData script tag (AMF0): duration
    (seconds double -> ms), width/height, audio/video presence flags
    from the header.  Number values must be finite; integral fixture
    durations keep the oracle exact."""
    if len(data) < 13 or data[:3] != b"FLV":
        raise ValueError("flv: bad magic")
    flags = data[4]
    data_off = int.from_bytes(data[5:9], "big")
    if data_off < 9 or data_off + 4 > len(data):
        raise ValueError("flv: bad data offset")
    pos = data_off + 4    # skip PreviousTagSize0
    meta: dict[str, float] = {}
    tags = 0
    while pos + 11 <= len(data):
        tags += 1
        if tags > 1 << 16:
            raise ValueError("flv: too many tags")
        ttype = data[pos]
        dsize = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 11:pos + 11 + dsize]
        if len(body) < dsize:
            break   # truncated final tag
        if ttype == 18 and body[:13] == b"\x02\x00\x0aonMetaData":
            i = 13
            if i + 5 > len(body) or body[i] != 8:
                raise ValueError("flv: bad metadata value")
            i += 5   # ECMA array marker + count
            while i + 2 <= len(body):
                klen = int.from_bytes(body[i:i + 2], "big")
                i += 2
                if klen == 0 and i < len(body) and body[i] == 9:
                    break   # object end marker 0x000009
                key = body[i:i + klen].decode("latin-1")
                i += klen
                if i >= len(body):
                    raise ValueError("flv: truncated metadata")
                vtype = body[i]
                i += 1
                if vtype == 0:      # number (double)
                    if i + 8 > len(body):
                        raise ValueError("flv: truncated number")
                    meta[key] = struct.unpack(
                        ">d", body[i:i + 8])[0]
                    i += 8
                elif vtype == 1:    # bool
                    if i >= len(body):
                        raise ValueError("flv: truncated bool")
                    meta[key] = float(body[i])
                    i += 1
                else:
                    # strings/objects: not needed, stop cleanly
                    break
            break
        pos += 11 + dsize + 4
    if not meta:
        raise ValueError("flv: no onMetaData numbers")
    dur = meta.get("duration", 0.0)
    if dur != dur or dur < 0 or dur > 1e9:   # NaN / bogus
        raise ValueError("flv: bad duration")
    w, h = meta.get("width", 0.0), meta.get("height", 0.0)
    # AMF doubles: inf escapes int() as OverflowError and huge
    # values crash the Arrow int32 cast — sanity-bound like duration
    if not (0 <= w < 2 ** 31 and 0 <= h < 2 ** 31) or w != w or h != h:
        raise ValueError("flv: implausible dimensions")
    return {
        "duration_ms": int(dur * 1000),
        "width": int(w),
        "height": int(h),
        "has_video": bool(flags & 0x01),
        "has_audio": bool(flags & 0x04),
    }


def encode_flv(duration_s: int = 0, w: int = 0, h: int = 0,
               has_video: bool = True,
               has_audio: bool = True) -> bytes:
    """Synthetic FLV: header + one onMetaData script tag — every
    parse_flv output is closed-form from the arguments (integral
    seconds keep the double exact)."""
    def amf_num(key: str, v: float) -> bytes:
        return (len(key).to_bytes(2, "big") + key.encode()
                + b"\x00" + struct.pack(">d", float(v)))

    props = (amf_num("duration", duration_s)
             + amf_num("width", w) + amf_num("height", h)
             + b"\x00\x00\x09")
    body = (b"\x02\x00\x0aonMetaData"
            + b"\x08" + (3).to_bytes(4, "big") + props)
    tag = (b"\x12" + len(body).to_bytes(3, "big")
           + b"\x00" * 7 + body)
    flags = (0x01 if has_video else 0) | (0x04 if has_audio else 0)
    return (b"FLV\x01" + bytes([flags])
            + (9).to_bytes(4, "big") + b"\x00" * 4
            + tag + len(tag).to_bytes(4, "big"))
