"""ISO-BMFF (MP4/M4A/MOV) box walk — container metadata without codec
decode.

The reference accepts .mp4/.m4v/.mov video and .m4a/.aac audio purely
to ship them to external transcription APIs
(internal/extractors/video/transcribe.go:30-41,
audio/transcribe.go:29-38 — that leg stays failure-coded offline).
What a curation pipeline needs BEFORE any model sees the bytes is the
container metadata: duration, track inventory, video dimensions,
codec fourccs — all available from the box structure alone
(ISO/IEC 14496-12, public spec), the same header-walk strategy as
kernel/audiocodec.parse_mp3.

Subset: top-level box walk + recursion through moov/trak/mdia/minf/
stbl; mvhd (v0/v1) for timescale+duration, tkhd (v0/v1) for track
dims, hdlr for track kind, stsd for the sample-entry fourcc.  Bomb
caps: box count and recursion depth.  Malformed input raises
ValueError (callers surface error rows).
"""

from __future__ import annotations

import struct

MAX_BOXES = 4096       # walk bomb cap


class _Walk:
    __slots__ = ("boxes",)

    def __init__(self) -> None:
        self.boxes = 0


def _iter_boxes(data: bytes, start: int, end: int, walk: _Walk):
    pos = start
    while pos + 8 <= end:
        walk.boxes += 1
        if walk.boxes > MAX_BOXES:
            raise ValueError("mp4: too many boxes")
        size, btype = struct.unpack_from(">I4s", data, pos)
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos   # box extends to end of enclosing scope
        if size < hdr or pos + size > end:
            raise ValueError("mp4: bad box size")
        yield btype, pos + hdr, pos + size
        pos += size
    if pos != end:
        raise ValueError("mp4: trailing bytes are not a box")


def parse_mp4(data: bytes) -> dict:
    """Container metadata: ``brand``, ``duration_ms`` (mvhd),
    ``n_tracks``, ``has_video``/``has_audio``, ``width``/``height``
    (largest video tkhd, 16.16 fixed -> integer), ``codecs``
    (sorted unique stsd fourccs, comma-joined).  Integer-only math so
    synthetic-box oracles are closed-form."""
    if len(data) < 8:
        raise ValueError("mp4: too short")
    walk = _Walk()
    brand = None
    timescale = None
    duration = None
    n_tracks = 0
    has_video = False
    has_audio = False
    width = height = 0
    codecs: set[str] = set()

    def walk_trak(s: int, e: int) -> None:
        nonlocal n_tracks, has_video, has_audio, width, height
        n_tracks += 1
        kind = None
        t_w = t_h = 0
        for btype, bs, be in _iter_boxes(data, s, e, walk):
            if btype == b"tkhd":
                # w/h are the LAST 8 payload bytes (after the
                # reserved fields + matrix), in BOTH tkhd versions
                if be - bs >= 8:
                    t_w, t_h = struct.unpack_from(">II", data, be - 8)
                    t_w >>= 16   # 16.16 fixed point
                    t_h >>= 16
            elif btype == b"mdia":
                for b2, s2, e2 in _iter_boxes(data, bs, be, walk):
                    if b2 == b"hdlr" and e2 - s2 >= 12:
                        kind = data[s2 + 8:s2 + 12]
                    elif b2 == b"minf":
                        for b3, s3, e3 in _iter_boxes(
                                data, s2, e2, walk):
                            if b3 != b"stbl":
                                continue
                            for b4, s4, e4 in _iter_boxes(
                                    data, s3, e3, walk):
                                if b4 == b"stsd" and e4 - s4 >= 16:
                                    codecs.add(
                                        data[s4 + 12:s4 + 16]
                                        .decode("latin-1"))
        if kind == b"vide":
            has_video = True
            if t_w * t_h >= width * height:
                width, height = t_w, t_h
        elif kind == b"soun":
            has_audio = True

    for btype, bs, be in _iter_boxes(data, 0, len(data), walk):
        if btype == b"ftyp":
            if be - bs < 4:
                raise ValueError("mp4: truncated ftyp")
            brand = data[bs:bs + 4].decode("latin-1").strip()
        elif btype == b"moov":
            for b2, s2, e2 in _iter_boxes(data, bs, be, walk):
                if b2 == b"mvhd":
                    if e2 - s2 < 1:
                        raise ValueError("mp4: truncated mvhd")
                    ver = data[s2]
                    if ver == 1:
                        if e2 - s2 < 28:
                            raise ValueError("mp4: truncated mvhd")
                        timescale, duration = struct.unpack_from(
                            ">IQ", data, s2 + 20)
                    else:
                        if e2 - s2 < 24:
                            raise ValueError("mp4: truncated mvhd")
                        timescale, duration = struct.unpack_from(
                            ">II", data, s2 + 12)
                elif b2 == b"trak":
                    walk_trak(s2, e2)
    if brand is None or timescale is None:
        raise ValueError("mp4: missing ftyp/mvhd")
    if timescale == 0:
        raise ValueError("mp4: zero timescale")
    dur_ms = duration * 1000 // timescale
    if dur_ms >= (1 << 63):
        # a crafted u64 mvhd duration must not crash the operator's
        # Arrow int64 cast task-wide (sanity bound, not a clamp)
        raise ValueError("mp4: implausible duration")
    return {
        "brand": brand,
        "duration_ms": dur_ms,
        "n_tracks": n_tracks,
        "has_video": has_video,
        "has_audio": has_audio,
        "width": width,
        "height": height,
        "codecs": ",".join(sorted(codecs)),
    }


# --------------------------------------------------------- fixtures


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _full(btype: bytes, version: int, payload: bytes) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + payload)


def encode_mp4(brand: str = "isom", timescale: int = 1000,
               duration: int = 0,
               tracks: list[tuple[str, str, int, int]] | None = None,
               mvhd_v1: bool = False) -> bytes:
    """Synthetic ISO-BMFF container: every parse_mp4 output is
    closed-form from the arguments.  ``tracks`` entries are
    ``(kind, codec_fourcc, width, height)`` with kind 'vide'/'soun'
    (the fixture analog of encode_mp3_frames)."""
    ftyp = _box(b"ftyp", brand.encode("latin-1").ljust(4) + b"\x00" * 8)
    if mvhd_v1:
        mvhd = _full(b"mvhd", 1, struct.pack(
            ">QQIQ", 0, 0, timescale, duration) + b"\x00" * 80)
    else:
        mvhd = _full(b"mvhd", 0, struct.pack(
            ">IIII", 0, 0, timescale, duration) + b"\x00" * 80)
    traks = b""
    for kind, codec, w, h in (tracks or []):
        tkhd = _full(b"tkhd", 0, b"\x00" * 72
                     + struct.pack(">II", w << 16, h << 16))
        hdlr = _full(b"hdlr", 0, b"\x00" * 4
                     + kind.encode("latin-1") + b"\x00" * 12)
        stsd = _full(b"stsd", 0, struct.pack(">I", 1)
                     + struct.pack(">I4s", 16,
                                   codec.encode("latin-1"))
                     + b"\x00" * 8)
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", hdlr + minf)
        traks += _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov


# --------------------------------------------------- AVIF dimensions

def parse_avif_dims(data: bytes) -> tuple[str, int, int]:
    """AVIF (ISO-BMFF image) -> (brand, width, height) from the
    meta/iprp/ipco/ispe property (ISO/IEC 23008-12 §6.5.3).  The AV1
    pixel codec is out of scope; dimensions alone feed size gates.
    Raises ValueError outside the subset."""
    if len(data) < 16:
        raise ValueError("avif: too short")
    walk = _Walk()
    brand = None
    dims = None
    for btype, bs, be in _iter_boxes(data, 0, len(data), walk):
        if btype == b"ftyp":
            if be - bs < 4:
                raise ValueError("avif: truncated ftyp")
            brand = data[bs:bs + 4].decode("latin-1").strip()
        elif btype == b"meta":
            # meta is a FULL box: 4 version/flags bytes then children
            for b2, s2, e2 in _iter_boxes(data, bs + 4, be, walk):
                if b2 != b"iprp":
                    continue
                for b3, s3, e3 in _iter_boxes(data, s2, e2, walk):
                    if b3 != b"ipco":
                        continue
                    for b4, s4, e4 in _iter_boxes(data, s3, e3, walk):
                        if b4 == b"ispe" and e4 - s4 >= 12:
                            import struct as _s

                            w, h = _s.unpack_from(">II", data, s4 + 4)
                            dims = (w, h)
    if brand is None or dims is None:
        raise ValueError("avif: missing ftyp/ispe")
    if dims[0] == 0 or dims[1] == 0 or dims[0] * dims[1] > (1 << 32):
        raise ValueError("avif: bad dimensions")
    return brand, dims[0], dims[1]


def encode_avif_header(w: int, h: int, brand: str = "avif") -> bytes:
    """Synthetic AVIF header (ftyp + meta/iprp/ipco/ispe only) —
    every parse_avif_dims output is closed-form from the arguments."""
    import struct as _s

    ispe = _full(b"ispe", 0, _s.pack(">II", w, h))
    ipco = _box(b"ipco", ispe)
    iprp = _box(b"iprp", ipco)
    meta = _full(b"meta", 0, iprp)
    ftyp = _box(b"ftyp",
                brand.encode("latin-1").ljust(4) + b"\x00" * 8)
    return ftyp + meta


def parse_jp2_dims(data: bytes) -> tuple[str, int, int, int, int]:
    """JPEG 2000 header walk → (container, width, height, components,
    bit_depth).  Accepts the JP2/JPX box container (signature box +
    'jp2h'/'ihdr', ISO 15444-1 §I.5) and raw codestreams (SOC + SIZ
    marker, §A.5.1).  Pixel decode (wavelets/EBCOT) is out of scope —
    this upgrades the size-only entries PDF JPXDecode images produce.
    Raises ValueError on anything that is not JPEG 2000."""
    if data[:4] == b"\xff\x4f\xff\x51":          # SOC + SIZ
        if len(data) < 42:
            raise ValueError("jp2: truncated SIZ")
        xsiz = int.from_bytes(data[8:12], "big")
        ysiz = int.from_bytes(data[12:16], "big")
        x0 = int.from_bytes(data[16:20], "big")
        y0 = int.from_bytes(data[20:24], "big")
        csiz = int.from_bytes(data[40:42], "big")
        if len(data) < 42 + 3 * csiz or csiz == 0:
            raise ValueError("jp2: truncated SIZ components")
        depth = (data[42] & 0x7F) + 1
        w, h = xsiz - x0, ysiz - y0
        if w <= 0 or h <= 0:
            raise ValueError("jp2: bad SIZ grid")
        return "j2k", w, h, csiz, depth
    if data[:12] != b"\x00\x00\x00\x0cjP  \r\n\x87\n":
        raise ValueError("jp2: bad signature box")
    pos = 12
    n = len(data)
    guard = 0
    while pos + 8 <= n:
        guard += 1
        if guard > 1 << 12:
            raise ValueError("jp2: box walk runaway")
        size = int.from_bytes(data[pos:pos + 4], "big")
        box = data[pos + 4:pos + 8]
        body_off = pos + 8
        if size == 1:
            if pos + 16 > n:
                raise ValueError("jp2: truncated extended box")
            size = int.from_bytes(data[pos + 8:pos + 16], "big")
            body_off = pos + 16
        if size == 0:
            size = n - pos
        if size < 8 or pos + size > n:
            raise ValueError("jp2: bad box size")
        if box == b"jp2h":
            # superbox: scan its children for ihdr
            cpos = body_off
            while cpos + 8 <= pos + size:
                csize = int.from_bytes(data[cpos:cpos + 4], "big")
                cbox = data[cpos + 4:cpos + 8]
                if csize < 8 or cpos + csize > pos + size:
                    raise ValueError("jp2: bad jp2h child")
                if cbox == b"ihdr":
                    if csize < 8 + 10:
                        raise ValueError("jp2: truncated ihdr")
                    h = int.from_bytes(data[cpos + 8:cpos + 12], "big")
                    w = int.from_bytes(data[cpos + 12:cpos + 16], "big")
                    nc = int.from_bytes(data[cpos + 16:cpos + 18], "big")
                    depth = (data[cpos + 18] & 0x7F) + 1
                    if w == 0 or h == 0 or nc == 0:
                        raise ValueError("jp2: bad ihdr")
                    return "jp2", w, h, nc, depth
                cpos += csize
            raise ValueError("jp2: jp2h without ihdr")
        pos += size
    raise ValueError("jp2: no jp2h box")
