"""EXIF metadata extraction from JPEG APP1 / TIFF headers.

Curation signals for the image leg of a training-data pipeline:
camera provenance (photo vs rendered graphic), capture timestamps,
orientation (needed before any pixel-geometry use), and GPS presence
(a PII flag a crawl curator must gate on).  The reference posts image
bytes to an external vision API (internal/extractors/image/
image.go:38-263) and never reads EXIF; this is engine-added breadth
on the same payload class, built from the public EXIF 2.3 / TIFF 6.0
layout only.

Subset and posture:

- JPEG: the APP1 segment whose body starts ``Exif\\x00\\x00``; the
  embedded TIFF structure is parsed with both byte orders.  Only
  IFD0, the Exif sub-IFD and the GPS sub-IFD are walked (thumbnail
  IFD1 and maker notes are skipped).
- TIFF files: the same walker applies from byte 0.
- Bounded: at most 64 entries per IFD, 3 IFDs, values read through
  range-checked slices; a malformed structure raises ValueError and
  the operator layer maps that to an all-NULL row (never raises).
- GPS coordinates fold (deg, min, sec) rationals + the N/S/E/W ref
  into a signed decimal degree rounded to 6 places (≈0.1 m, and a
  terminating decimal so cross-engine float hashing is stable).
"""

from __future__ import annotations

import struct

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

# tag -> output field, IFD0 + Exif sub-IFD
_TAGS_IFD0 = {
    0x010F: "make", 0x0110: "model", 0x0112: "orientation",
    0x0131: "software", 0x0132: "datetime",
}
_TAGS_EXIF = {
    0x829A: "exposure_time", 0x829D: "f_number", 0x8827: "iso",
    0x9003: "datetime_original", 0x920A: "focal_length",
    0xA002: "pixel_x", 0xA003: "pixel_y",
}

EXIF_FIELDS = (
    "make", "model", "software", "orientation", "datetime",
    "datetime_original", "exposure_time", "f_number", "iso",
    "focal_length", "pixel_x", "pixel_y",
    "gps_present", "gps_lat", "gps_lon",
)


def parse_exif(data: bytes) -> dict:
    """JPEG or TIFF bytes -> {field: value|None} over EXIF_FIELDS.
    Raises ValueError when no EXIF structure exists or it is
    malformed (callers map that to an all-NULL row)."""
    if data[:2] == b"\xff\xd8":
        tiff = _jpeg_app1(data)
    elif data[:4] in (b"II*\x00", b"MM\x00*"):
        tiff = data
    else:
        raise ValueError("exif: not a JPEG or TIFF payload")
    return _parse_tiff_exif(tiff)


def _jpeg_app1(data: bytes) -> bytes:
    """Walk JPEG segments for the Exif APP1 body (TIFF bytes)."""
    pos = 2
    n = len(data)
    for _ in range(256):
        if pos + 4 > n:
            break
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: no metadata past
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        seg_len = struct.unpack_from(">H", data, pos + 2)[0]
        if seg_len < 2 or pos + 2 + seg_len > n:
            break
        if marker == 0xE1 and data[pos + 4:pos + 10] == b"Exif\x00\x00":
            return data[pos + 10:pos + 2 + seg_len]
        pos += 2 + seg_len
    raise ValueError("exif: no Exif APP1 segment")


def _parse_tiff_exif(tiff: bytes) -> dict:
    if len(tiff) < 8:
        raise ValueError("exif: truncated TIFF header")
    if tiff[:4] == b"II*\x00":
        bo = "<"
    elif tiff[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("exif: bad TIFF magic")
    out: dict = {f: None for f in EXIF_FIELDS}
    out["gps_present"] = False
    ifd0_off = struct.unpack_from(bo + "I", tiff, 4)[0]
    exif_ptr = gps_ptr = None
    for tag, vals in _walk_ifd(tiff, bo, ifd0_off):
        if tag in _TAGS_IFD0:
            out[_TAGS_IFD0[tag]] = vals
        elif tag == 0x8769:
            exif_ptr = _as_int(vals)
        elif tag == 0x8825:
            gps_ptr = _as_int(vals)
    if exif_ptr is not None:
        for tag, vals in _walk_ifd(tiff, bo, exif_ptr):
            if tag in _TAGS_EXIF:
                out[_TAGS_EXIF[tag]] = vals
    if gps_ptr is not None:
        gps: dict = {}
        for tag, vals in _walk_ifd(tiff, bo, gps_ptr):
            gps[tag] = vals
        if gps:
            out["gps_present"] = True
            lat = _gps_coord(gps.get(0x0002), gps.get(0x0001), "S")
            lon = _gps_coord(gps.get(0x0004), gps.get(0x0003), "W")
            out["gps_lat"], out["gps_lon"] = lat, lon
    for f in ("orientation", "iso", "pixel_x", "pixel_y"):
        out[f] = _as_int(out[f])
    for f in ("exposure_time", "f_number", "focal_length"):
        out[f] = _as_float(out[f])
    for f in ("make", "model", "software", "datetime",
              "datetime_original"):
        if out[f] is not None and not isinstance(out[f], str):
            out[f] = None
    return out


def _walk_ifd(tiff: bytes, bo: str, off: int):
    """Yield (tag, decoded-value) over one IFD, bounded."""
    if off + 2 > len(tiff):
        raise ValueError("exif: IFD offset out of range")
    count = struct.unpack_from(bo + "H", tiff, off)[0]
    if count > 64:
        raise ValueError("exif: oversized IFD")
    for k in range(count):
        e = off + 2 + 12 * k
        if e + 12 > len(tiff):
            raise ValueError("exif: truncated IFD")
        tag, typ = struct.unpack_from(bo + "HH", tiff, e)
        n = struct.unpack_from(bo + "I", tiff, e + 4)[0]
        size = _TYPE_SIZES.get(typ)
        if size is None or n > 4096:
            continue  # unknown/oversized type: skip the entry
        total = size * n
        if total <= 4:
            voff = e + 8
        else:
            voff = struct.unpack_from(bo + "I", tiff, e + 8)[0]
            if voff + total > len(tiff):
                continue
        yield tag, _decode_value(tiff, bo, typ, n, voff)


def _decode_value(tiff: bytes, bo: str, typ: int, n: int, off: int):
    if typ == 2:  # ASCII, NUL-terminated
        raw = tiff[off:off + n]
        return raw.split(b"\x00", 1)[0].decode("latin-1")
    if typ in (1, 7):
        return list(tiff[off:off + n])
    if typ == 3:
        return list(struct.unpack_from(bo + "H" * n, tiff, off))
    if typ == 4:
        return list(struct.unpack_from(bo + "I" * n, tiff, off))
    if typ == 9:
        return list(struct.unpack_from(bo + "i" * n, tiff, off))
    if typ == 5:
        vs = struct.unpack_from(bo + "II" * n, tiff, off)
        return [(vs[2 * i], vs[2 * i + 1]) for i in range(n)]
    if typ == 10:
        vs = struct.unpack_from(bo + "ii" * n, tiff, off)
        return [(vs[2 * i], vs[2 * i + 1]) for i in range(n)]
    return None


def _as_int(v) -> int | None:
    if isinstance(v, list) and v and isinstance(v[0], int):
        v = v[0]
    if not isinstance(v, int):
        return None
    # feeds IntegerType operator columns: a 32-bit LONG tag value
    # above 2^31-1 must become NULL, not an Arrow int32 cast crash
    return v if 0 <= v < (1 << 31) else None


def _as_float(v) -> float | None:
    if isinstance(v, list) and v and isinstance(v[0], tuple):
        num, den = v[0]
        if den == 0:
            return None
        return round(num / den, 6)
    return None


def _gps_coord(dms, ref, neg_ref: str) -> float | None:
    """(deg,min,sec) rationals + hemisphere ref -> signed decimal
    degrees rounded to 6 places."""
    if not isinstance(dms, list) or len(dms) != 3 \
            or not all(isinstance(x, tuple) for x in dms):
        return None
    try:
        deg = sum((n / d) / f for (n, d), f in zip(dms, (1, 60, 3600)))
    except ZeroDivisionError:
        return None
    r = ref if isinstance(ref, str) else ""
    if r.upper().startswith(neg_ref):
        deg = -deg
    return round(deg, 6)


# --- fixture-side builder --------------------------------------------


def build_exif_app1(fields: dict, byte_order: str = "<") -> bytes:
    """Build an Exif APP1 segment (marker + length + body) carrying
    ``fields`` (same keys as EXIF_FIELDS; gps via 'gps_lat'/'gps_lon'
    floats).  Fixture-side encoder for tests and driver queries —
    independent of the parser's internals."""
    bo = byte_order
    magic = b"II*\x00" if bo == "<" else b"MM\x00*"

    def entry(tag, typ, vals):
        return (tag, typ, vals)

    ifd0, exif, gps = [], [], []
    strs = {"make": 0x010F, "model": 0x0110, "software": 0x0131,
            "datetime": 0x0132}
    for f, tag in strs.items():
        if fields.get(f) is not None:
            ifd0.append(entry(tag, 2, fields[f].encode() + b"\x00"))
    if fields.get("orientation") is not None:
        ifd0.append(entry(0x0112, 3, [fields["orientation"]]))
    if fields.get("datetime_original") is not None:
        exif.append(entry(0x9003, 2,
                          fields["datetime_original"].encode() + b"\x00"))
    for f, tag in (("exposure_time", 0x829A), ("f_number", 0x829D),
                   ("focal_length", 0x920A)):
        if fields.get(f) is not None:
            num, den = fields[f]
            exif.append(entry(tag, 5, [(num, den)]))
    if fields.get("iso") is not None:
        exif.append(entry(0x8827, 3, [fields["iso"]]))
    for f, tag in (("pixel_x", 0xA002), ("pixel_y", 0xA003)):
        if fields.get(f) is not None:
            exif.append(entry(tag, 4, [fields[f]]))
    if fields.get("gps_lat") is not None:
        lat, lon = fields["gps_lat"], fields["gps_lon"]
        gps.append(entry(0x0001, 2,
                         (b"S" if lat < 0 else b"N") + b"\x00"))
        gps.append(entry(0x0002, 5, _to_dms(abs(lat))))
        gps.append(entry(0x0003, 2,
                         (b"W" if lon < 0 else b"E") + b"\x00"))
        gps.append(entry(0x0004, 5, _to_dms(abs(lon))))

    # lay out: header(8) IFD0 [ExifIFD] [GPSIFD] valuedata
    def ifd_size(entries):
        return 2 + 12 * len(entries) + 4

    ifd0_full = list(ifd0)
    off_ifd0 = 8
    n0 = len(ifd0) + (1 if exif else 0) + (1 if gps else 0)
    off_exif = off_ifd0 + 2 + 12 * n0 + 4
    off_gps = off_exif + (ifd_size(exif) if exif else 0)
    data_off = off_gps + (ifd_size(gps) if gps else 0)
    if exif:
        ifd0_full.append(entry(0x8769, 4, [off_exif]))
    if gps:
        ifd0_full.append(entry(0x8825, 4, [off_gps]))
    ifd0_full.sort(key=lambda t: t[0])

    blob = bytearray()

    def emit_ifd(entries):
        nonlocal data_off
        out = bytearray(struct.pack(bo + "H", len(entries)))
        for tag, typ, vals in entries:
            if typ == 2:
                payload = vals
                n = len(payload)
            elif typ == 3:
                payload = struct.pack(bo + "H" * len(vals), *vals)
                n = len(vals)
            elif typ == 4:
                payload = struct.pack(bo + "I" * len(vals), *vals)
                n = len(vals)
            else:  # 5 rational
                flat = [x for pair in vals for x in pair]
                payload = struct.pack(bo + "I" * len(flat), *flat)
                n = len(vals)
            out += struct.pack(bo + "HHI", tag, typ, n)
            if len(payload) <= 4:
                out += payload + b"\x00" * (4 - len(payload))
            else:
                out += struct.pack(bo + "I", data_off)
                blob.extend(payload)
                data_off += len(payload)
        out += struct.pack(bo + "I", 0)  # next IFD
        return bytes(out)

    body = emit_ifd(ifd0_full)
    if exif:
        body += emit_ifd(sorted(exif, key=lambda t: t[0]))
    if gps:
        body += emit_ifd(sorted(gps, key=lambda t: t[0]))
    tiff = magic + struct.pack(bo + "I", off_ifd0) + body + bytes(blob)
    seg = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg


def _to_dms(deg: float) -> list[tuple[int, int]]:
    """Decimal degrees -> (deg, min, sec*10^4) rationals that fold
    back EXACTLY to round(deg, 6) when re-read (fixture arithmetic:
    seconds carry 4 decimal places, enough for 1e-6 degrees)."""
    total = round(deg * 3600 * 10000)  # 1e-4 arc-seconds
    d, rem = divmod(total, 3600 * 10000)
    m, sec4 = divmod(rem, 60 * 10000)
    return [(int(d), 1), (int(m), 1), (int(sec4), 10000)]


def inject_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment right after SOI of an encoded JPEG."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]
