"""kernel/exif.py: EXIF APP1/TIFF IFD parsing.  The builder
(build_exif_app1) and parser are exercised as a round-trip in both
byte orders, GPS DMS-rational folding is checked against decimal
fixtures, and mutation/truncation fuzz pins the never-raises
contract the operator layer depends on."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from pdf_to_text_extraction_service_spark.kernel import exif, imgcodec

FIELDS = {
    "make": "Acme", "model": "Shooter 9", "software": "firmware 1.2",
    "datetime": "2024:05:01 10:20:30",
    "datetime_original": "2024:04:30 09:08:07",
    "orientation": 6, "iso": 200,
    "exposure_time": (1, 250), "f_number": (28, 10),
    "focal_length": (35, 1),
    "pixel_x": 640, "pixel_y": 480,
    "gps_lat": 37.774929, "gps_lon": -122.419416,
}


def _jpeg_with_exif(fields, bo="<"):
    img = np.full((8, 8), 128, dtype=np.uint8)
    return exif.inject_app1(imgcodec.encode_jpeg(img),
                            exif.build_exif_app1(fields, bo))


@pytest.mark.parametrize("bo", ["<", ">"])
def test_roundtrip_both_endians(bo):
    got = exif.parse_exif(_jpeg_with_exif(FIELDS, bo))
    assert got["make"] == "Acme"
    assert got["model"] == "Shooter 9"
    assert got["software"] == "firmware 1.2"
    assert got["datetime"] == "2024:05:01 10:20:30"
    assert got["datetime_original"] == "2024:04:30 09:08:07"
    assert got["orientation"] == 6
    assert got["iso"] == 200
    assert got["exposure_time"] == 0.004
    assert got["f_number"] == 2.8
    assert got["focal_length"] == 35.0
    assert got["pixel_x"] == 640 and got["pixel_y"] == 480
    assert got["gps_present"] is True
    assert got["gps_lat"] == 37.774929
    assert got["gps_lon"] == -122.419416


def test_gps_fold_is_exact_for_6dp():
    rng = random.Random(5)
    for _ in range(200):
        lat = round(rng.uniform(-89.9, 89.9), 6)
        lon = round(rng.uniform(-179.9, 179.9), 6)
        j = _jpeg_with_exif({"gps_lat": lat, "gps_lon": lon})
        got = exif.parse_exif(j)
        assert got["gps_lat"] == lat and got["gps_lon"] == lon


def test_partial_fields_yield_nones():
    got = exif.parse_exif(_jpeg_with_exif({"orientation": 3}))
    assert got["orientation"] == 3
    assert got["make"] is None and got["gps_present"] is False
    assert got["gps_lat"] is None


def test_no_exif_raises_value_error():
    img = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError):
        exif.parse_exif(imgcodec.encode_jpeg(img))
    with pytest.raises(ValueError):
        exif.parse_exif(b"plain text payload")
    with pytest.raises(ValueError):
        exif.parse_exif(b"")


def test_bare_tiff_header_parses():
    app1 = exif.build_exif_app1(FIELDS)
    tiff = app1[4 + 6:]  # strip marker+len+Exif\0\0
    got = exif.parse_exif(tiff)
    assert got["model"] == "Shooter 9" and got["gps_present"] is True


def test_zero_denominator_is_null_not_crash():
    j = _jpeg_with_exif({"exposure_time": (1, 0)})
    assert exif.parse_exif(j)["exposure_time"] is None


def test_never_raises_contract_under_mutation():
    base = _jpeg_with_exif(FIELDS)
    rng = random.Random(11)
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.randrange(1, 6)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            out = exif.parse_exif(bytes(b))
            assert isinstance(out, dict)
        except ValueError:
            pass  # the one allowed failure mode
    for cut in range(0, len(base), 37):
        try:
            exif.parse_exif(base[:cut])
        except ValueError:
            pass


def test_oversized_ifd_rejected():
    tiff = b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 999)
    with pytest.raises(ValueError):
        exif.parse_exif(tiff + bytes(64))


def test_short_tiff_and_long_values_are_contained():
    # a 4-byte TIFF passes the magic check but must ValueError,
    # never struct.error (the documented kernel contract)
    with pytest.raises(ValueError):
        exif.parse_exif(b"II*\x00")
    # orientation/iso feed IntegerType columns: values above 2^31-1
    # must become NULL, not an Arrow int32 cast crash
    assert exif._as_int([4000000000]) is None
    assert exif._as_int(4000000000) is None
    assert exif._as_int(7) == 7
