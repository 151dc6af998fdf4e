"""EXIF: fixture round-trips (both hemispheres, missing GPS, bare TIFF),
corrupt-header guards, and the Spark mapInPandas surface with row-level
failure isolation."""

from __future__ import annotations

import struct

import pytest

from morphik_core_spark.functions.exif import (
    build_exif_jpeg,
    extract_exif,
    parse_exif_tiff,
)


def test_roundtrip_all_fields():
    j = build_exif_jpeg(
        make="Acme",
        model="X9",
        orientation=3,
        datetime_original="2023:12:31 23:59:59",
        exposure_time=(1, 125),
        f_number=(56, 10),
        iso=1600,
        gps=(52.52, -13.405),
    )
    m = extract_exif(j)
    assert (m["make"], m["model"], m["orientation"]) == ("Acme", "X9", 3)
    assert m["datetime_original"] == "2023:12:31 23:59:59"
    assert m["exposure_time"] == 1 / 125
    assert m["f_number"] == 5.6
    assert m["iso"] == 1600
    assert abs(m["gps_lat"] - 52.52) < 1e-4
    assert abs(m["gps_lon"] + 13.405) < 1e-4


def test_southern_western_hemispheres():
    m = extract_exif(build_exif_jpeg(gps=(-33.8688, 151.2093)))
    assert m["gps_lat"] < 0 < m["gps_lon"]


def test_no_gps_and_no_exif():
    assert extract_exif(build_exif_jpeg(gps=None))["gps_lat"] is None
    from morphik_core_spark.functions.jpeg import encode_jpeg_baseline
    import numpy as np

    plain = encode_jpeg_baseline(np.zeros((8, 8, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="no Exif"):
        extract_exif(plain)


def test_bare_tiff_payload():
    j = build_exif_jpeg()
    # carve the TIFF stream out of APP1 and parse it directly
    i = j.find(b"Exif\x00\x00") + 6
    (seglen,) = struct.unpack_from(">H", j, j.find(b"\xff\xe1") + 2)
    tiff = j[i : j.find(b"\xff\xe1") + 2 + seglen]
    raw = parse_exif_tiff(tiff)
    assert raw["make"] == "TestCam"


def test_corrupt_count_rejected_not_allocated():
    j = bytearray(build_exif_jpeg())
    # flip the count field of the first IFD entry to a huge value
    i = j.find(b"II*\x00")
    ifd0 = i + 8
    struct.pack_into("<I", j, ifd0 + 2 + 4, 0x7FFFFFFF)
    with pytest.raises(ValueError):
        extract_exif(bytes(j))


def test_truncated_payload_raises():
    j = build_exif_jpeg()
    with pytest.raises(ValueError):
        extract_exif(j[:40])


def test_spark_surface_row_isolation(spark):
    from morphik_core_spark.operators.multimodal import extract_image_exif

    good = build_exif_jpeg()
    nogps = build_exif_jpeg(gps=None)
    df = spark.createDataFrame(
        [("g", bytearray(good)), ("n", bytearray(nogps)), ("bad", bytearray(b"\x00\x01"))],
        "media_id string, payload binary",
    )
    out = {r.media_id: r for r in extract_image_exif(df).collect()}
    assert out["g"].ok and out["g"].has_gps and out["g"].make == "TestCam"
    assert out["n"].ok and not out["n"].has_gps
    assert not out["bad"].ok and out["bad"].err
