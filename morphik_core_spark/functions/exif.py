"""EXIF metadata extraction — pure-Python walk of the TIFF-structured
Exif block inside JPEG APP1 segments (or a bare TIFF file), plus a
fixture builder so round-trips are testable without any image library.

Reference parity: morphik-core reaches image metadata through PIL when
it parses images at all (`core/parser/morphik_parser.py`); this module
gives the Spark pipeline the same signals (camera make/model, capture
time, orientation, exposure, GPS) as plain columns for curation — e.g.
dedup burst shots by (make, model, datetime_original), drop GPS-bearing
images before training-set export, or fix rotation before feature
extraction.

Every count/offset read from the header is bounds-checked against the
file size BEFORE allocation — the corrupt-header allocation-bomb rule
from NOTES.md (the tiff.py `"I"*cnt` incident); a truncated or cyclic
IFD chain raises instead of hanging.
"""

from __future__ import annotations

import struct

__all__ = ["parse_exif_tiff", "extract_exif", "build_exif_jpeg", "EXIF_FIELDS"]

# type id -> byte size (TIFF 6.0 §2)
_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

_IFD0_TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0132: "datetime",
    0x8769: "_exif_ifd",
    0x8825: "_gps_ifd",
}
_EXIF_TAGS = {
    0x829A: "exposure_time",
    0x829D: "f_number",
    0x8827: "iso",
    0x9003: "datetime_original",
    0xA002: "pixel_width",
    0xA003: "pixel_height",
}
_GPS_TAGS = {
    0x0001: "gps_lat_ref",
    0x0002: "gps_lat",
    0x0003: "gps_lon_ref",
    0x0004: "gps_lon",
}

EXIF_FIELDS = [
    "make",
    "model",
    "orientation",
    "datetime",
    "datetime_original",
    "exposure_time",
    "f_number",
    "iso",
    "pixel_width",
    "pixel_height",
    "gps_lat",
    "gps_lon",
]


def _read_values(data: bytes, e: str, typ: int, cnt: int, base: int):
    size = _SIZES.get(typ)
    if size is None:
        return None
    if cnt > len(data) // size:
        raise ValueError(f"EXIF tag count {cnt} exceeds file size")
    total = size * cnt
    if total <= 4:
        raw = data[base : base + total]
    else:
        (p,) = struct.unpack_from(e + "I", data, base)
        if p + total > len(data):
            raise ValueError("EXIF tag data out of bounds")
        raw = data[p : p + total]
    if len(raw) < total:
        raise ValueError("EXIF tag data truncated")
    if typ == 2:  # ASCII, NUL-terminated
        return raw.split(b"\x00", 1)[0].decode("ascii", "replace")
    if typ == 3:
        return list(struct.unpack(e + "H" * cnt, raw))
    if typ in (4, 9):
        return list(struct.unpack(e + ("I" if typ == 4 else "i") * cnt, raw))
    if typ in (5, 10):
        f = "I" if typ == 5 else "i"
        pairs = struct.unpack(e + f * (2 * cnt), raw)
        return [(pairs[2 * i], pairs[2 * i + 1]) for i in range(cnt)]
    if typ in (1, 7):
        return list(raw)
    return None


def _walk_ifd(data: bytes, e: str, off: int, names: dict, out: dict) -> None:
    if off + 2 > len(data):
        raise ValueError("EXIF IFD offset out of bounds")
    (n,) = struct.unpack_from(e + "H", data, off)
    if off + 2 + 12 * n > len(data):
        raise ValueError("EXIF IFD entry table truncated")
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", data, base)
        name = names.get(tag)
        if name is None:
            continue
        vals = _read_values(data, e, typ, cnt, base + 8)
        if vals is not None:
            out[name] = vals


def parse_exif_tiff(data: bytes) -> dict:
    """Parse a TIFF-structured Exif payload (starting at the byte-order
    mark) into a raw tag dict. Sub-IFDs (Exif, GPS) are followed once
    each — no chain walking, so a crafted cycle can't loop."""
    if len(data) < 8:
        raise ValueError("EXIF payload too short")
    bom = data[:2]
    if bom == b"II":
        e = "<"
    elif bom == b"MM":
        e = ">"
    else:
        raise ValueError("EXIF payload has no byte-order mark")
    (magic,) = struct.unpack_from(e + "H", data, 2)
    if magic != 42:
        raise ValueError("EXIF payload missing TIFF magic 42")
    (ifd0,) = struct.unpack_from(e + "I", data, 4)
    raw: dict = {}
    _walk_ifd(data, e, ifd0, _IFD0_TAGS, raw)
    exif_ptr = raw.pop("_exif_ifd", None)
    if exif_ptr:
        _walk_ifd(data, e, int(exif_ptr[0]), _EXIF_TAGS, raw)
    gps_ptr = raw.pop("_gps_ifd", None)
    if gps_ptr:
        _walk_ifd(data, e, int(gps_ptr[0]), _GPS_TAGS, raw)
    return raw


def _rat(v) -> float | None:
    if not v:
        return None
    num, den = v[0] if isinstance(v[0], tuple) else (v[0], 1)
    if den == 0:
        return None
    return num / den


def _dms(vals, ref: str | None) -> float | None:
    if not vals or len(vals) < 3:
        return None
    d, m, s = (_rat([vals[0]]), _rat([vals[1]]), _rat([vals[2]]))
    if None in (d, m, s):
        return None
    deg = d + m / 60.0 + s / 3600.0
    if ref in ("S", "W"):
        deg = -deg
    return round(deg, 7)


def extract_exif(data: bytes) -> dict:
    """Normalized EXIF fields from a JPEG (APP1 scan) or bare TIFF.

    Returns a dict over :data:`EXIF_FIELDS` — strings for make/model/
    datetimes, ints for orientation/iso/pixel dims, floats for
    exposure_time/f_number and signed decimal-degree GPS. Missing
    fields are None; files with no Exif raise ValueError (callers doing
    row-level isolation report it as err, distinguishing 'no metadata'
    from 'unreadable')."""
    if data[:2] == b"\xff\xd8":  # JPEG: find the Exif APP1 segment
        pos, payload = 2, None
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                break
            marker = data[pos + 1]
            if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seglen,) = struct.unpack_from(">H", data, pos + 2)
            if seglen < 2 or pos + 2 + seglen > len(data):
                raise ValueError("JPEG segment length out of bounds")
            if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
                payload = data[pos + 10 : pos + 2 + seglen]
                break
            if marker == 0xDA:  # entropy data begins; no Exif before it
                break
            pos += 2 + seglen
        if payload is None:
            raise ValueError("JPEG has no Exif APP1 segment")
        raw = parse_exif_tiff(bytes(payload))
    elif data[:2] in (b"II", b"MM"):
        raw = parse_exif_tiff(data)
    else:
        raise ValueError("not a JPEG or TIFF payload")

    def first_int(name):
        v = raw.get(name)
        if isinstance(v, list) and v:
            return int(v[0])
        return None

    return {
        "make": raw.get("make"),
        "model": raw.get("model"),
        "orientation": first_int("orientation"),
        "datetime": raw.get("datetime"),
        "datetime_original": raw.get("datetime_original"),
        "exposure_time": _rat(raw.get("exposure_time")),
        "f_number": _rat(raw.get("f_number")),
        "iso": first_int("iso"),
        "pixel_width": first_int("pixel_width"),
        "pixel_height": first_int("pixel_height"),
        "gps_lat": _dms(raw.get("gps_lat"), (raw.get("gps_lat_ref") or [None])[0]
                        if isinstance(raw.get("gps_lat_ref"), list) else raw.get("gps_lat_ref")),
        "gps_lon": _dms(raw.get("gps_lon"), (raw.get("gps_lon_ref") or [None])[0]
                        if isinstance(raw.get("gps_lon_ref"), list) else raw.get("gps_lon_ref")),
    }


def _ifd_bytes(entries: list[tuple[int, int, int, bytes]], e: str, ifd_off: int,
               extra: bytearray, extra_base: int) -> bytes:
    """Serialize one IFD. entries: (tag, type, count, packed_value_bytes);
    values longer than 4 bytes append to ``extra`` and store a pointer."""
    out = bytearray(struct.pack(e + "H", len(entries)))
    for tag, typ, cnt, val in sorted(entries):
        out += struct.pack(e + "HHI", tag, typ, cnt)
        if len(val) <= 4:
            out += val.ljust(4, b"\x00")
        else:
            ptr = extra_base + len(extra)
            extra += val
            out += struct.pack(e + "I", ptr)
    out += struct.pack(e + "I", 0)  # next-IFD: none
    return bytes(out)


def build_exif_jpeg(
    *,
    make: str = "TestCam",
    model: str = "T1000",
    orientation: int = 6,
    datetime_original: str = "2024:03:01 10:20:30",
    exposure_time: tuple[int, int] = (1, 250),
    f_number: tuple[int, int] = (28, 10),
    iso: int = 200,
    gps: tuple[float, float] | None = (52.52, -13.405),
    jpeg_body: bytes | None = None,
) -> bytes:
    """Deterministic Exif-JPEG fixture: a real APP1 Exif block spliced
    after SOI of ``jpeg_body`` (default: a 8x8 gray baseline JPEG from
    the repo's own encoder)."""
    import numpy as np

    from morphik_core_spark.functions.jpeg import encode_jpeg_baseline

    if jpeg_body is None:
        jpeg_body = encode_jpeg_baseline(np.full((8, 8, 3), 128, dtype=np.uint8))
    e = "<"

    def ascii_v(s: str) -> tuple[int, int, bytes]:
        b = s.encode("ascii") + b"\x00"
        return 2, len(b), b

    def short_v(x: int) -> tuple[int, int, bytes]:
        return 3, 1, struct.pack(e + "H", x)

    def long_v(x: int) -> tuple[int, int, bytes]:
        return 4, 1, struct.pack(e + "I", x)

    def rat_v(pairs: list[tuple[int, int]]) -> tuple[int, int, bytes]:
        return 5, len(pairs), b"".join(struct.pack(e + "II", n, d) for n, d in pairs)

    def dms_pairs(deg: float) -> list[tuple[int, int]]:
        deg = abs(deg)
        d = int(deg)
        m = int((deg - d) * 60)
        s = round(((deg - d) * 60 - m) * 60 * 10000)
        return [(d, 1), (m, 1), (s, 10000)]

    # layout: header(8) | IFD0 | ExifIFD | GPSIFD | extra values
    header = struct.pack(e + "2sHI", b"II", 42, 8)

    def sized(entries):  # IFD byte length with n entries
        return 2 + 12 * len(entries) + 4

    n_ifd0 = 6 if gps is not None else 5
    ifd0_off = 8
    exif_off = ifd0_off + sized([0] * n_ifd0)
    gps_off = exif_off + sized([0] * 6)
    extra_base = gps_off + (sized([0] * 4) if gps is not None else 0)
    extra = bytearray()

    exif_entries = [
        (0x829A, *rat_v([exposure_time])),
        (0x829D, *rat_v([f_number])),
        (0x8827, *short_v(iso)),
        (0x9003, *ascii_v(datetime_original)),
        (0xA002, *long_v(8)),
        (0xA003, *long_v(8)),
    ]
    ifd0_entries = [
        (0x010F, *ascii_v(make)),
        (0x0110, *ascii_v(model)),
        (0x0112, *short_v(orientation)),
        (0x0132, *ascii_v(datetime_original)),
        (0x8769, *long_v(exif_off)),
    ]
    gps_entries = []
    if gps is not None:
        lat, lon = gps
        ifd0_entries.append((0x8825, *long_v(gps_off)))
        gps_entries = [
            (0x0001, *ascii_v("N" if lat >= 0 else "S")),
            (0x0002, *rat_v(dms_pairs(lat))),
            (0x0003, *ascii_v("E" if lon >= 0 else "W")),
            (0x0004, *rat_v(dms_pairs(lon))),
        ]

    # serialize with extra-value pool anchored after the last IFD
    body = bytearray()
    body += _ifd_bytes(ifd0_entries, e, ifd0_off, extra, extra_base)
    body += _ifd_bytes(exif_entries, e, exif_off, extra, extra_base)
    if gps is not None:
        body += _ifd_bytes(gps_entries, e, gps_off, extra, extra_base)
    tiff = header + bytes(body) + bytes(extra)

    app1 = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    return jpeg_body[:2] + seg + jpeg_body[2:]
