"""Pure-Python MJPEG-AVI video container codec.

The reference samples video frames at a configurable fps and feeds them to
the image pipeline (/root/reference/core/parser/video/parse_video.py:91-280
via PyMuPDF/ffmpeg). Neither is in this container, but with the baseline
JPEG codec (functions/jpeg.py) real, the classic self-contained video
format — Motion-JPEG in an AVI (RIFF) container — is fully decodable:
every frame is an independent baseline JPEG, so frame extraction is RIFF
chunk walking plus the existing still-image decoder.

- ``parse_avi_mjpeg``: RIFF walk → (fps, width, height, [frame bytes]).
  Anything that isn't RIFF/AVI raises ValueError (row-level isolation in
  the multimodal operators); codecs other than MJPEG raise too — honest
  boundary, no fake decode.
- ``encode_avi_mjpeg``: fixture-grade writer (avih/strl/movi, even-padded
  00dc chunks) so the sampler round-trips in tests without ffmpeg.
"""

from __future__ import annotations

import struct

import numpy as np

from morphik_core_spark.functions.jpeg import decode_jpeg, encode_jpeg_baseline

__all__ = ["parse_avi_mjpeg", "encode_avi_mjpeg", "decode_jpeg"]


def _chunks(data: bytes, start: int, end: int):
    """Iterate (fourcc, payload_start, payload_size) over a RIFF range."""
    i = start
    while i + 8 <= end:
        fourcc = data[i : i + 4]
        (size,) = struct.unpack_from("<I", data, i + 4)
        yield fourcc, i + 8, size
        i += 8 + size + (size & 1)  # chunks are word-aligned


def parse_avi_mjpeg(data: bytes) -> tuple[float, int, int, list[bytes]]:
    """AVI/MJPEG bytes -> (fps, width, height, frames as JPEG bytes)."""
    if data is None or len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF) container")
    usec_per_frame = None
    width = height = 0
    handler_ok = False
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal usec_per_frame, width, height, handler_ok
        for fourcc, p, size in _chunks(data, lo, hi):
            if fourcc == b"LIST":
                list_type = data[p : p + 4]
                if list_type == b"movi":
                    for cc, fp, fsize in _chunks(data, p + 4, p + size):
                        if cc[2:4] in (b"dc", b"db"):
                            frames.append(data[fp : fp + fsize])
                else:
                    walk(p + 4, p + size)
            elif fourcc == b"avih" and size >= 40:
                usec_per_frame, _mbps, _pad, _flags, _total = struct.unpack_from("<5I", data, p)
                width, height = struct.unpack_from("<II", data, p + 32)
            elif fourcc == b"strh" and size >= 8:
                if data[p : p + 4] == b"vids":
                    if data[p + 4 : p + 8] in (b"MJPG", b"mjpg"):
                        handler_ok = True
                    else:
                        raise ValueError(
                            f"unsupported AVI video codec {data[p + 4:p + 8]!r} (MJPG only)"
                        )

    walk(12, len(data))
    if not frames:
        raise ValueError("AVI has no video frames")
    if not handler_ok:
        raise ValueError("AVI has no MJPG video stream header")
    fps = 1e6 / usec_per_frame if usec_per_frame else 30.0
    return fps, width, height, frames


def encode_avi_mjpeg(frames: list[np.ndarray], fps: float = 10.0) -> bytes:
    """[(H, W, 3) uint8] -> minimal MJPEG-AVI bytes (fixture writer)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    jpegs = [encode_jpeg_baseline(f, subsample=True) for f in frames]

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def list_chunk(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    avih = struct.pack(
        "<10I", int(1e6 / fps), 0, 0, 0, len(jpegs), 0, 1, 0, w, h
    ) + b"\x00" * 16
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, int(fps), 0, len(jpegs), 0, 0, 0)
        + struct.pack("<4hI", 0, 0, 0, 0, 0)[:8]
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih) + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = list_chunk(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
