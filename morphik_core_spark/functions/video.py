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

__all__ = [
    "parse_avi",
    "parse_avi_mjpeg",
    "encode_avi_mjpeg",
    "encode_avi_dib",
    "decode_jpeg",
    "decode_dib_frame",
]


def _chunks(data: bytes, start: int, end: int):
    """Iterate (fourcc, payload_start, payload_size) over a RIFF range."""
    i = start
    while i + 8 <= end:
        fourcc = data[i : i + 4]
        (size,) = struct.unpack_from("<I", data, i + 4)
        yield fourcc, i + 8, size
        i += 8 + size + (size & 1)  # chunks are word-aligned


def parse_avi(data: bytes) -> tuple[float, int, int, list[bytes], str]:
    """AVI bytes -> (fps, width, height, frame payloads, codec).

    codec is "MJPG" (frames are baseline JPEGs → ``decode_jpeg``) or
    "DIB" (uncompressed BI_RGB 24-bit bottom-up frames →
    ``decode_dib_frame``). Anything that isn't RIFF/AVI raises; other
    codecs raise too — honest boundary, no fake decode.
    """
    if data is None or len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF) container")
    usec_per_frame = None
    width = height = 0
    codec = None
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal usec_per_frame, width, height, codec
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
                    handler = data[p + 4 : p + 8]
                    if handler in (b"MJPG", b"mjpg"):
                        codec = "MJPG"
                    elif handler in (b"DIB ", b"\x00\x00\x00\x00", b"RGB "):
                        codec = "DIB"
                    else:
                        raise ValueError(
                            f"unsupported AVI video codec {handler!r} (MJPG/DIB only)"
                        )

    walk(12, len(data))
    if not frames:
        raise ValueError("AVI has no video frames")
    if codec is None:
        raise ValueError("AVI has no supported video stream header")
    fps = 1e6 / usec_per_frame if usec_per_frame else 30.0
    return fps, width, height, frames, codec


def parse_avi_mjpeg(data: bytes) -> tuple[float, int, int, list[bytes]]:
    """AVI/MJPEG bytes -> (fps, width, height, frames as JPEG bytes)."""
    fps, w, h, frames, codec = parse_avi(data)
    if codec != "MJPG":
        raise ValueError(f"AVI stream is {codec}, not MJPG")
    return fps, w, h, frames


def decode_dib_frame(frame: bytes, width: int, height: int) -> np.ndarray:
    """One uncompressed BI_RGB frame -> (H, W, 3) uint8 RGB.

    DIB rows are bottom-up, BGR, each row padded to a 4-byte stride —
    the Windows bitmap memory layout AVI inherited.
    """
    stride = (width * 3 + 3) & ~3
    if width <= 0 or height <= 0 or len(frame) < stride * height:
        raise ValueError("DIB frame smaller than declared geometry")
    rows = np.frombuffer(frame[: stride * height], dtype=np.uint8).reshape(height, stride)
    px = rows[:, : width * 3].reshape(height, width, 3)
    return px[::-1, :, ::-1].copy()  # bottom-up -> top-down, BGR -> RGB


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


def encode_avi_dib(frames: list[np.ndarray], fps: float = 10.0) -> bytes:
    """[(H, W, 3) uint8 RGB] -> minimal uncompressed (BI_RGB) AVI bytes.

    Fixture-grade writer mirroring ``encode_avi_mjpeg``: same RIFF
    skeleton, handler 'DIB ', biCompression 0, frames stored bottom-up
    BGR with 4-byte row stride in 00db chunks — so the lossless decode
    path round-trips bit-exactly in tests.
    """
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    stride = (w * 3 + 3) & ~3

    def pack_frame(f: np.ndarray) -> bytes:
        bgr = f[::-1, :, ::-1]  # top-down RGB -> bottom-up BGR
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        return rows.tobytes()

    payloads = [pack_frame(np.asarray(f, dtype=np.uint8)) for f in frames]

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def list_chunk(list_type: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", list_type + payload)

    avih = struct.pack(
        "<10I", int(1e6 / fps), 0, 0, 0, len(payloads), 0, 1, 0, w, h
    ) + b"\x00" * 16
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, int(fps), 0, len(payloads), 0, 0, 0
        ) + struct.pack("<4hI", 0, 0, 0, 0, 0)[:8]
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"\x00\x00\x00\x00", stride * h, 0, 0, 0, 0)
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih) + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = list_chunk(b"movi", b"".join(chunk(b"00db", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
