"""MP4/MOV container metadata probe (no decode): duration, track kinds,
codec fourccs, and video dimensions from the moov box tree.

Video corpora overwhelmingly ship MP4/H.264 — codec decode is out of
scope for a pure-Python engine (and says so), but the CONTAINER metadata
a pipeline filters on (duration buckets, resolution floors, codec
allowlists) parses in microseconds from moov alone. This powers
`attach_media`-style typed metadata and the `sample_video_frames`
planner for externally-decoded corpora; MJPEG-AVI remains the fully
decoded path (`functions/video`).

Box walker subset: mvhd (version 0/1), trak/tkhd, mdia/mdhd/hdlr,
stsd codec entry. A fixture writer keeps it testable libless.
"""

from __future__ import annotations

import struct

__all__ = ["probe_mp4", "build_mp4_moov"]

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(data: bytes, start: int, end: int):
    i = start
    while i + 8 <= end:
        size, btype = struct.unpack_from(">I4s", data, i)
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", data, i + 8)[0]
            body = i + 16
        elif size == 0:  # to end of enclosing box
            size = end - i
            body = i + 8
        else:
            body = i + 8
        if size < 8 or i + size > end:
            raise ValueError("malformed MP4 box")
        yield btype, body, i + size
        i += size


def probe_mp4(data: bytes) -> dict:
    """MP4/MOV bytes → {duration_s, timescale, tracks:[{kind, codec,
    width, height, duration_s}]}."""
    if len(data) < 12:
        raise ValueError("not an MP4 (too short)")
    # ftyp is conventionally first but not mandatory; require it or moov
    head = data[4:8]
    if head not in (b"ftyp", b"moov", b"wide", b"free", b"mdat"):
        raise ValueError("not an MP4 (no ftyp/moov)")

    out: dict = {"duration_s": None, "timescale": None, "tracks": []}

    def walk(start: int, end: int, ctx: dict):
        for btype, body, bend in _boxes(data, start, end):
            if btype in _CONTAINERS:
                sub_ctx = {"track": {}} if btype == b"trak" else ctx
                walk(body, bend, sub_ctx)
                if btype == b"trak" and sub_ctx["track"]:
                    out["tracks"].append(sub_ctx["track"])
            elif btype == b"mvhd":
                ver = data[body]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", data, body + 20)
                else:
                    ts, dur = struct.unpack_from(">II", data, body + 12)
                out["timescale"] = ts
                out["duration_s"] = dur / ts if ts else None
            elif btype == b"tkhd" and "track" in ctx:
                ver = data[body]
                off = body + (88 if ver == 1 else 76)
                w, h = struct.unpack_from(">II", data, off)
                # 16.16 fixed point
                if w:
                    ctx["track"]["width"] = w >> 16
                if h:
                    ctx["track"]["height"] = h >> 16
            elif btype == b"mdhd" and "track" in ctx:
                ver = data[body]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", data, body + 20)
                else:
                    ts, dur = struct.unpack_from(">II", data, body + 12)
                if ts:
                    ctx["track"]["duration_s"] = dur / ts
            elif btype == b"hdlr" and "track" in ctx:
                handler = data[body + 8 : body + 12]
                ctx["track"]["kind"] = {
                    b"vide": "video", b"soun": "audio", b"text": "text", b"subt": "subtitle",
                }.get(handler, handler.decode("latin-1", errors="replace"))
            elif btype == b"stsd" and "track" in ctx:
                n = struct.unpack_from(">I", data, body + 4)[0]
                if n >= 1:
                    ctx["track"]["codec"] = data[body + 12 : body + 16].decode(
                        "latin-1", errors="replace"
                    )

    walk(0, len(data), {})
    if out["duration_s"] is None and not out["tracks"]:
        raise ValueError("MP4 contains no moov metadata")
    return out


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", len(payload) + 8, btype) + payload


def build_mp4_moov(
    duration_s: float,
    tracks: list[dict],
    timescale: int = 1000,
) -> bytes:
    """Fixture writer: a minimal ftyp+moov container carrying the given
    metadata (no media data)."""
    dur = int(duration_s * timescale)
    mvhd = _box(b"mvhd", bytes(12) + struct.pack(">II", timescale, dur) + bytes(80))
    traks = b""
    for t in tracks:
        tkhd = _box(
            b"tkhd",
            bytes(76)
            + struct.pack(">II", int(t.get("width", 0)) << 16, int(t.get("height", 0)) << 16),
        )
        handler = {"video": b"vide", "audio": b"soun"}.get(t.get("kind"), b"gnrc")
        hdlr = _box(b"hdlr", bytes(8) + handler + bytes(13))
        mdhd = _box(
            b"mdhd", bytes(12) + struct.pack(">II", timescale, int(t.get("duration_s", duration_s) * timescale)) + bytes(4)
        )
        entry = struct.pack(">I4s", 16, t.get("codec", "avc1").encode("latin-1")) + bytes(8)
        stsd = _box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        traks += _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + traks)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov
