"""Snappy codec (raw block + framing format) — pure Python, no external
lib.

Hadoop/Spark pipelines ship ``*.snappy`` text dumps and the snappy
framing format (RFC-less but specified in google/snappy framing_format.txt)
is what ``python-snappy``'s stream mode and many log shippers write. Raw
snappy is also parquet's default page codec — parquet itself is read by
the JVM, but corpus sidecar files aren't. This gives the binary source's
transparent-unwrap path the third Hadoop codec next to gzip and LZ4.

- **Raw block**: varint uncompressed length, then tagged elements —
  literals (tag&3 == 0, lengths 1..2^32 with 1-4 extra length bytes) and
  copies (copy-1: 3-bit length 4..11 with 11-bit offset; copy-2: 6-bit
  length with 16-bit offset; copy-4: 32-bit offset). Overlap copies
  replicate the pattern like LZ4.
- **Framing format**: stream identifier chunk ``sNaPpY``, compressed
  (0x00) / uncompressed (0x01) data chunks with masked CRC32C over the
  UNCOMPRESSED bytes, padding/reserved chunks skipped per spec.
- **CRC32C** (Castagnoli) and the framing mask are implemented here.

The greedy encoder exists to make every decoder path round-trip and
hypothesis testable offline (same policy as ``functions/lz4``).
"""

from __future__ import annotations

import struct

__all__ = [
    "crc32c",
    "compress_snappy_block",
    "decompress_snappy_block",
    "compress_snappy_framed",
    "decompress_snappy_framed",
]

_CRC_TABLE: list[int] = []


def _crc_table() -> list[int]:
    if not _CRC_TABLE:
        poly = 0x82F63B78  # reflected Castagnoli
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            _CRC_TABLE.append(c)
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _mask_crc(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _read_varint(data: bytes, i: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        if i >= len(data):
            raise ValueError("truncated varint")
        b = data[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7
        if shift > 35:
            raise ValueError("varint too long")


def _write_varint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def decompress_snappy_block(src: bytes) -> bytes:
    expected, i = _read_varint(src, 0)
    out = bytearray()
    n = len(src)
    while i < n:
        tag = src[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                if i + extra > n:
                    raise ValueError("truncated literal length")
                ln = int.from_bytes(src[i : i + extra], "little")
                i += extra
            ln += 1
            if i + ln > n:
                raise ValueError("literal overruns input")
            out += src[i : i + ln]
            i += ln
            continue
        if kind == 1:  # copy-1
            ln = ((tag >> 2) & 0x07) + 4
            if i >= n:
                raise ValueError("truncated copy-1")
            offset = ((tag >> 5) << 8) | src[i]
            i += 1
        elif kind == 2:  # copy-2
            ln = (tag >> 2) + 1
            if i + 2 > n:
                raise ValueError("truncated copy-2")
            offset = src[i] | (src[i + 1] << 8)
            i += 2
        else:  # copy-4
            ln = (tag >> 2) + 1
            if i + 4 > n:
                raise ValueError("truncated copy-4")
            offset = int.from_bytes(src[i : i + 4], "little")
            i += 4
        if offset == 0 or offset > len(out):
            raise ValueError("bad copy offset")
        start = len(out) - offset
        if offset >= ln:
            out += out[start : start + ln]
        else:
            pattern = bytes(out[start:])
            reps = -(-ln // offset)
            out += (pattern * reps)[:ln]
    if len(out) != expected:
        raise ValueError(f"snappy length mismatch: {len(out)} != {expected}")
    return bytes(out)


def _emit_literal(out: bytearray, lit: bytes) -> None:
    pos = 0
    while pos < len(lit):
        chunk = lit[pos : pos + (1 << 16)]
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < (1 << 8):
            out.append(60 << 2)
            out.append(ln)
        else:
            out.append(61 << 2)
            out += struct.pack("<H", ln)
        out += chunk
        pos += len(chunk)


def _emit_copy(out: bytearray, offset: int, ln: int) -> None:
    while ln > 0:
        if 4 <= ln <= 11 and offset < (1 << 11):
            out.append(1 | ((ln - 4) << 2) | ((offset >> 8) << 5))
            out.append(offset & 0xFF)
            return
        step = min(ln, 64)
        if ln - step in (1, 2, 3):  # never leave a sub-minimum tail
            step = ln - 4
        out.append(2 | ((step - 1) << 2))
        out += struct.pack("<H", offset)
        ln -= step


def compress_snappy_block(src: bytes) -> bytes:
    out = bytearray(_write_varint(len(src)))
    n = len(src)
    table: dict[bytes, int] = {}
    i = anchor = 0
    while i + 4 <= n:
        key = src[i : i + 4]
        j = table.get(key, -1)
        table[key] = i
        if j >= 0 and i - j < (1 << 16):
            mlen = 4
            while i + mlen < n and src[j + mlen] == src[i + mlen]:
                mlen += 1
            if anchor < i:
                _emit_literal(out, src[anchor:i])
            _emit_copy(out, i - j, mlen)
            i += mlen
            anchor = i
        else:
            i += 1
    if anchor < n:
        _emit_literal(out, src[anchor:])
    return bytes(out)


_STREAM_ID = b"\xff\x06\x00\x00sNaPpY"


def compress_snappy_framed(data: bytes, chunk_size: int = 65536) -> bytes:
    out = bytearray(_STREAM_ID)
    for pos in range(0, len(data), chunk_size) or [0]:
        raw = data[pos : pos + chunk_size]
        crc = _mask_crc(crc32c(raw))
        comp = compress_snappy_block(raw)
        if len(comp) < len(raw):
            body = struct.pack("<I", crc) + comp
            out += bytes([0x00]) + struct.pack("<I", len(body))[:3] + body
        else:
            body = struct.pack("<I", crc) + raw
            out += bytes([0x01]) + struct.pack("<I", len(body))[:3] + body
    return bytes(out)


def decompress_snappy_framed(data: bytes) -> bytes:
    if not data.startswith(_STREAM_ID):
        raise ValueError("missing snappy stream identifier")
    i = len(_STREAM_ID)
    out = bytearray()
    n = len(data)
    while i < n:
        if i + 4 > n:
            raise ValueError("truncated chunk header")
        ctype = data[i]
        clen = int.from_bytes(data[i + 1 : i + 4], "little")
        i += 4
        chunk = data[i : i + clen]
        if len(chunk) != clen:
            raise ValueError("truncated chunk body")
        i += clen
        if ctype == 0xFF:  # repeated stream identifier
            continue
        if ctype in (0x00, 0x01):
            if clen < 4:
                raise ValueError("chunk too short for checksum")
            (crc,) = struct.unpack_from("<I", chunk)
            raw = decompress_snappy_block(chunk[4:]) if ctype == 0x00 else chunk[4:]
            if _mask_crc(crc32c(raw)) != crc:
                raise ValueError("snappy chunk checksum mismatch")
            out += raw
        elif 0x02 <= ctype <= 0x7F:  # unskippable reserved
            raise ValueError(f"unskippable snappy chunk type 0x{ctype:02x}")
        # 0x80..0xFE: skippable (padding etc.) — ignore
    return bytes(out)
