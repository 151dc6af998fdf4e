"""LZ4 frame codec — pure Python, no external lib.

Training corpora ship as ``*.jsonl.lz4`` often enough (Hadoop/Spark LZ4
output, several public dumps) that the transparent-unwrap path in
:mod:`morphik_core_spark.sources.binary` should read them like .gz/.bz2/.xz.
stdlib has no LZ4, so this implements the spec directly:

- **Frame format** (v1.6.x): magic ``0x184D2204``, FLG/BD descriptor with
  xxHash32 header checksum, 4-byte-length blocks (high bit = stored
  uncompressed), optional per-block and content xxHash32 checksums.
- **Block format**: token sequences — 4-bit literal/match lengths with
  255-extension bytes, 2-byte little-endian match offsets, minimum match
  4, overlap copies allowed (offset < length replicates the pattern).
- **xxHash32** implemented here as well (the frame's checksum primitive).

The compressor is a greedy hash-table matcher — not ratio-optimal, but it
emits real matches (including overlaps), honors the spec's end-of-block
rules (last 5 bytes literal, no match starting in the final 12), and
falls back to stored blocks when compression doesn't pay, so every
decoder path is exercised by round-trip and hypothesis tests without any
external fixture.
"""

from __future__ import annotations

import struct

__all__ = [
    "xxh32",
    "compress_lz4_block",
    "decompress_lz4_block",
    "compress_lz4_frame",
    "decompress_lz4_frame",
]

_MAGIC = 0x184D2204
_P1, _P2, _P3, _P4, _P5 = 2654435761, 2246822519, 3266489917, 668265263, 374761393
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n, i = len(data), 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i <= n - 16:
            for k, v in enumerate((v1, v2, v3, v4)):
                w = int.from_bytes(data[i + 4 * k : i + 4 * k + 4], "little")
                v = _rotl((v + w * _P2) & _M32, 13)
                v = (v * _P1) & _M32
                if k == 0:
                    v1 = v
                elif k == 1:
                    v2 = v
                elif k == 2:
                    v3 = v
                else:
                    v4 = v
            i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        w = int.from_bytes(data[i : i + 4], "little")
        h = (_rotl((h + w * _P3) & _M32, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (_rotl((h + data[i] * _P5) & _M32, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# ------------------------------------------------------------------ block


def decompress_lz4_block(src: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if i >= n:
                    raise ValueError("truncated literal length")
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        if i + lit > n:
            raise ValueError("literals overrun input")
        out += src[i : i + lit]
        i += lit
        if i >= n:
            break  # the block's final sequence carries no match
        if i + 2 > n:
            raise ValueError("truncated match offset")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ValueError("zero match offset")
        mlen = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                if i >= n:
                    raise ValueError("truncated match length")
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ValueError("match offset beyond output start")
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            # overlap: the copy reads bytes it is writing — replicate the
            # period-`offset` pattern
            pattern = out[start:]
            reps = -(-mlen // offset)
            out += (bytes(pattern) * reps)[:mlen]
    return bytes(out)


def _emit_sequence(out: bytearray, literals: bytes, offset: int | None, mlen: int) -> None:
    lit = len(literals)
    ml = 0 if offset is None else mlen - 4
    token_lit = 15 if lit >= 15 else lit
    token_ml = 15 if ml >= 15 else ml
    out.append((token_lit << 4) | (token_ml if offset is not None else 0))
    rest = lit - 15
    while token_lit == 15:
        out.append(min(rest, 255))
        if rest < 255:
            break
        rest -= 255
    out += literals
    if offset is None:
        return
    out += struct.pack("<H", offset)
    rest = ml - 15
    while token_ml == 15:
        out.append(min(rest, 255))
        if rest < 255:
            break
        rest -= 255


def compress_lz4_block(src: bytes) -> bytes:
    n = len(src)
    out = bytearray()
    if n == 0:
        out.append(0)
        return bytes(out)
    table: dict[bytes, int] = {}
    i = anchor = 0
    # spec: the last match must start >= 12 bytes before the end and the
    # final 5 bytes are always literals
    limit = n - 12
    while i <= limit:
        key = src[i : i + 4]
        j = table.get(key, -1)
        table[key] = i
        if j >= 0 and i - j <= 0xFFFF:
            mlen = 4
            stop = n - 5
            while i + mlen < stop and src[j + mlen] == src[i + mlen]:
                mlen += 1
            _emit_sequence(out, src[anchor:i], i - j, mlen)
            i += mlen
            anchor = i
        else:
            i += 1
    _emit_sequence(out, src[anchor:], None, 0)
    return bytes(out)


# ------------------------------------------------------------------ frame

_BLOCK_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def compress_lz4_frame(
    data: bytes,
    block_size_id: int = 4,
    block_checksum: bool = False,
    content_checksum: bool = True,
) -> bytes:
    if block_size_id not in _BLOCK_SIZES:
        raise ValueError("block size id must be 4..7")
    flg = (1 << 6) | (0x10 if block_checksum else 0) | (0x04 if content_checksum else 0)
    bd = block_size_id << 4
    desc = bytes([flg, bd])
    hc = (xxh32(desc) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", _MAGIC) + desc + bytes([hc]))
    bs = _BLOCK_SIZES[block_size_id]
    for pos in range(0, len(data), bs):
        raw = data[pos : pos + bs]
        comp = compress_lz4_block(raw)
        if len(comp) < len(raw):
            out += struct.pack("<I", len(comp)) + comp
            blk = comp
        else:  # stored block (high bit set)
            out += struct.pack("<I", len(raw) | 0x80000000) + raw
            blk = raw
        if block_checksum:
            out += struct.pack("<I", xxh32(blk))
    out += struct.pack("<I", 0)  # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)


def decompress_lz4_frame(data: bytes) -> bytes:
    if len(data) < 7 or struct.unpack_from("<I", data)[0] != _MAGIC:
        raise ValueError("not an LZ4 frame")
    flg = data[4]
    if (flg >> 6) != 1:
        raise ValueError("unsupported LZ4 frame version")
    block_checksum = bool(flg & 0x10)
    content_size_flag = bool(flg & 0x08)
    content_checksum = bool(flg & 0x04)
    dict_id = bool(flg & 0x01)
    i = 6
    desc_end = i
    if content_size_flag:
        desc_end += 8
    if dict_id:
        desc_end += 4
    hc = data[desc_end]
    if ((xxh32(data[4:desc_end]) >> 8) & 0xFF) != hc:
        raise ValueError("LZ4 frame header checksum mismatch")
    i = desc_end + 1
    out = bytearray()
    while True:
        if i + 4 > len(data):
            raise ValueError("truncated LZ4 frame (no EndMark)")
        (bsz,) = struct.unpack_from("<I", data, i)
        i += 4
        if bsz == 0:
            break
        stored = bool(bsz & 0x80000000)
        bsz &= 0x7FFFFFFF
        blk = data[i : i + bsz]
        if len(blk) != bsz:
            raise ValueError("truncated LZ4 block")
        i += bsz
        if block_checksum:
            (bcs,) = struct.unpack_from("<I", data, i)
            i += 4
            if xxh32(blk) != bcs:
                raise ValueError("LZ4 block checksum mismatch")
        out += blk if stored else decompress_lz4_block(blk)
    if content_checksum:
        (ccs,) = struct.unpack_from("<I", data, i)
        if xxh32(bytes(out)) != ccs:
            raise ValueError("LZ4 content checksum mismatch")
    return bytes(out)
