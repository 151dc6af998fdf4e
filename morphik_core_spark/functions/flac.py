"""Pure-Python FLAC codec subset: decode (fixed + LPC prediction, Rice
residuals, independent/left-side/right-side/mid-side stereo, 8/16-bit)
plus a fixture encoder (fixed predictors, Rice partitions).

Speech corpora ship FLAC (LibriSpeech, MLS, Common Voice exports), so
the audio modality needs it for real — `audio.decode_wav`'s feature
pipeline accepts FLAC via `decode_flac` through the same row-isolation
contract. Out of subset (raise ValueError): 24/32-bit samples, Rice
escape partitions with method 1 ARE handled; wasted-bits subframes are
handled; variable blocksize streams are handled; CRCs are read but not
verified (a corrupt stream fails structurally instead).

The residual loops are per-sample Python — inherent to Rice coding's
data-dependent lengths; fine at feature-extraction sizes (a 10 s clip
decodes in well under a second), and the spot to drop to numpy batch
tricks if a corpus ever needs bulk PCM rather than features.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_flac", "encode_flac", "flac_stream_info"]


class _Bits:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        d = self.data
        p = self.pos
        if (p + n) > len(d) * 8:
            raise ValueError("truncated FLAC bitstream")
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        d = self.data
        p = self.pos
        total = len(d) * 8
        q = 0
        while p < total and not ((d[p >> 3] >> (7 - (p & 7))) & 1):
            q += 1
            p += 1
        if p >= total:
            raise ValueError("truncated FLAC unary run")
        self.pos = p + 1  # consume the stop bit
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_utf8_number(bits: _Bits) -> int:
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (bits.read(8) & 0x3F)
    return v


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
               8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768}


def flac_stream_info(data: bytes) -> dict:
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    i = 4
    info = None
    while True:
        hdr = data[i]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + data[i + 1 : i + 4])
        body = data[i + 4 : i + 4 + size]
        if btype == 0:
            b = _Bits(body)
            info = {
                "min_blocksize": b.read(16),
                "max_blocksize": b.read(16),
                "min_framesize": b.read(24),
                "max_framesize": b.read(24),
                "sample_rate": b.read(20),
                "channels": b.read(3) + 1,
                "bits_per_sample": b.read(5) + 1,
                "total_samples": b.read(36),
            }
        i += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    info["frames_offset"] = i
    return info


def _decode_residuals(bits: _Bits, block_size: int, order: int) -> list[int]:
    method = bits.read(2)
    if method not in (0, 1):
        raise ValueError(f"unsupported FLAC residual method {method}")
    plen_bits = 4 if method == 0 else 5
    escape = (1 << plen_bits) - 1
    porder = bits.read(4)
    n_parts = 1 << porder
    if block_size % n_parts:
        raise ValueError("FLAC partition count does not divide block size")
    out: list[int] = []
    for part in range(n_parts):
        n = block_size // n_parts - (order if part == 0 else 0)
        param = bits.read(plen_bits)
        if param == escape:
            raw_bits = bits.read(5)
            for _ in range(n):
                out.append(bits.read_signed(raw_bits) if raw_bits else 0)
            continue
        for _ in range(n):
            q = bits.read_unary()
            r = bits.read(param) if param else 0
            zz = (q << param) | r
            out.append((zz >> 1) ^ -(zz & 1))  # zigzag -> signed
    return out


def _decode_subframe(bits: _Bits, block_size: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("invalid FLAC subframe padding bit")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.read_unary()
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        v = bits.read_signed(eff)
        out = np.full(block_size, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([bits.read_signed(eff) for _ in range(block_size)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0..4
        order = stype - 8
        warm = [bits.read_signed(eff) for _ in range(order)]
        resid = _decode_residuals(bits, block_size, order)
        coefs = _FIXED_COEFS[order]
        vals = list(warm)
        for r in resid:
            pred = sum(c * vals[-k] for k, c in enumerate(coefs, start=1))
            vals.append(pred + r)
        out = np.asarray(vals, dtype=np.int64)
    elif stype >= 32:  # LPC order 1..32
        order = stype - 31
        warm = [bits.read_signed(eff) for _ in range(order)]
        precision = bits.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision escape")
        shift = bits.read_signed(5)
        coefs = [bits.read_signed(precision) for _ in range(order)]
        resid = _decode_residuals(bits, block_size, order)
        vals = list(warm)
        for r in resid:
            acc = sum(c * vals[-k] for k, c in enumerate(coefs, start=1))
            vals.append((acc >> shift) + r)
        out = np.asarray(vals, dtype=np.int64)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    return out << wasted


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (samples float64 in [-1, 1] shaped (n, channels), rate)."""
    info = flac_stream_info(data)
    bps = info["bits_per_sample"]
    if bps not in (8, 16):
        raise ValueError(f"unsupported FLAC bit depth {bps}")
    channels = info["channels"]
    bits = _Bits(data, info["frames_offset"] * 8)
    total = info["total_samples"]
    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    decoded = 0
    while decoded < total:
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)  # reserved
        _read_utf8_number(bits)
        if bs_code == 6:
            block_size = bits.read(8) + 1
        elif bs_code == 7:
            block_size = bits.read(16) + 1
        elif bs_code in _BLOCKSIZES:
            block_size = _BLOCKSIZES[bs_code]
        else:
            raise ValueError(f"reserved FLAC blocksize code {bs_code}")
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        bits.read(8)  # header CRC-8 (not verified)

        if ch_code < 8:
            if ch_code + 1 != channels:
                raise ValueError("FLAC channel count mismatch")
            subs = [_decode_subframe(bits, block_size, bps) for _ in range(channels)]
        elif ch_code in (8, 9, 10):  # left/side, right/side, mid/side
            if channels != 2:
                raise ValueError("FLAC side coding in non-stereo stream")
            # the side (difference) channel carries one extra bit
            if ch_code == 8:
                left = _decode_subframe(bits, block_size, bps)
                side = _decode_subframe(bits, block_size, bps + 1)
                subs = [left, left - side]
            elif ch_code == 9:
                side = _decode_subframe(bits, block_size, bps + 1)
                right = _decode_subframe(bits, block_size, bps)
                subs = [right + side, right]
            else:
                mid = _decode_subframe(bits, block_size, bps)
                side = _decode_subframe(bits, block_size, bps + 1)
                mid2 = (mid << 1) | (side & 1)
                subs = [(mid2 + side) >> 1, (mid2 - side) >> 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")
        _ = ss_code  # sample size rides STREAMINFO in this subset
        bits.align()
        bits.read(16)  # frame CRC-16 (not verified)
        for c in range(channels):
            chans[c].append(subs[c])
        decoded += block_size

    planes = [np.concatenate(c)[:total] for c in chans]
    samples = np.stack(planes, axis=1).astype(np.float64) / float(1 << (bps - 1))
    return samples, info["sample_rate"]


# ------------------------------------------------------------------ encode


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _write_utf8_number(bw: _BitW, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    # 2-byte form covers our fixture frame counts
    bw.write(0xC0 | (v >> 6), 8)
    bw.write(0x80 | (v & 0x3F), 8)


def _rice_param(resid: list[int]) -> int:
    if not resid:
        return 0
    mean = sum(abs(r) for r in resid) / len(resid)
    p = 0
    while (1 << p) < mean + 1 and p < 14:
        p += 1
    return p


def _write_residuals(bw: _BitW, resid: list[int]) -> None:
    param = _rice_param(resid)
    bw.write(0, 2)  # method 0 (4-bit params)
    bw.write(0, 4)  # partition order 0
    bw.write(param, 4)
    for r in resid:
        zz = (abs(r) << 1) - (1 if r < 0 else 0)
        q, rem = zz >> param, zz & ((1 << param) - 1)
        bw.write_unary(q)
        if param:
            bw.write(rem, param)


def _best_fixed_order(vals: np.ndarray) -> int:
    best, best_cost = 0, None
    v = vals.astype(np.int64)
    for order in range(3):
        d = v.copy()
        for _ in range(order):
            d = np.diff(d)
        cost = int(np.abs(d).sum())
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _write_subframe(bw: _BitW, vals: np.ndarray, width: int) -> None:
    if np.all(vals == vals[0]):  # CONSTANT subframe (digital silence etc)
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(int(vals[0]) & ((1 << width) - 1), width)
        return
    order = _best_fixed_order(vals)
    bw.write(0, 1)
    bw.write(8 + order, 6)
    bw.write(0, 1)  # no wasted bits
    for k in range(order):
        bw.write(int(vals[k]) & ((1 << width) - 1), width)
    d = vals.astype(np.int64)
    for _ in range(order):
        d = np.diff(d)
    _write_residuals(bw, [int(r) for r in d])


def encode_flac(
    samples: np.ndarray,
    rate: int,
    bps: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "independent",
) -> bytes:
    """(n, channels) float64 in [-1, 1] → FLAC bytes (fixed predictors,
    Rice partitions order 0). ``stereo_mode`` for 2-channel input:
    independent, left_side, right_side, or mid_side — so every decoder
    channel-assignment path is testable libless. Fixture aid."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    ints = np.clip(np.round(x * (1 << (bps - 1))), -(1 << (bps - 1)), (1 << (bps - 1)) - 1).astype(np.int64)

    out = bytearray(b"fLaC")
    si = _BitW()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si_bytes = bytes(si.out) + bytes(16)  # zero md5 (unverified)
    out += bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes

    frame_idx = 0
    for off in range(0, n, block_size):
        blk = ints[off : off + block_size]
        bs = blk.shape[0]
        bw = _BitW()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # blocksize: 16-bit at end of header
        bw.write(0, 4)  # sample rate: from STREAMINFO
        side = channels == 2 and stereo_mode != "independent"
        if side:
            ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode]
        else:
            ch_code = channels - 1
        bw.write(ch_code, 4)
        bw.write({8: 1, 16: 4}[bps], 3)
        bw.write(0, 1)
        _write_utf8_number(bw, frame_idx)
        bw.write(bs - 1, 16)
        bw.write(0, 8)  # CRC-8 placeholder (decoder doesn't verify)
        if side:
            left, right = blk[:, 0], blk[:, 1]
            s = left - right
            if stereo_mode == "left_side":
                _write_subframe(bw, left, bps)
                _write_subframe(bw, s, bps + 1)
            elif stereo_mode == "right_side":
                _write_subframe(bw, s, bps + 1)
                _write_subframe(bw, right, bps)
            else:  # mid_side
                mid = (left + right) >> 1
                _write_subframe(bw, mid, bps)
                _write_subframe(bw, s, bps + 1)
        else:
            for c in range(channels):
                _write_subframe(bw, blk[:, c], bps)
        bw.align()
        bw.write(0, 16)  # CRC-16 placeholder
        out += bytes(bw.out)
        frame_idx += 1
    return bytes(out)
