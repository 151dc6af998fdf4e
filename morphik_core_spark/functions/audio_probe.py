"""MP3 / Ogg container metadata probes (no decode) + ID3 tag reader.

Perceptual audio codecs (MP3, Vorbis, Opus) stay out of decode scope —
but like MP4 video (`functions/mp4`), the CONTAINER facts a pipeline
filters on parse in microseconds: duration, bitrate mode, sample rate,
channels, codec. That's what duration buckets, bitrate floors and
codec allowlists need over a podcast/speech corpus, with decode left to
the external-kernel seam.

- **MP3**: ID3v2 skip, MPEG audio frame-header walk (all versions/layers,
  bitrate + samplerate tables), Xing/Info VBR header when present (exact
  frame counts), else frame-walk estimation; CBR/VBR detection.
- **ID3v2**: v2.2/2.3/2.4 text frames (title/artist/album/...),
  syncsafe sizes, unicode encodings.
- **Ogg**: page walk, codec identification from the first packet
  (Vorbis / Opus / Theora / FLAC-in-Ogg), sample rate + channels from
  the codec's id header, duration from the last page's granule position.

Fixture builders make every path testable offline (same policy as the
codec modules).
"""

from __future__ import annotations

import struct

__all__ = ["probe_mp3", "read_id3", "probe_ogg", "build_mp3", "build_ogg"]

# bitrate kbps tables: (version_key, layer) -> 14 entries (index 1..14)
_BITRATES = {
    ("1", 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("1", 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("1", 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("2", 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    ("2", 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATES = {"1": [44100, 48000, 32000], "2": [22050, 24000, 16000], "2.5": [11025, 12000, 8000]}
_SAMPLES_PER_FRAME = {("1", 1): 384, ("1", 2): 1152, ("1", 3): 1152,
                      ("2", 1): 384, ("2", 2): 1152, ("2", 3): 576}


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def read_id3(data: bytes) -> dict:
    """ID3v2 text frames as a {frame_id: text} dict (empty when absent)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return {}
    ver = data[3]
    size = _syncsafe(data[6:10])
    out: dict[str, str] = {}
    i, end = 10, min(10 + size, len(data))
    while i + 6 <= end:
        if ver == 2:  # v2.2: 3-byte ids + 3-byte sizes
            fid = data[i : i + 3]
            fsize = int.from_bytes(data[i + 3 : i + 6], "big")
            body = data[i + 6 : i + 6 + fsize]
            i += 6 + fsize
        else:
            fid = data[i : i + 4]
            raw = data[i + 4 : i + 8]
            fsize = _syncsafe(raw) if ver >= 4 else int.from_bytes(raw, "big")
            body = data[i + 10 : i + 10 + fsize]
            i += 10 + fsize
        if not fid.strip(b"\x00") or fsize <= 0:
            break
        if fid[:1] == b"T" and body:
            enc = body[0]
            raw_text = body[1:]
            try:
                if enc == 0:
                    text = raw_text.decode("latin-1")
                elif enc == 1:
                    text = raw_text.decode("utf-16")
                elif enc == 2:
                    text = raw_text.decode("utf-16-be")
                else:
                    text = raw_text.decode("utf-8")
            except UnicodeDecodeError:
                continue
            out[fid.decode("latin-1").strip("\x00")] = text.rstrip("\x00")
    return out


def _frame_header(data: bytes, i: int):
    """Parse one MPEG audio frame header at i -> (frame_len, info) or None."""
    if i + 4 > len(data):
        return None
    b0, b1, b2, _b3 = data[i : i + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = {0: "2.5", 2: "2", 3: "1"}.get((b1 >> 3) & 3)
    layer = {1: 3, 2: 2, 3: 1}.get((b1 >> 1) & 3)
    if version is None or layer is None:
        return None
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    vkey = "1" if version == "1" else "2"
    bitrate = _BITRATES[(vkey, layer)][br_idx - 1] * 1000
    rate = _SAMPLE_RATES[version][sr_idx]
    padding = (b2 >> 1) & 1
    spf = _SAMPLES_PER_FRAME[(vkey, layer)]
    if layer == 1:
        frame_len = (12 * bitrate // rate + padding) * 4
    else:
        frame_len = spf // 8 * bitrate // rate + padding
    channels = 1 if ((data[i + 3] >> 6) & 3) == 3 else 2
    return frame_len, {
        "version": version, "layer": layer, "bitrate": bitrate,
        "sample_rate": rate, "channels": channels, "samples_per_frame": spf,
    }


def probe_mp3(data: bytes, max_frames: int = 4096) -> dict:
    """MP3 facts without decoding audio: codec/version/layer, sample rate,
    channels, CBR/VBR, mean bitrate, duration, tags. Honors a Xing/Info
    header (exact VBR frame count); otherwise walks frame headers."""
    tags = read_id3(data)
    i = 0
    if data[:3] == b"ID3":
        i = 10 + _syncsafe(data[6:10])
    # resync: scan for the first valid header
    first = None
    while i < len(data) - 4:
        fh = _frame_header(data, i)
        if fh:
            first = fh
            break
        i += 1
    if first is None:
        raise ValueError("no MPEG audio frame found")
    flen, info = first
    # Xing/Info header sits inside the first frame
    window = data[i : i + flen]
    n_frames = None
    vbr = False
    for tag in (b"Xing", b"Info"):
        j = window.find(tag)
        if j >= 0 and j + 12 <= len(window):
            flags = struct.unpack_from(">I", window, j + 4)[0]
            if flags & 1:
                n_frames = struct.unpack_from(">I", window, j + 8)[0]
            vbr = tag == b"Xing"
            break
    bitrates = []
    if n_frames is None:
        n_frames = 0
        j = i
        while j < len(data) - 4 and n_frames < max_frames:
            fh = _frame_header(data, j)
            if not fh:
                break
            n_frames += 1
            bitrates.append(fh[1]["bitrate"])
            j += fh[0]
        vbr = len(set(bitrates)) > 1
    duration = n_frames * info["samples_per_frame"] / info["sample_rate"]
    mean_bitrate = (sum(bitrates) // len(bitrates)) if bitrates else info["bitrate"]
    return {
        "codec": f"mp{info['layer']}",
        "mpeg_version": info["version"],
        "sample_rate": info["sample_rate"],
        "channels": info["channels"],
        "vbr": vbr,
        "bitrate": mean_bitrate,
        "n_frames": n_frames,
        "duration_s": round(duration, 3),
        "tags": tags,
    }


def probe_ogg(data: bytes) -> dict:
    """Ogg facts: codec (vorbis/opus/theora/flac), sample rate, channels,
    duration from the final granule position."""
    if data[:4] != b"OggS":
        raise ValueError("not an Ogg stream")
    first_packet = None
    last_granule = 0
    i = 0
    n = len(data)
    while i + 27 <= n:
        if data[i : i + 4] != b"OggS":
            break
        granule = struct.unpack_from("<q", data, i + 6)[0]
        nsegs = data[i + 26]
        seg_table = data[i + 27 : i + 27 + nsegs]
        body = i + 27 + nsegs
        size = sum(seg_table)
        if first_packet is None:
            first_packet = data[body : body + size]
        if granule > 0:
            last_granule = granule
        i = body + size
    if first_packet is None:
        raise ValueError("empty Ogg stream")
    if first_packet[1:7] == b"vorbis":
        channels = first_packet[11]
        rate = struct.unpack_from("<I", first_packet, 12)[0]
        codec = "vorbis"
    elif first_packet[:8] == b"OpusHead":
        channels = first_packet[9]
        rate = 48000  # opus granules always run at 48 kHz
        codec = "opus"
    elif first_packet[1:7] == b"theora":
        raise ValueError("Ogg/Theora is video — route to the video probe")
    elif first_packet[:5] == b"\x7fFLAC":
        codec = "flac"
        rate = (struct.unpack_from(">I", first_packet, 27)[0] >> 12) & 0xFFFFF
        channels = ((first_packet[30] >> 1) & 0x7) + 1
    else:
        raise ValueError("unknown Ogg codec")
    return {
        "codec": codec,
        "sample_rate": rate,
        "channels": channels,
        "duration_s": round(last_granule / rate, 3) if rate else None,
    }


# ------------------------------------------------------------- fixtures


def build_mp3(
    n_frames: int = 100,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    tags: dict | None = None,
    vbr_pattern: list[int] | None = None,
) -> bytes:
    """Fixture MPEG-1 Layer III stream: valid headers + zero payloads,
    optional ID3v2.3 tags and per-frame bitrate pattern (VBR)."""
    out = bytearray()
    if tags:
        frames = bytearray()
        for fid, text in tags.items():
            body = b"\x00" + text.encode("latin-1")
            frames += fid.encode() + struct.pack(">I", len(body)) + b"\x00\x00" + body
        size = len(frames)
        ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F])
        out += b"ID3\x03\x00\x00" + ss + frames
    sr_idx = _SAMPLE_RATES["1"].index(sample_rate)
    rates = vbr_pattern or [bitrate_kbps] * n_frames
    for k in range(n_frames):
        kbps = rates[k % len(rates)]
        br_idx = _BITRATES[("1", 3)].index(kbps) + 1
        flen = 1152 // 8 * (kbps * 1000) // sample_rate
        hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00])
        out += hdr + b"\x00" * (flen - 4)
    return bytes(out)


def build_ogg(codec: str = "vorbis", sample_rate: int = 44100, channels: int = 2, duration_s: float = 2.5) -> bytes:
    """Fixture Ogg stream: id-header page + one data page carrying the
    final granule position."""
    if codec == "vorbis":
        pkt = b"\x01vorbis" + b"\x00\x00\x00\x00" + bytes([channels]) + struct.pack("<I", sample_rate) + b"\x00" * 16
        granule_rate = sample_rate
    elif codec == "opus":
        pkt = b"OpusHead\x01" + bytes([channels]) + b"\x00" * 9
        granule_rate = 48000
    else:
        raise ValueError(codec)

    def page(granule: int, payload: bytes, seq: int) -> bytes:
        segs = []
        rest = len(payload)
        while rest >= 255:
            segs.append(255)
            rest -= 255
        segs.append(rest)
        head = (
            b"OggS\x00\x02" + struct.pack("<q", granule) + struct.pack("<I", 1)
            + struct.pack("<I", seq) + b"\x00\x00\x00\x00" + bytes([len(segs)]) + bytes(segs)
        )
        return head + payload

    final_granule = int(duration_s * granule_rate)
    return page(0, pkt, 0) + page(final_granule, b"\x00" * 32, 1)
