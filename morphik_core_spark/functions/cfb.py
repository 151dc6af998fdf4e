"""Compound File Binary (OLE2) reader + fixture writer, stdlib only.

Legacy Office files (.doc/.xls) are CFB containers ([MS-CFB], public).
The reference parses them by shelling out to LibreOffice
(/root/reference/core/parser/morphik_parser.py:527-616); this container
has no LibreOffice, so the container format is implemented directly and
the format-specific streams are decoded in functions/legacy_office.py.

Reader supports v3 (512 B) and v4 (4096 B) sectors, DIFAT overflow
chains, and the mini-FAT/mini-stream path for streams under the cutoff.
The writer is fixture-grade (v3, header-resident DIFAT, linear directory
"tree") so the .doc/.xls extractors are testable without real Office
files; it does write small streams through the real mini-stream path so
the reader's mini-FAT code is exercised honestly.
"""

from __future__ import annotations

import struct

__all__ = ["CfbFile", "write_cfb"]

_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_NOSTREAM = 0xFFFFFFFF


class CfbFile:
    """Parsed CFB container; ``streams`` maps name -> bytes."""

    def __init__(self, data: bytes):
        if len(data) < 512 or data[:8] != _MAGIC:
            raise ValueError("not a CFB (OLE2) container")
        (major,) = struct.unpack_from("<H", data, 26)
        (sector_shift,) = struct.unpack_from("<H", data, 30)
        if sector_shift not in (9, 12):
            raise ValueError(f"bad CFB sector shift {sector_shift}")
        ssize = 1 << sector_shift
        (mini_shift,) = struct.unpack_from("<H", data, 32)
        msize = 1 << mini_shift
        (n_fat,) = struct.unpack_from("<I", data, 44)
        (first_dir,) = struct.unpack_from("<I", data, 48)
        (mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (first_minifat,) = struct.unpack_from("<I", data, 60)
        (n_minifat,) = struct.unpack_from("<I", data, 64)
        (first_difat,) = struct.unpack_from("<I", data, 68)
        (n_difat,) = struct.unpack_from("<I", data, 72)

        def sector(i: int) -> bytes:
            off = (i + 1) * ssize
            if off + ssize > len(data):
                raise ValueError("CFB sector out of range")
            return data[off : off + ssize]

        # DIFAT: 109 entries in the header, then overflow sectors whose
        # last u32 chains to the next DIFAT sector
        difat = list(struct.unpack_from("<109I", data, 76))
        nxt = first_difat
        for _ in range(n_difat):
            if nxt in (_ENDOFCHAIN, _FREESECT):
                break
            body = sector(nxt)
            entries = struct.unpack(f"<{ssize // 4}I", body)
            difat.extend(entries[:-1])
            nxt = entries[-1]
        fat_sectors = [s for s in difat[: max(n_fat, 0) + len(difat)] if s not in (_FREESECT,)][:n_fat]

        fat: list[int] = []
        for s in fat_sectors:
            fat.extend(struct.unpack(f"<{ssize // 4}I", sector(s)))

        def chain(start: int, limit: int = 1 << 24) -> bytes:
            out = bytearray()
            cur = start
            seen = 0
            while cur not in (_ENDOFCHAIN, _FREESECT):
                if cur >= len(fat) or seen > limit:
                    raise ValueError("broken CFB FAT chain")
                out += sector(cur)
                cur = fat[cur]
                seen += 1
            return bytes(out)

        # directory: 128-byte entries across the dir chain
        dir_raw = chain(first_dir)
        entries = []
        for off in range(0, len(dir_raw), 128):
            e = dir_raw[off : off + 128]
            if len(e) < 128:
                break
            (name_len,) = struct.unpack_from("<H", e, 64)
            etype = e[66]
            if etype == 0 or name_len < 2:
                continue
            name = e[: name_len - 2].decode("utf-16-le", errors="replace")
            (start,) = struct.unpack_from("<I", e, 116)
            (size,) = struct.unpack_from("<Q", e, 120)
            if major == 3:
                size &= 0xFFFFFFFF
            entries.append((name, etype, start, size))

        root = next((e for e in entries if e[1] == 5), None)
        if root is None:
            raise ValueError("CFB without root entry")
        mini_stream = chain(root[2])[: root[3]] if root[3] else b""

        minifat: list[int] = []
        nxt = first_minifat
        for _ in range(n_minifat):
            if nxt in (_ENDOFCHAIN, _FREESECT):
                break
            minifat.extend(struct.unpack(f"<{ssize // 4}I", sector(nxt)))
            nxt = fat[nxt] if nxt < len(fat) else _ENDOFCHAIN

        def mini_chain(start: int) -> bytes:
            out = bytearray()
            cur = start
            seen = 0
            while cur not in (_ENDOFCHAIN, _FREESECT):
                # a chain can't be longer than the mini-FAT itself — a
                # corrupt cyclic chain must fail, not loop forever (same
                # guard as the main FAT walker above)
                if cur >= len(minifat) or seen > len(minifat):
                    raise ValueError("broken CFB mini-FAT chain")
                out += mini_stream[cur * msize : (cur + 1) * msize]
                cur = minifat[cur]
                seen += 1
            return bytes(out)

        self.streams: dict[str, bytes] = {}
        for name, etype, start, size in entries:
            if etype != 2:
                continue
            raw = mini_chain(start) if size < mini_cutoff else chain(start)
            self.streams[name] = raw[:size]

    def stream(self, *names: str) -> bytes:
        """First stream matching any of ``names`` (exact then casefold)."""
        for n in names:
            if n in self.streams:
                return self.streams[n]
        folded = {k.casefold(): v for k, v in self.streams.items()}
        for n in names:
            if n.casefold() in folded:
                return folded[n.casefold()]
        raise ValueError(f"CFB stream not found: {names} (have {sorted(self.streams)})")


def write_cfb(streams: dict[str, bytes]) -> bytes:
    """Fixture writer: v3 CFB with the given name -> bytes streams.

    Streams under 4096 bytes go through the real mini-stream/mini-FAT
    path; the directory "tree" is a linear right-sibling chain (readers
    that walk directory sectors linearly — including ours — accept it).
    """
    ssize, msize, cutoff = 512, 64, 4096
    names = list(streams)
    small = [n for n in names if len(streams[n]) < cutoff]
    large = [n for n in names if len(streams[n]) >= cutoff]

    def pad(b: bytes, k: int) -> bytes:
        r = len(b) % k
        return b + b"\x00" * (k - r) if r else b

    # mini stream: concatenation of 64-byte-padded small streams; the
    # mini-FAT is indexed BY SECTOR, so entries are emitted per occupied
    # sector in layout order (a zero-byte stream occupies no sectors and
    # must emit none — its directory start is ENDOFCHAIN)
    mini = bytearray()
    mini_start: dict[str, int] = {}
    minifat: list[int] = []
    for n in small:
        if not streams[n]:
            mini_start[n] = _ENDOFCHAIN
            continue
        base = len(mini) // msize
        mini_start[n] = base
        padded = pad(streams[n], msize)
        mini += padded
        k = len(padded) // msize
        minifat.extend(list(range(base + 1, base + k)) + [_ENDOFCHAIN])

    n_dir_sectors = -(-((len(names) + 1) * 128) // ssize)
    minifat_b = pad(b"".join(struct.pack("<I", v) for v in minifat), ssize)
    n_minifat_sectors = len(minifat_b) // ssize if minifat else 0
    mini_b = pad(bytes(mini), ssize)
    n_mini_sectors = len(mini_b) // ssize
    large_padded = {n: pad(streams[n], ssize) for n in large}
    n_large = sum(len(b) // ssize for b in large_padded.values())

    # layout: [fat][dir][minifat][ministream][large...]; solve FAT count
    n_fat = 1
    while True:
        total = n_fat + n_dir_sectors + n_minifat_sectors + n_mini_sectors + n_large
        need = -(-total // (ssize // 4))
        if need <= n_fat:
            break
        n_fat = need

    dir_first = n_fat
    minifat_first = dir_first + n_dir_sectors
    mini_first = minifat_first + n_minifat_sectors
    large_first = mini_first + n_mini_sectors

    fat = [_FATSECT] * n_fat
    for i in range(n_dir_sectors):
        fat.append(dir_first + i + 1 if i < n_dir_sectors - 1 else _ENDOFCHAIN)
    for i in range(n_minifat_sectors):
        fat.append(minifat_first + i + 1 if i < n_minifat_sectors - 1 else _ENDOFCHAIN)
    for i in range(n_mini_sectors):
        fat.append(mini_first + i + 1 if i < n_mini_sectors - 1 else _ENDOFCHAIN)
    large_start: dict[str, int] = {}
    cur = large_first
    for n in large:
        k = len(large_padded[n]) // ssize
        large_start[n] = cur
        fat.extend(list(range(cur + 1, cur + k)) + [_ENDOFCHAIN])
        cur += k
    fat_b = pad(b"".join(struct.pack("<I", v) for v in fat), ssize)
    fat_b = fat_b + b"\xff" * (n_fat * ssize - len(fat_b))  # FREESECT fill

    def dirent(name: str, etype: int, start: int, size: int, child: int = _NOSTREAM,
               right: int = _NOSTREAM) -> bytes:
        nb = name.encode("utf-16-le")
        e = bytearray(128)
        e[: len(nb)] = nb
        struct.pack_into("<H", e, 64, len(nb) + 2)
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, _NOSTREAM, right, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    ents = [dirent("Root Entry", 5, mini_first if mini else _ENDOFCHAIN, len(mini),
                   child=1 if names else _NOSTREAM)]
    for i, n in enumerate(names):
        right = i + 2 if i < len(names) - 1 else _NOSTREAM
        start = mini_start[n] if n in mini_start else large_start[n]
        ents.append(dirent(n, 2, start, len(streams[n]), right=right))
    dir_b = pad(b"".join(ents), ssize)
    dir_b += b"\x00" * (n_dir_sectors * ssize - len(dir_b))

    hdr = bytearray(512)
    hdr[:8] = _MAGIC
    struct.pack_into("<H", hdr, 24, 0x3E)
    struct.pack_into("<H", hdr, 26, 3)
    struct.pack_into("<H", hdr, 28, 0xFFFE)
    struct.pack_into("<H", hdr, 30, 9)
    struct.pack_into("<H", hdr, 32, 6)
    struct.pack_into("<I", hdr, 44, n_fat)
    struct.pack_into("<I", hdr, 48, dir_first)
    struct.pack_into("<I", hdr, 56, cutoff)
    struct.pack_into("<I", hdr, 60, minifat_first if minifat else _ENDOFCHAIN)
    struct.pack_into("<I", hdr, 64, n_minifat_sectors)
    struct.pack_into("<I", hdr, 68, _ENDOFCHAIN)
    struct.pack_into("<I", hdr, 72, 0)
    for i in range(109):
        struct.pack_into("<I", hdr, 76 + 4 * i, i if i < n_fat else _FREESECT)

    body = fat_b + dir_b + (minifat_b if minifat else b"") + mini_b + b"".join(
        large_padded[n] for n in large
    )
    return bytes(hdr) + body
