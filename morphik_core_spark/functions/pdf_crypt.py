"""Encrypted-PDF support: the Standard Security Handler (PDF 32000-1 §7.6).

Most "encrypted" PDFs in real corpora are owner-password-only — openable
with the EMPTY user password — so a pipeline that rejects every /Encrypt
document drops readable data. This module implements the standard
handler's RC4 (V1/V2, 40..128-bit) and AES-128-CBC (V4 /AESV2) schemes in
pure Python:

- Algorithm 2 file-key derivation (padded password, /O, /P, /ID, the
  R>=3 50-fold MD5 squeeze, the R4 EncryptMetadata salt);
- Algorithms 3/4/5 for the /O and /U entries — used both to VERIFY the
  empty user password (wrong-password files raise, so callers mark the
  row parse_failed instead of extracting garbage) and by the fixture
  encryptor;
- per-object keys (MD5 of key + objnum/gen, "sAlT" suffix for AES);
- RC4 and AES-128/256 implemented here (verified against the FIPS-197
  known-answer vectors in tests).

``decrypt_pdf(data)`` returns a plaintext copy of the document with every
stream decrypted in place (strings are left alone — text extraction reads
streams only), which the existing regex-based extractor consumes
unchanged; un-encrypted input passes through untouched. ``encrypt_pdf``
is the fixture writer that makes every decrypt path testable offline.

V5/R6 AES-256 is covered too: Algorithm 2.B (the iterated SHA-256/384/
512 + AES password hash), /U validation, and the /UE file-key unwrap —
V5 encrypts every object with the file key directly. Not covered (raise,
row-level): crypt filters other than Identity/V2/AESV2/AESV3 and
documents that genuinely require a user password.
"""

from __future__ import annotations

import hashlib
import re
import struct

__all__ = [
    "rc4",
    "aes128_decrypt_cbc",
    "aes128_encrypt_cbc",
    "decrypt_pdf",
    "encrypt_pdf",
    "is_encrypted_pdf",
]

_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
        0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    i = j = 0
    for b in data:
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out.append(b ^ s[(s[i] + s[j]) & 0xFF])
    return bytes(out)


# ---------------------------------------------------------------- AES-128

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytes(256)
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        b >>= 1
        a = _xtime(a)
    return p


# T-table cipher core (the classic 32-bit-word formulation): pure-Python
# AES needs it — Algorithm 2.B hashes run ~16k blocks per password, and a
# byte-wise MixColumns implementation turns that into minutes. Tables are
# built once at import from the S-box and GF(2^8) multiply above.
def _rotr8(w: int) -> int:
    return ((w >> 8) | (w << 24)) & 0xFFFFFFFF


_TE0 = [0] * 256
_TD0 = [0] * 256
for _x in range(256):
    _s = _SBOX[_x]
    _TE0[_x] = (_gmul(_s, 2) << 24) | (_s << 16) | (_s << 8) | _gmul(_s, 3)
    _si = _INV_SBOX[_x]
    _TD0[_x] = (_gmul(_si, 14) << 24) | (_gmul(_si, 9) << 16) | (_gmul(_si, 13) << 8) | _gmul(_si, 11)
_TE1 = [_rotr8(w) for w in _TE0]
_TE2 = [_rotr8(w) for w in _TE1]
_TE3 = [_rotr8(w) for w in _TE2]
_TD1 = [_rotr8(w) for w in _TD0]
_TD2 = [_rotr8(w) for w in _TD1]
_TD3 = [_rotr8(w) for w in _TD2]


def _words(rk_bytes: bytes) -> list[int]:
    return [int.from_bytes(rk_bytes[i : i + 4], "big") for i in range(0, 16, 4)]


def _imc(w: int) -> int:
    # InvMixColumns of one word == Td0 applied to the Sbox-inverse-free
    # byte path: compute directly from the bytes
    b = w.to_bytes(4, "big")
    return (
        ((_gmul(b[0], 14) ^ _gmul(b[1], 11) ^ _gmul(b[2], 13) ^ _gmul(b[3], 9)) << 24)
        | ((_gmul(b[0], 9) ^ _gmul(b[1], 14) ^ _gmul(b[2], 11) ^ _gmul(b[3], 13)) << 16)
        | ((_gmul(b[0], 13) ^ _gmul(b[1], 9) ^ _gmul(b[2], 14) ^ _gmul(b[3], 11)) << 8)
        | (_gmul(b[0], 11) ^ _gmul(b[1], 13) ^ _gmul(b[2], 9) ^ _gmul(b[3], 14))
    )


def _expand_key(key: bytes):
    """AES key schedule for 128- or 256-bit keys -> (enc_rounds, dec_rounds):
    lists of per-round 4-word lists; dec_rounds is the equivalent-inverse
    schedule (InvMixColumns folded into the inner round keys)."""
    nk = len(key) // 4
    rounds = {4: 10, 8: 14}[nk]
    words = [int.from_bytes(key[i : i + 4], "big") for i in range(0, len(key), 4)]
    i = nk
    while len(words) < 4 * (rounds + 1):
        w = words[-1]
        if i % nk == 0:
            b = w.to_bytes(4, "big")
            w = int.from_bytes(
                bytes([_SBOX[b[1]] ^ _RCON[i // nk - 1], _SBOX[b[2]], _SBOX[b[3]], _SBOX[b[0]]]),
                "big",
            )
        elif nk == 8 and i % nk == 4:
            b = w.to_bytes(4, "big")
            w = int.from_bytes(bytes(_SBOX[x] for x in b), "big")
        w ^= words[-nk]
        words.append(w)
        i += 1
    enc = [words[4 * r : 4 * r + 4] for r in range(rounds + 1)]
    dec = [list(enc[rounds])]
    for r in range(rounds - 1, 0, -1):
        dec.append([_imc(w) for w in enc[r]])
    dec.append(list(enc[0]))
    return enc, dec


def _aes_encrypt_block(key_sched, block: bytes) -> bytes:
    enc, _ = key_sched
    rk = enc[0]
    c0 = int.from_bytes(block[0:4], "big") ^ rk[0]
    c1 = int.from_bytes(block[4:8], "big") ^ rk[1]
    c2 = int.from_bytes(block[8:12], "big") ^ rk[2]
    c3 = int.from_bytes(block[12:16], "big") ^ rk[3]
    te0, te1, te2, te3 = _TE0, _TE1, _TE2, _TE3
    for rk in enc[1:-1]:
        t0 = te0[c0 >> 24] ^ te1[(c1 >> 16) & 0xFF] ^ te2[(c2 >> 8) & 0xFF] ^ te3[c3 & 0xFF] ^ rk[0]
        t1 = te0[c1 >> 24] ^ te1[(c2 >> 16) & 0xFF] ^ te2[(c3 >> 8) & 0xFF] ^ te3[c0 & 0xFF] ^ rk[1]
        t2 = te0[c2 >> 24] ^ te1[(c3 >> 16) & 0xFF] ^ te2[(c0 >> 8) & 0xFF] ^ te3[c1 & 0xFF] ^ rk[2]
        t3 = te0[c3 >> 24] ^ te1[(c0 >> 16) & 0xFF] ^ te2[(c1 >> 8) & 0xFF] ^ te3[c2 & 0xFF] ^ rk[3]
        c0, c1, c2, c3 = t0, t1, t2, t3
    rk = enc[-1]
    sb = _SBOX
    o0 = ((sb[c0 >> 24] << 24) | (sb[(c1 >> 16) & 0xFF] << 16) | (sb[(c2 >> 8) & 0xFF] << 8) | sb[c3 & 0xFF]) ^ rk[0]
    o1 = ((sb[c1 >> 24] << 24) | (sb[(c2 >> 16) & 0xFF] << 16) | (sb[(c3 >> 8) & 0xFF] << 8) | sb[c0 & 0xFF]) ^ rk[1]
    o2 = ((sb[c2 >> 24] << 24) | (sb[(c3 >> 16) & 0xFF] << 16) | (sb[(c0 >> 8) & 0xFF] << 8) | sb[c1 & 0xFF]) ^ rk[2]
    o3 = ((sb[c3 >> 24] << 24) | (sb[(c0 >> 16) & 0xFF] << 16) | (sb[(c1 >> 8) & 0xFF] << 8) | sb[c2 & 0xFF]) ^ rk[3]
    return b"".join(o.to_bytes(4, "big") for o in (o0, o1, o2, o3))


def _aes_decrypt_block(key_sched, block: bytes) -> bytes:
    _, dec = key_sched
    rk = dec[0]
    c0 = int.from_bytes(block[0:4], "big") ^ rk[0]
    c1 = int.from_bytes(block[4:8], "big") ^ rk[1]
    c2 = int.from_bytes(block[8:12], "big") ^ rk[2]
    c3 = int.from_bytes(block[12:16], "big") ^ rk[3]
    td0, td1, td2, td3 = _TD0, _TD1, _TD2, _TD3
    for rk in dec[1:-1]:
        t0 = td0[c0 >> 24] ^ td1[(c3 >> 16) & 0xFF] ^ td2[(c2 >> 8) & 0xFF] ^ td3[c1 & 0xFF] ^ rk[0]
        t1 = td0[c1 >> 24] ^ td1[(c0 >> 16) & 0xFF] ^ td2[(c3 >> 8) & 0xFF] ^ td3[c2 & 0xFF] ^ rk[1]
        t2 = td0[c2 >> 24] ^ td1[(c1 >> 16) & 0xFF] ^ td2[(c0 >> 8) & 0xFF] ^ td3[c3 & 0xFF] ^ rk[2]
        t3 = td0[c3 >> 24] ^ td1[(c2 >> 16) & 0xFF] ^ td2[(c1 >> 8) & 0xFF] ^ td3[c0 & 0xFF] ^ rk[3]
        c0, c1, c2, c3 = t0, t1, t2, t3
    rk = dec[-1]
    sb = _INV_SBOX
    o0 = ((sb[c0 >> 24] << 24) | (sb[(c3 >> 16) & 0xFF] << 16) | (sb[(c2 >> 8) & 0xFF] << 8) | sb[c1 & 0xFF]) ^ rk[0]
    o1 = ((sb[c1 >> 24] << 24) | (sb[(c0 >> 16) & 0xFF] << 16) | (sb[(c3 >> 8) & 0xFF] << 8) | sb[c2 & 0xFF]) ^ rk[1]
    o2 = ((sb[c2 >> 24] << 24) | (sb[(c1 >> 16) & 0xFF] << 16) | (sb[(c0 >> 8) & 0xFF] << 8) | sb[c3 & 0xFF]) ^ rk[2]
    o3 = ((sb[c3 >> 24] << 24) | (sb[(c2 >> 16) & 0xFF] << 16) | (sb[(c1 >> 8) & 0xFF] << 8) | sb[c0 & 0xFF]) ^ rk[3]
    return b"".join(o.to_bytes(4, "big") for o in (o0, o1, o2, o3))


def aes128_encrypt_cbc(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """PKCS#5-padded CBC encrypt (the PDF AESV2 stream layout minus the
    prepended IV, which the caller supplies/stores)."""
    ks = _expand_key(key)
    pad = 16 - (len(plaintext) % 16)
    pt = plaintext + bytes([pad]) * pad
    out = bytearray()
    prev = iv
    for i in range(0, len(pt), 16):
        blk = bytes(a ^ b for a, b in zip(pt[i : i + 16], prev))
        prev = _aes_encrypt_block(ks, blk)
        out += prev
    return bytes(out)


def aes128_decrypt_cbc(key: bytes, iv: bytes, ciphertext: bytes) -> bytes:
    if len(ciphertext) % 16:
        raise ValueError("AES ciphertext not block-aligned")
    ks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(ciphertext), 16):
        blk = ciphertext[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_aes_decrypt_block(ks, blk), prev))
        prev = blk
    if not out:
        return b""
    pad = out[-1]
    if not 1 <= pad <= 16 or len(out) < pad:
        raise ValueError("bad AES padding")
    return bytes(out[:-pad])


def _cbc_nopad(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    if len(data) % 16:
        raise ValueError("CBC input not block-aligned")
    ks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        if encrypt:
            prev = _aes_encrypt_block(ks, bytes(a ^ b for a, b in zip(blk, prev)))
            out += prev
        else:
            out += bytes(a ^ b for a, b in zip(_aes_decrypt_block(ks, blk), prev))
            prev = blk
    return bytes(out)


def _hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B — the R6 iterated SHA-2/AES password
    hash (also covers R5's plain SHA-256 as round 0 + loop exit)."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _cbc_nopad(k[:16], k[16:32], k1, encrypt=True)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


# ------------------------------------------------- standard security handler


def _padded(password: bytes) -> bytes:
    return (password + _PAD)[:32]


def _file_key(
    password: bytes,
    o_entry: bytes,
    p: int,
    id0: bytes,
    r: int,
    key_len: int,
    encrypt_metadata: bool,
) -> bytes:
    h = hashlib.md5()
    h.update(_padded(password))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    n = key_len if r >= 3 else 5
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def _owner_entry(owner_pw: bytes, user_pw: bytes, r: int, key_len: int) -> bytes:
    key = hashlib.md5(_padded(owner_pw)).digest()
    n = key_len if r >= 3 else 5
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    rc4_key = key[:n]
    o = rc4(rc4_key, _padded(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in rc4_key), o)
    return o


def _user_entry(file_key: bytes, id0: bytes, r: int) -> bytes:
    if r == 2:
        return rc4(file_key, _PAD)
    h = hashlib.md5(_PAD + id0).digest()
    u = rc4(file_key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16


def _object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<I", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


_ENC_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)")
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>")
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_SPAN_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)


def _stream_payload(body: bytes, sm: re.Match) -> bytes:
    """Exact stream bytes: prefer the dict's /Length (cipher bytes can
    legitimately END in 0x0A/0x0D, so a bare rstrip corrupts them), fall
    back to stripping the single optional EOL before `endstream`."""
    span = sm.group(1)
    lm = None
    for lm in _LENGTH_RE.finditer(body[: sm.start()]):
        pass  # last /Length before the stream keyword
    if lm is not None:
        n = int(lm.group(1))
        if n <= len(span):
            return span[:n]
    if span.endswith(b"\r\n"):
        return span[:-2]
    if span.endswith(b"\n") or span.endswith(b"\r"):
        return span[:-1]
    return span
_NUM_FIELD = {
    b"V": re.compile(rb"/V\s+(\d+)"),
    b"R": re.compile(rb"/R\s+(\d+)"),
    b"Length": re.compile(rb"/Length\s+(\d+)"),
    b"P": re.compile(rb"/P\s+(-?\d+)"),
}


def _str_field(body: bytes, name: bytes) -> bytes | None:
    m = re.search(rb"/" + name + rb"\s*(?:\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]+)>)", body, re.DOTALL)
    if not m:
        return None
    if m.group(2) is not None:
        return bytes.fromhex(m.group(2).decode().replace("\n", "").replace(" ", ""))
    raw = m.group(1)
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == 0x5C and i + 1 < len(raw):  # backslash escape
            nxt = raw[i + 1]
            table = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}
            if nxt in table:
                out.append(table[nxt])
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal
                oct_digits = raw[i + 1 : i + 4]
                j = 0
                while j < len(oct_digits) and 0x30 <= oct_digits[j] <= 0x37:
                    j += 1
                out.append(int(oct_digits[:j], 8) & 0xFF)
                i += 1 + j
                continue
            out.append(nxt)
            i += 2
            continue
        out.append(c)
        i += 1
    return bytes(out)


def is_encrypted_pdf(data: bytes) -> bool:
    return _ENC_REF_RE.search(data) is not None


def decrypt_pdf(data: bytes, password: bytes = b"") -> bytes:
    """Return a copy of ``data`` with every stream decrypted (standard
    security handler; empty user password by default). Unencrypted input
    is returned unchanged; wrong password / unsupported scheme raises
    ValueError (callers keep the row-level parse_failed contract)."""
    ref = _ENC_REF_RE.search(data)
    if ref is None:
        return data
    enc_num = int(ref.group(1))
    enc_body = None
    for m in _OBJ_RE.finditer(data):
        if int(m.group(1)) == enc_num:
            enc_body = m.group(3)
            break
    if enc_body is None:
        raise ValueError("missing /Encrypt object")
    if b"/Standard" not in enc_body:
        raise ValueError("unsupported security handler (not /Standard)")
    fields = {k.decode(): (int(rx.search(enc_body).group(1)) if rx.search(enc_body) else None)
              for k, rx in _NUM_FIELD.items()}
    v = fields["V"] or 1
    r = fields["R"] or (2 if v == 1 else 3)
    if v not in (1, 2, 4, 5):
        raise ValueError(f"unsupported encryption /V {v}")
    key_bits = fields["Length"] or 40
    p = fields["P"] if fields["P"] is not None else -1
    o_entry = _str_field(enc_body, b"O")
    u_entry = _str_field(enc_body, b"U")
    if o_entry is None or u_entry is None:
        raise ValueError("Encrypt dict missing /O or /U")
    aes = b"/AESV2" in enc_body or b"/AESV3" in enc_body
    if v == 4 and not aes and b"/V2" not in enc_body and b"/Identity" not in enc_body:
        raise ValueError("unsupported crypt filter")
    encrypt_metadata = b"/EncryptMetadata false" not in enc_body
    idm = _ID_RE.search(data)
    id0 = bytes.fromhex(idm.group(1).decode()) if idm else b""
    if v == 5:
        # R5/R6: SHA-2 hash families, file key wrapped in /UE (or /OE)
        ue_entry = _str_field(enc_body, b"UE")
        if ue_entry is None or len(u_entry) < 48:
            raise ValueError("V5 Encrypt dict missing /UE or short /U")
        vsalt, ksalt = u_entry[32:40], u_entry[40:48]
        if _hash_2b(password, vsalt, b"") != u_entry[:32]:
            raise ValueError("PDF requires a (non-empty) user password")
        inter = _hash_2b(password, ksalt, b"")
        key = _cbc_nopad(inter, b"\x00" * 16, ue_entry[:32], encrypt=False)
        aes = True
    else:
        key = _file_key(password, o_entry, p, id0, r, key_bits // 8, encrypt_metadata)
        expect_u = _user_entry(key, id0, r)
        if (r == 2 and expect_u != u_entry[:32]) or (r >= 3 and expect_u[:16] != u_entry[:16]):
            raise ValueError("PDF requires a (non-empty) user password")

    out = bytearray()
    pos = 0
    for m in _OBJ_RE.finditer(data):
        num, gen, body = int(m.group(1)), int(m.group(2)), m.group(3)
        out += data[pos : m.start()]
        pos = m.end()
        if num == enc_num or b"/XRef" in body[:200]:
            out += data[m.start() : m.end()]
            continue
        sm = _STREAM_SPAN_RE.search(body)
        if sm is None:
            out += data[m.start() : m.end()]
            continue
        raw = _stream_payload(body, sm)
        # V5 uses the FILE key directly for every object; earlier
        # versions derive a per-object key
        okey = key if v == 5 else _object_key(key, num, gen, aes)
        if aes:
            if len(raw) < 16:
                raise ValueError("AES stream shorter than its IV")
            plain = aes128_decrypt_cbc(okey, raw[:16], raw[16:])
        else:
            plain = rc4(okey, raw)
        head = _LENGTH_RE.sub(b"/Length %d" % len(plain), body[: sm.start()], count=1)
        new_body = head + b"stream\n" + plain + b"\nendstream" + body[sm.end() :]
        out += m.group(1) + b" " + m.group(2) + b" obj" + new_body + b"endobj"
    out += data[pos:]
    # the output IS plaintext: drop the /Encrypt reference so a second
    # pass (or a caller that pre-decrypts) treats it as such
    return _ENC_REF_RE.sub(b"", bytes(out))


def encrypt_pdf(
    data: bytes,
    method: str = "rc4-128",
    owner_pw: bytes = b"owner",
    user_pw: bytes = b"",
    doc_id: bytes = b"\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f\x10",
) -> bytes:
    """Fixture encryptor: wrap a plain fixture PDF in standard-handler
    encryption (``rc4-40`` | ``rc4-128`` | ``aes-128``) so every decrypt
    path is testable offline. Encrypts streams only, mirroring what
    ``decrypt_pdf`` reads."""
    v, r, bits = {
        "rc4-40": (1, 2, 40),
        "rc4-128": (2, 3, 128),
        "aes-128": (4, 4, 128),
        "aes-256": (5, 6, 256),
    }[method]
    p = -44  # print+extract denied — typical owner-locked profile
    aes = method in ("aes-128", "aes-256")
    if v == 5:
        key = hashlib.sha256(b"fixture-file-key:" + doc_id).digest()
        vsalt, ksalt = b"VsaltUsr", b"KsaltUsr"
        u_entry = _hash_2b(user_pw, vsalt, b"") + vsalt + ksalt
        ue_entry = _cbc_nopad(_hash_2b(user_pw, ksalt, b""), b"\x00" * 16, key, encrypt=True)
        ovs, oks = b"VsaltOwn", b"KsaltOwn"
        o_entry = _hash_2b(owner_pw, ovs, u_entry) + ovs + oks
        oe_entry = _cbc_nopad(_hash_2b(owner_pw, oks, u_entry), b"\x00" * 16, key, encrypt=True)
    else:
        o_entry = _owner_entry(owner_pw, user_pw, r, bits // 8)
        key = _file_key(user_pw, o_entry, p, doc_id, r, bits // 8, True)
        u_entry = _user_entry(key, doc_id, r)

    max_num = 0
    out = bytearray()
    pos = 0
    for m in _OBJ_RE.finditer(data):
        num, gen, body = int(m.group(1)), int(m.group(2)), m.group(3)
        max_num = max(max_num, num)
        out += data[pos : m.start()]
        pos = m.end()
        sm = _STREAM_SPAN_RE.search(body)
        if sm is None:
            out += data[m.start() : m.end()]
            continue
        raw = _stream_payload(body, sm)
        okey = key if v == 5 else _object_key(key, num, gen, aes)
        if aes:
            iv = hashlib.md5(struct.pack("<II", num, gen)).digest()  # deterministic fixture IV
            enc = iv + aes128_encrypt_cbc(okey, iv, raw)
        else:
            enc = rc4(okey, raw)
        head = _LENGTH_RE.sub(b"/Length %d" % len(enc), body[: sm.start()], count=1)
        new_body = head + b"stream\n" + enc + b"\nendstream" + body[sm.end() :]
        out += m.group(1) + b" " + m.group(2) + b" obj" + new_body + b"endobj"
    out += data[pos:]

    def hexs(b: bytes) -> bytes:
        return b"<" + b.hex().encode() + b">"

    enc_num = max_num + 1
    cf = b""
    if v == 4:
        cf = b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
    elif v == 5:
        cf = (
            b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF"
            b" /UE " + hexs(ue_entry) + b" /OE " + hexs(oe_entry)
        )
    enc_obj = (
        b"%d 0 obj << /Filter /Standard /V %d /R %d /Length %d /P %d /O %s /U %s%s >> endobj\n"
        % (enc_num, v, r, bits, p, hexs(o_entry), hexs(u_entry), cf)
    )
    trailer = b"trailer << /Encrypt %d 0 R /ID [%s %s] >>\n" % (enc_num, hexs(doc_id), hexs(doc_id))
    return bytes(out) + enc_obj + trailer
