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
- RC4 and AES-128 implemented here (verified against the FIPS-197
  known-answer vector in tests).

``decrypt_pdf(data)`` returns a plaintext copy of the document with every
stream decrypted in place (strings are left alone — text extraction reads
streams only), which the existing regex-based extractor consumes
unchanged; un-encrypted input passes through untouched. ``encrypt_pdf``
is the fixture writer that makes every decrypt path testable offline.

Not covered (raise, row-level): V5/R6 AES-256, crypt filters other than
Identity/V2/AESV2, and documents that genuinely require a user password.
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


def _expand_key(key: bytes) -> list[bytes]:
    words = [key[i : i + 4] for i in range(0, 16, 4)]
    for r in range(10):
        w = words[-1]
        w = bytes([_SBOX[w[1]] ^ _RCON[r], _SBOX[w[2]], _SBOX[w[3]], _SBOX[w[0]]])
        for k in range(4):
            w = bytes(a ^ b for a, b in zip(words[-4], w))
            words.append(w)
    return [b"".join(words[i : i + 4]) for i in range(0, 44, 4)]


def _add_rk(state: bytearray, rk: bytes) -> None:
    for i in range(16):
        state[i] ^= rk[i]


def _shift_rows(s: bytearray, inv: bool) -> None:
    for r in range(1, 4):
        row = [s[r + 4 * c] for c in range(4)]
        k = -r if inv else r
        row = row[k % 4 :] + row[: k % 4]
        for c in range(4):
            s[r + 4 * c] = row[c]


def _mix_columns(s: bytearray, inv: bool) -> None:
    m = (14, 11, 13, 9) if inv else (2, 3, 1, 1)
    for c in range(4):
        col = s[4 * c : 4 * c + 4]
        for r in range(4):
            s[4 * c + r] = (
                _gmul(col[0], m[(0 - r) % 4])
                ^ _gmul(col[1], m[(1 - r) % 4])
                ^ _gmul(col[2], m[(2 - r) % 4])
                ^ _gmul(col[3], m[(3 - r) % 4])
            )


def _aes_encrypt_block(key_sched: list[bytes], block: bytes) -> bytes:
    s = bytearray(block)
    _add_rk(s, key_sched[0])
    for rnd in range(1, 10):
        for i in range(16):
            s[i] = _SBOX[s[i]]
        _shift_rows(s, inv=False)
        _mix_columns(s, inv=False)
        _add_rk(s, key_sched[rnd])
    for i in range(16):
        s[i] = _SBOX[s[i]]
    _shift_rows(s, inv=False)
    _add_rk(s, key_sched[10])
    return bytes(s)


def _aes_decrypt_block(key_sched: list[bytes], block: bytes) -> bytes:
    s = bytearray(block)
    _add_rk(s, key_sched[10])
    for rnd in range(9, 0, -1):
        _shift_rows(s, inv=True)
        for i in range(16):
            s[i] = _INV_SBOX[s[i]]
        _add_rk(s, key_sched[rnd])
        _mix_columns(s, inv=True)
    _shift_rows(s, inv=True)
    for i in range(16):
        s[i] = _INV_SBOX[s[i]]
    _add_rk(s, key_sched[0])
    return bytes(s)


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
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>")
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_SPAN_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
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
    if v not in (1, 2, 4):
        raise ValueError(f"unsupported encryption /V {v} (AES-256/R6 not implemented)")
    key_bits = fields["Length"] or 40
    p = fields["P"] if fields["P"] is not None else -1
    o_entry = _str_field(enc_body, b"O")
    u_entry = _str_field(enc_body, b"U")
    if o_entry is None or u_entry is None:
        raise ValueError("Encrypt dict missing /O or /U")
    aes = b"/AESV2" in enc_body
    if v == 4 and not aes and b"/V2" not in enc_body and b"/Identity" not in enc_body:
        raise ValueError("unsupported crypt filter")
    encrypt_metadata = b"/EncryptMetadata false" not in enc_body
    idm = _ID_RE.search(data)
    id0 = bytes.fromhex(idm.group(1).decode()) if idm else b""
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
        raw = sm.group(1).rstrip(b"\r\n")
        okey = _object_key(key, num, gen, aes)
        if aes:
            if len(raw) < 16:
                raise ValueError("AES stream shorter than its IV")
            plain = aes128_decrypt_cbc(okey[:16], raw[:16], raw[16:])
        else:
            plain = rc4(okey, raw)
        new_body = body[: sm.start()] + b"stream\n" + plain + b"\nendstream" + body[sm.end() :]
        out += m.group(1) + b" " + m.group(2) + b" obj" + new_body + b"endobj"
    out += data[pos:]
    return bytes(out)


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
    v, r, bits = {"rc4-40": (1, 2, 40), "rc4-128": (2, 3, 128), "aes-128": (4, 4, 128)}[method]
    p = -44  # print+extract denied — typical owner-locked profile
    o_entry = _owner_entry(owner_pw, user_pw, r, bits // 8)
    key = _file_key(user_pw, o_entry, p, doc_id, r, bits // 8, True)
    u_entry = _user_entry(key, doc_id, r)
    aes = method == "aes-128"

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
        raw = sm.group(1).rstrip(b"\r\n")
        okey = _object_key(key, num, gen, aes)
        if aes:
            iv = hashlib.md5(struct.pack("<II", num, gen)).digest()  # deterministic fixture IV
            enc = iv + aes128_encrypt_cbc(okey[:16], iv, raw)
        else:
            enc = rc4(okey, raw)
        new_body = body[: sm.start()] + b"stream\n" + enc + b"\nendstream" + body[sm.end() :]
        out += m.group(1) + b" " + m.group(2) + b" obj" + new_body + b"endobj"
    out += data[pos:]

    def hexs(b: bytes) -> bytes:
        return b"<" + b.hex().encode() + b">"

    enc_num = max_num + 1
    cf = b""
    if aes:
        cf = b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
    enc_obj = (
        b"%d 0 obj << /Filter /Standard /V %d /R %d /Length %d /P %d /O %s /U %s%s >> endobj\n"
        % (enc_num, v, r, bits, p, hexs(o_entry), hexs(u_entry), cf)
    )
    trailer = b"trailer << /Encrypt %d 0 R /ID [%s %s] >>\n" % (enc_num, hexs(doc_id), hexs(doc_id))
    return bytes(out) + enc_obj + trailer
