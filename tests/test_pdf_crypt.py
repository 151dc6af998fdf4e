"""Encrypted-PDF support: cipher known-answer vectors, standard-handler
round trips for all three schemes, password rejection, and the
transparent path through extract_pdf_text + the binary source."""

from __future__ import annotations

import zlib

import pytest

from morphik_core_spark.functions.pdf import extract_pdf_text
from morphik_core_spark.functions.pdf_crypt import (
    _aes_decrypt_block,
    _aes_encrypt_block,
    _expand_key,
    aes128_decrypt_cbc,
    aes128_encrypt_cbc,
    decrypt_pdf,
    encrypt_pdf,
    is_encrypted_pdf,
    rc4,
)


def _obj_stream(n: int, dict_body: bytes, payload: bytes) -> bytes:
    return b"%d 0 obj << %s /Length %d >> stream\n%s\nendstream endobj\n" % (
        n, dict_body, len(payload), payload,
    )


def _pdf(*contents: bytes) -> bytes:
    body = b"".join(
        _obj_stream(i + 1, b"/Filter /FlateDecode", zlib.compress(c))
        for i, c in enumerate(contents)
    )
    return b"%PDF-1.4\n" + body + b"%%EOF"


def test_aes128_fips197_vector():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    ks = _expand_key(key)
    assert _aes_encrypt_block(ks, pt) == ct
    assert _aes_decrypt_block(ks, ct) == pt


def test_rc4_known_vector():
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Wiki", b"pedia").hex() == "1021bf0420"


def test_cbc_roundtrip_and_padding_check():
    key = b"0123456789abcdef"
    for n in (0, 1, 15, 16, 17, 300):
        data = bytes(range(256)) * 2
        data = data[:n]
        ct = aes128_encrypt_cbc(key, b"\x00" * 16, data)
        assert len(ct) % 16 == 0
        assert aes128_decrypt_cbc(key, b"\x00" * 16, ct) == data
    with pytest.raises(ValueError):
        aes128_decrypt_cbc(key, b"\x00" * 16, b"short")


@pytest.mark.parametrize("method", ["rc4-40", "rc4-128", "aes-128"])
def test_encrypted_pdf_text_extracts_transparently(method):
    pdf = _pdf(b"BT (alpha secret) Tj ET", b"BT (beta secret) Tj ET")
    enc = encrypt_pdf(pdf, method)
    assert is_encrypted_pdf(enc) and not is_encrypted_pdf(pdf)
    assert enc != pdf
    # extract_pdf_text decrypts internally — no caller involvement
    text = extract_pdf_text(enc)
    assert "alpha secret" in text and "beta secret" in text


def test_real_user_password_is_rejected_not_garbage():
    pdf = _pdf(b"BT (locked) Tj ET")
    enc = encrypt_pdf(pdf, "aes-128", user_pw=b"hunter2")
    with pytest.raises(ValueError, match="password"):
        decrypt_pdf(enc)
    # the right password opens it
    assert b"BT" in zlib.decompress(
        decrypt_pdf(enc, password=b"hunter2").split(b"stream\n", 1)[1].split(b"\nendstream")[0]
    )


def test_unencrypted_passthrough_is_identity():
    pdf = _pdf(b"BT (plain) Tj ET")
    assert decrypt_pdf(pdf) is pdf


def test_v5_without_ue_raises():
    # a V5 dict missing /UE (or with a short /U) must fail loudly, not
    # produce garbage
    pdf = _pdf(b"BT (x) Tj ET")
    enc = encrypt_pdf(pdf, "rc4-128")
    bad = enc.replace(b"/V 2 /R 3", b"/V 5 /R 6")
    with pytest.raises(ValueError, match="UE"):
        decrypt_pdf(bad)


@pytest.mark.parametrize("method", ["aes-256"])
def test_aes256_v5_roundtrip_and_password(method):
    pdf = _pdf(b"BT (v5 secret text) Tj ET")
    enc = encrypt_pdf(pdf, method)
    assert "v5 secret text" in extract_pdf_text(enc)
    locked = encrypt_pdf(pdf, method, user_pw=b"pw")
    with pytest.raises(ValueError, match="password"):
        decrypt_pdf(locked)
    assert "v5 secret text" in extract_pdf_text(decrypt_pdf(locked, password=b"pw"))


def test_aes256_fips197_vector():
    key = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
    )
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ks = _expand_key(key)
    ct = _aes_encrypt_block(ks, pt)
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert _aes_decrypt_block(ks, ct) == pt


def test_encrypted_pdf_through_binary_source(spark, tmp_path):
    from morphik_core_spark.sources.binary import files_to_raw_docs, read_binary_dir

    pdf = _pdf(b"BT (owner locked corpus doc) Tj ET")
    (tmp_path / "open.pdf").write_bytes(pdf)
    (tmp_path / "locked.pdf").write_bytes(encrypt_pdf(pdf, "aes-128"))
    (tmp_path / "pwd.pdf").write_bytes(encrypt_pdf(pdf, "rc4-128", user_pw=b"x"))
    out = {r.filename: r for r in files_to_raw_docs(read_binary_dir(spark, str(tmp_path))).collect()}
    assert out["open.pdf"].parse_status == "ok"
    assert out["locked.pdf"].parse_status == "ok"
    assert "owner locked corpus doc" in out["locked.pdf"].text
    assert out["pwd.pdf"].parse_status == "parse_failed"
