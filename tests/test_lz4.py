"""LZ4 frame codec: xxHash32 reference vectors, block/frame round-trips
(incl. overlap copies, stored blocks, multi-block frames), corruption
detection, and the .lz4 unwrap path through the binary document source."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from morphik_core_spark.functions.lz4 import (
    compress_lz4_block,
    compress_lz4_frame,
    decompress_lz4_block,
    decompress_lz4_frame,
    xxh32,
)


def test_xxh32_reference_vectors():
    # published xxHash32 test vectors (seed 0)
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"x",
        b"ab" * 5000,  # period-2 overlap copies
        b"A" * 70000,  # period-1 overlap + >64KB (multi-block at id=4)
        b"the quick brown fox jumps over the lazy dog " * 400,
        bytes(range(256)) * 3,  # short, barely compressible
    ],
)
def test_block_and_frame_roundtrip(payload):
    assert decompress_lz4_block(compress_lz4_block(payload)) == payload
    for bc in (False, True):
        frame = compress_lz4_frame(payload, block_checksum=bc)
        assert decompress_lz4_frame(frame) == payload


def test_incompressible_data_uses_stored_blocks():
    import random

    raw = random.Random(9).randbytes(200_000)
    frame = compress_lz4_frame(raw)
    assert decompress_lz4_frame(frame) == raw
    assert len(frame) < len(raw) + 64  # stored blocks add only headers


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=4096))
def test_roundtrip_property(payload):
    assert decompress_lz4_frame(compress_lz4_frame(payload)) == payload


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet="ab \n", min_size=0, max_size=8192))
def test_roundtrip_repetitive_text(s):
    payload = s.encode()
    assert decompress_lz4_frame(compress_lz4_frame(payload)) == payload


def test_corruption_is_detected():
    frame = bytearray(compress_lz4_frame(b"hello world " * 100))
    # flip one payload byte -> content checksum must catch it
    frame[20] ^= 0xFF
    with pytest.raises(ValueError):
        decompress_lz4_frame(bytes(frame))
    # bad magic
    with pytest.raises(ValueError):
        decompress_lz4_frame(b"\x00\x00\x00\x00" + bytes(frame[4:]))
    # header checksum
    frame2 = bytearray(compress_lz4_frame(b"abc"))
    frame2[4] ^= 0x04  # toggle a FLG bit without fixing HC
    with pytest.raises(ValueError):
        decompress_lz4_frame(bytes(frame2))


def test_truncated_frame_raises():
    frame = compress_lz4_frame(b"some document text here " * 50)
    with pytest.raises(ValueError):
        decompress_lz4_frame(frame[: len(frame) // 2])


def test_lz4_unwrap_through_binary_source(spark, tmp_path):
    from morphik_core_spark.sources.binary import files_to_raw_docs, read_binary_dir

    text = "lz4-compressed corpus document. " * 40
    (tmp_path / "doc.txt.lz4").write_bytes(compress_lz4_frame(text.encode()))
    (tmp_path / "broken.txt.lz4").write_bytes(b"\x04\x22\x4d\x18garbage")
    files = read_binary_dir(spark, str(tmp_path))
    out = {r.filename: r for r in files_to_raw_docs(files).collect()}
    assert out["doc.txt"].parse_status == "ok"
    assert out["doc.txt"].text.startswith("lz4-compressed corpus document.")
    assert out["broken.txt"].parse_status == "parse_failed"
