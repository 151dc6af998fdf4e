"""Snappy codec: CRC32C vector, block/frame round-trips, corruption
detection, and the .snappy unwrap path through the binary source."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from morphik_core_spark.functions.snappy import (
    compress_snappy_block,
    compress_snappy_framed,
    crc32c,
    decompress_snappy_block,
    decompress_snappy_framed,
)


def test_crc32c_reference_vector():
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"q",
        b"ab" * 5000,  # overlap copies
        b"Z" * 70000,  # period-1 run across chunk boundary
        b"the quick brown fox " * 500,
        bytes(range(256)) * 2,
    ],
)
def test_block_and_frame_roundtrip(payload):
    assert decompress_snappy_block(compress_snappy_block(payload)) == payload
    assert decompress_snappy_framed(compress_snappy_framed(payload)) == payload


def test_incompressible_uses_uncompressed_chunks():
    import random

    raw = random.Random(11).randbytes(150_000)
    frame = compress_snappy_framed(raw)
    assert decompress_snappy_framed(frame) == raw
    assert len(frame) < len(raw) + 64


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=4096))
def test_roundtrip_property(payload):
    assert decompress_snappy_framed(compress_snappy_framed(payload)) == payload
    assert decompress_snappy_block(compress_snappy_block(payload)) == payload


def test_corruption_and_bad_frames_raise():
    frame = bytearray(compress_snappy_framed(b"hello snappy " * 200))
    frame[-3] ^= 0xFF  # payload byte -> CRC mismatch
    with pytest.raises(ValueError):
        decompress_snappy_framed(bytes(frame))
    with pytest.raises(ValueError):
        decompress_snappy_framed(b"not a snappy stream")
    # declared length mismatch in a raw block
    blk = bytearray(compress_snappy_block(b"abcdef"))
    blk[0] += 1  # bump varint expected length
    with pytest.raises(ValueError):
        decompress_snappy_block(bytes(blk))
    # unskippable reserved chunk type
    bad = compress_snappy_framed(b"")[:10] + bytes([0x02, 1, 0, 0, 0])
    with pytest.raises(ValueError):
        decompress_snappy_framed(bad)


def test_skippable_padding_chunks_are_ignored():
    frame = bytearray(compress_snappy_framed(b"data " * 100))
    frame += bytes([0xFE, 3, 0, 0]) + b"pad"  # padding chunk at the end
    assert decompress_snappy_framed(bytes(frame)) == b"data " * 100


def test_snappy_unwrap_through_binary_source(spark, tmp_path):
    from morphik_core_spark.sources.binary import files_to_raw_docs, read_binary_dir

    text = "snappy framed corpus document. " * 40
    (tmp_path / "framed.txt.snappy").write_bytes(compress_snappy_framed(text.encode()))
    (tmp_path / "rawblock.txt.snappy").write_bytes(compress_snappy_block(text.encode()))
    files = read_binary_dir(spark, str(tmp_path))
    out = {r.filename: r for r in files_to_raw_docs(files).collect()}
    for name in ("framed.txt", "rawblock.txt"):
        assert out[name].parse_status == "ok"
        assert out[name].text.startswith("snappy framed corpus document.")
