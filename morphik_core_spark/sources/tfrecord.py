"""TFRecord shard sink/source — the training-data delivery format.

A 100 TB curation pipeline ends by EXPORTING the curated corpus in a
format trainers stream natively; TFRecord is one of the two standards
(WebDataset tar is the other — `sources/webdataset`). The reference has
no trainer-export stage (its pipeline ends at the vector index), so this
is pipeline-extension surface like the dedup/curation families.

Everything is stdlib + the repo's own CRC32C:

- **Record framing** (`encode_record`/`iter_records`): the TFRecord wire
  format — ``[len: uint64 LE][masked crc32c(len): uint32 LE][payload]
  [masked crc32c(payload): uint32 LE]`` with the same Castagnoli table +
  mask the Snappy framing codec already carries (`functions/snappy`).
- **tf.train.Example** (`encode_example`/`decode_example`): a
  hand-rolled protobuf encoder/decoder for the fixed Example shape
  (``features.feature[key] -> bytes_list | int64_list``), so exported
  shards are genuinely TensorFlow-readable without any TF dependency.
  Wire layout: Example{1: Features{1: repeated map entry{1: key,
  2: Feature{1: BytesList{1: repeated bytes} | 2: Int64List{1: repeated
  varint}}}}}.
- **Distributed shard writer** (`write_tfrecord_shards`): rows hash to
  ``n_shards`` by the portable 60-bit key hash (deterministic,
  engine-portable), each shard is assembled and written by ONE task via
  ``applyInPandas`` over the shard groupBy (the training_shards layout),
  records ordered by key within a shard so re-runs are byte-identical.
  Returns the manifest (shard, n_records, n_bytes, path, sha256) — the
  audit artifact a delivery pipeline records.
- **Reader** (`read_tfrecord_shards`): binaryFile scan + mapInPandas
  frame-walk with per-FILE failure isolation — a corrupt shard yields
  one error row, never a dead job.

Scale: one shuffle on the shard id; shard files are the parallelism
unit on read, exactly like the WARC scan. Shard count is the file-size
knob (aim ~100-500 MB/shard at 100 TB).

Filesystem contract: ``out_dir`` must be a path visible under the SAME
mount on every executor AND the driver — a shared filesystem (NFS,
Lustre) or a FUSE-mounted object store. Each task creates the directory
itself and writes through a task-local temp file + atomic ``os.replace``
(no partial shards on task retry); the manifest and the binaryFile
reader then resolve the same paths from the driver. Executor-local-only
disks are NOT supported — to target raw S3/HDFS, mount it or swap the
two ``open()`` sites for the store's atomic-put client.
"""

from __future__ import annotations

import contextlib
import hashlib
import os
import socket
import uuid
import struct
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphik_core_spark.functions.snappy import _mask_crc, crc32c
from morphik_core_spark.sources.shard_tmp import sweep_stale_tmps as _sweep_stale_tmps

__all__ = [
    "encode_record",
    "iter_records",
    "encode_example",
    "decode_example",
    "write_tfrecord_shards",
    "read_tfrecord_shards",
]


# ------------------------------------------------------------ framing
def encode_record(payload: bytes) -> bytes:
    """One TFRecord frame: length + masked length-CRC + payload + masked
    payload-CRC (all little-endian, CRC32C/Castagnoli)."""
    header = struct.pack("<Q", len(payload))
    return (
        header
        + struct.pack("<I", _mask_crc(crc32c(header)))
        + payload
        + struct.pack("<I", _mask_crc(crc32c(payload)))
    )


def iter_records(blob: bytes, verify: bool = True) -> Iterator[bytes]:
    """Walk a TFRecord byte stream; raises ValueError on truncation or a
    CRC mismatch (when ``verify``)."""
    i, n = 0, len(blob)
    while i < n:
        if n - i < 12:
            raise ValueError("truncated TFRecord header")
        (length,) = struct.unpack_from("<Q", blob, i)
        (len_crc,) = struct.unpack_from("<I", blob, i + 8)
        if verify and _mask_crc(crc32c(blob[i : i + 8])) != len_crc:
            raise ValueError("TFRecord length CRC mismatch")
        i += 12
        if n - i < length + 4:
            raise ValueError("truncated TFRecord payload")
        payload = blob[i : i + length]
        (data_crc,) = struct.unpack_from("<I", blob, i + length)
        if verify and _mask_crc(crc32c(payload)) != data_crc:
            raise ValueError("TFRecord payload CRC mismatch")
        i += length + 4
        yield payload


# ------------------------------------------------ tf.train.Example wire
def _varint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def _zigzag_free_varint_read(data: bytes, i: int) -> tuple[int, int]:
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
        if shift > 63:
            raise ValueError("varint too long")


def _len_field(tag: int, body: bytes) -> bytes:
    # wire type 2 (LEN): key = (field << 3) | 2
    return _varint((tag << 3) | 2) + _varint(len(body)) + body


def encode_example(features: dict[str, bytes | int | Sequence[int]]) -> bytes:
    """Minimal tf.train.Example: bytes values become bytes_list features,
    ints / int sequences become int64_list features. Keys are emitted in
    sorted order so encoding is deterministic."""
    entries = bytearray()
    for key in sorted(features):
        val = features[key]
        if isinstance(val, bytes):
            inner = _len_field(1, val)  # BytesList.value
            feature = _len_field(1, inner)  # Feature.bytes_list
        else:
            ints = [val] if isinstance(val, int) else list(val)
            body = bytearray()
            for x in ints:
                if x < 0:
                    x &= (1 << 64) - 1  # protobuf int64: two's complement
                body += _varint(x)
            # Int64List.value (field 1) packed, then Feature.int64_list (field 2)
            inner = _varint((1 << 3) | 2) + _varint(len(body)) + bytes(body)
            feature = _len_field(2, inner)
        entry = _len_field(1, key.encode("utf-8")) + _len_field(2, feature)
        entries += _len_field(1, entry)  # Features.feature map entry
    features_msg = bytes(entries)
    return _len_field(1, features_msg)  # Example.features


def decode_example(blob: bytes) -> dict[str, bytes | list[int]]:
    """Inverse of `encode_example` (bytes_list -> bytes of the first
    value; int64_list -> list of ints, packed or unpacked)."""

    def fields(data: bytes) -> Iterator[tuple[int, int, bytes | int]]:
        i = 0
        while i < len(data):
            key, i = _zigzag_free_varint_read(data, i)
            tag, wire = key >> 3, key & 7
            if wire == 2:
                ln, i = _zigzag_free_varint_read(data, i)
                yield tag, wire, data[i : i + ln]
                i += ln
            elif wire == 0:
                v, i = _zigzag_free_varint_read(data, i)
                yield tag, wire, v
            else:
                raise ValueError(f"unsupported wire type {wire}")

    out: dict[str, bytes | list[int]] = {}
    for tag, _, feats in fields(blob):
        if tag != 1:
            continue
        for etag, _, entry in fields(feats):  # repeated map entries
            if etag != 1:
                continue
            name: str | None = None
            value: bytes | list[int] | None = None
            for ftag, _, fval in fields(entry):
                if ftag == 1:
                    name = fval.decode("utf-8")
                elif ftag == 2:
                    for vtag, vwire, vval in fields(fval):
                        if vtag == 1:  # bytes_list
                            for btag, _, bval in fields(vval):
                                if btag == 1:
                                    value = bval
                        elif vtag == 2:  # int64_list
                            ints: list[int] = []
                            for itag, iwire, ival in fields(vval):
                                if itag != 1:
                                    continue
                                if iwire == 2:  # packed
                                    j = 0
                                    while j < len(ival):
                                        x, j = _zigzag_free_varint_read(ival, j)
                                        if x >= 1 << 63:
                                            x -= 1 << 64
                                        ints.append(x)
                                else:
                                    x = ival
                                    if x >= 1 << 63:
                                        x -= 1 << 64
                                    ints.append(x)
                            value = ints
            if name is not None and value is not None:
                out[name] = value
    return out


# ------------------------------------------------------------- writer
def write_tfrecord_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    text_col: str,
    n_shards: int = 8,
    meta_cols: Sequence[str] = (),
) -> DataFrame:
    """Export (key, text, meta...) rows as TFRecord shards of
    tf.train.Example payloads. Deterministic end to end: shard =
    portable_hash(key) mod n_shards, records sorted by key inside each
    shard, Example keys sorted — re-running the export produces
    byte-identical files (manifest sha256 proves it).

    One shuffle (the shard groupBy); each shard file is written by the
    task that owns the group. Returns the manifest DataFrame
    (shard, n_records, n_bytes, path, sha256).
    """
    os.makedirs(out_dir, exist_ok=True)
    meta_cols = list(meta_cols)
    shard = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % n_shards
    ).alias("_shard")
    base = df.select(
        shard,
        F.col(key_col).cast("string").alias("_key"),
        F.col(text_col).cast("string").alias("_text"),
        *[F.col(c).cast("string").alias(f"_m_{c}") for c in meta_cols],
    )

    out_dir_b = out_dir
    metas = list(meta_cols)

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values("_key")
        buf = bytearray()
        for _, row in pdf.iterrows():
            feats: dict[str, bytes | int | list[int]] = {
                "key": str(row["_key"]).encode("utf-8"),
                "text": str(row["_text"]).encode("utf-8"),
            }
            for c in metas:
                feats[c] = str(row[f"_m_{c}"]).encode("utf-8")
            buf += encode_record(encode_example(feats))
        # Executor-side: the driver's makedirs only ran on ITS node; on a
        # multi-node cluster the task must create the (shared-FS) dir
        # itself, and temp-file + atomic replace keeps task retries from
        # leaving a torn shard behind.
        os.makedirs(out_dir_b, exist_ok=True)
        path = os.path.join(out_dir_b, f"shard-{sid:05d}.tfrecord")
        # pid alone is not unique across nodes on a shared FS
        # (speculative/retried copies of this task on different hosts can
        # share a pid and interleave into one temp file) — include host
        # and a per-attempt random token.
        tmp = (
            f"{path}.tmp-{socket.gethostname()}-{os.getpid()}-"
            f"{uuid.uuid4().hex}"
        )
        # A crashed or losing speculative attempt must not leave its temp
        # file next to live shards forever: unlink on any failure, and
        # sweep stale temps from PRIOR crashed processes (old enough that
        # no live attempt can still be writing them).
        _sweep_stale_tmps(out_dir_b)
        try:
            with open(tmp, "wb") as fh:
                fh.write(buf)
            os.replace(tmp, path)
        except BaseException:
            with contextlib.suppress(OSError):
                os.unlink(tmp)
            raise
        return pd.DataFrame(
            [
                {
                    "shard": sid,
                    "n_records": len(pdf),
                    "n_bytes": len(buf),
                    "path": path,
                    "sha256": hashlib.sha256(bytes(buf)).hexdigest(),
                }
            ]
        )

    return base.groupBy("_shard").applyInPandas(
        write_shard,
        schema="shard long, n_records long, n_bytes long, path string, sha256 string",
    )


def read_tfrecord_shards(spark: SparkSession, path: str) -> DataFrame:
    """binaryFile scan over *.tfrecord + frame/Example decode with
    per-file failure isolation: corrupt shards produce one row with
    ``error`` set instead of killing the scan. Output: (key, text,
    shard_path, error)."""
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.tfrecord")
    ).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                try:
                    for payload in iter_records(bytes(blob)):
                        ex = decode_example(payload)
                        key = ex.get("key")
                        text = ex.get("text")
                        rows.append(
                            (
                                key.decode("utf-8") if isinstance(key, bytes) else None,
                                text.decode("utf-8") if isinstance(text, bytes) else None,
                                p,
                                None,
                            )
                        )
                except Exception as exc:  # noqa: BLE001 — shard-level isolation
                    rows.append((None, None, p, f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(rows, columns=["key", "text", "shard_path", "error"])

    return files.mapInPandas(
        parse, schema="key string, text string, shard_path string, error string"
    )
