"""WebDataset tar-shard sink/source — the other trainer-delivery format.

WebDataset (the format the `webdataset` PyTorch loader streams) is just
POSIX tar: each sample is a group of adjacent members sharing a basename
— ``{key}.txt``, ``{key}.json``, ``{key}.cls`` … — and a dataset is a
set of ``shard-00000.tar`` files read sequentially. Plain stdlib
``tarfile`` covers both directions; no torch/webdataset dependency.

- `write_webdataset_shards`: portable-hash shard assignment, per-shard
  tar assembled in memory by ONE task (`applyInPandas` over the shard
  groupBy, the TFRecord-writer layout), members sorted by key and
  written with ZEROED mtime/uid/gid so re-runs are byte-identical (the
  manifest's sha256 proves it).
- `read_webdataset_shards`: binaryFile scan + mapInPandas tar walk,
  adjacent members grouped by basename into one row per sample,
  per-FILE failure isolation (a corrupt shard is one error row).

Scale: one shuffle on the shard id; shards are the read-parallelism
unit. Same knobs — and the same shared-filesystem contract (``out_dir``
visible on executors and driver under one mount; tasks mkdir and write
temp-file + atomic ``os.replace``) — as the TFRecord sink
(`sources/tfrecord`).
"""

from __future__ import annotations

import contextlib
import hashlib
import io
import os
import socket
import uuid
import tarfile
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphik_core_spark.sources.shard_tmp import sweep_stale_tmps as _sweep_stale_tmps

__all__ = ["write_webdataset_shards", "read_webdataset_shards"]


def _add_member(tar: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0  # deterministic archives
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tar.addfile(info, io.BytesIO(payload))


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    ext_cols: dict[str, str],
    n_shards: int = 8,
) -> DataFrame:
    """Export rows as WebDataset tar shards: each row becomes one sample
    whose members are ``{key}.{ext}`` for every (column -> ext) in
    ``ext_cols`` (values written as UTF-8). Deterministic end to end —
    shard = portable_hash(key) mod n_shards, members sorted by key,
    zeroed tar metadata. Returns the manifest (shard, n_samples,
    n_bytes, path, sha256)."""
    os.makedirs(out_dir, exist_ok=True)
    items = sorted(ext_cols.items())
    shard = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % n_shards
    ).alias("_shard")
    base = df.select(
        shard,
        F.col(key_col).cast("string").alias("_key"),
        *[F.col(c).cast("string").alias(f"_c_{c}") for c, _ in items],
    )
    out_dir_b = out_dir

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values("_key")
        buf = io.BytesIO()
        n = 0
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in pdf.iterrows():
                key = str(row["_key"])
                for col, ext in items:
                    _add_member(tar, f"{key}.{ext}", str(row[f"_c_{col}"]).encode("utf-8"))
                n += 1
        blob = buf.getvalue()
        # Executor-side mkdir (driver-side makedirs only ran on its own
        # node) + temp-file/atomic-replace so task retries never leave a
        # torn shard. Requires out_dir on a shared mount (module doc).
        os.makedirs(out_dir_b, exist_ok=True)
        path = os.path.join(out_dir_b, f"shard-{sid:05d}.tar")
        # host + pid + per-attempt uuid: pid alone can collide across
        # nodes on the documented shared-FS deployment (speculative or
        # retried task copies), which would interleave two writers into
        # one temp file before the atomic replace.
        tmp = (
            f"{path}.tmp-{socket.gethostname()}-{os.getpid()}-"
            f"{uuid.uuid4().hex}"
        )
        # A crashed or losing speculative attempt must not leave its temp
        # file next to live shards forever: unlink on any failure, and
        # sweep stale temps from PRIOR crashed processes.
        _sweep_stale_tmps(out_dir_b)
        try:
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.replace(tmp, path)
        except BaseException:
            with contextlib.suppress(OSError):
                os.unlink(tmp)
            raise
        return pd.DataFrame(
            [
                {
                    "shard": sid,
                    "n_samples": n,
                    "n_bytes": len(blob),
                    "path": path,
                    "sha256": hashlib.sha256(blob).hexdigest(),
                }
            ]
        )

    return base.groupBy("_shard").applyInPandas(
        write_shard,
        schema="shard long, n_samples long, n_bytes long, path string, sha256 string",
    )


def read_webdataset_shards(
    spark: SparkSession, path: str, exts: Sequence[str]
) -> DataFrame:
    """binaryFile scan over *.tar; adjacent members sharing a basename
    become one row: (key, <ext columns...>, shard_path, error). Member
    extensions outside ``exts`` are ignored; corrupt shards isolate to
    one error row."""
    exts = list(exts)
    files = spark.read.format("binaryFile").load(os.path.join(path, "*.tar")).select(
        "path", "content"
    )
    cols = ", ".join(f"`{e}` string" for e in exts)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                try:
                    with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tar:
                        samples: dict[str, dict[str, str]] = {}
                        order: list[str] = []
                        for member in tar.getmembers():
                            base, dot, ext = member.name.rpartition(".")
                            if not dot or ext not in exts:
                                continue
                            fh = tar.extractfile(member)
                            if fh is None:
                                continue
                            if base not in samples:
                                samples[base] = {}
                                order.append(base)
                            samples[base][ext] = fh.read().decode("utf-8")
                        for key in order:
                            rows.append(
                                (key, *[samples[key].get(e) for e in exts], p, None)
                            )
                except Exception as exc:  # noqa: BLE001 — shard-level isolation
                    rows.append((None, *[None] * len(exts), p, f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(
                rows, columns=["key", *exts, "shard_path", "error"]
            )

    return files.mapInPandas(
        parse, schema=f"key string, {cols}, shard_path string, error string"
    )
