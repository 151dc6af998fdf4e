"""Bloom-filter data skipping for parquet file sets — the Delta/Iceberg
bloom-index analog on top of plain directories: a one-pass per-FILE
bloom build persisted as a sidecar manifest, and a reader that prunes
the file list for point/IN-list lookups before Spark ever opens a
footer.

Zone maps (min/max, `plans/partitioning.zorder_write`) prune RANGE
predicates; blooms prune EQUALITY on high-cardinality keys where ranges
overlap every file (uuid-ish ids, content hashes). Together they are
the two halves of lakehouse data skipping.

Design:
- the bloom build is ONE scan: group (input_file_name, bit) distinct —
  at most files x num_bits rows reach the driver, independent of table
  size;
- bits use the repo's 60-bit md5 `portable_hash` with the same
  per-probe salting as `operators/sketches.bloom_bits`, so the Python
  prune-side hash is ONE md5 call per probe value — no JVM roundtrip,
  and byte-identical to the build side by construction (pinned by a
  cross-language test);
- the manifest stores each file's filter as a hex bitmap (num_bits/4
  chars), committed write-temp-then-rename like the version manifest;
- no false negatives ever: a file whose manifest entry is missing (new
  file appended after indexing) is always kept — stale indexes degrade
  to full scans, never to wrong answers.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphik_core_spark.operators.dedup import portable_hash

__all__ = ["write_bloom_index", "prune_files", "scan_with_bloom"]

_INDEX_FILE = "_bloom_index.json"


def _index_path(table_path: str) -> str:
    return os.path.join(table_path, _INDEX_FILE)


def _py_bit(value, j: int, num_bits: int) -> int:
    """Python twin of the build-side bit expression:
    portable_hash('bloom{j}|' || CAST(value AS STRING)) % num_bits."""
    s = f"bloom{j}|{value}"
    h = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
    return h % num_bits


def write_bloom_index(
    spark: SparkSession,
    table_path: str,
    key_col: str,
    num_bits: int = 4096,
    num_hashes: int = 3,
) -> dict:
    """Build per-file bloom filters over ``key_col`` in one scan and
    persist the sidecar manifest. Returns the manifest dict."""
    df = spark.read.parquet(table_path)
    bits_expr = F.array(
        *[
            portable_hash(
                F.concat(F.lit(f"bloom{j}|"), F.col(key_col).cast("string"))
            )
            % num_bits
            for j in range(num_hashes)
        ]
    )
    pairs = (
        df.select(
            F.input_file_name().alias("file"), F.explode(bits_expr).alias("bit")
        )
        .distinct()
        .collect()
    )
    root = os.path.abspath(table_path)
    by_file: dict[str, set] = {}
    for r in pairs:
        # manifest keys are paths RELATIVE to the table root so
        # partitioned layouts (k=.../part-*.parquet) resolve correctly
        f = r["file"]
        for prefix in ("file://", "file:"):
            if f.startswith(prefix):
                f = f[len(prefix):]
                break
        rel = os.path.relpath(os.path.abspath(f), root)
        by_file.setdefault(rel, set()).add(int(r["bit"]))
    files = {}
    for f, bits in by_file.items():
        bitmap = bytearray(num_bits // 8)
        for b in bits:
            bitmap[b // 8] |= 1 << (b % 8)
        files[f] = bytes(bitmap).hex()
    manifest = {
        "key_col": key_col,
        "num_bits": num_bits,
        "num_hashes": num_hashes,
        "files": files,
    }
    tmp = _index_path(table_path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, _index_path(table_path))
    return manifest


def _bit_set(bitmap_hex: str, bit: int) -> bool:
    byte = int(bitmap_hex[2 * (bit // 8) : 2 * (bit // 8) + 2], 16)
    return bool(byte & (1 << (bit % 8)))


def prune_files(table_path: str, values) -> list[str] | None:
    """Data files that MAY contain any of ``values`` under the sidecar
    index; None when no index exists (caller scans everything). Files
    not present in the manifest (appended after indexing) are always
    kept — staleness can only widen the scan."""
    p = _index_path(table_path)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        m = json.load(fh)
    nb, nh = m["num_bits"], m["num_hashes"]
    probes = [
        [_py_bit(v, j, nb) for j in range(nh)] for v in values
    ]
    keep = []
    for dirpath, _dirs, fnames in os.walk(table_path):
        for fname in sorted(fnames):
            if not fname.endswith(".parquet"):
                continue
            full = os.path.join(dirpath, fname)
            rel = os.path.relpath(full, table_path)
            bitmap = m["files"].get(rel)
            if bitmap is None:
                keep.append(full)
                continue
            if any(all(_bit_set(bitmap, b) for b in pr) for pr in probes):
                keep.append(full)
    return keep


def scan_with_bloom(
    spark: SparkSession,
    table_path: str,
    key_col: str,
    values,
) -> DataFrame:
    """Point/IN-list read with bloom file pruning: scans only the files
    that may contain a probe value, then applies the exact predicate
    (bloom false positives filter out here — no false negatives by
    construction). Falls back to the full directory when unindexed."""
    values = list(values)
    files = prune_files(table_path, values)
    pred = F.col(key_col).isin(values)
    if files is None:
        return spark.read.parquet(table_path).filter(pred)
    if not files:
        return spark.read.parquet(table_path).filter(F.lit(False))
    # basePath keeps hive-partition columns resolvable when reading
    # pruned leaf files out of a partitioned layout
    return spark.read.option("basePath", table_path).parquet(*files).filter(pred)
