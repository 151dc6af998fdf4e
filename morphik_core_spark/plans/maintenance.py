"""Lakehouse table maintenance: versioned snapshots (time travel) and
small-file compaction — the operational half of the §2.9
update/versioning story.

The reference keeps document version history inside each row
(`update_strategy='add'` appends to system_metadata.version history —
`core/services/ingestion_service.py:852-1145`) and mutates rows in place
in Postgres. At warehouse scale the equivalent is table-level: every
mutation produces a new immutable snapshot version recorded in a
manifest, old versions stay readable (time travel / audit / reproducible
training runs), and a compactor periodically folds the small files that
incremental writes accumulate into scan-friendly ones.

This is deliberately a minimal version-manifest format (a JSON file next
to `v=N/` snapshot directories), not a Delta/Iceberg reimplementation:
enough mechanism to make upsert-with-history and read_version real and
testable, with the commit protocol documented. At production scale you'd
swap the directory manifest for a table format's transaction log — the
operator surface above it (`versioned_upsert` / `read_version`) is
unchanged.

Concurrency note: the manifest write is the commit point (write temp +
atomic rename). Single-writer is assumed, matching the reference's
per-document worker locks.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morphik_core_spark.operators.docstore import upsert

__all__ = [
    "list_versions",
    "current_version",
    "read_version",
    "versioned_write",
    "versioned_upsert",
    "compact",
    "vacuum",
    "diff_versions",
    "schema_diff",
]

_MANIFEST = "_versions.json"


def _manifest_path(table_path: str) -> str:
    return os.path.join(table_path, _MANIFEST)


def _load_manifest(table_path: str) -> list[dict]:
    p = _manifest_path(table_path)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)


def _commit(table_path: str, manifest: list[dict]) -> None:
    # write-temp + rename: readers never observe a partial manifest
    p = _manifest_path(table_path)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, p)


def list_versions(table_path: str) -> list[dict]:
    """Manifest entries: {version, dir, op, rows, committed_at_unix}."""
    return _load_manifest(table_path)


def current_version(table_path: str) -> int:
    m = _load_manifest(table_path)
    if not m:
        raise FileNotFoundError(f"no versions at {table_path}")
    return m[-1]["version"]


def read_version(spark: SparkSession, table_path: str, version: int | None = None) -> DataFrame:
    """Time travel: the snapshot as of ``version`` (default: latest)."""
    m = _load_manifest(table_path)
    if not m:
        raise FileNotFoundError(f"no versions at {table_path}")
    by_v = {e["version"]: e for e in m}
    v = m[-1]["version"] if version is None else version
    if v not in by_v:
        raise ValueError(f"version {v} not found (have {sorted(by_v)})")
    return spark.read.parquet(os.path.join(table_path, by_v[v]["dir"]))


def versioned_write(df: DataFrame, table_path: str, op: str = "write") -> int:
    """Append a new immutable snapshot version; returns its number."""
    m = _load_manifest(table_path)
    v = (m[-1]["version"] + 1) if m else 0
    d = f"v={v}"
    df.write.mode("errorifexists").parquet(os.path.join(table_path, d))
    rows = df.sparkSession.read.parquet(os.path.join(table_path, d)).count()
    m.append({"version": v, "dir": d, "op": op, "rows": rows, "committed_at_unix": int(time.time())})
    _commit(table_path, m)
    return v


def versioned_upsert(
    spark: SparkSession, table_path: str, updates: DataFrame, keys: list[str]
) -> int:
    """Upsert against the latest snapshot, committing the result as a new
    version — every prior state stays readable (the table-level analog of
    the reference's `update_strategy='add'` row-version history)."""
    base = read_version(spark, table_path)
    return versioned_write(upsert(base, updates, keys), table_path, op="upsert")


def compact(
    spark: SparkSession,
    table_path: str,
    target_rows_per_file: int,
) -> int:
    """Fold the latest snapshot's small files into ~target-sized ones and
    commit the result as a new version (OPTIMIZE/compaction analog).

    Sizing by row count here because the synthetic fixtures are
    uniform-width; a production compactor sizes by bytes
    (`spark.sql.files.maxPartitionBytes`-aligned) — same mechanism, the
    repartition count is the only line that changes. Old versions keep
    their original file layout, so time travel is unaffected.
    """
    df = read_version(spark, table_path)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    return versioned_write(df.repartition(n_files), table_path, op=f"compact({n_files})")


def vacuum(
    table_path: str,
    keep_versions: int = 2,
) -> list[int]:
    """Retention cleanup (Delta VACUUM analog): physically delete
    snapshot directories older than the newest ``keep_versions``
    versions and drop them from the manifest, returning the deleted
    version numbers.

    The manifest commits BEFORE the directories are removed — the same
    order Delta's tombstone-then-delete protocol uses — so a crash
    mid-vacuum leaves unreferenced directories (harmless, re-vacuumable)
    rather than a manifest pointing at deleted data. Time travel
    contracts shrink accordingly: `read_version` on a vacuumed version
    raises the same not-found error as an unknown one.

    ``keep_versions`` must be >= 1; the latest snapshot is never
    deletable. At 100 TB the deletes are object-store calls per data
    file — driver-side here to match the directory-manifest scale, the
    manifest protocol is what carries over.
    """
    import shutil

    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    m = _load_manifest(table_path)
    if not m:
        raise FileNotFoundError(f"no versions at {table_path}")
    if len(m) <= keep_versions:
        return []
    drop, keep = m[:-keep_versions], m[-keep_versions:]
    _commit(table_path, keep)
    deleted = []
    for e in drop:
        d = os.path.join(table_path, e["dir"])
        shutil.rmtree(d, ignore_errors=True)
        deleted.append(e["version"])
    return deleted


def diff_versions(
    spark: SparkSession,
    table_path: str,
    keys: list[str],
    v_old: int,
    v_new: int | None = None,
) -> DataFrame:
    """Row-level diff between two snapshot versions: one row per changed
    key with change in {'added', 'removed', 'changed'} — the audit tool
    the version manifest makes cheap (what did that CDC epoch / upsert
    actually do?), and the input to an incremental downstream refresh
    (process only 'added'+'changed' keys instead of the snapshot).

    Shape: one full-outer join on the key columns; 'changed' compares
    the md5 of the concatenated non-key columns (NULL-tagged so NULL vs
    '' differ) computed executor-side — the diff never collects.
    Output: keys + (change string).
    """
    old = read_version(spark, table_path, v_old)
    new = read_version(spark, table_path, v_new)
    val_cols = [c for c in new.columns if c not in keys]

    def fp(df: DataFrame) -> DataFrame:
        tagged = [
            F.coalesce(F.concat(F.lit("v:"), F.col(c).cast("string")), F.lit("null"))
            for c in val_cols
        ]
        return df.select(
            *keys, F.md5(F.concat_ws("\x1f", *tagged)).alias("_fp")
        )

    o = fp(old).withColumnRenamed("_fp", "_fp_old")
    n = fp(new).withColumnRenamed("_fp", "_fp_new")
    joined = o.join(n, list(keys), "full_outer")
    return (
        joined.select(
            *keys,
            F.when(F.col("_fp_old").isNull(), F.lit("added"))
            .when(F.col("_fp_new").isNull(), F.lit("removed"))
            .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
            .alias("change"),
        )
        .filter(F.col("change").isNotNull())
    )


def schema_diff(
    spark: SparkSession,
    table_path: str,
    v_old: int,
    v_new: int | None = None,
) -> dict:
    """Schema evolution report between two versions: added / removed /
    type-changed columns — the compatibility gate before pointing
    readers at a new snapshot (a type change that parquet would merge
    silently is exactly what should fail loudly; cf. the tables.py
    fail-fast lesson)."""
    old = dict(read_version(spark, table_path, v_old).dtypes)
    new = dict(read_version(spark, table_path, v_new).dtypes)
    return {
        "added": sorted(set(new) - set(old)),
        "removed": sorted(set(old) - set(new)),
        "type_changed": sorted(
            {c: (old[c], new[c]) for c in set(old) & set(new) if old[c] != new[c]}
        ),
        "compatible": set(old) <= set(new)
        and all(old[c] == new[c] for c in set(old) & set(new)),
    }
