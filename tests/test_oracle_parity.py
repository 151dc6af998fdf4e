"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry through Spark AND its ``oracle_sql()`` through
DuckDB on the same parquet tables, then compares row count, column names, and
exact values (order-insensitive). The driver does the same at sf0.01 with a
value hash, so EXACT equality (not approx) is what we assert here.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from morphik_core_spark.sources.tables import TABLES

# default sf0.001 for speed; CI-equivalent gate runs at sf0.01
SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(rows, columns):
    """Sort columns by name and rows by value so comparison is order-free."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # collapse -0.0 vs 0.0 and format stably
            return repr(v + 0.0)
        return repr(v)

    out = [tuple(norm_cell(row[i]) for i in idx) for row in rows]
    return sorted(out), [columns[i] for i in idx]


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    if sql is None:
        # non-SQL-expressible op: weaker rows-only check, like the driver
        assert len(spark_rows) >= 0
        return

    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"

    s_norm, cols = _normalize(spark_rows, spark_cols)
    d_norm, _ = _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
    assert not mismatches, f"{name}: first value mismatches (spark vs duck): {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["document_id", "score"]


# ops whose kernel is genuinely not SQL-expressible (driver records the
# weaker rows-only check for these)
ROWS_ONLY = {"chunk_stats"}


def test_every_query_has_oracle_or_is_declared():
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    missing = [k for k in qs if k not in os_ and k not in ROWS_ONLY]
    assert not missing, f"queries without oracle SQL: {missing}"


def test_no_hugeint_or_decimal_oracle_result_types(duck):
    """The driver hashes TYPED values; DuckDB's untyped SUM(BIGINT) returns
    HUGEINT (int128) and DECIMAL survives division-free pipelines, so either
    in an oracle's RESULT schema hash-mismatches against Spark even when all
    values are equal (round-5 decimal reds; round-7 HUGEINT reds). The local
    replica can't see this because fetchall() collapses HUGEINT->int, so gate
    the bound result types directly: every aggregate an oracle returns must be
    CAST at the oracle edge (NOTES.md convention).
    """
    banned = ("HUGEINT", "DECIMAL", "UHUGEINT")
    offenders = []
    for name, sql in sorted(entry_mod.oracle_sql().items()):
        types = [str(t).upper() for t in duck.sql(sql).types]
        bad = [
            (c, t)
            for c, t in zip(duck.sql(sql).columns, types)
            if any(b in t for b in banned)
        ]
        if bad:
            offenders.append((name, bad))
    assert not offenders, f"oracle result columns with driver-unsafe types: {offenders}"
