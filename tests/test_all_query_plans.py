"""Meta plan audit: EVERY driver query's physical plan, automatically.

Two invariants that must hold across the whole `queries()` surface, not
just the operators with dedicated plan tests:

- no `CartesianProduct` — scalar/1-row attachments compile to
  BroadcastNestedLoopJoin, which is fine; an actual cartesian of two
  real frames is always a bug at scale;
- no `BatchEvalPython` — row-at-a-time Python never appears in a query
  plan (Arrow-batched pandas nodes are the sanctioned Python path);
- no `DecimalType` OUTPUT column — DECIMAL is encouraged internally for
  exact arithmetic, but the harness value-hash renders decimals
  differently between its Spark and DuckDB fetch paths (round-5
  driver-red on `moving_aggregates` et al.), so every final output
  column must be cast DOUBLE+ROUND at the edge.

New queries inherit the audit the moment they're registered.
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import DecimalType

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_no_cartesian_no_row_python(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF in plan"
    decimal_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
    assert not decimal_cols, (
        f"{name}: DECIMAL-typed output column(s) {decimal_cols} — cast to "
        "DOUBLE with an explicit ROUND at the output edge (keep DECIMAL "
        "internally); the harness hash diverges on decimal rendering"
    )
