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


# --------------------------------------------------------- scan budget
# Effective FileScans per input table: FileSourceScanExec nodes reachable
# WITHOUT crossing a cache boundary, plus each distinct InMemoryRelation's
# populating scan counted ONCE (an InMemoryTableScan consumer re-reads the
# cache, not the file). This is the metric that caught quality_ensemble
# re-tokenizing the corpus 8x from unpersisted multi-read lineage — a
# constant-factor waste that multiplies at 100 TB. Budget: <= 4 scans of
# any one table; queries above it are grandfathered in the allowlist
# below with their CURRENT count (the gate fails if they get WORSE) and
# should be burned down with plans.cache.scoped_persist over the shared
# frame.
_SCAN_BUDGET = 4
# name -> measured max scans per table (2026-08, sf0.001 plans); shrink,
# never grow.
_SCAN_ALLOWLIST = {
    "acf_daily": 6,
    "ann_recall": 6,
    "basket_lift": 10,
    "ccf_event_types": 12,
    "cdc_apply": 6,
    "chi_square_screen": 7,
    "cms_heavy_hitters": 5,
    "corr_matrix_lineitem": 6,
    "dunn_doclen": 10,
    "folder_children": 5,
    "funnel_steps": 6,
    "gains_deciles": 8,
    "golden_record": 6,
    "graph_rag_expansion": 5,
    "hybrid_rrf": 6,
    "ivm_join": 6,
    "ivm_join_b": 6,
    "join_size_estimate": 8,
    "kmv_source_overlap": 10,
    "kruskal_doclen": 8,
    "ks_price_drift": 8,
    "length_matching": 6,
    "lineitem_corr": 6,
    "ljung_box_daily": 7,
    "mann_kendall": 16,
    "neyman_allocation": 16,
    "pmi_bigrams": 5,
    "sliding_heavy_hitters": 7,
    "snapshot_diff": 5,
    "spearman_screen": 10,
    "textrank_keywords": 6,
    "theil_nations": 6,
    "theil_sen_trend": 11,
    "token_budget_mixture": 17,
    "trade_triangles": 14,
}


def _effective_scans(spark, jplan):
    """Count file scans that would actually execute: walk the physical
    plan (unwrapping AQE), stop at InMemoryTableScan consumers, and count
    each distinct cached relation's populating scan exactly once."""
    import re
    from collections import Counter

    jvm = spark._jvm
    acc: Counter = Counter()
    seen_caches: set = set()

    def walk(node):
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.initialPlan())
            return
        if cls == "InMemoryTableScanExec":
            rid = jvm.java.lang.System.identityHashCode(node.relation().cacheBuilder())
            if rid not in seen_caches:
                seen_caches.add(rid)
                walk(node.relation().cacheBuilder().cachedPlan())
            return
        if cls == "FileSourceScanExec":
            m = re.search(r"([a-z_0-9]+)\.parquet", node.toString().split("\n")[0])
            acc[m.group(1) if m else "?"] += 1
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        sq = node.subqueries()
        for i in range(sq.size()):
            walk(sq.apply(i))

    walk(jplan)
    return acc


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_scan_budget(spark, name):
    from morphik_core_spark.plans.cache import release_all_scoped

    try:
        df = entry_mod.queries()[name](spark, SF_DIR)
        scans = _effective_scans(spark, df._jdf.queryExecution().executedPlan())
    finally:
        release_all_scoped()
    worst = max(scans.values(), default=0)
    budget = _SCAN_ALLOWLIST.get(name, _SCAN_BUDGET)
    assert worst <= budget, (
        f"{name}: {dict(scans)} — a table is read {worst}x (budget {budget}). "
        "Persist the shared frame (plans.cache.scoped_persist) instead of "
        "re-deriving it; each extra scan is a full corpus pass at 100 TB."
    )


def test_effective_scans_detects_unpersisted_multi_read(spark):
    """The counter itself: an unpersisted frame consumed by 6 branches
    shows 6 effective scans; scoped_persist collapses them to 1 (the
    populating scan, counted once)."""
    from pyspark.sql import functions as F

    from morphik_core_spark.plans.cache import release_scoped, scoped_persist

    base = spark.read.parquet(f"{SF_DIR}/nation.parquet").select("n_nationkey")
    branches = [base.agg(F.sum(F.col("n_nationkey") + i).alias("s")) for i in range(6)]
    u = branches[0]
    for b in branches[1:]:
        u = u.unionAll(b)
    scans = _effective_scans(spark, u._jdf.queryExecution().executedPlan())
    assert scans.get("nation", 0) == 6, dict(scans)

    cached = scoped_persist(base)
    try:
        branches = [cached.agg(F.sum(F.col("n_nationkey") + i).alias("s")) for i in range(6)]
        u = branches[0]
        for b in branches[1:]:
            u = u.unionAll(b)
        scans = _effective_scans(spark, u._jdf.queryExecution().executedPlan())
        assert scans.get("nation", 0) == 1, dict(scans)
    finally:
        release_scoped()
