"""Effective-FileScan counter — the scan-amplification metric behind the
plan gate (tests/test_all_query_plans.py) and the bench sidecar.

"Effective" scans per input table = FileSourceScanExec nodes reachable in
the physical plan WITHOUT crossing a cache boundary, plus each distinct
InMemoryRelation's populating scan counted ONCE (an InMemoryTableScan
consumer re-reads the cache, not the file). This is the metric that
caught quality_ensemble re-tokenizing the corpus 8x from unpersisted
multi-read lineage — a constant-factor waste that multiplies at 100 TB.

Living here (not in tests/) so bench.py records the same number per
query per round: scan regressions show up as DATA in BENCH_DETAIL.json,
not only as a gate flip when a query crosses the budget boundary.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame, SparkSession

__all__ = ["effective_scans", "effective_scans_df", "worst_scan_count"]


def effective_scans(spark: SparkSession, jplan) -> Counter:
    """Count file scans that would actually execute: walk the physical
    plan (unwrapping AQE), stop at InMemoryTableScan consumers, and count
    each distinct cached relation's populating scan exactly once.
    Returns Counter({table_stem: n_scans})."""
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


def effective_scans_df(df: DataFrame) -> Counter:
    """Convenience wrapper: count effective scans of a DataFrame's
    executed plan (plan compilation only — no job runs)."""
    return effective_scans(df.sparkSession, df._jdf.queryExecution().executedPlan())


def worst_scan_count(df: DataFrame) -> int:
    """Max effective scans of any one input table — the number the scan
    budget gates on and the bench records per query."""
    return max(effective_scans_df(df).values(), default=0)
