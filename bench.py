"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Each query is materialized with the noop writer (full execution, no
driver-side collect overhead). Timings are per-query wall clock; "value" is
the total.

Output contract (tail-capture-proof): the FULL detail JSON (all per-query
timings) is printed first on its own line and also written to
BENCH_DETAIL.json next to this script; the LAST stdout line is a compact
summary — {"metric", "value", "unit", "sf", "queries": <slowest only>} —
guaranteed under ~1.5 KB so a bounded tail capture always retains a
parseable line containing the headline total.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import traceback

import __spark_entry__ as entry_mod
from morphik_core_spark.session import get_spark


def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="morphik_core_spark_bench")
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}

    # warm the JVM + parquet footers once so per-query numbers measure the
    # plans, not first-touch costs; same for the constant driver-side
    # lookups (query vector, LSH hyperplanes) that parameterize queries.
    # Warmup failures are non-fatal (queries just pay their own first-touch)
    # and isolated per step, so one broken warmup can't skip the rest; the
    # JSON records which failed so timings are auditable across rounds.
    warmup_failed: list[str] = []
    for wname, wfn in [
        ("status_counts", lambda: entry_mod.queries()["status_counts"](spark, sf_dir).count()),
        ("query_vector", lambda: entry_mod._query_vector(spark, sf_dir)),
        ("hyperplanes", lambda: entry_mod._hyperplanes(spark, sf_dir)),
        ("centroids", lambda: entry_mod._centroids(spark, sf_dir)),
    ]:
        try:
            wfn()
        except Exception:
            warmup_failed.append(wname)
            print(f"bench: warmup {wname} failed (continuing)", file=sys.stderr)

    from morphik_core_spark.plans.cache import release_all_scoped

    def cleanup() -> None:
        # release operator-scoped persists and anything else cached so no
        # query's timing rides another's leaked partitions (the round-5
        # bench measured 1.7-2x diffuse inflation from exactly this) and
        # executor storage stays flat across the 199x2 executions
        release_all_scoped()
        spark.catalog.clearCache()

    def timed(fn) -> float:
        # min of two runs, plus an ADAPTIVE third when the two samples
        # disagree by >25%: the first run can absorb scheduler/JIT noise
        # (observed ±60% variance on single runs), and two agreeing
        # samples were still not enough to reject a sustained host-load
        # burst (the round-9 driver bench had a multi-minute spike window
        # contaminating five consecutive queries — exactly the case where
        # the two samples DISAGREE and the third breaks the tie). The
        # adaptive form keeps total wall-clock near min-of-two on a quiet
        # host instead of paying +50% on every query. Cache state is
        # reset outside the clock, so every run is cold-cache and
        # measures the plan, not a predecessor's leftovers.
        samples = []
        for _ in range(2):
            start = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - start)
            cleanup()
        if abs(samples[0] - samples[1]) > 0.25 * min(samples):
            start = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - start)
            cleanup()
        return round(min(samples), 4)

    def timed_safe(name: str, fn) -> None:
        # one broken query must never zero the whole bench round — record
        # the error, keep the JSON line parseable, and keep going
        try:
            timings[name] = timed(fn)
        except Exception:
            errors[name] = traceback.format_exc(limit=3).splitlines()[-1][:300]
            print(f"bench: {name} failed: {errors[name]}", file=sys.stderr)

    # per-query effective-scan counts (worst table) ride along in the
    # detail JSON so scan regressions show up as data round over round,
    # not only as the plan gate flipping at the budget boundary. Plan
    # compilation only — no job runs — but construction isn't free for
    # every query (some collect bounded driver-side params), so it's
    # measured OUTSIDE the timing clock and isolated per query.
    from morphik_core_spark.plans.scan_audit import worst_scan_count

    scan_counts: dict[str, int] = {}

    def audit_scans(name: str, fn) -> None:
        try:
            scan_counts[name] = worst_scan_count(fn(spark, sf_dir))
        except Exception:
            scan_counts[name] = -1  # construction failed; error captured by timing
        finally:
            cleanup()

    for name, fn in entry_mod.queries().items():
        timed_safe(name, lambda fn=fn: _materialize(fn(spark, sf_dir)))
        audit_scans(name, fn)

    timed_safe("entry_flagship", lambda: entry_mod.entry(spark).collect())

    # ingestion throughput: clean -> chunk -> embed over the documents
    # table (the reference's north-star batch pipeline)
    from pyspark.sql import functions as F

    from morphik_core_spark.sources.tables import load_table
    from morphik_core_spark.streaming.ingestion import ingest_batch

    def run_ingest():
        raw = load_table(spark, "documents", sf_dir).select(
            F.col("doc_id").cast("string").alias("external_id"),
            F.lit(None).cast("string").alias("filename"),
            F.lit("text/plain").alias("content_type"),
            "text",
            F.lit(None).cast("string").alias("metadata"),
            F.col("source").alias("app_id"),
            F.lit(None).cast("string").alias("folder_path"),
        )
        documents, chunks = ingest_batch(raw, chunk_size=512, chunk_overlap=64)
        _materialize(chunks)

    timed_safe("ingest_pipeline", run_ingest)

    # a partial round must never look like a faster one: with any query
    # broken the total is incomparable across rounds, so report null
    # (per-query timings remain for the queries that did run)
    total = round(sum(timings.values()), 4) if not errors else None

    detail = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "scans": scan_counts,
        "sf": sf,
    }
    if errors:
        detail["errors"] = errors
        detail["incomplete"] = True
    if warmup_failed:
        detail["warmup_failed"] = warmup_failed

    # full detail: own stdout line + sidecar file (survives any tail window)
    print(json.dumps(detail))
    try:
        sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
        with open(sidecar, "w") as fh:
            json.dump(detail, fh)
    except OSError:
        pass  # read-only checkout must not break the bench

    # LAST line = compact summary, capped well under the driver's tail
    # capture so the headline total is always parseable. Only the slowest
    # queries ride along inline; the rest live in the detail line/sidecar.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    summary = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "detail": "BENCH_DETAIL.json",
        "queries": {},
    }
    budget = 1500  # bytes; tail capture observed at 2000
    for name, secs in slowest.items():
        summary["queries"][name] = secs
        if len(json.dumps(summary)) > budget:
            del summary["queries"][name]
            summary["queries_truncated"] = True
            break
    if errors:
        summary["incomplete"] = True
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
