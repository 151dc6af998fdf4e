"""Round-11 optimization profiler: isolate queries, time them, dump plans.

Times each named query with the noop sink (guide §1.4), min of N runs with
scoped-persist/cache cleanup between runs (same methodology as bench.py),
and optionally writes `.explain("formatted")` to plans/r12/<name>_<tag>.txt
so before/after plan claims are auditable.

Usage:
    python scripts/profile_r12.py q1 q2 ...          # time only
    python scripts/profile_r12.py --plans before q1  # also dump plans
    python scripts/profile_r12.py --runs 3 q1
    python scripts/profile_r12.py --all              # every registry query
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS_DIR = os.path.join(REPO, "plans", "r12")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="tag: write plans/r12/<name>_<tag>.txt")
    args = ap.parse_args()

    import __spark_entry__ as em
    from morphik_core_spark.plans.cache import release_all_scoped
    from morphik_core_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_r12")
    qs = em.queries()
    names = list(qs) if args.all else args.names
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # same warmup as bench.py so first-touch costs don't pollute timings
    qs["status_counts"](spark, sf_dir).count()
    for warm in (em._query_vector, em._hyperplanes, em._centroids):
        try:
            warm(spark, sf_dir)
        except Exception:
            pass

    def cleanup():
        release_all_scoped()
        spark.catalog.clearCache()

    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        if args.plans:
            os.makedirs(PLANS_DIR, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLANS_DIR, f"{name}_{args.plans}.txt"), "w") as fh:
                fh.write(plan)
            cleanup()
        samples = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"r12:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            cleanup()
        out[name] = round(min(samples), 4)
        print(f"{name}: {out[name]}  (samples: {[round(s, 3) for s in samples]})", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
