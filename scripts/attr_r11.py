"""Round-11 session-2 attribution: jobs/stages + construction vs execution.

Host noise makes absolute timings unreliable, so this sweep records the
NOISE-IMMUNE structure of every registry query alongside timings:

- cj: Spark jobs launched during DataFrame CONSTRUCTION (fn(spark, sf_dir))
      — each is a driver round-trip paid inside bench.py's clock per sample;
- ej: jobs launched by the noop-sink execution;
- es: total stages across those execution jobs (scheduling cost proxy);
- c/e: min-of-N construction/execution seconds (noisy, secondary).

Job/stage counts come from the status tracker via per-phase job groups, so
they are exact and deterministic for a fixed plan.

Usage:
    python scripts/attr_r11.py --all
    python scripts/attr_r11.py q1 q2 --runs 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    import __spark_entry__ as em
    from morphik_core_spark.plans.cache import release_all_scoped
    from morphik_core_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="attr_r11")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = em.queries()
    names = list(qs) if args.all else args.names
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # bench.py's warmup so first-touch costs don't pollute
    qs["status_counts"](spark, sf_dir).count()
    for warm in (em._query_vector, em._hyperplanes, em._centroids):
        try:
            warm(spark, sf_dir)
        except Exception:
            pass

    def cleanup():
        release_all_scoped()
        spark.catalog.clearCache()

    def group_counts(group: str) -> tuple[int, int]:
        jids = tracker.getJobIdsForGroup(group)
        stages = 0
        for j in jids:
            info = tracker.getJobInfo(j)
            if info is not None:
                stages += len(info.stageIds)
        return len(jids), stages

    out: dict[str, dict[str, float]] = {}
    for i, name in enumerate(names):
        fn = qs[name]
        cs, es = [], []
        cj = ej = ejs = 0
        for r in range(args.runs):
            cg, eg = f"c{r}:{name}", f"e{r}:{name}"
            sc.setJobGroup(cg, f"attr construct {name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            sc.setJobGroup(eg, f"attr execute {name}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            sc.setJobGroup(None, None)
            cs.append(t1 - t0)
            es.append(t2 - t1)
            if r == args.runs - 1:  # last run: caches warmed state == bench sample 2
                cj, _ = group_counts(cg)
                ej, ejs = group_counts(eg)
            cleanup()
        out[name] = {
            "c": round(min(cs), 4),
            "e": round(min(es), 4),
            "cj": cj,
            "ej": ej,
            "es": ejs,
        }
        print(
            f"[{i + 1}/{len(names)}] {name}: c={out[name]['c']} e={out[name]['e']} "
            f"cj={cj} ej={ej} es={ejs}",
            file=sys.stderr,
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
