"""Compare two bench JSON files with noise-aware judgment.

Round-over-round bench analysis keeps tripping on two things: totals
that aren't comparable because the query set grew, and single-run noise
on this host (measured ~1.3x on sub-2s queries, NOTES.md). This tool
does the comparison the honest way:

- totals are recomputed over the SHARED query set only;
- per-query ratios are flagged only beyond a noise threshold (default
  1.5x) AND an absolute floor (default 0.3s delta) so microsecond
  wobble never pages anyone;
- added/removed queries are listed separately, never folded into totals.

Usage: python scripts/bench_compare.py OLD.json NEW.json [--threshold 1.5]
Accepts either the driver's BENCH_r*.json wrapper (with "parsed") or
bench.py's raw one-line output. Prints one JSON doc.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]
    if "queries" not in doc:
        raise SystemExit(f"{path}: no 'queries' key — not a bench file")
    return doc


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--abs-floor", type=float, default=0.3)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    regressions, improvements = [], []
    for name in shared:
        a, b = oq[name], nq[name]
        if a <= 0:
            continue
        ratio = b / a
        if ratio >= args.threshold and b - a >= args.abs_floor:
            regressions.append({"query": name, "old": a, "new": b, "ratio": round(ratio, 2)})
        elif ratio <= 1 / args.threshold and a - b >= args.abs_floor:
            improvements.append({"query": name, "old": a, "new": b, "ratio": round(ratio, 2)})

    shared_old = round(sum(oq[n] for n in shared), 3)
    shared_new = round(sum(nq[n] for n in shared), 3)
    out = {
        "shared_queries": len(shared),
        "shared_total_old": shared_old,
        "shared_total_new": shared_new,
        "shared_ratio": round(shared_new / shared_old, 3) if shared_old else None,
        "regressions": sorted(regressions, key=lambda r: -r["ratio"]),
        "improvements": sorted(improvements, key=lambda r: r["ratio"]),
        "added": {n: nq[n] for n in added},
        "removed": {n: oq[n] for n in removed},
        "incomplete_old": bool(old.get("errors")),
        "incomplete_new": bool(new.get("errors")),
    }
    json.dump(out, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
