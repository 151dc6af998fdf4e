"""Compute the next round's `_DRIVER_WINDOW` (the 50 queries the driver's
CORRECTNESS gate checks).

Policy, per NOTES.md's rotation bookkeeping:
1. RED rows from the latest CORRECTNESS file stay in the window (a fix
   must be proven by a green driver row, not just locally).
2. The remaining slots fill with never-driver-checked queries (union of
   all CORRECTNESS_r*.json keys vs the current `queries()` registry),
   in registry order.
3. Prints the window as a ready-to-paste Python list plus the carry-over
   pool for the round after.

Run: python scripts/rotate_window.py   (from the repo root)
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def main() -> None:
    spec = importlib.util.spec_from_file_location("entry", "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    registry = list(mod.queries().keys())

    files = sorted(glob.glob("CORRECTNESS_r*.json"))
    if not files:
        print("no CORRECTNESS files; window = first 50 registry entries")
        window = registry[:WINDOW]
    else:
        checked: set[str] = set()
        for f in files:
            checked |= set(json.load(open(f)).keys())
        latest = json.load(open(files[-1]))
        red = [
            k
            for k, v in latest.items()
            if k in registry
            and not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match"))
        ]
        never = [q for q in registry if q not in checked]
        window = red + [q for q in never if q not in red][: WINDOW - len(red)]
        carry = [q for q in never if q not in window]
        print(f"latest file: {files[-1]}  red: {len(red)} {red}")
        print(f"never-checked: {len(never)}; window fills {len(window)}; carry: {len(carry)}")
        print("carry-over pool:", carry)
    print("\n_DRIVER_WINDOW = [")
    for name in window:
        print(f'    "{name}",')
    print("]")


if __name__ == "__main__":
    main()
