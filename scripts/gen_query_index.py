"""Regenerate QUERY_INDEX.md from the queries() registry docstrings."""
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as e

qs = e.queries()
lines = [
    "# QUERY_INDEX — the driver-contract surface, generated from `__spark_entry__.py`",
    "",
    f"{len(qs)} queries, every one with a DuckDB oracle twin. Regenerate with",
    "`python scripts/gen_query_index.py` after adding queries.",
    "",
    "| # | query | what it checks |",
    "|---|---|---|",
]
for i, (name, fn) in enumerate(sorted(qs.items()), 1):
    doc = inspect.getdoc(fn) or ""
    summary = " ".join(doc.split()).replace("|", "\\|")
    if len(summary) > 220:
        summary = summary[:217] + "..."
    lines.append(f"| {i} | `{name}` | {summary} |")
out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERY_INDEX.md")
with open(out, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {out} ({len(qs)} queries)")
