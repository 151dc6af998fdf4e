"""Physical-plan audit: walk a DataFrame's executed plan and report the
patterns that kill jobs at 100 TB — as a library API, so pipelines can
CI-gate their own queries the way tests/test_all_query_plans.py gates
this repo's driver surface.

Each finding is (severity, rule, detail). ``error`` findings are the
always-bugs (cartesian of real frames, row-at-a-time Python); ``warn``
findings are legitimate-in-context shapes (unpartitioned window over a
dimension table, nested-loop broadcast of a one-row scalar) that the
caller should consciously accept — the audit makes the acceptance
explicit instead of silent.

This reads plan STRINGS, not internals: the node names asserted here
(`CartesianProduct`, `BatchEvalPython`, `Exchange`, ...) are the stable
physical-operator names Spark has printed for years, the same contract
the repo's plan tests rely on (NOTES.md: assert on node names, never on
formatting).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

__all__ = ["PlanFinding", "audit_plan", "assert_plan_clean"]


@dataclass(frozen=True)
class PlanFinding:
    severity: str  # "error" | "warn"
    rule: str
    detail: str


def _plan_strings(df: DataFrame) -> tuple[str, str]:
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString(), qe.optimizedPlan().toString()


def audit_plan(
    df: DataFrame,
    *,
    max_exchanges: int | None = None,
) -> list[PlanFinding]:
    """Audit ``df``'s physical plan. Triggers analysis/planning but runs
    nothing. Rules:

    - error `cartesian`: a `CartesianProduct` node — two real frames
      without a join key; at scale this is |A|x|B| work, always a bug.
    - error `row-python`: `BatchEvalPython` — row-at-a-time Python UDF;
      Arrow-batched pandas nodes (`ArrowEvalPython`, `MapInPandas`,
      `FlatMapGroupsInPandas`) are the sanctioned Python path and do
      not trigger this.
    - warn `nested-loop`: `BroadcastNestedLoopJoin` — fine when one side
      is a one-row scalar/sketch attachment (this repo's global-average
      and bloom-bits patterns), fatal if both sides are real tables.
    - warn `global-window`: a window with an empty partition spec
      funnels everything through ONE task — fine for dimension-sized
      exact-rank reports (`balance_deciles`), wrong for facts.
    - warn `exchange-budget` (only when ``max_exchanges`` given): more
      shuffles than the caller budgeted for this query.
    """
    executed, optimized = _plan_strings(df)
    findings: list[PlanFinding] = []

    if "CartesianProduct" in executed:
        findings.append(
            PlanFinding("error", "cartesian", "CartesianProduct of real frames")
        )
    if "BatchEvalPython" in executed:
        findings.append(
            PlanFinding("error", "row-python", "row-at-a-time Python UDF in plan")
        )
    if "BroadcastNestedLoopJoin" in executed:
        findings.append(
            PlanFinding(
                "warn",
                "nested-loop",
                "BroadcastNestedLoopJoin — acceptable only for one-row/"
                "sketch-sized broadcast attachments",
            )
        )
    # the optimized plan prints `Window [exprs], [partition], [order]`
    # — three bracketed lists — for partitioned windows and only TWO
    # (`[exprs], [order]`) when PARTITION BY is empty (verified against
    # Spark 4.1; the same omission WindowExec warns about at runtime)
    for line in optimized.splitlines():
        ls = line.strip().lstrip("+-: ")
        if ls.startswith("Window ") and ls.count("], [") < 2:
            findings.append(
                PlanFinding(
                    "warn",
                    "global-window",
                    "window with empty PARTITION BY — single-task sort",
                )
            )
            break
    if max_exchanges is not None:
        n = executed.count("Exchange")
        if n > max_exchanges:
            findings.append(
                PlanFinding(
                    "warn",
                    "exchange-budget",
                    f"{n} Exchange nodes (budget {max_exchanges})",
                )
            )
    return findings


def assert_plan_clean(df: DataFrame, *, allow_warnings: bool = True) -> None:
    """Raise AssertionError on audit errors (and on warnings unless
    ``allow_warnings``) — the one-liner for CI gates."""
    findings = audit_plan(df)
    bad = [
        f
        for f in findings
        if f.severity == "error" or not allow_warnings
    ]
    if bad:
        raise AssertionError(
            "; ".join(f"[{f.severity}] {f.rule}: {f.detail}" for f in bad)
        )
