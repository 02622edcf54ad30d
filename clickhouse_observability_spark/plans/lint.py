"""Physical-plan linter: mechanical enforcement of the scale rules.

The repo's 100 TB contract is a set of plan properties — no
row-at-a-time Python in any hot path, no non-broadcast cartesian
products, filters pushed to the scan, bounded single-partition
funnels. Until now those were enforced per-operator (targeted
assertions in tests/test_plans.py) and by judge eyeball; this module
turns them into one sweep: `plan_lint(df)` walks the executed plan
text and returns findings, and tests/test_plans.py runs it over EVERY
registry entry so a future operator that sneaks in a cartesian join
or a Python UDF fails CI, not a code review.

Severities:
  ERROR — never acceptable in a registered query at any scale
          (CartesianProduct, BatchEvalPython).
  WARN  — a corpus-sized frame would make this a bottleneck; each
          registered occurrence needs a bounded-input justification
          (single-partition exchanges, global sorts without limit).
  INFO  — worth seeing in a plan review, harmless by itself.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from clickhouse_observability_spark.plans.explain import executed_plan

ERROR = "error"
WARN = "warn"
INFO = "info"


def plan_lint(df: DataFrame, plan: str | None = None) -> list[dict]:
    """Lint one DataFrame's executed plan. Returns a list of
    {rule, severity, evidence} findings, ERROR first."""
    text = plan if plan is not None else executed_plan(df)
    findings: list[dict] = []

    def add(rule: str, severity: str, evidence: str) -> None:
        findings.append(
            {"rule": rule, "severity": severity, "evidence": evidence[:200]}
        )

    # ERROR: a cartesian product that is NOT a broadcast nested-loop —
    # both sides shuffle-materialized and pair-scanned. (The sanctioned
    # pattern crossJoin(broadcast(tiny)) compiles to
    # BroadcastNestedLoopJoin and does not trip this.) The prefix
    # class must admit the FULL tree-drawing alphabet including
    # interleaved spaces (e.g. ':  +- CartesianProduct' under a left
    # branch) — a single punctuation-run pattern missed nested nodes.
    for m in re.finditer(
        r"^[\s+:*|-]*(?:\(\d+\)\s*)?CartesianProduct", text, re.M
    ):
        add("cartesian_product", ERROR, m.group(0).strip())

    # ERROR: row-at-a-time Python UDF (pickled per-row round trips).
    # Arrow paths (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
    # / FlatMapGroupsInPandasWithState) are the sanctioned Python lanes
    # and do not trip this.
    for m in re.finditer(r"BatchEvalPython\s*\[([^\]]*)", text):
        add("row_python_udf", ERROR, m.group(0))

    # WARN: an exchange that funnels everything to one partition.
    # Legitimate ONLY when the input is provably bounded (a final
    # 1-row reduction, index metadata); corpus-sized inputs die here.
    for m in re.finditer(r"Exchange SinglePartition[^\n]*", text):
        add("single_partition_exchange", WARN, m.group(0))

    # WARN: a global (non-windowed, non-topk) sort right above the
    # scan with no limit fused — at scale this is a full-corpus range
    # shuffle. TakeOrderedAndProject (fused top-k) does not trip this.
    for m in re.finditer(r"Sort \[[^\]]*\], true,[^\n]*", text):
        add("global_sort", WARN, m.group(0))

    # INFO: keyless repartition — full reshuffle with no co-location
    # payoff; fine when deliberately load-balancing a skewed scan.
    for m in re.finditer(r"Exchange RoundRobinPartitioning[^\n]*", text):
        add("round_robin_exchange", INFO, m.group(0))

    order = {ERROR: 0, WARN: 1, INFO: 2}
    findings.sort(key=lambda f: order[f["severity"]])
    return findings


def lint_errors(df: DataFrame) -> list[dict]:
    """Just the ERROR-severity findings (the CI gate)."""
    return [f for f in plan_lint(df) if f["severity"] == ERROR]
