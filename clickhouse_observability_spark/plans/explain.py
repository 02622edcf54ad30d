"""Physical-plan introspection helpers.

The engine's performance contract is expressed as assertions over the
executed plan — filters reach the scan (PushedFilters), projections
prune the read schema (ReadSchema), small dims broadcast, top-k fuses
into TakeOrderedAndProject, hot paths stay inside WholeStageCodegen.
Tests and the bench loop both use these instead of eyeballing
`.explain()` output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions that reached the parquet scan."""
    plan = executed_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Columns actually read from parquet (column pruning check)."""
    plan = executed_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in executed_plan(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen regions (fewer, wider = better)."""
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))


def shuffle_count(df: DataFrame) -> int:
    """Exchange operators in the plan — each is a full shuffle."""
    return executed_plan(df).count("Exchange hashpartitioning") + executed_plan(
        df
    ).count("Exchange rangepartitioning")
