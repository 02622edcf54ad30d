from clickhouse_observability_spark.plans.explain import (
    executed_plan,
    has_broadcast_join,
    has_take_ordered,
    pushed_filters,
    read_schema_columns,
    whole_stage_codegen_spans,
)
from clickhouse_observability_spark.plans.lint import lint_errors, plan_lint

__all__ = [
    "executed_plan",
    "has_broadcast_join",
    "has_take_ordered",
    "pushed_filters",
    "read_schema_columns",
    "whole_stage_codegen_spans",
    "plan_lint",
    "lint_errors",
]
