"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship reference query (the db.go:81-99 template
over events); queries()/oracle_sql() come from the engine's registry —
one named entry per implemented operator from SURVEY.md §2, each with
a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the engine package lives beside this file; make the import robust
# to whatever cwd the driver launches from
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from clickhouse_observability_spark import registry
from clickhouse_observability_spark.operators.query_logs import query_events
from clickhouse_observability_spark.session import ensure_utc
from clickhouse_observability_spark.sources.parquet import load_table

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: last 100 error events in January 2024 — the exact
    reference read-path template (filters + desc sort + limit)."""
    ensure_utc(spark)
    events = load_table(spark, SF0001, "events")
    return query_events(
        events, "error", "2024-01-01 00:00:00", "2024-02-01 00:00:00", limit=100
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
