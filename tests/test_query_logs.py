"""Read-path template tests (P1-P6, O1-O3, F1) — SURVEY.md §2.2/§2.6.

Fixture rows follow FIXTURES.md §1 (the reference README's canonical
smoke rows: README.md:85).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from clickhouse_observability_spark.operators.query_logs import query_events, query_logs
from clickhouse_observability_spark.schema import LOGS_SCHEMA


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def logs_df(spark):
    rows = [
        (_ts("2025-09-01T20:05:00"), "orders", "WARN", "Order 12346 has pending items",
         '{"order_id": "12346", "pending_items": "2", "user": "jane.smith"}', "trace-124", "span-458"),
        (_ts("2025-09-01T20:06:00"), "orders", "INFO", "ok", '{"user": "bob"}', "trace-125", "span-1"),
        (_ts("2025-09-01T20:07:00"), "orders", "ERROR", "boom", "{}", "trace-126", "span-2"),
        (_ts("2025-08-15T10:00:00"), "orders", "WARN", "old month", '{"user": "jane.smith"}', "t", "s"),
        (_ts("2025-09-01T20:05:30"), "payments", "WARN", "other service", '{"user": "jane.smith"}', "t2", "s2"),
        (_ts("2025-09-01T23:59:59"), "orders", "INFO", "edge", "", "t3", "s3"),
    ]
    return spark.createDataFrame(rows, LOGS_SCHEMA)


def test_template_service_and_range(logs_df):
    out = query_logs(logs_df, "orders", "2025-09-01 00:00:00", "2025-09-02 00:00:00")
    rows = out.collect()
    assert [r.msg for r in rows] == [
        "edge", "boom", "ok", "Order 12346 has pending items",
    ]  # ORDER BY ts DESC
    assert out.columns == ["ts", "service", "level", "msg", "attrs", "trace_id", "span_id"]


def test_range_is_closed_open(logs_df):
    # ts >= from AND ts < to (db.go:84): row at exactly `to` excluded.
    out = query_logs(logs_df, "orders", "2025-09-01 20:05:00", "2025-09-01 20:07:00")
    assert {r.msg for r in out.collect()} == {"Order 12346 has pending items", "ok"}


def test_optional_level_filter(logs_df):
    out = query_logs(logs_df, "orders", "2025-09-01 00:00:00", "2025-09-02 00:00:00", level="WARN")
    assert [r.msg for r in out.collect()] == ["Order 12346 has pending items"]


def test_json_user_predicate(logs_df):
    out = query_logs(
        logs_df, "orders", "2025-08-01 00:00:00", "2025-10-01 00:00:00", user="jane.smith"
    )
    assert [r.msg for r in out.collect()] == ["Order 12346 has pending items", "old month"]


def test_limit(logs_df):
    out = query_logs(logs_df, "orders", "2025-08-01 00:00:00", "2025-10-01 00:00:00", limit=2)
    assert out.count() == 2


def test_empty_attrs_no_match(logs_df):
    # get_json_object on "" / "{}" yields NULL -> excluded, matching
    # ClickHouse JSONExtractString("")="" vs non-empty literal.
    out = query_logs(
        logs_df, "orders", "2025-09-01 00:00:00", "2025-09-02 00:00:00", user="nobody"
    )
    assert out.count() == 0


def test_query_events_against_testdata(spark, sf_small):
    from clickhouse_observability_spark.sources.parquet import load_table

    events = load_table(spark, sf_small, "events")
    out = query_events(events, "error", "2024-01-01 00:00:00", "2024-02-01 00:00:00", limit=10)
    rows = out.collect()
    assert 0 < len(rows) <= 10
    ts_list = [r.ts for r in rows]
    assert ts_list == sorted(ts_list, reverse=True)
    assert all(r.event_type == "error" for r in rows)


def test_topk_plan_is_take_ordered(spark, sf_small):
    # O3: sort+limit must fuse into TakeOrderedAndProject, not a global sort.
    from clickhouse_observability_spark.sources.parquet import load_table

    events = load_table(spark, sf_small, "events")
    out = query_events(events, "error", "2024-01-01 00:00:00", "2024-02-01 00:00:00", limit=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_filter_pushdown_reaches_scan(spark, sf_small):
    from clickhouse_observability_spark.sources.parquet import load_table

    events = load_table(spark, sf_small, "events")
    out = events.filter(F.col("event_type") == "error").select("event_id", "event_type")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "event_type" in plan


def test_schema_describe_matches_duckdb(spark, sf_small):
    # DESCRIBE parity (reference README.md:97-98): the engine's schema
    # result set equals DuckDB's information_schema over the same
    # parquet, modulo the documented type-name mapping.
    import duckdb

    from clickhouse_observability_spark.queries.parity import schema_describe_events

    got = [(r.name, r.type, r.pos)
           for r in schema_describe_events(spark, sf_small).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_small}/events.parquet'"
    )
    duck_to_spark = {"BIGINT": "bigint", "VARCHAR": "string",
                     "DOUBLE": "double", "TIMESTAMP": "timestamp"}
    exp = [(name, duck_to_spark[dtype], pos) for name, dtype, pos in con.execute(
        "SELECT column_name, data_type, ordinal_position::BIGINT "
        "FROM information_schema.columns WHERE table_name = 'events' "
        "ORDER BY 3"
    ).fetchall()]
    assert got == exp
