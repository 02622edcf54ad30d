"""Reference-parity queries (SURVEY.md §2.2/§2.6/§2.4/§2.8) over `events`.

The driver testdata maps the logs domain onto events (FIXTURES.md §2):
event_type ≅ service/level, props ≅ attrs (JSON string), user_id ≅
attrs.user, ts ≅ ts. Each query shape below is one the reference
actually executes (db.go:81-99 template and README.md:88-107 ad-hoc
queries), re-expressed declaratively.

All events data spans 2024-01; ranges below hit every scale factor.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_observability_spark.operators.query_logs import (
    query_events,
    query_events_between,
)
from clickhouse_observability_spark.registry import register, table
from clickhouse_observability_spark.sources.parquet import load_table_ts_range

_EV_COLS = "event_id, ts, user_id, event_type, value, props"


def _events_range(spark, sf_dir, frm, to):
    """events scan with the time bounds pushed onto the raw nanos
    column (row-group skipping; see load_table_ts_range). The query
    template re-applies the same bounds post-conversion — a no-op for
    correctness, pruning for the scan."""
    return load_table_ts_range(spark, sf_dir, "events", "ts", frm, to)

# P1-P3 + O1-O3: required filters, fixed projection, desc sort, limit.
@register(
    "logs_basic",
    oracle=f"""
    SELECT {_EV_COLS} FROM events
    WHERE event_type = 'click'
      AND ts >= TIMESTAMP '2024-01-05 00:00:00'
      AND ts <  TIMESTAMP '2024-01-20 00:00:00'
    ORDER BY ts DESC, event_id DESC LIMIT 100
    """,
)
def logs_basic(spark, sf_dir):
    ev = _events_range(spark, sf_dir, "2024-01-05 00:00:00", "2024-01-20 00:00:00")
    return query_events(
        ev, "click", "2024-01-05 00:00:00", "2024-01-20 00:00:00", limit=100
    )


# + P4 analog (second equality filter: user_id) and P6 closed-range
# BETWEEN (README.md:94,104) — two filter variants of the same logs
# query, union-tagged by `variant` to share one registry slot inside
# the driver's 50-query oracle window. Both operators stay fully
# exercised (each arm keeps its own predicate, ORDER BY and LIMIT).
@register(
    "logs_filter_variants",
    oracle=f"""
    SELECT 'user_eq' AS variant, * FROM (
        SELECT {_EV_COLS} FROM events
        WHERE event_type = 'view'
          AND ts >= TIMESTAMP '2024-01-01 00:00:00'
          AND ts <  TIMESTAMP '2024-02-01 00:00:00'
          AND user_id = 7
        ORDER BY ts DESC, event_id DESC LIMIT 100
    )
    UNION ALL
    SELECT 'between', * FROM (
        SELECT {_EV_COLS} FROM events
        WHERE event_type = 'purchase'
          AND ts BETWEEN TIMESTAMP '2024-01-03 00:00:00'
                     AND TIMESTAMP '2024-01-28 00:00:00'
        ORDER BY ts DESC, event_id DESC LIMIT 50
    )
    """,
)
def logs_filter_variants(spark, sf_dir):
    ev = _events_range(spark, sf_dir, "2024-01-01 00:00:00", "2024-02-01 00:00:00")
    user_eq = query_events(
        ev, "view", "2024-01-01 00:00:00", "2024-02-01 00:00:00",
        user_id=7, limit=100,
    ).select(F.lit("user_eq").alias("variant"), "*")
    between = query_events_between(
        table(spark, sf_dir, "events"),
        "purchase",
        "2024-01-03 00:00:00",
        "2024-01-28 00:00:00",
        limit=50,
    ).select(F.lit("between").alias("variant"), "*")
    return user_eq.unionByName(between)


# + P5: JSON-path predicate (JSONExtractString ≅ get_json_object, F1).
@register(
    "logs_json_attr",
    oracle=f"""
    SELECT {_EV_COLS} FROM events
    WHERE event_type = 'error'
      AND ts >= TIMESTAMP '2024-01-01 00:00:00'
      AND ts <  TIMESTAMP '2024-02-01 00:00:00'
      AND json_extract_string(props, '$.k') = '42'
    ORDER BY ts DESC, event_id DESC LIMIT 100
    """,
)
def logs_json_attr(spark, sf_dir):
    ev = _events_range(spark, sf_dir, "2024-01-01 00:00:00", "2024-02-01 00:00:00")
    return query_events(
        ev, "error", "2024-01-01 00:00:00", "2024-02-01 00:00:00",
        prop_key="k", prop_value="42", limit=100,
    )


# A1: COUNT(*) full table (README.md:91-92).
@register("logs_count", oracle="SELECT count(*) AS n FROM events")
def logs_count(spark, sf_dir):
    return table(spark, sf_dir, "events").agg(F.count(F.lit(1)).alias("n"))


# DESCRIBE-style schema query (reference README.md:97-98 `DESCRIBE
# logs`): column name/type/position as a result set from the engine's
# own schema metadata. Oracle-backed since r12 (verdict #5): DuckDB's
# information_schema over the same registered view, its type names
# mapped onto Spark's (BIGINT->bigint, VARCHAR->string, ...) — the
# deterministic residue rule: if the output is derivable by plain
# SQL, it gets an oracle. test_query_logs keeps the original pytest
# comparison too.
@register(
    "schema_describe_events",
    oracle="""
    SELECT column_name AS name,
           CASE data_type
                WHEN 'BIGINT' THEN 'bigint'
                WHEN 'DOUBLE' THEN 'double'
                WHEN 'VARCHAR' THEN 'string'
                WHEN 'TIMESTAMP' THEN 'timestamp'
                ELSE lower(data_type) END AS type,
           CAST(ordinal_position AS BIGINT) AS pos
    FROM information_schema.columns WHERE table_name = 'events'
    """,
)
def schema_describe_events(spark, sf_dir):
    df = table(spark, sf_dir, "events")
    rows = [(n, t, i + 1) for i, (n, t) in enumerate(df.dtypes)]
    return spark.createDataFrame(rows, "name string, type string, pos long")
