"""The reference's entire read-path query surface, as one declarative plan.

Reference template (internal/db/db.go:81-99), built there by SQL
string concatenation with dynamically-optional predicates:

    SELECT ts, service, level, msg, attrs, trace_id, span_id   -- P1
    FROM logs
    WHERE service = ?                                          -- P2
      AND ts >= ? AND ts < ?                                   -- P3 (closed-open)
      [AND level = ?]                                          -- P4 (optional)
      [AND JSONExtractString(attrs,'user') = ?]                -- P5 (optional)
    ORDER BY ts DESC                                           -- O1
    LIMIT ?                                                    -- O2/O3

Spark-first notes:
- The whole template is scan -> filter -> select -> orderBy -> limit.
  Catalyst pushes the filters into the Parquet scan (PushedFilters)
  and fuses sort+limit into TakeOrderedAndProject — the distributed
  top-k keeps only `limit` rows per partition, so the plan's shuffle
  is O(limit × partitions), not O(rows). No custom code needed.
- Partition pruning: the at-rest table is directory-partitioned by
  month=toYYYYMM(ts) (db.go:51). Spark cannot infer month bounds from
  a ts range, so `query_logs` derives the month predicate itself —
  the one piece of logic ClickHouse got from its DDL that we must add
  (SURVEY.md §4). At 100 TB this is the difference between scanning
  one month and scanning all of them.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clickhouse_observability_spark.functions.json_attrs import attrs_get
from clickhouse_observability_spark.schema import LOGS_COLUMNS, PARTITION_COLUMN

TsLike = "str | dt.datetime | Column"


def _ts_lit(v) -> Column:
    if isinstance(v, Column):
        return v
    if isinstance(v, dt.datetime):
        return F.lit(v)
    return F.to_timestamp(F.lit(v))


def _month_int(v) -> int | None:
    """yyyyMM bound for a python-side literal; None if not derivable."""
    if isinstance(v, dt.datetime):
        return v.year * 100 + v.month
    if isinstance(v, str):
        try:
            d = dt.datetime.fromisoformat(v.replace("Z", "+00:00"))
        except ValueError:
            return None
        return d.year * 100 + d.month
    return None


def query_logs(
    logs: DataFrame,
    service: str,
    frm,
    to,
    level: str | None = None,
    user: str | None = None,
    limit: int = 100,
    ts_tiebreak: Column | None = None,
) -> DataFrame:
    """db.go:81-99 template over a logs-schema DataFrame.

    `frm`/`to` are closed-open ([frm, to)), matching `ts >= ? AND
    ts < ?` with UTC normalization done by the session timezone
    (api.go:66-67). If the frame carries the write-path `month`
    partition column, a derived month-range predicate is added so the
    scan prunes partition directories.
    """
    frm_c, to_c = _ts_lit(frm), _ts_lit(to)
    df = logs.filter(F.col("service") == service)  # P2
    df = df.filter((F.col("ts") >= frm_c) & (F.col("ts") < to_c))  # P3
    if PARTITION_COLUMN in logs.columns:
        lo, hi = _month_int(frm), _month_int(to)
        if lo is not None and hi is not None:
            df = df.filter(F.col(PARTITION_COLUMN).between(lo, hi))
    if level:  # P4
        df = df.filter(F.col("level") == level)
    if user:  # P5
        df = df.filter(attrs_get("attrs", "user") == user)
    order = [F.col("ts").desc()]
    if ts_tiebreak is not None:
        order.append(ts_tiebreak)
    return df.select(*LOGS_COLUMNS).orderBy(*order).limit(int(limit))  # P1,O1-O3


def query_events(
    events: DataFrame,
    event_type: str,
    frm,
    to,
    user_id: int | None = None,
    prop_key: str | None = None,
    prop_value: str | None = None,
    limit: int = 100,
) -> DataFrame:
    """The same template mapped onto the driver's `events` table
    (FIXTURES.md §2: event_type ≅ service/level, props ≅ attrs,
    user_id ≅ attrs.user). Deterministic tie-break on event_id so
    LIMIT is stable across engines.
    """
    frm_c, to_c = _ts_lit(frm), _ts_lit(to)
    df = events.filter(F.col("event_type") == event_type)
    df = df.filter((F.col("ts") >= frm_c) & (F.col("ts") < to_c))
    if user_id is not None:
        df = df.filter(F.col("user_id") == int(user_id))
    if prop_key is not None and prop_value is not None:
        df = df.filter(attrs_get("props", prop_key) == prop_value)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    return (
        df.select(*cols)
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(int(limit))
    )


def query_events_between(
    events: DataFrame, event_type: str, a, b, limit: int = 100
) -> DataFrame:
    """Closed-range variant `ts BETWEEN ? AND ?` (P6, README.md:94,104)."""
    df = events.filter(F.col("event_type") == event_type).filter(
        F.col("ts").between(_ts_lit(a), _ts_lit(b))
    )
    return (
        df.select("event_id", "ts", "user_id", "event_type", "value", "props")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(int(limit))
    )
