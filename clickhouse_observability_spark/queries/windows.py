"""EXT window-function queries with DuckDB oracles (SURVEY.md §2.5 EXT)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_observability_spark.operators import analytics as A
from clickhouse_observability_spark.registry import register, table


@register(
    "window_topn_per_type",
    oracle="""
    SELECT event_type, rn, event_id, ts, user_id, value FROM (
        SELECT event_type, event_id, ts, user_id, value,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ) WHERE rn <= 5
    """,
)
def window_topn_per_type(spark, sf_dir):
    return A.top_n_per_type(table(spark, sf_dir, "events"), n=5)


@register(
    "window_user_gaps",
    oracle="""
    SELECT user_id, event_id, ts,
           epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           )) AS gap_us
    FROM events WHERE event_type = 'click'
    """,
)
def window_user_gaps(spark, sf_dir):
    # NOTE: the lag window runs over click rows only (filter first),
    # matching the oracle's WHERE-before-OVER evaluation order.
    ev = table(spark, sf_dir, "events")
    return A.user_activity_gaps(ev, "click")


@register(
    "asof_click_before_purchase",
    oracle="""
    WITH tagged AS (
        SELECT user_id AS _k, ts AS _ts, 1 AS _side,
               event_id, ts, value, NULL::BIGINT AS _val
        FROM events WHERE event_type = 'purchase'
        UNION ALL
        SELECT user_id, ts, 0, NULL, NULL, NULL, event_id
        FROM events WHERE event_type = 'click'
    )
    SELECT event_id, ts, user_id, value, last_click_id FROM (
        SELECT event_id, ts, _k AS user_id, value, _side,
               last_value(_val IGNORE NULLS) OVER (
                   PARTITION BY _k ORDER BY _ts, _side
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS last_click_id
        FROM tagged
    ) WHERE _side = 1
    """,
)
def asof_click_before_purchase(spark, sf_dir):
    """Backward as-of join: each purchase picks up the id of the
    latest click at-or-before it by the same user."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    return A.asof_join_last_event(
        purchases, clicks, on="user_id", right_value="event_id",
        alias="last_click_id",
    ).select("event_id", "ts", "user_id", "value", "last_click_id")
