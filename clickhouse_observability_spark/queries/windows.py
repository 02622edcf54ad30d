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
    "window_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, event_id, ts,
               -- windowed sum() widens to HUGEINT in DuckDB; cast the
               -- result to BIGINT to hash-match Spark's long.
               (sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ))::BIGINT AS session_no
        FROM flagged
    )
    SELECT user_id, session_no, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sess GROUP BY user_id, session_no
    """,
)
def window_sessionize(spark, sf_dir):
    """Batch sessionization: a >30-minute gap starts a new session;
    session ids come from a cumulative sum over the gap flags — the
    lag + running-sum idiom, one shuffle on user_id serving both
    windows, then a per-session aggregate."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = flagged.withColumn("session_no", F.sum("new_sess").over(cum))
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "window_rank_suite",
    oracle="""
    SELECT event_id, event_type,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile,
           round(cume_dist() OVER w, 6) AS cdist,
           round(value - avg(value) OVER (PARTITION BY event_type), 4) AS delta_from_mean
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id ASC)
    """,
)
def window_rank_suite(spark, sf_dir):
    """The full ranking-function family over one window, plus an
    unbounded-frame analytic (delta from the partition mean) — one
    shuffle on the partition key serves all six functions."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    wa = Window.partitionBy("event_type")
    return ev.select(
        "event_id",
        "event_type",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.round(F.col("value") - F.avg("value").over(wa), 4).alias("delta_from_mean"),
    )


@register(
    "join_trace_correlation",
    oracle="""
    SELECT e.event_id AS error_id, e.ts AS error_ts, e.user_id,
           count(*) AS n_context_events
    FROM events e JOIN events c
      ON e.user_id = c.user_id
     AND c.ts >= e.ts - INTERVAL 5 MINUTE AND c.ts < e.ts
     AND c.event_type <> 'error'
    WHERE e.event_type = 'error'
    GROUP BY e.event_id, e.ts, e.user_id
    """,
)
def join_trace_correlation(spark, sf_dir):
    """Trace-correlation self-join (SURVEY.md §2.3 EXT): for each
    error, count the same user's activity in the 5 minutes before —
    the logs.join(logs, trace_id) pattern with a bounded time range.
    Equi-join on user_id carries the range predicate as a post-join
    filter; the bounded window keeps fan-out linear in activity rate."""
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
        "user_id",
    )
    ctx = ev.filter(F.col("event_type") != "error").select(
        "user_id", F.col("ts").alias("ctx_ts")
    )
    return (
        err.join(ctx, "user_id")
        .filter(
            (F.col("ctx_ts") >= F.col("error_ts") - F.expr("INTERVAL 5 MINUTES"))
            & (F.col("ctx_ts") < F.col("error_ts"))
        )
        .groupBy("error_id", "error_ts", "user_id")
        .agg(F.count(F.lit(1)).alias("n_context_events"))
    )


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


@register(
    "window_gap_fill_hourly",
    oracle="""
    WITH counts AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, min(hour) AS lo, max(hour) AS hi
        FROM counts GROUP BY 1
    ),
    grid AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        FROM bounds
    )
    SELECT g.event_type, g.hour, c.n,
           CAST(last_value(c.n IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_carry
    FROM grid g LEFT JOIN counts c USING (event_type, hour)
    """,
)
def window_gap_fill_hourly(spark, sf_dir):
    """CH `ORDER BY h WITH FILL STEP INTERVAL 1 HOUR INTERPOLATE (n)`
    as a first-class operator (reference README.md panels are hourly
    time series; gap filling is the densify idiom): per-type hourly
    event counts densified onto the 1-hour grid between each type's
    first and last bucket, with NULL counts on filled rows and a
    carried-forward `n_carry` (the INTERPOLATE arm). Fill rows are
    generated distributively — each real row explodes its own gap —
    so the only shuffle is the partitioned window sort on
    (event_type, hour), post-aggregation-sized."""
    from clickhouse_observability_spark.operators.gapfill import (
        gap_fill,
        interval_to_micros,
    )

    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("n_carry", F.col("n"))
    )
    return gap_fill(
        hourly,
        "hour",
        interval_to_micros(1, "hour"),
        partition_by=("event_type",),
        interpolate=("n_carry",),
    )


@register(
    "asof_general_join",
    # After the 50-slot window; DuckDB's NATIVE ASOF JOIN is the
    # oracle — our union-and-carry plan must agree with a second
    # engine's first-class implementation row for row. Clicks are
    # pre-deduped to one per (user, ts) (max event_id) so equal-ts
    # ties cannot differ between engines.
    oracle="""
    WITH p AS (
        SELECT event_id, ts, user_id, value
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts AS click_ts, max(event_id) AS click_event_id
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    )
    SELECT p.event_id, p.ts, p.user_id, p.value,
           c.click_event_id, c.click_ts
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
)
def asof_general_join(spark, sf_dir):
    """The general ASOF JOIN operator (full right-row carry,
    inner/left, backward/forward — operators/joins.py:asof_join; the
    CH `ASOF LEFT JOIN` statement routes here through the dialect):
    each purchase carries the whole latest at-or-before click row of
    the same user, unmatched purchases kept with NULLs. One shuffle
    on user_id, no row amplification."""
    from clickhouse_observability_spark.operators.joins import asof_join

    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.max("event_id").alias("click_event_id"))
    )
    return asof_join(
        purchases, clicks, ["user_id"], "ts", "click_ts", how="left"
    ).select("event_id", "ts", "user_id", "value",
             "click_event_id", "click_ts")
