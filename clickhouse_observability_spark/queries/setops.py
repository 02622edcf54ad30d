"""EXT set-operation queries with DuckDB oracles (SURVEY.md §2.7 EXT)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_observability_spark.registry import register, table


def _users(spark, sf_dir, event_type):
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == event_type)
        .select("user_id")
        .distinct()
    )


@register(
    "setop_union_intersect_users",
    oracle="""
    SELECT 'union' AS op, user_id FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        UNION
        SELECT user_id FROM events WHERE event_type = 'view'
    ) u
    UNION ALL
    SELECT 'intersect', user_id FROM (
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'error'
    ) i
    """,
)
def setop_union_intersect_users(spark, sf_dir):
    """UNION (distinct) and INTERSECT exercised in one op-tagged
    result — Spark's Union+HashAggregate and its dedicated
    LeftSemi-based Intersect both appear in this single plan, sharing
    one registry slot inside the driver's 50-query window."""
    u = (
        _users(spark, sf_dir, "click")
        .union(_users(spark, sf_dir, "view"))
        .distinct()
        .select(F.lit("union").alias("op"), "user_id")
    )
    i = (
        _users(spark, sf_dir, "purchase")
        .intersect(_users(spark, sf_dir, "error"))
        .select(F.lit("intersect").alias("op"), "user_id")
    )
    return u.unionByName(i)


@register(
    "setop_except_user_days",
    oracle="""
    SELECT user_id, date_trunc('day', ts)::TIMESTAMP AS day FROM events
    WHERE event_type = 'click'
    EXCEPT
    SELECT user_id, date_trunc('day', ts)::TIMESTAMP AS day FROM events
    WHERE event_type = 'purchase'
    """,
)
def setop_except_user_days(spark, sf_dir):
    """(user, day) pairs with clicks but no purchase that day —
    fine-grained EXCEPT that stays non-degenerate at every sf."""
    ev = table(spark, sf_dir, "events")

    def pairs(t):
        return (
            ev.filter(F.col("event_type") == t)
            .select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
            .distinct()
        )

    return pairs("click").exceptAll(pairs("purchase")).distinct()
