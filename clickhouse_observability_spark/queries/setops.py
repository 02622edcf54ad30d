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
    SELECT 'union' AS op, user_id, NULL::TIMESTAMP AS day FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        UNION
        SELECT user_id FROM events WHERE event_type = 'view'
    ) u
    UNION ALL
    SELECT 'intersect', user_id, NULL::TIMESTAMP FROM (
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'error'
    ) i
    UNION ALL
    SELECT 'except_day', user_id, day FROM (
        SELECT user_id, date_trunc('day', ts)::TIMESTAMP AS day FROM events
        WHERE event_type = 'click'
        EXCEPT
        SELECT user_id, date_trunc('day', ts)::TIMESTAMP AS day FROM events
        WHERE event_type = 'purchase'
    ) x
    """,
)
def setop_union_intersect_users(spark, sf_dir):
    """UNION (distinct), INTERSECT and EXCEPT exercised in one
    op-tagged result — Spark's Union+HashAggregate, its LeftSemi-based
    Intersect and its LeftAnti-based Except all appear in this single
    plan, sharing one registry slot inside the driver's 50-query
    window (the EXCEPT arm was folded in r4, freeing the
    setop_except_user_days slot). The union/intersect arms carry a
    NULL day; the except arm operates on (user, day) pairs."""
    no_day = F.lit(None).cast("timestamp").alias("day")
    u = (
        _users(spark, sf_dir, "click")
        .union(_users(spark, sf_dir, "view"))
        .distinct()
        .select(F.lit("union").alias("op"), "user_id", no_day)
    )
    i = (
        _users(spark, sf_dir, "purchase")
        .intersect(_users(spark, sf_dir, "error"))
        .select(F.lit("intersect").alias("op"), "user_id", no_day)
    )
    x = _except_user_days(spark, sf_dir).select(
        F.lit("except_day").alias("op"), "user_id", "day"
    )
    return u.unionByName(i).unionByName(x)


def _except_user_days(spark, sf_dir):
    ev = table(spark, sf_dir, "events")

    def pairs(t):
        return (
            ev.filter(F.col("event_type") == t)
            .select("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
            .distinct()
        )

    return pairs("click").exceptAll(pairs("purchase")).distinct()


# Oracle restored r8 (verdict #3): the driver window slot stayed with
# the op-tagged panel, but the registry-wide CI gate adjudicates every
# oracle entry each run.
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
    return _except_user_days(spark, sf_dir)
