"""Behavioral analytics queries — windowFunnel / retention /
sequenceCount, the ClickHouse-signature functions of the reference's
backing engine (coverage context: the reference delegates ad-hoc
analytics of this class to ClickHouse, README.md:82-107).

Late-loaded (after `tpch_extra` in registry._load_all) so the
oracle-backed entries register AFTER the driver's 50-slot
adjudication window; the oracle SQL is executed against DuckDB by
tests/test_behavioral.py.
"""

from __future__ import annotations

from clickhouse_observability_spark.operators import behavioral as B
from clickhouse_observability_spark.registry import register, table

_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WINDOW_S = 6 * 3600


@register("behavior_window_funnel")
def behavior_window_funnel(spark, sf_dir):
    """ClickHouse windowFunnel('6h')(view -> click -> purchase): the
    deepest funnel level per user, computed with the REAL ClickHouse
    sequential fold (re-anchoring at every step-1 event — see
    operators/behavioral.py). Rows-only: the stateful fold has no
    clean SQL mirror (DuckDB's list_reduce lacks an initial-value
    form); pytest pins an exact python replay of the ClickHouse
    algorithm on crafted timelines AND on the real events table."""
    return B.window_funnel(
        table(spark, sf_dir, "events"),
        steps=list(_FUNNEL_STEPS),
        window_seconds=_FUNNEL_WINDOW_S,
    )


@register(
    "behavior_retention",
    oracle="""
    SELECT user_id AS user,
           max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r1,
           max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
             * max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS r2,
           max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
             * max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS r3
    FROM events GROUP BY user_id
    """,
)
def behavior_retention(spark, sf_dir):
    """ClickHouse retention(signup, click, purchase): r1 = signed up,
    rK = signed up AND did action K — the cohort-retention primitive
    as conditional-max aggregates, one shuffle."""
    return B.retention(
        table(spark, sf_dir, "events"),
        conditions=[
            "event_type = 'signup'",
            "event_type = 'click'",
            "event_type = 'purchase'",
        ],
    )


@register("behavior_sequence_count")
def behavior_sequence_count(spark, sf_dir):
    """ClickHouse sequenceCount shape: non-overlapping view->purchase
    pairs per user (a purchase closes the EARLIEST open view).
    Rows-only: the stateful timeline fold has no clean SQL mirror;
    pytest pins an exact python reference."""
    return B.sequence_count(
        table(spark, sf_dir, "events"), "view", "purchase"
    )
