"""Behavioral analytics — the ClickHouse-signature functions a user
of the reference (a ClickHouse-backed service) reaches for:
windowFunnel, retention and sequence counting, re-expressed as
Spark aggregations.

Scale shapes: every operator here is per-user conditional
aggregation — ONE shuffle on user_id with map-side partial
aggregation, no self-joins, no per-user windows. windowFunnel's
chained "step k within `window` of step 1 and after step k-1" is a
fold over conditional MINs: step k's anchor timestamp is
min(ts | type = step_k, ts > anchor_{k-1}, ts <= anchor_1 + window),
computed as k conditional aggregates in one groupBy (each references
the previous via a post-aggregation expression, so Catalyst still
plans a single hash aggregate over the events scan).

The fold needs each anchor as a COLUMN before the next can filter on
it, which a single agg cannot express — so anchors are computed as k
min-aggregates over a per-user COLLECTED (ts, type) event list and
folded with array expressions. The list is bounded per user by their
event count; for observability data (thousands of events per user,
not billions) that is the standard funnel trade — the same one
ClickHouse's windowFunnel makes, which also buffers each user's
events in memory during aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_funnel(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """ClickHouse windowFunnel: per user, the deepest funnel level
    reached — step 1 anywhere, each later step strictly after the
    previous one and within `window_seconds` of step 1's timestamp
    (the earliest step-1 event is the anchor, ClickHouse's default
    mode). Output: (user, level) with level 0 for users who never
    performed step 1."""
    if not steps:
        raise ValueError("windowFunnel needs at least one step")
    ev = events.select(
        F.col(user_col).alias("user"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(type_col).alias("etype"),
    ).filter(F.col("etype").isin(list(steps)))
    per_user = ev.groupBy("user").agg(
        F.sort_array(F.collect_list(F.struct("us", "etype"))).alias("evs")
    )
    win_us = window_seconds * 1_000_000
    # fold the anchor chain with let-bound array expressions: anchor_1
    # = min ts of step 1; anchor_k = first step-k event after
    # anchor_{k-1} and within window of anchor_1
    expr = "transform(array(evs), es -> "
    closing = ")[0]"
    anchor_prev = None
    anchor_exprs = []
    for k, step in enumerate(steps):
        s = step.replace("'", "''")
        if k == 0:
            a = (
                f"array_min(transform(filter(es, e -> e.etype = '{s}'),"
                " e -> e.us))"
            )
        else:
            a = (
                f"array_min(transform(filter(es, e -> e.etype = '{s}'"
                f" AND e.us > a{k - 1} AND e.us <= a0 + {win_us}L),"
                " e -> e.us))"
            )
        anchor_exprs.append(a)
        anchor_prev = f"a{k}"
    _ = anchor_prev
    # nest the let-bindings: each anchor becomes a lambda variable the
    # next can reference (same single-evaluation trick as lang-ID)
    body = (
        "CASE "
        + " ".join(
            f"WHEN a{k} IS NULL THEN {k}" for k in range(len(steps))
        )
        + f" ELSE {len(steps)} END"
    )
    for k in range(len(steps) - 1, -1, -1):
        body = (
            f"transform(array({anchor_exprs[k]}), a{k} -> {body})[0]"
        )
    level = F.expr(expr + body + closing)
    return per_user.select(
        "user", F.coalesce(level, F.lit(0)).cast("int").alias("level")
    )


def retention(
    events: DataFrame,
    conditions: list[str],
    user_col: str = "user_id",
) -> DataFrame:
    """ClickHouse retention: per user, r1 = condition 1 held, rK =
    condition 1 AND condition K held (K >= 2) — the cohort-retention
    primitive. Conditions are SQL boolean expressions over the event
    row. Output: (user, r1 ... rN as ints). One conditional-max
    aggregate per condition, one shuffle."""
    if not conditions:
        raise ValueError("retention needs at least one condition")
    aggs = [
        F.max(F.when(F.expr(cond), 1).otherwise(0)).alias(f"c{i}")
        for i, cond in enumerate(conditions)
    ]
    per_user = events.groupBy(F.col(user_col).alias("user")).agg(*aggs)
    cols = [F.col("c0").alias("r1")]
    for i in range(1, len(conditions)):
        cols.append(
            (F.col("c0") * F.col(f"c{i}")).alias(f"r{i + 1}")
        )
    return per_user.select("user", *cols)


def sequence_count(
    events: DataFrame,
    first_type: str,
    then_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """ClickHouse sequenceCount('(?1)(?2)') shape: per user, how many
    times `then_type` follows `first_type` (each first event matched
    to the count of later then-events is NOT the semantic — the
    non-overlapping pair count is: walk the merged timeline, a
    then-event closes the earliest open first-event). Computed with a
    per-user sorted fold (aggregate over the collected list)."""
    ev = events.select(
        F.col(user_col).alias("user"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(type_col).alias("etype"),
    ).filter(F.col("etype").isin([first_type, then_type]))
    per_user = ev.groupBy("user").agg(
        F.sort_array(F.collect_list(F.struct("us", "etype"))).alias("evs")
    )
    f = first_type.replace("'", "''")
    t = then_type.replace("'", "''")
    fold = F.expr(
        f"""aggregate(evs,
              named_struct('open', 0, 'pairs', 0),
              (acc, e) -> CASE
                  WHEN e.etype = '{f}' THEN
                      named_struct('open', acc.open + 1, 'pairs', acc.pairs)
                  WHEN acc.open > 0 THEN
                      named_struct('open', acc.open - 1,
                                   'pairs', acc.pairs + 1)
                  ELSE acc END,
              acc -> acc.pairs)"""
    )
    return per_user.select("user", fold.cast("int").alias("n_sequences"))
