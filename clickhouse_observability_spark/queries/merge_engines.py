"""Registry entries for the MergeTree engine family
(operators/merge_engines.py): Replacing / Collapsing /
VersionedCollapsing / Summing merge-on-read over the events table,
each with a DuckDB oracle. Register AFTER the 50-slot window; the CI
registry gate adjudicates them every run.

The collapsing fixtures derive sign from event_type (view = +1 state
row, purchase = -1 cancel row) — a contrived but deterministic
open/close stream, which is exactly the shape CollapsingMergeTree
exists for (mutable "current state" kept as append-only +/- rows).
Money/value sums ride the moneydec double-units policy (exact
integer-valued doubles below 2^53), so every aggregate hash-matches
DuckDB's integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_observability_spark.functions.moneydec import units4d
from clickhouse_observability_spark.operators import merge_engines as ME
from clickhouse_observability_spark.registry import register, table


@register(
    "engine_replacing_latest",
    oracle="""
    SELECT user_id, event_type, ts, value FROM (
        SELECT user_id, event_type, ts, value,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, value DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def engine_replacing_latest(spark, sf_dir):
    """ReplacingMergeTree(ts) FINAL over ORDER BY (user_id,
    event_type): the newest state row per key — the upsert-on-append
    pattern (CH keeps all versions in parts; the merge rule keeps the
    max version; ties pinned by the payload struct). One max_by
    shuffle; the oracle is the equivalent window-rank formulation."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value")
    return ME.replacing_read(
        ev, keys=["user_id", "event_type"], version=["ts"])


@register(
    "engine_collapsing_sessions",
    oracle="""
    WITH s AS (
        SELECT user_id,
               CASE event_type WHEN 'view' THEN 1 ELSE -1 END AS sign,
               ts, value
        FROM events WHERE event_type IN ('view', 'purchase')
    ), g AS (
        SELECT user_id,
               sum(CASE WHEN sign = 1 THEN 1 ELSE 0 END) AS p,
               sum(CASE WHEN sign = -1 THEN 1 ELSE 0 END) AS n
        FROM s GROUP BY 1
    ), lp AS (
        SELECT user_id, ts, value FROM (
            SELECT user_id, ts, value, row_number() OVER (
                PARTITION BY user_id
                ORDER BY ts DESC, value DESC) AS rn
            FROM s WHERE sign = 1) WHERE rn = 1
    ), fn AS (
        SELECT user_id, ts, value FROM (
            SELECT user_id, ts, value, row_number() OVER (
                PARTITION BY user_id
                ORDER BY ts ASC, value ASC) AS rn
            FROM s WHERE sign = -1) WHERE rn = 1
    )
    SELECT g.user_id,
           CAST(CASE WHEN p > n THEN 1 ELSE -1 END AS INT) AS sign,
           CASE WHEN p > n THEN lp.ts ELSE fn.ts END AS ts,
           CASE WHEN p > n THEN lp.value ELSE fn.value END AS value
    FROM g LEFT JOIN lp USING (user_id) LEFT JOIN fn USING (user_id)
    WHERE p <> n
    """,
)
def engine_collapsing_sessions(spark, sf_dir):
    """CollapsingMergeTree(sign) FINAL: view opens (+1), purchase
    cancels (-1); balanced users vanish, the rest keep the dominant
    sign's extreme row (last positive / first negative in (ts, value)
    order — CH's documented |p-n| <= 1 rule, pinned deterministic for
    any imbalance). One conditional min_by/max_by shuffle."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        F.when(F.col("event_type") == "view", 1).otherwise(-1)
        .cast("int").alias("sign"),
        "ts", "value")
    return ME.collapsing_read(
        ev, keys=["user_id"], sign_col="sign", order=["ts", "value"])


@register(
    "engine_collapsing_net",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE event_type WHEN 'view' THEN 1 ELSE -1 END)
                AS BIGINT) AS net,
           sum(CAST(round(value * 10000) AS BIGINT)
               * CASE event_type WHEN 'view' THEN 1 ELSE -1 END)
               / 10000.0 AS net_value
    FROM events WHERE event_type IN ('view', 'purchase')
    GROUP BY user_id HAVING net <> 0
    """,
)
def engine_collapsing_net(spark, sf_dir):
    """The merge-schedule-INDEPENDENT collapsing reader — CH's
    documented sum(value * sign) ... HAVING sum(sign) != 0 pattern
    (correct over any partially merged part set, unlike FINAL whose
    survivors depend on merge order). Values ride exact integer
    units; the final division is one IEEE op over the identical
    integer on both engines."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        F.when(F.col("event_type") == "view", 1).otherwise(-1)
        .cast("int").alias("sign"),
        units4d("value").alias("vu"))
    out = ME.collapsing_net_read(
        ev, keys=["user_id"], sign_col="sign", value_col="vu")
    return out.select(
        "user_id", F.col("net").cast("bigint").alias("net"),
        (F.col("net_value") / F.lit(10000.0)).alias("net_value"))


@register(
    "engine_versioned_collapsing",
    oracle="""
    SELECT user_id, version_day, sign, n_rows FROM (
        SELECT user_id,
               date_trunc('day', ts)::TIMESTAMP AS version_day,
               CAST(CASE WHEN sum(sign) > 0 THEN 1 ELSE -1 END AS INT)
                   AS sign,
               CAST(abs(sum(sign)) AS INT) AS n_rows
        FROM (
            SELECT user_id, ts,
                   CASE event_type WHEN 'view' THEN 1 ELSE -1 END
                       AS sign
            FROM events WHERE event_type IN ('view', 'purchase')
        )
        GROUP BY 1, 2 HAVING sum(sign) <> 0
    )
    """,
)
def engine_versioned_collapsing(spark, sf_dir):
    """VersionedCollapsingMergeTree(sign, day) FINAL: +1/-1 cancel
    within a (user, day) version; the net imbalance survives with its
    dominant sign and multiplicity. Unlike plain collapsing this IS
    merge-order-independent (cancellation is confined to a version),
    so FINAL itself is adjudicable."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("version_day"),
        F.when(F.col("event_type") == "view", 1).otherwise(-1)
        .cast("int").alias("sign"))
    return ME.versioned_collapsing_read(
        ev, keys=["user_id"], sign_col="sign",
        version_col="version_day")


@register(
    "engine_summing_parts_merge",
    oracle="""
    SELECT date_trunc('day', ts)::TIMESTAMP AS bucket_day, event_type,
           sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0
               AS sum_value,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(user_id) AS first_user
    FROM events GROUP BY 1, 2
    """,
)
def engine_summing_parts_merge(spark, sf_dir):
    """SummingMergeTree FINAL reached THROUGH background merges: the
    events table splits into three synthetic parts (pmod of user_id —
    the insert-batch analog), which fold pairwise through the summing
    merge rule; the result must equal one direct aggregation — the
    merge-associativity the parts model rests on, here adjudicated
    cross-engine against DuckDB's single-shot GROUP BY. Sums ride
    exact integer units; the non-summed payload column takes the
    key's minimum (CH's arbitrary pick, pinned deterministic)."""
    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("bucket_day"),
        "event_type",
        units4d("value").alias("vu"),
        F.lit(1).cast("long").alias("n_rows"),
        "user_id")
    parts = [ev.filter(F.pmod(F.col("user_id"), F.lit(3)) == i)
             for i in range(3)]

    def rule(df):
        return ME.summing_read(
            df, keys=["bucket_day", "event_type"],
            sum_cols=["vu", "n_rows"])

    merged = ME.merge_parts(parts, rule)
    return merged.select(
        "bucket_day", "event_type",
        (F.col("vu") / F.lit(10000.0)).alias("sum_value"),
        F.col("n_rows"),
        F.col("user_id").alias("first_user"))


@register(
    "engine_replacing_merge_tree_schedule",
    oracle="""
    SELECT user_id, event_id, event_type, ts, value FROM (
        SELECT user_id, event_id, event_type, ts, value,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, value DESC, event_id DESC,
                            event_type DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def engine_replacing_merge_tree_schedule(spark, sf_dir):
    """ReplacingMergeTree FINAL reached through a PAIR-TREE merge
    schedule (r11, r10 verdict "missing #2" — merge_parts schedule
    algebra under the oracle): events split into four synthetic parts
    (pmod(event_id, 4) — the insert-batch analog), merged as
    merge(merge(p0, p1), merge(p2, p3)) — a DIFFERENT schedule from
    engine_summing_parts_merge's left fold, covering the tree shapes
    CH's background merger actually produces. Because the replacing
    rule (max_by over the version-then-payload struct) is
    associative, any schedule equals the single-shot FINAL the DuckDB
    oracle computes with one window rank. Version = (ts, value), ties
    totalized by (event_id, event_type)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts", "value")
    parts = [ev.filter(F.pmod(F.col("event_id"), F.lit(4)) == i)
             for i in range(4)]

    def rule(df):
        return ME.replacing_read(
            df, keys=["user_id"], version=["ts", "value"])

    left = ME.merge_parts(parts[:2], rule)
    right = ME.merge_parts(parts[2:], rule)
    return ME.merge_parts([left, right], rule).select(
        "user_id", "event_id", "event_type", "ts", "value")
