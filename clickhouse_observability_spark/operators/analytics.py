"""EXT aggregation / window / as-of operators (SURVEY.md §2.4/§2.5 EXT).

The reference has no GROUP BY, windows, or joins anywhere — its whole
aggregate surface is COUNT(*) (README.md:91-92). These are the natural
log-analytics extensions SURVEY.md §2 lists as EXT, each expressed so
Catalyst plans them with partial (map-side) aggregation and, for
top-N-per-group, a rank filter it can push into the window sort.

Scale notes per operator are inline: every groupBy here shuffles on
its grouping key; low-cardinality keys (event_type: 5 values) partial-
aggregate down to almost nothing before the shuffle, and the window
functions partition on keys with bounded group sizes (user_id,
event_type), so state per task stays flat as rows grow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_observability_spark.functions.moneydec import (
    money_sum,
    units4d,
    units_avg_d,
)


def counts_by_type(events: DataFrame) -> DataFrame:
    """Rows per event_type — dictionary-size result, map-side combine
    makes the shuffle negligible at any scale."""
    return events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


def type_panel(events: DataFrame) -> DataFrame:
    """Row count + exact distinct users + full numeric value profile
    per event_type in ONE groupBy — every per-type profiling aggregate
    shares a single shuffle (and a single registry slot in the oracle
    window; the value-stats columns were folded in r4 to free the
    standalone agg_value_stats slot). value is 2dp -> sum in exact
    decimal, avg floor-quantized over the exact sum (moneydec:
    boundary-proof cross-engine, unlike round(sum(double)))."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("user_id").alias("users"),
        money_sum("value").alias("sum_value"),
        units_avg_d(units4d("value"), F.count(F.lit(1)), ndigits=4)
        .alias("avg_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


def hourly_counts(events: DataFrame) -> DataFrame:
    """Time-bucketed counts (the classic logs dashboard query).
    date_trunc keeps the bucket a native timestamp: groupable,
    partition-prunable, and identical across engines."""
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        money_sum("value").alias("sum_value"),
    )


def month_buckets(events: DataFrame) -> DataFrame:
    """toYYYYMM bucketing (F2 parity — the reference's partition fn)."""
    month = (F.year("ts") * 100 + F.month("ts")).cast("int")
    return events.groupBy(month.alias("month")).agg(F.count(F.lit(1)).alias("n"))


def distinct_users(events: DataFrame) -> DataFrame:
    """Exact distinct users per type. Spark plans this as a two-phase
    expand + partial distinct; exactness matches the DuckDB oracle
    (approx_count_distinct is benched separately, unmatched)."""
    return events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("users")
    )


def approx_distinct_users(events: DataFrame) -> DataFrame:
    """HLL++ distinct — the 100 TB path (constant memory vs exact's
    per-key set). No oracle: sketches are engine-specific; pytest
    asserts <5% relative error vs exact."""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("users_approx")
    )


def value_stats(events: DataFrame) -> DataFrame:
    """Full numeric profile per type. value is 2dp -> exact-decimal
    sum + floor-quantized avg (moneydec boundary-proof policy)."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum("value").alias("sum_value"),
        units_avg_d(units4d("value"), F.count(F.lit(1)), ndigits=4)
        .alias("avg_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


def median_value(events: DataFrame) -> DataFrame:
    """Exact interpolated median per type (Spark `percentile` ==
    DuckDB quantile_cont). Exact percentile gathers per-group values:
    fine for 5 groups; at 100 TB swap in percentile_approx."""
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("median_value")
    )


def latency_percentiles_approx(
    events: DataFrame, accuracy: int = 10_000
) -> DataFrame:
    """The 100 TB percentile path: percentile_approx keeps a bounded
    GK sketch per group (O(accuracy) memory) instead of buffering
    every value like exact `percentile` does — at 20 TB per group the
    exact form is an executor OOM, the sketch is constant-size.
    Sketches are engine-specific -> rows-only driver check; pytest
    bounds the error vs the exact operator."""
    q = f"percentile_approx(value, array(0.50, 0.95, 0.99), {accuracy})"
    return (
        events.groupBy("event_type")
        .agg(F.expr(q).alias("qs"))
        .select(
            "event_type",
            F.round(F.col("qs")[0], 4).alias("p50"),
            F.round(F.col("qs")[1], 4).alias("p95"),
            F.round(F.col("qs")[2], 4).alias("p99"),
        )
    )


def median_value_approx(events: DataFrame, accuracy: int = 10_000) -> DataFrame:
    """Bounded-memory median (see latency_percentiles_approx)."""
    return events.groupBy("event_type").agg(
        F.round(
            F.expr(f"percentile_approx(value, 0.5, {accuracy})"), 4
        ).alias("median_value")
    )


def error_rate_hourly(events: DataFrame, error_type: str = "error") -> DataFrame:
    """Windowed error-rate (the alerting query): per hour, error
    events / total events. Conditional aggregation — one pass, one
    tiny shuffle; the ratio of two ints is engine-exact."""
    is_err = (F.col("event_type") == error_type).cast("long")
    return (
        events.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(is_err).alias("n_errors"),
        )
        .withColumn(
            "error_rate", F.round(F.col("n_errors") / F.col("n_total"), 6)
        )
    )


def latency_percentiles(events: DataFrame) -> DataFrame:
    """p50/p95/p99 of the numeric payload per type (the latency-SLO
    query). Exact interpolated percentiles (== quantile_cont); the
    documented 100 TB swap is percentile_approx with the same call
    shape."""
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Generic data-quality profile: per column — null count, distinct
    count, min/max (as strings for type-uniformity). One aggregate
    pass over the table (all stats computed together), then a tiny
    unpivot; the training-data 'sanity sweep' operator."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs, F.count(F.lit(1)).alias("__n"))
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    )


def top_n_per_type(events: DataFrame, n: int = 5) -> DataFrame:
    """Top-N newest events per type via row_number — subsumes the
    reference's per-service ORDER BY ts DESC LIMIT pattern in one
    shuffle on the (low-cardinality) partition key."""
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select("event_type", "rn", "event_id", "ts", "user_id", "value")
    )


def user_activity_gaps(events: DataFrame, event_type: str = "click") -> DataFrame:
    """Inter-event gap per user (lag window): gap_us = ts - lag(ts).
    One shuffle on user_id; per-user state is a single previous row."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        events.filter(F.col("event_type") == event_type)
        .withColumn("gap_us", gap)
        .select("user_id", "event_id", "ts", "gap_us")
    )


def asof_join_last_event(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value: str = "event_id",
    alias: str = "asof_value",
) -> DataFrame:
    """AS-OF JOIN (backward): for each left row, the latest right row
    with right.ts <= left.ts and equal key.

    Spark has no native as-of join; the scalable composition is the
    union-and-carry-forward pattern: tag both sides, union, and run a
    single `last(..., ignorenulls) over (partition by key order by
    ts)` window — O(n log n) with exactly one shuffle on the key, no
    range cross-join blowup (the naive join-then-max is quadratic in
    per-key density). Returns the left rows + carried value.
    """
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
        F.lit(None).cast(right.schema[right_value].dataType).alias("_val"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
        F.col(right_value).alias("_val"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right (_side=0) sorts before left at equal ts => "<=" semantics
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(alias, F.last("_val", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("_side") == 1)
        .select("_row.*", alias)
    )
