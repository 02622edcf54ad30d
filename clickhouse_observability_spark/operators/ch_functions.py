"""ClickHouse aggregate-function family, Spark-first.

The reference delegates all query execution to ClickHouse
(`internal/db/db.go:80-143`), whose users lean on a signature set of
aggregate combinators beyond ANSI SQL. The behavioral trio
(windowFunnel / retention / sequenceCount) lives in
`operators/behavioral.py`; this module covers the remaining
workhorses (public ClickHouse SQL surface):

- `argMax(a, b)` / `argMin(a, b)` — value of `a` at the extreme of
  `b`. Implemented as a STRUCT max/min inside a normal aggregation
  (Spark orders structs lexicographically), so it rides the ordinary
  partial-aggregation path — one map-side-combined shuffle, no
  window, and the (b, a) struct makes ties deterministic (CH leaves
  them arbitrary; we pin them so the oracle can too).
- `topK(k)` — most frequent values. CH's is approximate
  (space-saving); at any scale the exact two-level shape below is
  already safe (pre-aggregate to (group, value) counts — bounded by
  value cardinality — then per-group top-k), so we ship exact
  results with deterministic tie order.
- `sumIf/countIf/avgIf` — conditional aggregates (`F.when` inside
  the agg; Spark fuses them into the same single aggregation).
- `histogram` — fixed-width bins, returned as a dense per-group
  count array (missing bins zero-filled JVM-side via
  sequence+transform, not driver-side).
- `sumMap` — merge map columns by summing per key. Explode +
  regroup: the only shape that scales (per-key partial sums combine
  map-side; never builds whole-group maps in executor memory).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from clickhouse_observability_spark.functions.moneydec import (
    floor_quantize as _floor_quantize,
)


def _cols(arg: str | Column, by: str | Column) -> tuple[Column, Column]:
    return (F.col(arg) if isinstance(arg, str) else arg,
            F.col(by) if isinstance(by, str) else by)


def arg_max(arg: str | Column, by: str | Column) -> Column:
    """ClickHouse argMax(arg, by); ties broken by larger arg."""
    a, b = _cols(arg, by)
    return F.max(F.struct(b.alias("b"), a.alias("a")))["a"]


def arg_min(arg: str | Column, by: str | Column) -> Column:
    """ClickHouse argMin(arg, by); ties broken by smaller arg."""
    a, b = _cols(arg, by)
    return F.min(F.struct(b.alias("b"), a.alias("a")))["a"]


def top_k_by_freq(
    df: DataFrame, group: str, col: str, k: int
) -> DataFrame:
    """(group, top_k array) — the k most frequent `col` values per
    group, ordered by count desc then value asc (deterministic).

    Level 1 collapses to (group, value) counts — map-side combined,
    output bounded by value cardinality, not row count. Level 2 ranks
    within groups; collect_list gives no order guarantee, so the rank
    rides inside the struct and `sort_array` restores it."""
    counts = df.groupBy(group, col).agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy(group).orderBy(F.desc("__c"), F.asc(col))
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(group)
        .agg(F.transform(
            F.sort_array(F.collect_list(F.struct("__rn", col))),
            lambda s: s[col],
        ).alias("top_k"))
    )


def histogram_fixed(
    value: str | Column, lo: float, hi: float, n_bins: int
) -> tuple[Column, Column]:
    """(bucket expression, densify expression) for fixed-width bins.

    Usage: group by the bucket expression with counts, then apply the
    densify expression over collect_list(struct(bucket, cnt)) to get
    a dense n_bins-long count array with empty bins as 0."""
    v = F.col(value) if isinstance(value, str) else value
    width = (hi - lo) / n_bins
    bucket = F.least(
        F.lit(n_bins),
        F.greatest(F.lit(1), (F.floor((v - lo) / width) + 1).cast("int")),
    )

    def densify(entries: Column) -> Column:
        m = F.map_from_entries(entries)
        return F.transform(
            F.sequence(F.lit(1), F.lit(n_bins)),
            lambda b: F.coalesce(m[b], F.lit(0).cast("long")),
        )

    return bucket, densify


def sum_map(
    df: DataFrame, group: str, map_col: Column, round_to: int | None = None,
    dec_sum: bool = False, agg: str = "sum",
) -> DataFrame:
    """ClickHouse sumMap / maxMap / minMap: merge maps by key with
    the chosen combiner (`agg` in sum/max/min — the r9 dialect
    refusals for maxMap/minMap point here).

    Output exploded as (group, map_key, map_sum) rows — the at-rest
    shape that keeps per-key partial combines map-side and never
    materializes a whole group's map in one executor.
    dec_sum=True sums in exact DECIMAL(18,4) (moneydec policy: only
    for values with <=4 decimal digits; order-independent, so the
    rounded sum can't flip at a cross-engine boundary; max/min are
    order-free already)."""
    from clickhouse_observability_spark.functions.moneydec import dec

    if agg not in ("sum", "max", "min"):
        raise ValueError(f"agg must be sum/max/min, got {agg!r}")
    fn = {"sum": F.sum, "max": F.max, "min": F.min}[agg]
    ex = df.select(group, F.explode(map_col).alias("map_key", "__v"))
    s = fn(dec("__v")) if dec_sum else fn("__v")
    if round_to is not None:
        s = F.round(s, round_to)
    if dec_sum:
        s = s.cast("double")
    return ex.groupBy(group, "map_key").agg(s.alias("map_sum"))


def top_k_by_weight(
    df: DataFrame, group: str, val: str, weight: str, k: int,
    round_to: int = 4, dec_sum: bool = False,
) -> DataFrame:
    """ClickHouse topKWeighted(k)(x, w): the top values by TOTAL
    WEIGHT within each group (CH's is a sketch; grouped data makes
    the exact form affordable — sum weights per (group, value),
    rank, keep k). Weights round to `round_to` BEFORE ranking with a
    value tie-break, so a float-summation-order ulp can't flip a
    rank between engines; dec_sum=True removes even the boundary
    case by summing in exact DECIMAL(18,4) (moneydec; only for
    weights with <=4 decimal digits). Output: (group, val, w, rank)."""
    from pyspark.sql import Window as W

    from clickhouse_observability_spark.functions.moneydec import dec

    wsum = F.sum(dec(weight)) if dec_sum else F.sum(weight)
    wexpr = F.round(wsum, round_to)
    if dec_sum:
        wexpr = wexpr.cast("double")
    w = df.groupBy(group, val).agg(wexpr.alias("w"))
    win = W.partitionBy(group).orderBy(F.desc("w"), F.asc(val))
    return (
        w.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )


def weighted_quantile(
    df: DataFrame, group: str, x: str, w: str, q: float,
) -> DataFrame:
    """ClickHouse quantileExactWeighted(q)(x, w): the exact
    q-quantile of x where each row counts w times — the
    pre-aggregated-histogram form (x = latency bucket, w = hit
    count) that makes exact quantiles affordable over rollups.

    Lower-bound definition, CH's: the smallest x whose cumulative
    weight reaches ceil(q · total) — integer-exact when weights are
    integers, so both engines agree bit-for-bit (no interpolation,
    no float accumulation across rows).

    Plan: ONE shuffle on the group key; a cumulative-sum window over
    (group, x) and a min-over-eligible pick — never a per-group
    value list on the driver. Output: (group, q{q} DOUBLE)."""
    from pyspark.sql import Window as W

    per_x = df.groupBy(group, x).agg(F.sum(w).alias("__w"))
    win = (W.partitionBy(group).orderBy(x)
           .rowsBetween(W.unboundedPreceding, W.currentRow))
    tot = W.partitionBy(group)
    alias = f"q{str(q).replace('.', '')}"
    cum = per_x.select(
        group, F.col(x).alias("__x"),
        F.sum("__w").over(win).alias("__cum"),
        F.sum("__w").over(tot).alias("__tot"),
    )
    return (
        cum.filter(F.col("__cum") >= F.ceil(F.lit(q) * F.col("__tot")))
        .groupBy(group)
        .agg(F.min("__x").cast("double").alias(alias))
    )


def entropy(df: DataFrame, group: str, col: str) -> DataFrame:
    """ClickHouse `entropy(x)`: Shannon entropy (log2) of the value
    distribution within each group — the cardinality-shape signal
    observability stacks run over URL/status/template columns (a
    sudden entropy drop = one value flooding).

    Two-level aggregation by necessity (per-value counts, then the
    -Σ p·log2 p fold), both with map-side combine: the first groupBy
    is (group, value)-keyed, the second collapses to the group — no
    per-group value list ever materializes in one executor.

    Output: (group, entropy DOUBLE). The probability uses the
    group's own total (count over the same rows), so the two
    aggregates pipeline into one shuffle exchange + an AQE-coalesced
    second stage."""
    # NULLs are skipped, matching CH/DuckDB aggregate semantics (a
    # groupBy would otherwise count NULL as one more value)
    per_val = (
        df.filter(F.col(col).isNotNull())
        .groupBy(group, col).agg(F.count(F.lit(1)).alias("__c"))
    )
    return (
        per_val.groupBy(group)
        .agg(
            F.sum("__c").alias("__n"),
            F.sum(F.col("__c") * F.log2("__c")).alias("__clog"),
        )
        .select(
            group,
            # -Σ (c/n)·log2(c/n) = log2(n) − (Σ c·log2 c)/n : one
            # pass over per-value counts, no second join for n
            (F.log2("__n") - F.col("__clog") / F.col("__n"))
            .alias("entropy"),
        )
    )


def segment_overlap_exact(
    df: DataFrame, segment: str = "event_type", id_col: str = "user_id"
) -> DataFrame:
    """Exact pairwise audience overlap between segments — for every
    segment pair (a < b) that SHARES at least one id: distinct-id
    counts of each side, the intersection, the union
    (inclusion–exclusion), and Jaccard. Fully-disjoint pairs emit no
    row (inner-join semantics, mirrored by the oracle); the theta
    twin emits every pair, so diffing the two entries must treat an
    absent exact row as intersection 0. The ClickHouse-users'
    uniq-across-segments analysis, done exactly.

    Shape: ONE distinct pass (segment, id) — a single shuffle on the
    pair — then a self-join on the id to count co-membership; the
    per-segment totals are a tiny aggregate broadcast onto the
    #segments² result. The id-keyed self-join is the exact-answer
    cost: each id's segment list fans out |segments(id)|² — fine
    while ids belong to few segments. `segment_overlap_theta` is the
    registered approximation for when it isn't.
    """
    d = df.select(F.col(segment).alias("seg"), F.col(id_col).alias("id")).distinct()
    totals = d.groupBy("seg").agg(F.count(F.lit(1)).alias("n"))
    a = d.select(F.col("seg").alias("seg_a"), "id")
    b = d.select(F.col("seg").alias("seg_b"), "id")
    inter = (
        a.join(b, "id")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ta = totals.select(F.col("seg").alias("seg_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("seg").alias("seg_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(ta), "seg_a")
        .join(F.broadcast(tb), "seg_b")
        .select(
            "seg_a", "seg_b", "n_a", "n_b", "n_inter",
            (F.col("n_a") + F.col("n_b") - F.col("n_inter")).alias("n_union"),
            # int/int -> the same IEEE double on both engines;
            # floor-quantize (round() diverges at representation
            # boundaries — moneydec policy for quotients)
            _floor_quantize(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


def segment_overlap_theta(
    df: DataFrame, segment: str = "event_type", id_col: str = "user_id"
) -> DataFrame:
    """Approximate pairwise audience overlap via DataSketches THETA
    sketches (the CH `uniqTheta` family: uniqTheta + intersect/union
    over sketch states) — the 100 TB path. One aggregation builds a
    per-segment sketch (KB-sized mergeable state, map-side combined:
    the ids themselves never shuffle); the #segments-row sketch table
    self-joins (tiny, broadcast) and every pair's union/intersection
    estimate is pure sketch arithmetic. The exact twin costs an
    id-keyed self-join whose fan-out is quadratic in segments-per-id;
    this one's cost is ONE scan regardless of overlap structure.

    Estimates are engine-specific -> rows-only; pytest bounds the
    relative error against `segment_overlap_exact`. Unlike the exact
    twin, EVERY (a < b) pair gets a row — disjoint segments report
    est_inter ≈ 0 instead of being absent.
    """
    sk = df.groupBy(F.col(segment).alias("seg")).agg(
        F.expr(f"theta_sketch_agg({id_col})").alias("sk"),
    )
    a = sk.select(
        F.col("seg").alias("seg_a"), F.col("sk").alias("sk_a")
    )
    b = sk.select(
        F.col("seg").alias("seg_b"), F.col("sk").alias("sk_b")
    )
    est = lambda c: F.round(F.expr(f"theta_sketch_estimate({c})"), 1)
    return (
        a.join(F.broadcast(b), F.col("seg_a") < F.col("seg_b"))
        .select(
            "seg_a",
            "seg_b",
            est("sk_a").alias("est_a"),
            est("sk_b").alias("est_b"),
            est("theta_intersection(sk_a, sk_b)").alias("est_inter"),
            est("theta_union(sk_a, sk_b)").alias("est_union"),
        )
    )
