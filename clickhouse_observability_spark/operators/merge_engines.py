"""The ClickHouse MergeTree ENGINE FAMILY as merge-on-read operators.

The reference's table is plain MergeTree (internal/db/db.go:40-50);
ClickHouse's data model around it is the engine family — the same
parts-and-background-merge machinery with an engine-specific MERGE
RULE. The AggregatingMergeTree analog has been in-repo since r4
(operators/rollup.py: -State parts + merge-on-read); this module
completes the family:

- ReplacingMergeTree(version): parts accumulate row versions; a merge
  keeps ONE row per ORDER BY key — the max version (insert order when
  no version column). The upsert-on-append pattern.
- CollapsingMergeTree(sign): rows carry sign = +1 (state) / -1
  (cancel); a merge cancels balanced groups and keeps the last
  positive (or first negative) of an unbalanced one.
- VersionedCollapsingMergeTree(sign, version): +1/-1 cancel WITHIN a
  version; each (key, version)'s net imbalance survives.
- SummingMergeTree(cols): a merge replaces a key's rows with one row
  carrying their sums.

Spark-first shape: the merge rule is ONE aggregate per key —
max_by / conditional min_by-max_by / sum — so "FINAL" (full collapse)
is a single shuffle on the engine key, and a BACKGROUND MERGE over
any subset of parts is the same operator applied to their union.
Replacing/summing merges are associative (any merge schedule equals
FINAL — pinned in tests); collapsing is merge-order-dependent in CH
and here alike, which is why the engine-sanctioned reader is the
schedule-independent sum(value * sign) HAVING sum(sign) != 0 pattern
(collapsing_net_read) — expressible directly in the DataFrame API
over the raw parts.

Determinism strengthening (same policy as rollup/TTL): wherever CH
leaves tie order or the >1-imbalance case unspecified, these
operators pin a total order — ties break by the full remaining-column
struct, and an imbalanced collapsing group keeps its dominant-sign
extreme row — so every entry is cross-engine adjudicable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "replacing_read",
    "collapsing_read",
    "collapsing_net_read",
    "versioned_collapsing_read",
    "summing_read",
    "merge_parts",
]


def _others(df: DataFrame, *used: str) -> list[str]:
    drop = {c.lower() for c in used}
    return [c for c in df.columns if c.lower() not in drop]


def replacing_read(
    df: DataFrame,
    keys: list[str],
    version: list[str] | None = None,
) -> DataFrame:
    """ReplacingMergeTree FINAL: one row per `keys` — the one with the
    max `version` tuple (ties and the no-version case break by the
    full payload struct, newest-wins made total). One shuffle on the
    key; at 100 TB this is the same partial-aggregatable max_by shape
    as any top-1-per-key (map-side combine keeps shuffle rows at one
    per key per partition)."""
    payload = _others(df, *keys)
    ver_cols = list(version or [])
    order = F.struct(*[F.col(c) for c in ver_cols + payload])
    agg = F.max_by(F.struct(*[F.col(c) for c in payload]), order)
    out = df.groupBy(*keys).agg(agg.alias("__r"))
    return out.select(*keys, *[F.col(f"__r.{c}").alias(c) for c in payload])


def collapsing_read(
    df: DataFrame,
    keys: list[str],
    sign_col: str = "sign",
    order: list[str] | None = None,
) -> DataFrame:
    """CollapsingMergeTree FINAL: per key, balanced groups vanish;
    p > n keeps the LAST (+1) row, n > p keeps the FIRST (-1) row in
    the `order` total order (CH documents the |p-n| <= 1 cases and
    logs on the rest; this pins the dominant-sign extreme row for any
    imbalance — a documented strengthening). One shuffle on the key."""
    payload = _others(df, *keys, sign_col)
    ordc = [F.col(c) for c in (order or payload)]
    pos = F.col(sign_col) == 1
    neg = F.col(sign_col) == -1
    ostruct = F.struct(*ordc, *[F.col(c) for c in payload])
    g = df.groupBy(*keys).agg(
        F.sum(F.when(pos, 1).otherwise(0)).alias("__p"),
        F.sum(F.when(neg, 1).otherwise(0)).alias("__n"),
        F.max_by(F.struct(*[F.col(c) for c in payload]),
                 F.when(pos, ostruct)).alias("__lp"),
        F.min_by(F.struct(*[F.col(c) for c in payload]),
                 F.when(neg, ostruct)).alias("__fn"),
    )
    keep = g.filter(F.col("__p") != F.col("__n"))
    side = F.when(F.col("__p") > F.col("__n"), F.col("__lp")).otherwise(
        F.col("__fn"))
    sign = F.when(F.col("__p") > F.col("__n"), F.lit(1)).otherwise(
        F.lit(-1))
    return keep.select(
        *keys, sign.cast("int").alias(sign_col),
        *[side.getField(c).alias(c) for c in payload])


def collapsing_net_read(
    df: DataFrame,
    keys: list[str],
    sign_col: str = "sign",
    value_col: str | None = None,
) -> DataFrame:
    """The CH-documented NON-FINAL read over a collapsing table:
    sum(value * sign) / sum(sign) per key, HAVING sum(sign) != 0 —
    correct over any partially-merged part set because the merge rule
    preserves both sums. Pure partial-aggregatable GROUP BY."""
    net = F.sum(F.col(sign_col)).alias("net")
    aggs = [net]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col) * F.col(sign_col)).alias("net_value"))
    return (df.groupBy(*keys).agg(*aggs)
            .filter(F.col("net") != 0))


def versioned_collapsing_read(
    df: DataFrame,
    keys: list[str],
    sign_col: str = "sign",
    version_col: str = "version",
) -> DataFrame:
    """VersionedCollapsingMergeTree FINAL: +1/-1 cancel pairwise
    WITHIN a (key, version); the net imbalance survives as one row
    per (key, version) carrying the dominant sign and multiplicity.
    (CH keeps |net| physical copies; folding them to a multiplicity
    column is the same information one aggregate earlier.)"""
    p = F.sum(F.when(F.col(sign_col) == 1, 1).otherwise(0))
    n = F.sum(F.when(F.col(sign_col) == -1, 1).otherwise(0))
    g = df.groupBy(*keys, version_col).agg(
        (p - n).alias("__net"))
    return (g.filter(F.col("__net") != 0)
            .select(*keys, version_col,
                    F.when(F.col("__net") > 0, F.lit(1)).otherwise(-1)
                    .cast("int").alias(sign_col),
                    F.abs(F.col("__net")).cast("int").alias("n_rows")))


def summing_read(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """SummingMergeTree FINAL: one row per key with `sum_cols`
    summed; every other column takes the value of the key's FIRST row
    in (sum_cols-excluded) payload order (CH takes an arbitrary one —
    pinned deterministic). Partial-aggregatable; the 100 TB shape is
    a plain map-side-combining GROUP BY."""
    payload = _others(df, *keys, *sum_cols)
    aggs = [F.sum(F.col(c)).alias(c) for c in sum_cols]
    if payload:
        first = F.min(F.struct(*[F.col(c) for c in payload]))
        aggs.append(first.alias("__f"))
        return (df.groupBy(*keys).agg(*aggs)
                .select(*keys, *sum_cols,
                        *[F.col(f"__f.{c}").alias(c) for c in payload]))
    return df.groupBy(*keys).agg(*aggs)


def merge_parts(
    parts: list[DataFrame],
    merge_fn,
) -> DataFrame:
    """Background-merge simulation: fold a PART LIST pairwise through
    an engine's merge rule (partially applied). For REPLACING and
    SUMMING the rule is an associative aggregate (max_by / sum), so
    merging in ANY grouping equals one FINAL over the union — pinned
    in tests by comparing left fold, pair tree and single-shot FINAL.
    COLLAPSING is merge-ORDER-DEPENDENT — in ClickHouse too (a
    balanced pair can cancel inside an early merge that FINAL-over-
    everything would have paired differently), which is exactly why
    CH documents the sum(sign)-style read (`collapsing_net_read`) as
    the merge-schedule-independent way to query such tables; use
    that, not merge_parts, for collapsing correctness claims."""
    if not parts:
        raise ValueError("merge_parts needs at least one part")
    acc = parts[0]
    for p in parts[1:]:
        acc = merge_fn(acc.unionByName(p))
    return acc
