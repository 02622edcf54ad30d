"""Time-series anomaly scoring over rollup-grain aggregates.

The dashboards the reference serves (hourly counts / error rates,
README.md:88-107 ad-hoc queries) become ALERTS by scoring each time
bucket against its trailing window. Everything here runs on
bucket-grain rows — O(hours x dims), the materialized-rollup read
path — never on raw events, so the same query costs the same at
100 TB.

Scores:
- trailing z-score: (x - mean_trailing) / stddev_trailing over the
  previous `trailing` buckets (exclusive of the current one — an
  anomalous bucket must not dilute its own baseline);
- day-over-day seasonal delta for hourly series (x vs the same hour
  yesterday) — catches level shifts the short window normalizes
  away.

Window functions over bucket-grain rows shuffle state-sized frames;
the per-dim partition keeps them independent. The z-score is scored
against the UNWEIGHTED trailing mean/stddev of the bucket rates; the
separately reported `baseline_mean` (see the registry query) is the
POOLED trailing rate — a ratio of integer window sums, so the
displayed baseline is bit-identical across engines (a mean of 24
six-decimal doubles structurally lands on round-half boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_error_rates(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    error_value: str = "error",
) -> DataFrame:
    """(bucket, n_total, n_errors, error_rate) per hour — one
    map-side-combined aggregation."""
    return (
        events.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col(type_col) == error_value, 1))
            .alias("n_errors"),
        )
        .withColumn(
            "error_rate",
            F.round(F.col("n_errors") / F.col("n_total"), 6),
        )
    )


def trailing_zscores(
    buckets: DataFrame,
    value_col: str,
    order_col: str = "bucket",
    partition_cols: tuple[str, ...] = (),
    trailing: int = 24,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Score each bucket against its trailing-window baseline.

    The window excludes the current row (rowsBetween(-trailing, -1)):
    a spike must not shift its own baseline. Buckets with fewer than
    3 trailing samples or zero variance get a NULL score (not 0 — an
    unscorable bucket is not a normal one). Seasonal delta compares
    to the value exactly 24 rows back (same hour yesterday for an
    hourly series)."""
    w = (Window.partitionBy(*partition_cols).orderBy(order_col)
         .rowsBetween(-trailing, -1))
    lagw = Window.partitionBy(*partition_cols).orderBy(order_col)
    x = F.col(value_col)
    mean = F.avg(x).over(w)
    std = F.stddev_samp(x).over(w)
    n = F.count(x).over(w)
    # 1e-9, not 0: the two engines' stddev differ in the last ulp, so
    # a knife-edge >0 test could flip NULL vs a huge z between them
    z = F.when((n >= 3) & (std > 1e-9), (x - mean) / std)
    yesterday = F.lag(x, 24).over(lagw)
    return (
        buckets
        .withColumn("zscore", F.round(z, 4))
        .withColumn(
            "seasonal_delta",
            F.round(x - yesterday, 6),
        )
        .withColumn(
            "is_anomaly",
            F.coalesce(F.col("zscore") > z_threshold, F.lit(False)),
        )
    )


def slo_burn_rates(
    rates: DataFrame,
    target: float = 0.2,
    long_window_buckets: int = 6,
    threshold: float = 6.0,
    dims: tuple[str, ...] = (),
) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the SRE-workbook rule)
    over hourly (bucket, n_total, n_errors) rows: burn = observed
    error rate / error budget (`target`); a page fires only when the
    LONG window burns hot (sustained budget loss, here 6 h of
    buckets) AND the SHORT window still does (the incident is live,
    not a stale tail) — the pairing that keeps pages actionable.

    Bucket-grain input (the rollup read path): the trailing sums are
    a RANGE window over epoch seconds — missing buckets leave the
    window, so sparse hours don't stretch the long window's span the
    way a ROWS frame would. O(hours) rows end to end. `dims` scores
    each dimension's series independently (per-service SLOs): the
    window partitions on them, so the frame stays
    O(hours × |dims-values|) with no cross-series bleed.
    """
    span = long_window_buckets * 3600 - 1
    w = Window.partitionBy(*[F.col(d) for d in dims]).orderBy(
        F.col("es")
    ).rangeBetween(-span, 0)
    es = F.unix_timestamp("bucket").cast("long")
    # zero-event buckets (a dense zero-filled spine is the natural SLO
    # input) must yield NULL burns and page=False — an unguarded
    # division would crash the whole query under Spark 4's default
    # ANSI mode, not produce a quiet row
    t_short, t_long = F.col("n_total"), F.sum("n_total").over(w)
    burn_s = F.when(
        t_short > 0,
        F.round(F.col("n_errors") / t_short / F.lit(target), 4),
    )
    burn_l = F.when(
        t_long > 0,
        F.round(F.sum("n_errors").over(w) / t_long / F.lit(target), 4),
    )
    return (
        rates.select("bucket", *dims, "n_total", "n_errors")
        .withColumn("es", es)
        .select(
            "bucket",
            *dims,
            "n_total",
            "n_errors",
            burn_s.alias("burn_short"),
            burn_l.alias("burn_long"),
            F.coalesce(
                (burn_s >= threshold) & (burn_l >= threshold), F.lit(False)
            ).alias("page"),
        )
    )
