"""Time-series downsampling for dashboard rendering: LTTB.

Largest-Triangle-Three-Buckets (Steinarsson 2013, the algorithm
Grafana/Flot use) picks, per time bucket, the point forming the
largest triangle with the previously selected point and the next
bucket's centroid — preserving visual shape (peaks, dips) far better
than striding or averaging. The reference serves hourly panels over
its backing store (README.md); rendering a month of per-second data
needs exactly this reduction.

Spark-first split of the work:

1. The DATA-SIZED pass is pure JVM: per series, points bucket onto
   the n_out-2 inner grid (first/last points are their own buckets,
   the LTTB contract) and each bucket reduces to its centroid plus
   FOUR extreme candidates (min/max y, first/last x) via min_by/
   max_by — one shuffle keyed on (series, bucket), output n_out rows
   per series regardless of input size.
2. The SELECTION pass runs over those ≤n_out-row groups with
   applyInPandas (Arrow-batched; group size is the render target,
   ~hundreds-thousands — the bounded-group pattern MMR established):
   the sequential LTTB fold picks one candidate per bucket.

Documented approximation: classic LTTB may select ANY point of a
bucket; this implementation selects among the bucket's four extreme
candidates. The triangle-area objective is monotone in the candidate's
signed distance from the (prev, next-centroid) line, so the optimum
over a bucket always lies on the bucket's convex hull in that
direction — the y extremes are the hull's vertical extremes and
catch it in practice (pytest pins equality with exact LTTB on
adversarial fixtures); the x extremes keep endpoint behavior stable
on sparse buckets.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["lttb_downsample"]


def _lttb_select(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact LTTB fold over one series' bucket summaries."""
    pdf = pdf.sort_values("__b").reset_index(drop=True)
    n = len(pdf)
    out_x, out_y = [], []
    # first bucket: its single first point (LTTB keeps endpoints)
    prev = (pdf.loc[0, "cand_x"][0], pdf.loc[0, "cand_y"][0])
    out_x.append(prev[0])
    out_y.append(prev[1])
    for i in range(1, n - 1):
        nxt = (
            (pdf.loc[i + 1, "mean_x"], pdf.loc[i + 1, "mean_y"])
            if i + 1 < n else prev
        )
        best, best_area = None, -1.0
        for cx, cy in zip(pdf.loc[i, "cand_x"], pdf.loc[i, "cand_y"]):
            area = abs(
                (prev[0] - nxt[0]) * (cy - prev[1])
                - (prev[0] - cx) * (nxt[1] - prev[1])
            )
            if area > best_area:
                best, best_area = (cx, cy), area
        prev = best
        out_x.append(best[0])
        out_y.append(best[1])
    if n > 1:
        out_x.append(pdf.loc[n - 1, "cand_x"][-1])
        out_y.append(pdf.loc[n - 1, "cand_y"][-1])
    keys = {c: pdf.loc[0, c] for c in pdf.columns
            if c.startswith("__k_")}
    res = pd.DataFrame({"x": out_x, "y": out_y})
    for c, v in keys.items():
        res[c] = v
    return res


def lttb_downsample(
    df: DataFrame,
    x: str,
    y: str,
    n_out: int,
    partition_by: tuple[str, ...] = (),
) -> DataFrame:
    """Downsample each series to <= n_out visually-representative
    points. `x` is numeric or timestamp (converted to micros), `y`
    numeric. Returns (partition_by..., x, y) with the original x
    dtype. Series with <= n_out points pass through unchanged."""
    if n_out < 3:
        raise ValueError("LTTB needs n_out >= 3 (two endpoints + one)")
    from pyspark.sql import types as T

    xdt = df.schema[x].dataType
    is_ts = isinstance(xdt, (T.TimestampType, T.TimestampNTZType))
    xnum = (F.unix_micros(F.col(x).cast("timestamp")) if is_ts
            else F.col(x).cast("double"))
    keys = list(partition_by)
    kcols = [F.col(k).alias(f"__k_{k}") for k in keys]

    pts = df.select(
        *kcols, xnum.cast("double").alias("__x"),
        F.col(y).cast("double").alias("__y"),
    )
    gb = [f"__k_{k}" for k in keys]
    stats = pts.groupBy(*gb).agg(F.count(F.lit(1)).alias("__n"))
    j = pts.join(F.broadcast(stats), gb) if gb else \
        pts.crossJoin(F.broadcast(stats.limit(1)))
    # INDEX-based buckets, the canonical LTTB partition: point j
    # (0-based sort rank) of the n-2 interior points falls in bucket
    # floor((j*(n_out-2) - 1) / (n-2)) — exact integer arithmetic for
    # the reference's floor(i*every)+1 ranges, including the
    # every-is-integer boundary. First/last points are their own
    # buckets. The rank window and the bucket groupBy share the
    # series key, so this stays one logical repartition per series.
    rn = F.row_number().over(Window.partitionBy(*gb).orderBy("__x"))
    jdf = j.withColumn("__rn", rn)
    inner = n_out - 2
    jj = (F.col("__rn") - 1).cast("long")
    b = F.when(F.col("__rn") == 1, F.lit(0)) \
        .when(F.col("__rn") == F.col("__n"), F.lit(n_out - 1)) \
        .otherwise(
            (F.floor((jj * inner - 1) / (F.col("__n") - 2)) + 1)
            .cast("int"))
    small = F.col("__n") <= n_out
    bucketed = jdf.withColumn(
        "__b", F.when(small, F.col("__rn") - 1).otherwise(b))
    # per bucket: centroid + the four extreme candidates (first-x,
    # min-y, max-y, last-x in that order; _lttb_select uses [0] of
    # bucket 0 and [-1] of the last as the exact endpoints)
    summ = bucketed.groupBy(*gb, "__b").agg(
        F.avg("__x").alias("mean_x"), F.avg("__y").alias("mean_y"),
        F.array(
            F.min_by("__x", "__x"), F.min_by("__x", "__y"),
            F.max_by("__x", "__y"), F.max_by("__x", "__x"),
        ).alias("cand_x"),
        F.array(
            F.min_by("__y", "__x"), F.min("__y"),
            F.max("__y"), F.max_by("__y", "__x"),
        ).alias("cand_y"),
    )
    out_schema = ", ".join(
        ["x double", "y double"]
        + [f"__k_{k} {df.schema[k].dataType.simpleString()}"
           for k in keys]
    )
    # group sizes are <= n_out (the render target): the bounded
    # applyInPandas pattern
    if gb:
        grouped = summ.groupBy(*gb)
    else:
        grouped = summ.withColumn("__g", F.lit(1)).groupBy("__g")
    sel = grouped.applyInPandas(_lttb_select, out_schema)
    final = [
        *[F.col(f"__k_{k}").alias(k) for k in keys],
        (F.timestamp_micros(F.col("x").cast("long")).alias(x) if is_ts
         else F.col("x").cast(xdt).alias(x)),
        F.col("y").alias(y),
    ]
    return sel.select(*final)
