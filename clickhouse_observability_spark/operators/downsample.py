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

__all__ = ["lttb_downsample", "lttb_downsample_exact"]


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


def _lttb_select_exact(pdf: pd.DataFrame) -> pd.DataFrame:
    """LTTB fold over one series' bucket summaries, cross-engine
    deterministic: every decision input is an exact integer (x
    re-based to the series start, y in quantized units, bucket sums
    as integers) and every float op mirrors one SQL-side IEEE op —
    see lttb_downsample_exact. Candidate order is (first-x, min-y,
    max-y, last-x); strict > keeps the earliest on area ties."""
    pdf = pdf.sort_values("__b").reset_index(drop=True)
    n = len(pdf)
    px, pq = int(pdf.loc[0, "c1x"]), int(pdf.loc[0, "c1q"])
    out_x, out_y = [px], [pdf.loc[0, "c1y"]]
    for i in range(1, n - 1):
        n1 = int(pdf.loc[i + 1, "nb"])
        # exact ints; float() = one nearest-even conversion, matching
        # SQL CAST(... AS DOUBLE) over the identical integer
        term1 = float(px * n1 - int(pdf.loc[i + 1, "sx"]))
        term3 = float(int(pdf.loc[i + 1, "sq"]) - pq * n1)
        best_k, best_area = None, None
        for k in (1, 2, 3, 4):
            cx = int(pdf.loc[i, f"c{k}x"])
            cq = int(pdf.loc[i, f"c{k}q"])
            area = abs(term1 * float(cq - pq) - float(px - cx) * term3)
            if best_area is None or area > best_area:
                best_k, best_area = k, area
        px = int(pdf.loc[i, f"c{best_k}x"])
        pq = int(pdf.loc[i, f"c{best_k}q"])
        out_x.append(px)
        out_y.append(pdf.loc[i, f"c{best_k}y"])
    if n > 1:
        out_x.append(int(pdf.loc[n - 1, "c4x"]))
        out_y.append(pdf.loc[n - 1, "c4y"])
    res = pd.DataFrame({"xr": pd.Series(out_x, dtype="int64"),
                        "y": pd.Series(out_y, dtype="float64")})
    res["x0"] = int(pdf.loc[0, "x0"])
    for c in pdf.columns:
        if c.startswith("__k_"):
            res[c] = pdf.loc[0, c]
    return res


def lttb_downsample_exact(
    df: DataFrame,
    x: str,
    y: str,
    n_out: int,
    partition_by: tuple[str, ...] = (),
    y_units: int = 10_000,
) -> DataFrame:
    """LTTB with CROSS-ENGINE-DETERMINISTIC selection — the oracle-
    adjudicable arm of `lttb_downsample` (r9 verdict #4).

    Same bucket partition and candidate restriction as the float arm,
    but every fold decision is derived from exact integers so an
    independent engine (the DuckDB oracle) replays it bit-for-bit:

    - x re-bases to the series' min timestamp (micros), keeping all
      x values and bucket x-sums exact BIGINTs (a raw epoch-micros
      sum overflows double's 2^53 integer range and its partial-sum
      order would then change the low bits per engine/run);
    - y quantizes to `y_units` integer units (lossless when the
      column carries <= log10(y_units) decimal digits — testdata
      `value` has 4); the ORIGINAL y is carried for output;
    - bucket centroids stay as (sum, count) rational pairs; the
      triangle-area comparison is multiplied through by the next
      bucket's count, so areas are |CAST(int)*CAST(int) -
      CAST(int)*CAST(int)| — two IEEE multiplies and a subtract over
      bit-identical integers, identical in any engine. Bound: the
      intermediate `x_rel * bucket_count` must stay under 2^63
      (~9e18; a 1-year-micros series holds to ~300M rows/series —
      repartition the time axis beyond that);
    - candidates take deterministic struct tie-breaks:
      first-x = min(x, yq, y), min-y = min(yq, x, y),
      max-y = max(yq, x, y), last-x = max(x, yq, y);
    - the rank order (x, yq, y) is a total order over distinct rows,
      so bucket membership is reproducible under duplicates.

    Output (partition_by..., x, y): x restored to the original axis,
    y the original double. Series with <= n_out points pass through
    unchanged (both engines' small arm)."""
    if n_out < 3:
        raise ValueError("LTTB needs n_out >= 3 (two endpoints + one)")
    from pyspark.sql import types as T

    xdt = df.schema[x].dataType
    is_ts = isinstance(xdt, (T.TimestampType, T.TimestampNTZType))
    xnum = (F.unix_micros(F.col(x).cast("timestamp")) if is_ts
            else F.col(x).cast("long"))
    keys = list(partition_by)
    kcols = [F.col(k).alias(f"__k_{k}") for k in keys]
    gb = [f"__k_{k}" for k in keys]

    pts = df.select(
        *kcols, xnum.alias("__xl"),
        F.col(y).cast("double").alias("__y"),
    ).withColumn(
        "__yq", F.round(F.col("__y") * y_units).cast("long"))
    stats = pts.groupBy(*gb).agg(
        F.count(F.lit(1)).alias("__n"), F.min("__xl").alias("x0"))
    j = pts.join(F.broadcast(stats), gb) if gb else \
        pts.crossJoin(F.broadcast(stats.limit(1)))
    j = j.withColumn("__xr", F.col("__xl") - F.col("x0"))
    rn = F.row_number().over(
        Window.partitionBy(*gb).orderBy("__xr", "__yq", "__y"))
    jdf = j.withColumn("__rn", rn)
    inner = n_out - 2
    # integer division (numerator >= 0 for interior points): exact on
    # both engines, no float quotient anywhere near a floor boundary
    b = F.when(F.col("__rn") == 1, F.lit(0)) \
        .when(F.col("__rn") == F.col("__n"), F.lit(n_out - 1)) \
        .otherwise(
            F.expr(
                f"CAST((CAST(__rn - 1 AS BIGINT) * {inner} - 1) "
                f"div (__n - 2) AS INT) + 1"))
    small = F.col("__n") <= n_out
    big = jdf.filter(~small).withColumn("__b", b)

    summ = big.groupBy(*gb, "x0", "__b").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("__xr").alias("sx"), F.sum("__yq").alias("sq"),
        F.min(F.struct("__xr", "__yq", "__y")).alias("s1"),
        F.min(F.struct("__yq", "__xr", "__y")).alias("s2"),
        F.max(F.struct("__yq", "__xr", "__y")).alias("s3"),
        F.max(F.struct("__xr", "__yq", "__y")).alias("s4"),
    ).select(
        *gb, "x0", "__b", "nb", "sx", "sq",
        F.col("s1.__xr").alias("c1x"), F.col("s1.__yq").alias("c1q"),
        F.col("s1.__y").alias("c1y"),
        F.col("s2.__xr").alias("c2x"), F.col("s2.__yq").alias("c2q"),
        F.col("s2.__y").alias("c2y"),
        F.col("s3.__xr").alias("c3x"), F.col("s3.__yq").alias("c3q"),
        F.col("s3.__y").alias("c3y"),
        F.col("s4.__xr").alias("c4x"), F.col("s4.__yq").alias("c4q"),
        F.col("s4.__y").alias("c4y"),
    )
    out_schema = ", ".join(
        ["xr bigint", "y double", "x0 bigint"]
        + [f"__k_{k} {df.schema[k].dataType.simpleString()}"
           for k in keys]
    )
    grouped = summ.groupBy(*gb) if gb else \
        summ.withColumn("__g", F.lit(1)).groupBy("__g")
    sel = grouped.applyInPandas(_lttb_select_exact, out_schema)
    xl = F.col("x0") + F.col("xr")
    final_x = (F.timestamp_micros(xl).alias(x) if is_ts
               else xl.cast(xdt).alias(x))
    downsampled = sel.select(
        *[F.col(f"__k_{k}").alias(k) for k in keys], final_x,
        F.col("y").alias(y))
    passthrough = jdf.filter(small).select(
        *[F.col(f"__k_{k}").alias(k) for k in keys],
        (F.timestamp_micros(F.col("__xl")).alias(x) if is_ts
         else F.col("__xl").cast(xdt).alias(x)),
        F.col("__y").alias(y))
    return downsampled.unionByName(passthrough)
