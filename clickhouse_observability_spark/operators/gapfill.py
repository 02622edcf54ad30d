"""Gap filling: ClickHouse `ORDER BY ... WITH FILL` as a DataFrame op.

ClickHouse densifies a sorted result stream by walking it once and
inserting, between each pair of neighbouring rows, the axis values
`prev + STEP, prev + 2*STEP, ...` while they stay below the next
row's value — i.e. the fill grid re-anchors at every real row, which
matters when real values sit off-grid. `FROM` prepends a lead-in grid
before the first row and `TO` appends a tail after the last
(exclusive). The reference's query surface is CH SQL (README.md
panels are time-ordered series), where WITH FILL is the standard
densify idiom for time axes; `functions/ch_dialect.py` routes the
clause here.

Spark-first shape: ONE window pass (`lead` over the axis) computes
each row's gap, then every row *generates its own following fill
rows* via `sequence`/`transform` + `explode` — fully distributed, no
driver loop, no second shuffle beyond the window sort. With
`partition_by` keys the window is partitioned and each group fills
independently (the multi-key `ORDER BY k1, ..., axis WITH FILL`
shape); without keys it is the same single-sorted-stream bound as
ClickHouse's own initiator-node fill — a *reporting-size* operator
by construction, applied after aggregation has shrunk the data.

Documented divergence (same in-band convention as the WITH TOTALS
translation): filled rows carry NULL in non-axis columns — Spark's
idiom for "no data" — where ClickHouse substitutes type defaults
(0, ''). `interpolate` columns instead carry the previous real row's
value forward (CH `INTERPOLATE (col)`), or — the CH
`INTERPOLATE (col AS expr)` form — derive each fill row's value from
the previous REAL row and the row's 1-based position in its gap via
a caller-supplied callable. CH applies the expression iteratively
(fill row i sees fill row i-1); the callable receives (prev_real,
i) so iterable-in-closed-form expressions (carry, constants, col ±
k, col * k) reproduce CH exactly, and the dialect layer refuses the
forms that have no closed form rather than diverging silently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["gap_fill", "interval_to_micros"]

# fixed-length interval units -> microseconds (months/quarters/years
# are variable-length and cannot anchor an arithmetic fill grid)
_FIXED_INTERVAL_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 7 * 86_400_000_000,
}


def interval_to_micros(n: float, unit: str) -> int:
    u = unit.lower().rstrip("s")
    if u not in _FIXED_INTERVAL_US:
        raise ValueError(
            f"only fixed-length interval steps are supported "
            f"({sorted(_FIXED_INTERVAL_US)}), got {unit!r}; a month/"
            f"quarter/year grid is calendar-dependent — bucket with "
            f"date_trunc instead")
    us = n * _FIXED_INTERVAL_US[u]
    if us != int(us) or int(us) <= 0:
        raise ValueError(f"step must be a positive whole number of "
                         f"microseconds, got {n} {unit}")
    return int(us)


def gap_fill(
    df: DataFrame,
    axis: str,
    step,
    *,
    from_value=None,
    to_value=None,
    partition_by: tuple[str, ...] = (),
    interpolate=(),
    descending: bool = False,
    max_fill_per_gap: int = 1_000_000,
) -> DataFrame:
    """Insert rows so `axis` steps by `step` between neighbours.

    axis: a numeric, date or timestamp column of `df`. step: a
    positive number (numeric axis), microseconds (timestamp axis —
    use `interval_to_micros`), or whole DAYS (date axis, the CH
    convention for Date fills). from_value/to_value: optional bounds in
    the axis domain (python literal or Column); `from` prepends a
    lead-in grid before the first row, `to` (exclusive) extends the
    tail after the last. With `descending`, the stream is filled
    high-to-low (CH `ORDER BY x DESC WITH FILL`). `max_fill_per_gap`
    bounds the rows any single gap may generate (a `TO` far beyond
    the data with a tiny step would otherwise materialize an
    unbounded array in one task) — exceeding it raises.

    interpolate: which non-axis columns fill rows should populate.
    A tuple of names carries the previous real row's value forward
    (CH `INTERPOLATE (col)`); a dict maps name -> None (carry) or a
    callable `(prev: Column, i: Column) -> Column` receiving the
    previous REAL row's value and the fill row's 1-based index in
    its gap (CH `INTERPOLATE (col AS expr)` in closed form — e.g.
    `lambda prev, i: prev + i * F.lit(10)` for `col AS col + 10`).

    Returns real rows plus fill rows, unsorted; callers order by
    (partition_by..., axis).
    """
    interp: dict = (dict(interpolate) if isinstance(interpolate, dict)
                    else {c: None for c in interpolate})
    if axis in partition_by or axis in interp:
        raise ValueError("axis cannot be a partition or interpolate key")
    dt = df.schema[axis].dataType
    is_ts = isinstance(dt, (T.TimestampType, T.TimestampNTZType))
    is_date = isinstance(dt, T.DateType)
    is_frac = isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType))
    if not (is_ts or is_date or is_frac
            or isinstance(dt, T.NumericType)):
        raise ValueError(f"gap_fill axis must be numeric, date or "
                         f"timestamp, got {dt.simpleString()}")
    sign = -1 if descending else 1

    def num(c: Column) -> Column:
        # map the axis into an orderable arithmetic domain (micros
        # for timestamps, days for dates); descending negates so the
        # ascending fill algebra below covers both directions
        if is_ts:
            c = F.unix_micros(c.cast("timestamp"))
        elif is_date:
            c = F.unix_date(c.cast("date"))
        elif is_frac:
            c = c.cast("double")
        else:
            c = c.cast("long")
        return c * sign

    def denum(v: Column) -> Column:
        v = v * sign
        if is_ts:
            return F.timestamp_micros(v.cast("long")).cast(dt)
        if is_date:
            return F.date_from_unix_date(v.cast("int"))
        return v.cast(dt)

    if is_frac:
        step_num = float(step)
    else:
        step_num = int(step)
        if step_num != step:
            raise ValueError(f"non-integral step {step} for integral axis")
    if step_num <= 0:
        raise ValueError(f"step must be positive, got {step}")

    def bound(v) -> Column:
        if v is None:
            return F.lit(None).cast("double" if is_frac else "long")
        return num(v if isinstance(v, Column) else F.lit(v))

    axn = F.col("__gf_n")
    nxt = F.col("__gf_nxt")
    stp = F.lit(step_num)
    w = Window.partitionBy(*partition_by).orderBy("__gf_n")
    g = (
        df.withColumn("__gf_n", num(F.col(axis)))
        .withColumn("__gf_nxt", F.lead("__gf_n").over(w))
        .withColumn("__gf_rn", F.row_number().over(w))
    )

    def guarded(n: Column) -> Column:
        # assert_true throws task-side when a single gap would
        # explode past the bound; NULL (assert passed) otherwise
        return F.when(
            F.assert_true(
                n <= F.lit(max_fill_per_gap),
                F.lit(f"gap_fill: a single gap exceeds max_fill_per_gap="
                      f"{max_fill_per_gap}; widen the step or bound TO"),
            ).isNull(),
            n,
        ).cast("int")

    def grid(start: Column, count: Column, carry: bool) -> DataFrame:
        """count fill values start, start+step, ... as full-schema
        rows; the exploded 1-based gap index also feeds interpolation
        callables (CH `INTERPOLATE (col AS expr)` closed forms)."""
        idx_t = "double" if is_frac else "long"
        idxs = F.when(count >= 1, F.sequence(F.lit(1), guarded(count)))
        ex = g.withColumn("__gf_i", F.explode(idxs))
        i_col = F.col("__gf_i")
        val = start + (i_col - 1).cast(idx_t) * stp
        cols = []
        for c in df.columns:
            if c == axis:
                cols.append(denum(val).alias(c))
            elif c in partition_by:
                cols.append(F.col(c))
            elif carry and c in interp:
                fn = interp[c]
                v = F.col(c) if fn is None else fn(F.col(c), i_col)
                cols.append(v.cast(df.schema[c].dataType).alias(c))
            else:
                cols.append(F.lit(None).cast(df.schema[c].dataType).alias(c))
        return ex.select(*cols)

    # rows strictly inside (row, next-or-TO): re-anchored at each row
    upper = F.when(nxt.isNotNull(), nxt).otherwise(bound(to_value))
    if is_frac:
        n_after = F.ceil((upper - axn) / stp) - 1
    else:
        n_after = F.floor((upper - axn - F.lit(1)) / stp)
    n_after = F.when(upper > axn, n_after).otherwise(F.lit(0))
    out = df.unionByName(grid(axn + stp, n_after, carry=True))

    if from_value is not None:
        # lead-in grid FROM, FROM+step, ... strictly below the first
        # row of each partition; nothing precedes it, so interpolate
        # columns stay NULL (CH: no previous value to carry)
        frm = bound(from_value)
        if is_frac:
            n_head = F.ceil((axn - frm) / stp)
        else:
            n_head = F.floor((axn - frm - F.lit(1)) / stp) + 1
        n_head = F.when(
            (F.col("__gf_rn") == 1) & (frm < axn), n_head
        ).otherwise(F.lit(0))
        out = out.unionByName(grid(frm, n_head, carry=False))
    return out
