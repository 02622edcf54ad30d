"""gap_fill operator + CH `ORDER BY ... WITH FILL` dialect wiring."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from clickhouse_observability_spark.functions.ch_dialect import (
    ChDialectError,
    ch_sql,
    translate,
)
from clickhouse_observability_spark.operators.gapfill import (
    gap_fill,
    interval_to_micros,
)


def _axis_vals(df, axis="x", **kw):
    return [r[axis] for r in df.orderBy(*kw.get("order", [axis])).collect()]


def test_int_axis_basic_and_interpolate(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (4, "b", 40), (6, "c", 60)], "x int, s string, v int"
    )
    out = gap_fill(df, "x", 1, interpolate=("v",)).orderBy("x")
    rows = out.collect()
    assert [r.x for r in rows] == [1, 2, 3, 4, 5, 6]
    # fill rows: s NULL, v carried from the previous real row
    by_x = {r.x: r for r in rows}
    assert by_x[2].s is None and by_x[2].v == 10
    assert by_x[3].v == 10 and by_x[5].v == 40
    assert by_x[4].s == "b"  # real rows untouched


def test_step_grid_is_reanchored_at_real_rows(spark):
    # CH walks the sorted stream: fills restart from each real value,
    # so off-grid rows shift the grid (0.0 -> 1.0, 2.0; then 2.5 ...)
    df = spark.createDataFrame([(0.0,), (2.5,)], "x double")
    out = gap_fill(df, "x", 1.0, to_value=5.0)
    assert _axis_vals(out) == [0.0, 1.0, 2.0, 2.5, 3.5, 4.5]


def test_from_to_bounds_exclusive_to(spark):
    df = spark.createDataFrame([(1,), (3,)], "x int")
    out = gap_fill(df, "x", 1, from_value=-2, to_value=6)
    assert _axis_vals(out) == [-2, -1, 0, 1, 2, 3, 4, 5]
    # FROM at/above the first row adds nothing
    out2 = gap_fill(df, "x", 1, from_value=1)
    assert _axis_vals(out2) == [1, 2, 3]


def test_partitioned_fill_restarts_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 10), ("b", 12)], "g string, x int"
    )
    out = gap_fill(df, "x", 1, partition_by=("g",)).orderBy("g", "x")
    got = [(r.g, r.x) for r in out.collect()]
    assert got == [("a", 1), ("a", 2), ("a", 3),
                   ("b", 10), ("b", 11), ("b", 12)]


def test_descending_with_bounds(spark):
    df = spark.createDataFrame([(10,), (7,)], "x int")
    out = gap_fill(df, "x", 1, from_value=12, to_value=5, descending=True)
    assert _axis_vals(out, order=[F.col("x").desc()]) == [
        12, 11, 10, 9, 8, 7, 6]


def test_timestamp_axis_interval_step(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [(t0, 1), (t0 + dt.timedelta(hours=3), 2)], "x timestamp, v int"
    )
    out = gap_fill(df, "x", interval_to_micros(1, "hour"),
                   interpolate=("v",))
    rows = out.orderBy("x").collect()
    assert [r.x for r in rows] == [
        t0 + dt.timedelta(hours=h) for h in range(4)]
    assert [r.v for r in rows] == [1, 1, 1, 2]


def test_max_fill_per_gap_guard(spark):
    df = spark.createDataFrame([(0,), (10_000,)], "x int")
    with pytest.raises(Exception, match="max_fill_per_gap"):
        gap_fill(df, "x", 1, max_fill_per_gap=100).count()


def test_interval_to_micros_rejects_calendar_units():
    assert interval_to_micros(2, "hours") == 7_200_000_000
    with pytest.raises(ValueError, match="month"):
        interval_to_micros(1, "month")


def test_dialect_with_fill_end_to_end(spark):
    t = dt.datetime(2024, 3, 1)
    rows = [(t, "api", 5), (t + dt.timedelta(hours=2), "api", 7),
            (t + dt.timedelta(hours=3), "api", 9)]
    spark.createDataFrame(rows, "ts timestamp, service string, n int") \
        .createOrReplaceTempView("twf")
    out = ch_sql(spark, (
        "SELECT toStartOfHour(ts) AS h, max(n) AS m FROM twf "
        "GROUP BY h ORDER BY h WITH FILL STEP INTERVAL 1 HOUR "
        "INTERPOLATE (m)"
    )).collect()
    assert [r.h for r in out] == [t + dt.timedelta(hours=k)
                                  for k in range(4)]
    assert [r.m for r in out] == [5, 5, 7, 9]
    # FROM/TO bounds + post-fill LIMIT; no INTERPOLATE -> NULL fills
    out2 = ch_sql(spark, (
        "SELECT toStartOfHour(ts) AS h, max(n) AS m FROM twf GROUP BY h "
        "ORDER BY h WITH FILL "
        "FROM toDateTime('2024-02-29 22:00:00') "
        "TO toDateTime('2024-03-01 06:00:00') "
        "STEP INTERVAL 1 HOUR LIMIT 4"
    )).collect()
    assert [r.h for r in out2] == [
        dt.datetime(2024, 2, 29, 22) + dt.timedelta(hours=k)
        for k in range(4)]
    assert [r.m for r in out2] == [None, None, 5, None]


def test_dialect_with_fill_grouped_axis(spark):
    spark.createDataFrame(
        [("a", 1, 10), ("a", 3, 30), ("b", 7, 70)],
        "g string, x int, v int",
    ).createOrReplaceTempView("twg")
    out = ch_sql(spark, (
        "SELECT g, x, v FROM twg ORDER BY g, x WITH FILL"
    )).collect()
    assert [(r.g, r.x, r.v) for r in out] == [
        ("a", 1, 10), ("a", 2, None), ("a", 3, 30), ("b", 7, 70)]


def test_dialect_with_fill_errors(spark):
    spark.range(1).selectExpr("id AS x", "id AS y") \
        .createOrReplaceTempView("twe")
    with pytest.raises(ChDialectError, match="projected column name"):
        ch_sql(spark, "SELECT x FROM twe ORDER BY x + 1 WITH FILL")
    with pytest.raises(ChDialectError, match="does not project"):
        ch_sql(spark, "SELECT y FROM twe ORDER BY x WITH FILL")
    with pytest.raises(ChDialectError, match="one ORDER BY column"):
        ch_sql(spark,
               "SELECT x, y FROM twe ORDER BY x WITH FILL, y WITH FILL")
    # expression interpolation supports only iterated-closed-form
    # shapes (col, literal, col ± k, col * k); anything else raises
    with pytest.raises(ChDialectError, match="closed-form"):
        ch_sql(spark, "SELECT x, y FROM twe ORDER BY x WITH FILL "
                      "INTERPOLATE (y AS y * y)")
    with pytest.raises(ChDialectError, match="closed-form"):
        ch_sql(spark, "SELECT x, y FROM twe ORDER BY x WITH FILL "
                      "INTERPOLATE (y AS x + 1)")
    with pytest.raises(ChDialectError, match="month"):
        ch_sql(spark, "SELECT x FROM twe ORDER BY x WITH FILL "
                      "STEP INTERVAL 1 MONTH")
    with pytest.raises(ChDialectError, match="negative STEP"):
        ch_sql(spark, "SELECT x FROM twe ORDER BY x WITH FILL STEP -1")
    with pytest.raises(ChDialectError, match="subquery"):
        ch_sql(spark, "SELECT * FROM (SELECT x FROM twe "
                      "ORDER BY x WITH FILL) q")
    # translate() alone still refuses (cannot express fill as text)
    with pytest.raises(ChDialectError, match="ch_sql"):
        translate("SELECT x FROM twe ORDER BY x WITH FILL")


def test_dialect_interpolate_expressions(spark):
    """CH `INTERPOLATE (col AS expr)` evaluates expr iteratively —
    fill row i sees fill row i-1's values. The supported closed
    forms reproduce that exactly: after i fills, col+k yields
    prev + i*k, col*k yields prev * k^i, a literal stays constant."""
    spark.createDataFrame(
        [(1, 100, 2.0, 9), (5, 200, 32.0, 9)],
        "x int, a int, m double, c int",
    ).createOrReplaceTempView("twix")
    out = ch_sql(spark, (
        "SELECT x, a, m, c FROM twix ORDER BY x WITH FILL "
        "INTERPOLATE (a AS a + 10, m AS m * 2, c AS 7)"
    )).collect()
    assert [(r.x, r.a, r.m, r.c) for r in out] == [
        (1, 100, 2.0, 9),
        (2, 110, 4.0, 7),   # iterated once
        (3, 120, 8.0, 7),   # twice
        (4, 130, 16.0, 7),  # three times
        (5, 200, 32.0, 9),  # real row resets the anchor
    ]
    # `col AS col` and `col AS col - k` forms
    out = ch_sql(spark, (
        "SELECT x, a FROM twix ORDER BY x WITH FILL "
        "INTERPOLATE (a AS a - 50)"
    )).collect()
    assert [(r.x, r.a) for r in out] == [
        (1, 100), (2, 50), (3, 0), (4, -50), (5, 200)]


def test_dialect_bare_interpolate_carries_all(spark):
    spark.createDataFrame(
        [(1, "p", 5), (3, "q", 9)], "x int, s string, v int"
    ).createOrReplaceTempView("twi")
    out = ch_sql(
        spark, "SELECT x, s, v FROM twi ORDER BY x WITH FILL INTERPOLATE"
    ).collect()
    assert [(r.x, r.s, r.v) for r in out] == [
        (1, "p", 5), (2, "p", 5), (3, "q", 9)]


def test_date_axis_fill(spark):
    import datetime as _dt

    df = spark.createDataFrame(
        [(_dt.date(2024, 3, 1), 1), (_dt.date(2024, 3, 4), 4)],
        "x date, v int")
    out = gap_fill(df, "x", 1, interpolate=("v",)).orderBy("x").collect()
    assert [r.x for r in out] == [
        _dt.date(2024, 3, 1) + _dt.timedelta(days=k) for k in range(4)]
    assert [r.v for r in out] == [1, 1, 1, 4]
    # dialect: Date axis takes whole-day INTERVAL or numeric-day STEP
    spark.createDataFrame(
        [(_dt.date(2024, 3, 1), 1), (_dt.date(2024, 3, 5), 5)],
        "d date, v int").createOrReplaceTempView("twd")
    got = ch_sql(spark, (
        "SELECT d, v FROM twd ORDER BY d WITH FILL STEP INTERVAL 2 DAY"
    )).collect()
    assert [r.d for r in got] == [
        _dt.date(2024, 3, 1), _dt.date(2024, 3, 3), _dt.date(2024, 3, 5)]
    with pytest.raises(ChDialectError, match="whole-day"):
        ch_sql(spark,
               "SELECT d FROM twd ORDER BY d WITH FILL "
               "STEP INTERVAL 1 HOUR")
    # unsupported axis type raises the operator's message, not a
    # raw cast error
    with pytest.raises(Exception, match="numeric, date or timestamp"):
        gap_fill(spark.createDataFrame([("a",)], "x string"), "x", 1)
