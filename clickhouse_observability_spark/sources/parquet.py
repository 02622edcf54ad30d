"""Parquet scan helpers over the driver testdata star schema.

(EXT-S6 in SURVEY.md §2.1.) Plain `spark.read.parquet` — Catalyst
handles column pruning + predicate pushdown into the vectorized
reader; nothing custom is needed or wanted here.

One wrinkle: the driver testdata stores timestamps as parquet
TIMESTAMP(NANOS), which Spark's reader rejects outright. We read them
as raw int64 nanos (`spark.sql.legacy.parquet.nanosAsLong`) and
convert to TimestampType with exact integer division (`div 1000`,
truncating to µs exactly like DuckDB does), so both engines see
identical microsecond values.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_observability_spark.schema import TESTDATA_TABLES

# Columns stored as TIMESTAMP(NANOS) in the driver parquet.
NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in NANO_TS_COLUMNS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # int64 nanos -> µs (exact integer division; float div would
            # lose ulps at 2^60 magnitudes) -> timestamp.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def load_table_ts_range(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    ts_col: str,
    frm: str | None = None,
    to: str | None = None,
) -> DataFrame:
    """Scan with the time-range predicate applied to the RAW int64
    nanos column BEFORE timestamp conversion.

    A filter on `timestamp_micros(ts div 1000)` cannot reach the
    parquet reader; the same bounds expressed on the raw long column
    push down to row-group min/max stats (PushedFilters shows
    GreaterThanOrEqual/LessThan on the nanos), so months outside the
    range are never decoded. This is the testdata equivalent of the
    month-partition pruning the at-rest LogsTable gets for free.
    Bounds are closed-open [frm, to), matching the query template.
    """
    import datetime as dt

    def _nanos(v: str) -> int:
        d = dt.datetime.fromisoformat(v.replace("Z", "+00:00"))
        if d.tzinfo is not None:
            d = d.astimezone(dt.timezone.utc).replace(tzinfo=None)
        # integer arithmetic from epoch; float seconds would lose ns
        return ((d - dt.datetime(1970, 1, 1)).days * 86_400_000_000
                + (d - dt.datetime(1970, 1, 1)).seconds * 1_000_000
                + (d - dt.datetime(1970, 1, 1)).microseconds) * 1000

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if dict(df.dtypes).get(ts_col) == "bigint":
        if frm is not None:
            df = df.filter(F.col(ts_col) >= F.lit(_nanos(frm)))
        if to is not None:
            df = df.filter(F.col(ts_col) < F.lit(_nanos(to)))
        df = df.withColumn(ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000")))
    else:
        if frm is not None:
            df = df.filter(F.col(ts_col) >= F.to_timestamp(F.lit(frm)))
        if to is not None:
            df = df.filter(F.col(ts_col) < F.to_timestamp(F.lit(to)))
    return df
