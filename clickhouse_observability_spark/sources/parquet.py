"""Parquet scan helpers over the driver testdata star schema.

(EXT-S6 in SURVEY.md §2.1.) Plain `spark.read.parquet` — Catalyst
handles column pruning + predicate pushdown into the vectorized
reader; nothing custom is needed or wanted here.

One wrinkle: driver testdata timestamp physical types have varied
across rounds — TIMESTAMP(NANOS) (which Spark's reader rejects; read
as raw int64 nanos via `spark.sql.legacy.parquet.nanosAsLong` and
divided to µs exactly like DuckDB does) and plain TIMESTAMP(MICROS)
with isAdjustedToUTC=false (which Spark reads as TIMESTAMP_NTZ).
Both are normalized to TimestampType (LTZ) here under the UTC session
(`ensure_utc`), so every downstream operator sees one timestamp
dtype with identical microsecond values to what DuckDB sees.
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
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            # TIMESTAMP_NTZ wall-clock == the UTC instant under the
            # UTC session; one dtype downstream (unix_micros & friends
            # require TimestampType).
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def parquet_row_count(sf_dir: str, name: str) -> int:
    """Row count straight from the parquet FOOTER (no Spark job) —
    the system.parts cost class: O(#row groups) metadata pages. Reads
    the input file per call (no memoization), so callers resolving a
    corpus-relative knob (e.g. a df-cap fraction) stay honest while
    skipping a full count() job."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(
        os.path.join(sf_dir, f"{name}.parquet")
    ).metadata.num_rows


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
    """Scan with the time-range predicate applied to the RAW stored
    column type BEFORE any dtype normalization.

    A filter on a converted/cast column cannot reach the parquet
    reader; the same bounds expressed in the column's native type
    (int64 nanos, or a TIMESTAMP_NTZ literal for µs-NTZ storage) push
    down to row-group min/max stats (PushedFilters shows
    GreaterThanOrEqual/LessThan), so months outside the range are
    never decoded. This is the testdata equivalent of the
    month-partition pruning the at-rest LogsTable gets for free.
    Bounds are closed-open [frm, to), matching the query template.
    """
    import datetime as dt

    def _naive_utc(v: str) -> dt.datetime:
        d = dt.datetime.fromisoformat(v.replace("Z", "+00:00"))
        if d.tzinfo is not None:
            d = d.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return d

    def _nanos(v: str) -> int:
        d = _naive_utc(v)
        # integer arithmetic from epoch; float seconds would lose ns
        return ((d - dt.datetime(1970, 1, 1)).days * 86_400_000_000
                + (d - dt.datetime(1970, 1, 1)).seconds * 1_000_000
                + (d - dt.datetime(1970, 1, 1)).microseconds) * 1000

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    stored = dict(df.dtypes).get(ts_col)
    if stored == "bigint":
        if frm is not None:
            df = df.filter(F.col(ts_col) >= F.lit(_nanos(frm)))
        if to is not None:
            df = df.filter(F.col(ts_col) < F.lit(_nanos(to)))
        df = df.withColumn(ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000")))
    elif stored == "timestamp_ntz":
        # NTZ-typed literals keep the comparison in the stored type so
        # it pushes down; the cast to LTZ happens after the filter.
        def _ntz_lit(v: str):
            return F.expr(f"TIMESTAMP_NTZ '{_naive_utc(v).isoformat(sep=' ')}'")

        if frm is not None:
            df = df.filter(F.col(ts_col) >= _ntz_lit(frm))
        if to is not None:
            df = df.filter(F.col(ts_col) < _ntz_lit(to))
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    else:
        if frm is not None:
            df = df.filter(F.col(ts_col) >= F.to_timestamp(F.lit(frm)))
        if to is not None:
            df = df.filter(F.col(ts_col) < F.to_timestamp(F.lit(to)))
    return df
