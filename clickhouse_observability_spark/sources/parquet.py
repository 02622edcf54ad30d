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
