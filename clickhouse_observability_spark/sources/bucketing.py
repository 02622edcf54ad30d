"""Bucketed table layout: co-located fact-fact joins (SURVEY.md §2.3
scale note).

At 100 TB the lineitem⋈orders shuffle IS the query cost. Bucketing
both facts on the join key at write time (`bucketBy` + `sortBy`)
pre-partitions data so Catalyst plans the join with ZERO Exchange —
each task joins bucket i of both sides locally. This module is the
write-side convention; the join itself stays a plain `df.join`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed, bucket-sorted parquet table in the
    session catalog. Sorting within buckets additionally enables
    sort-merge joins without a per-task sort."""
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables. With equal bucket counts on the
    join key, the plan contains no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
