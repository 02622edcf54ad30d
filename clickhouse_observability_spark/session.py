"""SparkSession bootstrap.

The reference pins all time handling to UTC (internal/api/api.go:66-67,
internal/service/service.go:24); we pin the Spark session timezone the
same way. Everything else is scale-oriented defaults: AQE on (runtime
shuffle-partition coalescing + skew-join splitting), parquet filter
pushdown on, Arrow enabled for the few Pandas-UDF code paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

APP_NAME = "clickhouse-observability-spark"


def get_spark(app_name: str = APP_NAME, cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) or all
    local cores. On a real cluster the master/config come from
    spark-submit; these settings are safe there too.
    """
    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or "*"
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # TakeOrderedAndProject allocates an O(limit) top-k buffer PER
        # TASK; above this threshold Spark falls back to sort+limit,
        # which spills instead of OOMing on absurd limits.
        .config("spark.sql.execution.topKSortFallbackThreshold", "100000")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if SparkSession.getActiveSession() is None:
        builder = builder.master(os.environ.get("SPARK_MASTER", f"local[{n}]"))
    return builder.getOrCreate()


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone to UTC (runtime-settable).

    Called at the top of every public query entry point so results are
    stable even when the caller built the session without
    ``get_spark`` (e.g. the correctness driver).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


# -- per-invocation shared-subtree persist (r13 optimization round) ---
#
# For operators whose plan uses one expensive subtree several times
# (Spark evaluates each reference from scratch — ReusedExchange does
# not fire across these shapes), persist() the subtree ONCE PER
# INVOCATION and evict the previous invocation's entry at the next
# call to the same slot. Eviction-before-persist means a repeat call
# on the same input can never CacheManager-match the old cached data
# (cross-run result caching is banned for the bench/oracle surface:
# every invocation recomputes from the parquet inputs); persist (not
# localCheckpoint) keeps lineage, so evicting under a still-lazy
# earlier frame degrades to recompute instead of failing. A session
# holds at most one live cached frame per slot.
_FRESH_PERSISTED: dict = {}


def fresh_persist(df, slot: str):
    old = _FRESH_PERSISTED.pop(slot, None)
    if old is not None:
        try:
            old.unpersist()
        except Exception:
            pass
    df = df.persist()
    _FRESH_PERSISTED[slot] = df
    return df


def release_fresh_persists() -> int:
    """Unpersist every live fresh_persist slot (r14, verdict #9 —
    the lifecycle hook the removed release_lsh_caches() used to be):
    the last invocation's frame otherwise stays pinned in executor
    storage until the next same-slot call or session end. Lineage
    survives unpersist, so a caller still holding the frame lazily
    degrades to recompute, never fails. Returns the number of slots
    released; call from session-teardown / bench-cleanup paths."""
    n = 0
    for slot in list(_FRESH_PERSISTED):
        old = _FRESH_PERSISTED.pop(slot, None)
        if old is not None:
            try:
                old.unpersist()
            except Exception:
                pass
            n += 1
    return n


def local_df(spark: SparkSession, rows, schema):
    """DataFrame from driver-local rows in ONE partition.

    `createDataFrame(list)` slices local data into defaultParallelism
    (32) pickled partitions; a later `.coalesce(1)` then makes ONE
    task evaluate all 32 Python sub-partitions SEQUENTIALLY (~150 ms
    of Python-runner round-trip each — measured ~5 s per tiny sidecar
    write, r5). Parallelizing with numSlices=1 up front makes the
    same write ~0.3 s. Use for index METADATA frames (means rows,
    codebooks, drop-lists) — anything corpus-sized stays on the
    normal distributed path."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(list(rows), 1), schema
    )
