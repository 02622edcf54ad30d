"""TTL retention + compaction jobs (S4 in SURVEY.md §2.1, §4).

The reference arms a ClickHouse TTL — `ALTER TABLE logs MODIFY TTL
ts + INTERVAL <N> DAY DELETE` driven by $RETENTION_DAYS
(internal/db/db.go:59-66) — and relies on MergeTree background merges
(db.go:50). Spark equivalents are explicit jobs:

- retention: drop whole month partition directories strictly older
  than the cutoff month (cheap, no data rewrite — the 100 TB path),
  then exactly delete the in-boundary-month rows older than the
  cutoff by rewriting just that one partition;
- compaction: rewrite a partition's small files into few large ones
  (row-group sized), preserving the (service, ts) sort.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from clickhouse_observability_spark.schema import LOGS_COLUMNS, PARTITION_COLUMN


def set_table_ttl(path: str, days: int | None) -> None:
    """Persist (or clear) the table's armed TTL — the at-rest state
    behind CH `ALTER TABLE ... MODIFY TTL ts + INTERVAL n DAY DELETE`
    / `REMOVE TTL`. The retention job consults it before the env."""
    import json

    p = os.path.join(path, "_ttl.json")
    if days is None:
        try:
            os.remove(p)
        except FileNotFoundError:
            pass
        return
    os.makedirs(path, exist_ok=True)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"retention_days": int(days)}, f)
    os.replace(tmp, p)


def read_table_ttl(path: str) -> int | None:
    import json

    p = os.path.join(path, "_ttl.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(json.load(f)["retention_days"])


def _partition_months(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        if d.startswith(f"{PARTITION_COLUMN}="):
            try:
                out.append(int(d.split("=", 1)[1]))
            except ValueError:
                pass
    return sorted(out)


def apply_retention(
    spark: SparkSession,
    path: str,
    retention_days: int | None = None,
    now: dt.datetime | None = None,
    exact: bool = True,
    dry_run: bool = False,
    refresh_views: bool = False,
) -> dict:
    """Delete rows with ts older than now - retention_days (db.go:60-65).

    ``retention_days=None`` reads $RETENTION_DAYS — the reference's
    config surface (cmd/server/main.go:25-27): TTL is armed only when
    the env var is set, so with neither argument nor env the job is a
    no-op, exactly like the reference skipping the ALTER TTL.

    Whole months below the cutoff month are dropped as directories
    (metadata-only at scale: ALTER TABLE ... DROP PARTITION); the
    boundary month is rewritten with an exact ts filter when
    ``exact``. ``dry_run`` reports what WOULD be dropped/rewritten
    without touching data. Returns {"dropped_months": [...],
    "rewritten": month|None, "stale_views": [...]}.

    Materialized views: attached views accumulate per-block INSERT
    increments and never see deletes, so after a retention pass a
    view's totals keep counting the dropped rows — they diverge from
    re-aggregating the base table. ClickHouse has the SAME property
    (a target table of a matview is not TTL'd with its source; the
    docs tell you to set TTL on both or re-populate). Default
    behavior mirrors CH: the divergence is allowed but SURFACED —
    any rows were removed and views are attached -> their names come
    back under ``stale_views`` (the operator's cue to schedule
    ``MaterializedView.refresh``). ``refresh_views=True`` instead
    rebuilds each attached view from the post-retention base right
    here (one aggregation per view over the retained partitions —
    bounded, but not free; at 100 TB prefer dropping the view's own
    aged state rows when the view keys include the TTL axis).
    """
    if retention_days is None:
        # armed-TTL resolution order mirrors the reference: a TTL set
        # on the TABLE (the dialect's ALTER TABLE ... MODIFY TTL —
        # db.go:59-66 issues exactly that statement) wins over the
        # $RETENTION_DAYS env; with neither, the job is a no-op.
        retention_days = read_table_ttl(path)
    if retention_days is None:
        raw = os.environ.get("RETENTION_DAYS", "")
        if not raw.strip().isdigit():
            return {"dropped_months": [], "rewritten": None, "skipped": True}
        retention_days = int(raw)
    now = now or dt.datetime.now(dt.timezone.utc)
    cutoff = now - dt.timedelta(days=int(retention_days))
    cutoff_month = cutoff.year * 100 + cutoff.month
    dropped, rewritten = [], None
    if dry_run:
        dropped = [m for m in _partition_months(path) if m < cutoff_month]
        boundary = cutoff_month if cutoff_month in _partition_months(path) else None
        return {"dropped_months": dropped, "rewritten": boundary, "dry_run": True}
    for m in _partition_months(path):
        if m < cutoff_month:
            shutil.rmtree(os.path.join(path, f"{PARTITION_COLUMN}={m}"))
            dropped.append(m)
    if exact and cutoff_month in _partition_months(path):
        part_dir = os.path.join(path, f"{PARTITION_COLUMN}={cutoff_month}")
        kept = (
            spark.read.parquet(part_dir)
            .filter(F.col("ts") >= F.lit(cutoff.replace(tzinfo=None)))
            .sortWithinPartitions("service", "ts")
        )
        tmp = part_dir + ".tmp"
        from clickhouse_observability_spark.sources.writer import (
            parquet_ts_micros,
        )

        # zstd keeps the rewritten partition in the table's at-rest
        # codec (LogsTable._write) instead of silently reverting to
        # snappy; ts_micros keeps the ts footer stats alive.
        with parquet_ts_micros(spark):
            kept.write.mode("overwrite").option("compression", "zstd") \
                .parquet(tmp)
        shutil.rmtree(part_dir)
        os.rename(tmp, part_dir)
        rewritten = cutoff_month
    # surface (or repair) matview divergence — see docstring
    stale_views: list[str] = []
    if dropped or rewritten is not None:
        from clickhouse_observability_spark.sources.mutations import (
            _handle_stale_views,
        )
        from clickhouse_observability_spark.sources.writer import LogsTable

        table = LogsTable(spark, path)
        if table.materialized_views:
            # one staleness contract, shared with mutations/partition
            # ops: refresh (and re-cover projections) or surface
            # stale + un-cover serving projections
            stale_views = _handle_stale_views(table, refresh_views)
    return {"dropped_months": dropped, "rewritten": rewritten,
            "stale_views": stale_views}


def compact_partition(
    spark: SparkSession,
    path: str,
    month: int,
    target_files: int = 1,
    zorder: list[str] | None = None,
    deduplicate: bool = False,
) -> int:
    """MergeTree-style merge: coalesce a month's small files
    (db.go:50's background merges, done explicitly). Returns the
    number of input files merged.

    `deduplicate`: CH's `OPTIMIZE ... DEDUPLICATE` — drop fully
    identical rows (every column equal) while merging.

    `zorder`: optionally re-cluster the partition along a Morton
    curve over the given columns (`sources/zorder.py`) instead of
    the (service, ts) lexicographic order — after this, BOTH a
    service-only and a time-only predicate prune files/row-groups
    via footer stats, where the lexicographic layout prunes only
    its leading key. The natural background-merge hook for layout
    optimization (Delta's OPTIMIZE ZORDER runs at the same point in
    the lifecycle)."""
    from clickhouse_observability_spark.sources.writer import (
        parquet_ts_micros,
    )

    part_dir = os.path.join(path, f"{PARTITION_COLUMN}={month}")
    files = [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
    # widened read + overlay: evolved columns (ALTER TABLE ADD
    # COLUMN) are MATERIALIZED into the compacted files instead of
    # silently dropped (CH: merges materialize column defaults)
    from pyspark.sql import types as T

    from clickhouse_observability_spark.schema import LOGS_SCHEMA
    from clickhouse_observability_spark.sources.schema_evolution import (
        SchemaExt,
    )

    ext = SchemaExt(path)
    df = ext.overlay(
        spark.read.schema(
            T.StructType(LOGS_SCHEMA.fields + ext.read_fields())
        ).parquet(part_dir)
    )
    if deduplicate:
        # CH `OPTIMIZE ... DEDUPLICATE`: drop FULLY identical rows
        # during the merge (all columns equal). One extra shuffle on
        # the row hash inside the partition being rewritten anyway.
        df = df.dropDuplicates()
    tmp = part_dir + ".tmp"
    if zorder:
        from clickhouse_observability_spark.sources.zorder import zvalue

        with parquet_ts_micros(spark):
            (
                df.withColumn("__z", zvalue(df, zorder))
                .repartitionByRange(target_files, "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
                .write.mode("overwrite")
                .option("compression", "zstd")
                .parquet(tmp)
            )
    else:
        with parquet_ts_micros(spark):
            (
                df.repartition(target_files)
                .sortWithinPartitions("service", "ts")
                .write.mode("overwrite")
                .option("compression", "zstd")  # match LogsTable._write
                .parquet(tmp)
            )
    shutil.rmtree(part_dir)
    os.rename(tmp, part_dir)
    return len(files)
