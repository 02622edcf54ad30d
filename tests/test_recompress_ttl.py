"""Recompression TTL (r13): `TTL ts + INTERVAL n DAY RECOMPRESS
CODEC(ZSTD(l)|LZ4)` — CH's hot-data-fast-codec / cold-data-dense-codec
lifecycle (reference context: the reference arms only DELETE,
internal/db/db.go:59-66; this completes the table-TTL action set
DELETE / DELETE WHERE / GROUP BY / TO VOLUME-DISK / RECOMPRESS).
Fully-aged months rewrite under the armed codec, values untouched;
idempotence via a dot-prefixed per-location marker (parquet footers
record the codec but not the level)."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest

from clickhouse_observability_spark.functions.ch_dialect import (
    ChDialectError,
    ch_sql,
)
from clickhouse_observability_spark.sources.retention import (
    apply_retention,
    compact_partition,
    read_table_ttl_spec,
)
from clickhouse_observability_spark.sources.tiering import (
    month_dirs,
    month_volume,
)
from clickhouse_observability_spark.sources.writer import LogsTable

NOW = dt.datetime(2025, 9, 20, tzinfo=dt.timezone.utc)


@pytest.fixture()
def table(spark, tmp_path):
    """One aged month (202507, 4k repetitive rows — codec choices are
    visible in the byte sizes), one boundary month (202508), one hot
    month (202509)."""
    from pyspark.sql import functions as F

    t = LogsTable(spark, str(tmp_path / "logs"))
    t.init_schema()
    base = spark.range(4000).select(
        F.expr("timestamp'2025-07-10 01:00:00' + make_interval(0,0,0,0,0,0,id)")
        .alias("ts"),
        F.concat(F.lit("svc-"), (F.col("id") % 4).cast("string"))
        .alias("service"),
        F.lit("INFO").alias("level"),
        F.concat(F.lit("payload-"), (F.col("id") % 50).cast("string"))
        .alias("msg"),
        F.lit("").alias("attrs"),
        (F.col("id") % 100).cast("string").alias("trace_id"),
        F.col("id").cast("string").alias("span_id"),
    )
    t.insert(base)
    t.ingest_batch([
        {"ts": "2025-08-05T03:00:00Z", "service": "svc-0",
         "level": "INFO", "msg": "aug", "attrs": {},
         "trace_id": "t", "span_id": "s"},
        {"ts": "2025-09-15T05:00:00Z", "service": "svc-0",
         "level": "INFO", "msg": "sep", "attrs": {},
         "trace_id": "t", "span_id": "s"},
    ])
    return t


def _month_bytes(t, month):
    (d,) = month_dirs(t.path, month)
    return sum(os.path.getsize(f)
               for f in glob.glob(os.path.join(d, "*.parquet")))


def _month_codec(t, month):
    import pyarrow.parquet as pq

    (d,) = month_dirs(t.path, month)
    (f,) = sorted(glob.glob(os.path.join(d, "*.parquet")))[:1]
    return pq.ParquetFile(f).metadata.row_group(0).column(0).compression


def _snapshot(t):
    return sorted((str(r.ts), r.service, r.msg, r.span_id)
                  for r in t.read().collect())


def test_recompress_semantics_and_idempotence(spark, table):
    """The fully-aged month rewrites under the armed codec (LZ4 is
    footer-visible and less dense than the at-rest zstd on this
    data); boundary and hot months keep the hot-path codec; values
    are byte-identical; reruns skip via the marker; re-arming a
    DIFFERENT codec re-fires; MATERIALIZE TTL counts the months."""
    before = _snapshot(table)
    zstd_bytes = _month_bytes(table, 202507)
    assert _month_codec(table, 202507) == "ZSTD"
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL ts + INTERVAL 40 DAY "
                  "RECOMPRESS CODEC(LZ4)", logs=table)
    assert read_table_ttl_spec(table.path)["recompress"] == [
        {"days": 40, "codec": "LZ4", "level": None}]
    res = apply_retention(spark, table.path, now=NOW)
    # 40d cutoff month 202508: only 202507 is STRICTLY older
    assert res["recompressed"] == {"LZ4": [202507]}
    assert res["dropped_months"] == []
    assert _month_codec(table, 202507) != "ZSTD"
    assert _month_bytes(table, 202507) > zstd_bytes  # lz4 less dense
    assert _month_codec(table, 202508) == "ZSTD"  # boundary untouched
    assert _snapshot(table) == before  # value-neutral
    # idempotent rerun: marker short-circuits, nothing reported
    res2 = apply_retention(spark, table.path, now=NOW)
    assert res2["recompressed"] == {}
    # operator visibility: system.parts attributes the at-rest codec
    # per file (CH default_compression_codec analog)
    codecs = {r["partition"]: r["codec"] for r in table.parts()}
    assert codecs[202507] != "ZSTD" and codecs[202509] == "ZSTD"
    # re-arm a denser codec: the stale marker is superseded.
    # MATERIALIZE TTL applies at the REAL wall clock, where all three
    # months are past the 40-day horizon — every month recompresses
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL ts + INTERVAL 40 DAY "
                  "RECOMPRESS CODEC(ZSTD(19))", logs=table)
    assert ch_sql(spark, "ALTER TABLE logs MATERIALIZE TTL",
                  logs=table) == 3
    for m in (202507, 202508, 202509):
        assert _month_codec(table, m) == "ZSTD"
    assert _month_bytes(table, 202507) < zstd_bytes  # denser than l3
    assert _snapshot(table) == before


def test_recompress_reapplies_after_month_rewrite(spark, table):
    """A mutation/compaction of the month replaces the directory and
    drops the marker — the next retention pass re-applies the armed
    codec, CH's reapply-on-merge behavior."""
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL ts + INTERVAL 40 DAY "
                  "RECOMPRESS CODEC(ZSTD(19))", logs=table)
    res = apply_retention(spark, table.path, now=NOW)
    assert res["recompressed"] == {"ZSTD(19)": [202507]}
    compact_partition(spark, table.path, 202507)
    res2 = apply_retention(spark, table.path, now=NOW)
    assert res2["recompressed"] == {"ZSTD(19)": [202507]}


def test_recompress_tiered_month_in_place(spark, table):
    """A tiered month recompresses on its own volume; arming a move
    rule + a recompress rule in one statement works (the rewrite runs
    before the move on a freshly-aged month)."""
    before = _snapshot(table)
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL "
                  "ts + INTERVAL 40 DAY TO VOLUME 'cold', "
                  "ts + INTERVAL 40 DAY RECOMPRESS CODEC(ZSTD(19))",
           logs=table)
    res = apply_retention(spark, table.path, now=NOW)
    assert res["recompressed"] == {"ZSTD(19)": [202507]}
    assert res["tiered"] == {"cold": [202507]}
    assert month_volume(table.path, 202507) == "cold"
    (d,) = month_dirs(table.path, 202507)
    assert os.path.exists(os.path.join(d, ".recompressed-ZSTD-19"))
    assert _snapshot(table) == before
    # rerun: both arms idempotent
    res2 = apply_retention(spark, table.path, now=NOW)
    assert res2["recompressed"] == {} and res2["tiered"] == {}


def test_recompress_show_create_roundtrip_and_dry_run(spark, table):
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL "
                  "ts + INTERVAL 40 DAY RECOMPRESS CODEC(ZSTD(9)), "
                  "ts + INTERVAL 44 DAY RECOMPRESS CODEC(LZ4), "
                  "ts + INTERVAL 400 DAY DELETE", logs=table)
    stmt = ch_sql(spark, "SHOW CREATE TABLE logs",
                  logs=table).collect()[0].statement
    (ttl_line,) = [ln for ln in stmt.splitlines() if ln.startswith("TTL ")]
    assert "RECOMPRESS CODEC(ZSTD(9))" in ttl_line
    assert "RECOMPRESS CODEC(LZ4)" in ttl_line
    spec = read_table_ttl_spec(table.path)
    ch_sql(spark, "ALTER TABLE logs MODIFY " + ttl_line, logs=table)
    assert read_table_ttl_spec(table.path) == spec  # round-trip
    # dry run previews the pending recompression (longest-expired
    # rule wins: both cutoff months are 202508, so the 44d LZ4 rule
    # takes 202507), touches nothing
    before = _month_codec(table, 202507)
    preview = apply_retention(spark, table.path, now=NOW, dry_run=True)
    assert preview["recompressed"] == {"LZ4": [202507]}
    assert _month_codec(table, 202507) == before
    # REMOVE TTL clears recompress rules
    ch_sql(spark, "ALTER TABLE logs REMOVE TTL", logs=table)
    assert read_table_ttl_spec(table.path) is None


def test_recompress_refusals(spark, table):
    for bad in (
        # LZ4HC: no parquet analog — refused honestly, not downgraded
        "ALTER TABLE logs MODIFY TTL ts + INTERVAL 5 DAY "
        "RECOMPRESS CODEC(LZ4HC(9))",
        # ZSTD level out of bounds
        "ALTER TABLE logs MODIFY TTL ts + INTERVAL 5 DAY "
        "RECOMPRESS CODEC(ZSTD(25))",
        # LZ4 takes no level
        "ALTER TABLE logs MODIFY TTL ts + INTERVAL 5 DAY "
        "RECOMPRESS CODEC(LZ4(4))",
        # non-positive horizon
        "ALTER TABLE logs MODIFY TTL ts + INTERVAL 0 DAY "
        "RECOMPRESS CODEC(ZSTD(9))",
    ):
        with pytest.raises(ChDialectError):
            ch_sql(spark, bad, logs=table)
    assert read_table_ttl_spec(table.path) is None
