"""Storage tiering seams (r12 flagship): `TTL ts + INTERVAL n DAY
TO VOLUME 'cold'` as metadata-only month moves under `_tiers/<vol>/`
(sources/tiering.py), with READ TRANSPARENCY pinned at every path
consumer — the one unacceptable failure mode is a cold file invisible
to a pruned read (silent data loss), so each seam test proves a
consumer sees tiered months: plain + pruned reads, skip-index pruned
reads (sidecar survives the move), mutations (in-place on-volume
rewrite), TTL delete/collapse/column-TTL over cold months, engine
FINAL reads (the tiering x engine x column-TTL triple seam),
DETACH/FREEZE/CHECK TABLE, crash-recovery debris inside tier roots,
system.parts volume attribution, and the SHOW CREATE round-trip.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from clickhouse_observability_spark.functions.ch_dialect import (
    ChDialectError,
    ch_sql,
)
from clickhouse_observability_spark.schema import PARTITION_COLUMN
from clickhouse_observability_spark.sources.retention import (
    apply_retention,
    read_table_ttl_spec,
)
from clickhouse_observability_spark.sources.tiering import (
    apply_tiering,
    month_dirs,
    month_volume,
    partition_months,
    read_storage_tiers,
    tier_roots,
)
from clickhouse_observability_spark.sources.writer import LogsTable

NOW = dt.datetime(2025, 9, 20, tzinfo=dt.timezone.utc)

# three months: 202507 (very cold), 202508 (cold), 202509 (hot)
ROWS = [
    {"ts": "2025-07-10T01:00:00Z", "service": "orders", "level": "INFO",
     "msg": "jul1", "attrs": {"k": "1"}, "trace_id": "t1", "span_id": "s1"},
    {"ts": "2025-07-20T02:00:00Z", "service": "payments", "level": "WARN",
     "msg": "jul2", "attrs": {"k": "2"}, "trace_id": "t2", "span_id": "s2"},
    {"ts": "2025-08-05T03:00:00Z", "service": "orders", "level": "INFO",
     "msg": "aug1", "attrs": {"k": "3"}, "trace_id": "t3", "span_id": "s3"},
    {"ts": "2025-08-25T04:00:00Z", "service": "orders", "level": "ERROR",
     "msg": "aug2", "attrs": {"k": "4"}, "trace_id": "t4", "span_id": "s4"},
    {"ts": "2025-09-15T05:00:00Z", "service": "orders", "level": "INFO",
     "msg": "sep1", "attrs": {"k": "5"}, "trace_id": "t5", "span_id": "s5"},
]


@pytest.fixture()
def table(spark, tmp_path):
    t = LogsTable(spark, str(tmp_path / "logs"))
    t.init_schema()
    t.ingest_batch(ROWS)
    return t


def _snapshot(t):
    return sorted(
        (r.ts.isoformat(), r.service, r.msg, r.month)
        for r in t.read().collect()
    )


def _arm_cold(spark, table, days=40):
    ch_sql(spark, f"ALTER TABLE logs MODIFY TTL ts + INTERVAL {days} "
                  "DAY TO VOLUME 'cold'", logs=table)


def test_mover_is_metadata_only_and_read_transparent(spark, table):
    """Aged months MOVE (same inodes — zero data bytes) and every row
    stays readable byte-identically; the boundary month stays warm
    (strictly-older rule); rerun is idempotent."""
    before = _snapshot(table)
    inodes = {
        f: os.stat(os.path.join(d, f)).st_ino
        for m in (202507, 202508)
        for d in month_dirs(table.path, m)
        for f in os.listdir(d) if f.endswith(".parquet")
    }
    _arm_cold(spark, table)  # cutoff 2025-08-11 -> 202507 moves
    assert read_storage_tiers(table.path) == [
        {"days": 40, "volume": "cold", "kind": "VOLUME"}]
    res = apply_retention(spark, table.path, now=NOW)
    assert res["tiered"] == {"cold": [202507]}
    assert res["dropped_months"] == []
    assert month_volume(table.path, 202507) == "cold"
    assert month_volume(table.path, 202508) == "default"
    # the tier dir holds the SAME files (inode-identical: a rename,
    # not a rewrite)
    (d,) = month_dirs(table.path, 202507)
    assert f"_tiers{os.sep}cold" in d
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            assert os.stat(os.path.join(d, f)).st_ino == inodes[f]
    assert _snapshot(table) == before  # read transparency
    assert partition_months(table.path) == [202507, 202508, 202509]
    # idempotent: nothing moves twice
    assert apply_tiering(table.path, NOW)["moved"] == {}


def test_pruned_read_sees_cold_month(spark, table):
    """Month-predicate pruning must reach INTO the tier: the filtered
    scan reads only the cold month's files and returns its rows —
    a cold month missing from a pruned read is silent data loss."""
    from pyspark.sql import functions as F

    _arm_cold(spark, table)
    apply_retention(spark, table.path, now=NOW)
    cold = table.read().filter(F.col(PARTITION_COLUMN) == 202507)
    rows = sorted(r.msg for r in cold.collect())
    assert rows == ["jul1", "jul2"]
    # EXECUTED file set (input_file_name reflects partition pruning;
    # inputFiles() is plan-level and lists every leaf of the union)
    files = {r.f for r in cold.select(
        F.input_file_name().alias("f")).distinct().collect()}
    assert files and all(f"_tiers/cold/{PARTITION_COLUMN}=202507" in f
                         for f in files)
    # and a warm-month pruned read never READS cold files
    warm = table.read().filter(F.col(PARTITION_COLUMN) == 202509)
    wfiles = {r.f for r in warm.select(
        F.input_file_name().alias("f")).distinct().collect()}
    assert wfiles and all("_tiers" not in f for f in wfiles)


def test_skip_index_sidecar_survives_move(spark, table):
    """The sidecar keys on the volume-independent relative path, so
    summaries stay valid across a move: pruning still fires, zero
    files go unindexed, and an incremental materialize is a no-op."""
    from clickhouse_observability_spark.sources.skip_index import (
        SkipIndex,
        read_pruned,
    )

    ch_sql(spark, "ALTER TABLE logs ADD INDEX svc service TYPE set(10)",
           logs=table)
    ch_sql(spark, "ALTER TABLE logs MATERIALIZE INDEX svc", logs=table)
    _arm_cold(spark, table)
    apply_retention(spark, table.path, now=NOW)
    df, st = read_pruned(spark, table.path, "svc", "payments")
    assert st["files_unindexed"] == 0
    assert st["files_skipped"] > 0  # payments exists only in 202507
    got = sorted(r.msg for r in
                 df.filter(df.service == "payments").collect())
    assert got == ["jul2"]  # the cold month's row came back
    idx = SkipIndex.load(table.path, "svc")
    n_before = idx.meta["n_files"]
    idx.materialize(spark, incremental=True)  # no new files: no-op
    assert SkipIndex.load(table.path, "svc").meta["n_files"] == n_before


def test_mutation_rewrites_cold_month_in_place(spark, table):
    """DELETE/UPDATE WHERE over a tiered month rewrites IN PLACE on
    its volume (CH: mutations produce the new part on the old part's
    disk) — and a DELETE that couldn't see cold months would silently
    no-op, so the matched count is pinned too."""
    from clickhouse_observability_spark.sources.mutations import (
        apply_mutation,
    )

    _arm_cold(spark, table)
    apply_retention(spark, table.path, now=NOW)
    res = apply_mutation(spark, table.path, "msg = 'jul1'")
    assert res["matched_rows"] == 1
    assert res["affected_months"] == [202507]
    assert month_volume(table.path, 202507) == "cold"  # stayed cold
    assert sorted(r.msg for r in table.read().collect()) == [
        "aug1", "aug2", "jul2", "sep1"]
    res = apply_mutation(spark, table.path,
                         "service = 'payments'",
                         assignments={"msg": "concat(msg, '#upd')"})
    assert res["matched_rows"] == 1
    got = {r.msg for r in table.read().collect()}
    assert "jul2#upd" in got


def test_ttl_delete_and_column_ttl_reach_cold_months(spark, table):
    """The delete horizon drops a tiered month (every location), and
    COLUMN TTL reverts aged cells inside a tier without moving it."""
    from clickhouse_observability_spark.sources.retention import (
        set_column_ttl,
    )

    _arm_cold(spark, table)
    apply_retention(spark, table.path, now=NOW)
    assert month_volume(table.path, 202507) == "cold"
    # column TTL on the cold month: in-place, row-preserving
    set_column_ttl(table.path, "msg", 35)  # cutoff 08-16: jul+aug1 age
    res = apply_retention(spark, table.path, now=NOW)
    assert 202507 in res["column_ttl"]["msg"]
    assert month_volume(table.path, 202507) == "cold"
    vals = {(r.month, r.msg) for r in table.read().collect()}
    assert (202507, "") in vals and (202509, "sep1") in vals
    # now arm a delete horizon that covers the cold month: it must
    # vanish from its tier (a surviving cold month = silent failure)
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL ts + INTERVAL 50 DAY "
                  "DELETE", logs=table)
    res = apply_retention(spark, table.path, now=NOW)  # cutoff 08-01
    assert 202507 in res["dropped_months"]
    assert month_dirs(table.path, 202507) == []
    assert partition_months(table.path) == [202508, 202509]


def test_engine_final_x_column_ttl_x_tiering_triple_seam(spark, table):
    """The r12 triple seam (r11 verdict #6): a Replacing FINAL read
    over a month that is simultaneously TIERED COLD and COLUMN-AGED
    must stay bit-identical to the same read over an untiered,
    eagerly-reverted copy."""
    from clickhouse_observability_spark.operators.merge_engines import (
        replacing_read,
    )
    from clickhouse_observability_spark.sources.retention import (
        set_column_ttl,
    )

    # expected: compute on the PRE-lifecycle frame with the column
    # revert folded algebraically (msg cutoff 2025-08-16)
    from pyspark.sql import functions as F

    base = table.read().withColumn(
        "msg",
        F.when(F.col("ts") < F.lit(dt.datetime(2025, 8, 16)), "")
        .otherwise(F.col("msg")))
    want = sorted(
        (r.service, str(r.ts), r.msg)
        for r in replacing_read(
            base.select("service", "ts", "msg"), ["service"],
            version=["ts"]).collect())

    _arm_cold(spark, table)
    set_column_ttl(table.path, "msg", 35)
    apply_retention(spark, table.path, now=NOW)
    assert month_volume(table.path, 202507) == "cold"
    got = sorted(
        (r.service, str(r.ts), r.msg)
        for r in replacing_read(
            table.read().select("service", "ts", "msg"), ["service"],
            version=["ts"]).collect())
    assert got == want


def test_lifecycle_ops_cover_tiers(spark, table):
    """DETACH parks a cold month; ATTACH restores it to the default
    volume; FREEZE snapshots cold months; CHECK TABLE verifies cold
    parts; OPTIMIZE compacts a cold month in place; system.parts
    attributes the serving volume."""
    from clickhouse_observability_spark.sources.mutations import (
        check_table,
    )

    _arm_cold(spark, table)
    apply_retention(spark, table.path, now=NOW)

    # system.parts: volume column
    vols = {(r.partition, r.volume)
            for r in ch_sql(spark, "SELECT partition, volume FROM "
                            "system.parts", logs=table).collect()}
    assert (202507, "cold") in vols and (202509, "default") in vols

    # CHECK TABLE sees the cold part
    rows = check_table(spark, table.path)
    paths = {r["part_path"] for r in rows}
    assert any(f"_tiers/cold/{PARTITION_COLUMN}=202507" in p
               for p in paths)
    assert all(r["is_passed"] for r in rows)

    # FREEZE includes the cold month
    ch_sql(spark, "ALTER TABLE logs FREEZE WITH NAME 'snap'", logs=table)
    snap = os.path.join(table.path, "_shadow", "snap")
    assert os.path.isdir(os.path.join(
        snap, f"{PARTITION_COLUMN}=202507"))

    # OPTIMIZE (no PARTITION clause) compacts every month incl. cold,
    # in place on its volume
    ch_sql(spark, "OPTIMIZE TABLE logs FINAL", logs=table)
    assert month_volume(table.path, 202507) == "cold"

    # DETACH a cold month -> invisible; ATTACH -> back on default
    ch_sql(spark, "ALTER TABLE logs DETACH PARTITION 202507", logs=table)
    assert month_dirs(table.path, 202507) == []
    assert 202507 not in {r.month for r in table.read().collect()}
    ch_sql(spark, "ALTER TABLE logs ATTACH PARTITION 202507", logs=table)
    assert month_volume(table.path, 202507) == "default"
    assert sorted(r.msg for r in table.read().collect()) == [
        "aug1", "aug2", "jul1", "jul2", "sep1"]
    # ...and the next pass re-ages it back to cold
    res = apply_retention(spark, table.path, now=NOW)
    assert res["tiered"] == {"cold": [202507]}


def test_split_month_consolidates_on_compaction(spark, table):
    """A late write re-creates a tiered month on the default volume:
    reads union both locations (no loss, no double-read); compaction
    consolidates into the cold location."""
    from clickhouse_observability_spark.sources.retention import (
        compact_partition,
    )

    _arm_cold(spark, table)
    apply_retention(spark, table.path, now=NOW)
    table.ingest_batch([
        {"ts": "2025-07-31T09:00:00Z", "service": "orders",
         "level": "INFO", "msg": "jul3", "attrs": {"k": "9"},
         "trace_id": "t9", "span_id": "s9"},
    ])
    assert len(month_dirs(table.path, 202507)) == 2  # split
    df = table.read()
    got = sorted(r.msg for r in df.filter(df.month == 202507).collect())
    assert got == ["jul1", "jul2", "jul3"]
    compact_partition(spark, table.path, 202507, target_files=1)
    (d,) = month_dirs(table.path, 202507)
    assert f"_tiers{os.sep}cold" in d
    df = table.read()
    got = sorted(r.msg for r in df.filter(df.month == 202507).collect())
    assert got == ["jul1", "jul2", "jul3"]
    # ...or the next mover pass merges the warm copy without a rewrite
    table.ingest_batch([
        {"ts": "2025-07-31T10:00:00Z", "service": "orders",
         "level": "INFO", "msg": "jul4", "attrs": {"k": "10"},
         "trace_id": "t10", "span_id": "s10"},
    ])
    assert len(month_dirs(table.path, 202507)) == 2
    res = apply_tiering(table.path, NOW)
    assert res["moved"] == {"cold": [202507]}
    assert len(month_dirs(table.path, 202507)) == 1
    df = table.read()
    got = sorted(r.msg for r in df.filter(df.month == 202507).collect())
    assert got == ["jul1", "jul2", "jul3", "jul4"]


def test_crash_debris_inside_tier_recovers(spark, table):
    """Swap debris inside `_tiers/<vol>/` recovers exactly like base
    debris: a crash between the two swap renames of a cold-month
    rewrite must not lose the month."""
    import shutil

    from clickhouse_observability_spark.sources.retention import (
        recover_partition_swaps,
    )

    _arm_cold(spark, table)
    apply_retention(spark, table.path, now=NOW)
    (d,) = month_dirs(table.path, 202507)
    root = os.path.dirname(d)
    old = os.path.join(root, f".{PARTITION_COLUMN}=202507.old")
    os.rename(d, old)  # crash state: .old without a live dir
    assert month_dirs(table.path, 202507) == []
    res = recover_partition_swaps(table.path)
    assert f".{PARTITION_COLUMN}=202507.old" in res["restored"]
    assert month_volume(table.path, 202507) == "cold"
    # completed-swap leftover: .old BESIDE the live dir -> cleaned
    shutil.copytree(d, old)
    res = recover_partition_swaps(table.path)
    assert f".{PARTITION_COLUMN}=202507.old" in res["cleaned"]


def test_multi_tier_show_create_roundtrip_and_remove(spark, table):
    """Two move rules + a delete horizon in one statement: the
    longest-expired rule wins placement; SHOW CREATE renders a TTL
    clause that re-parses to the identical spec; REMOVE TTL clears
    delete AND move rules but keeps COLUMN TTLs; already-tiered
    months stay where they are (CH parity)."""
    from clickhouse_observability_spark.sources.retention import (
        read_column_ttls,
        set_column_ttl,
    )

    set_column_ttl(table.path, "trace_id", 90)
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL "
                  "ts + INTERVAL 40 DAY TO VOLUME 'cold', "
                  "ts + INTERVAL 46 DAY TO DISK 'archive', "
                  "ts + INTERVAL 400 DAY DELETE", logs=table)
    res = apply_retention(spark, table.path, now=NOW)
    # both cutoff months are 202508 (40d -> 08-11, 46d -> 08-05), so
    # both rules cover 202507 and the LONGEST-EXPIRED (46d) wins
    assert res["tiered"] == {"archive": [202507]}
    assert month_volume(table.path, 202507) == "archive"

    stmt = ch_sql(spark, "SHOW CREATE TABLE logs",
                  logs=table).collect()[0].statement
    ttl_line = [ln for ln in stmt.splitlines() if ln.startswith("TTL ")]
    assert ttl_line == [
        "TTL ts + INTERVAL 40 DAY TO VOLUME 'cold', "
        "ts + INTERVAL 46 DAY TO DISK 'archive', "
        "ts + INTERVAL 400 DAY DELETE"]
    spec_before = read_table_ttl_spec(table.path)
    ch_sql(spark, "ALTER TABLE logs MODIFY " + ttl_line[0], logs=table)
    assert read_table_ttl_spec(table.path) == spec_before  # round-trip

    ch_sql(spark, "ALTER TABLE logs REMOVE TTL", logs=table)
    assert read_storage_tiers(table.path) == []
    assert read_column_ttls(table.path) == {"trace_id": 90}
    assert month_volume(table.path, 202507) == "archive"  # stays put

    # refusals: bad volume name, duplicate DELETE, garbage clause
    for bad in (
        "ALTER TABLE logs MODIFY TTL ts + INTERVAL 5 DAY "
        "TO VOLUME '../evil'",
        "ALTER TABLE logs MODIFY TTL ts + INTERVAL 5 DAY DELETE, "
        "ts + INTERVAL 9 DAY DELETE",
        "ALTER TABLE logs MODIFY TTL ts + INTERVAL 5 DAY "
        "TO TABLE 'x'",
    ):
        with pytest.raises(ChDialectError):
            ch_sql(spark, bad, logs=table)


def test_untiered_table_costs_nothing_extra(spark, table):
    """The untiered common case: one (volume, root) pair, the same
    single-root scan as before tiering existed."""
    assert tier_roots(table.path) == [("default", table.path)]
    files = table.read().inputFiles()
    assert files and all("_tiers" not in f for f in files)


def test_manual_move_partition_to_volume(spark, table):
    """CH `ALTER TABLE logs MOVE PARTITION p TO VOLUME 'v'` — the
    operator-initiated twin of the TTL mover: metadata-only, read-
    transparent, reversible ('default' moves back to base), and an
    armed TTL rule re-ages a manually-warmed month on the next pass."""
    before = _snapshot(table)
    assert ch_sql(spark, "ALTER TABLE logs MOVE PARTITION 202508 "
                         "TO VOLUME 'cold'", logs=table) == 1
    assert month_volume(table.path, 202508) == "cold"
    assert _snapshot(table) == before  # read transparency
    # idempotent: already resident -> moved=0
    assert ch_sql(spark, "ALTER TABLE logs MOVE PARTITION 202508 "
                         "TO VOLUME 'cold'", logs=table) == 0
    # TO DISK spelling routes identically
    assert ch_sql(spark, "ALTER TABLE logs MOVE PARTITION 202507 "
                         "TO DISK 'archive'", logs=table) == 1
    assert month_volume(table.path, 202507) == "archive"
    # back to the default volume
    assert ch_sql(spark, "ALTER TABLE logs MOVE PARTITION 202508 "
                         "TO VOLUME 'default'", logs=table) == 1
    assert month_volume(table.path, 202508) == "default"
    assert _snapshot(table) == before
    # refusals: absent partition, hostile volume name
    for bad in (
        "ALTER TABLE logs MOVE PARTITION 209912 TO VOLUME 'cold'",
        "ALTER TABLE logs MOVE PARTITION 202508 TO VOLUME '../x'",
    ):
        with pytest.raises(ChDialectError):
            ch_sql(spark, bad, logs=table)
    # the armed policy is AUTHORITATIVE over manual placement: the
    # next pass relocates every aged month to its rule's volume
    # (multi-tier aging requires tier-to-tier moves, so a manual
    # off-policy placement is overridden — deterministic, and the
    # manual statement remains the tool for tables WITHOUT move
    # rules; documented in sources/tiering.py)
    _arm_cold(spark, table)
    res = apply_retention(spark, table.path, now=NOW)
    assert res["tiered"] == {"cold": [202507]}
    assert month_volume(table.path, 202507) == "cold"


def test_system_disks_and_storage_policies(spark, table):
    """CH system.disks / system.storage_policies over the tier layout
    (r12): disks = base + occupied volumes with live bytes; policies
    = the armed move rules in horizon order behind the default
    volume."""
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL "
                  "ts + INTERVAL 40 DAY TO VOLUME 'cold', "
                  "ts + INTERVAL 46 DAY TO DISK 'archive'", logs=table)
    apply_retention(spark, table.path, now=NOW)  # 202507 -> archive
    disks = {(r.name,): (r.bytes_on_disk, r.parts)
             for r in ch_sql(spark, "SELECT name, bytes_on_disk, parts "
                             "FROM system.disks", logs=table).collect()}
    assert ("default",) in disks and ("archive",) in disks
    assert disks[("archive",)][0] > 0 and disks[("archive",)][1] > 0
    pol = [(r.volume_name, r.volume_priority, r.move_after_days)
           for r in ch_sql(
               spark,
               "SELECT volume_name, volume_priority, move_after_days "
               "FROM system.storage_policies ORDER BY volume_priority",
               logs=table).collect()]
    assert pol == [("default", 1, None), ("cold", 2, 40),
                   ("archive", 3, 46)]


def test_materialize_ttl_statement(spark, table):
    """CH `ALTER TABLE logs MATERIALIZE TTL` (r12): apply the armed
    TTL to existing data NOW — one synchronous retention pass instead
    of waiting for the batcher's cadence. With a move-only spec every
    fixture month is aged vs wall-clock now, so all three relocate;
    with nothing armed the statement is a no-op like CH."""
    # nothing armed -> no-op (returns 0, touches nothing)
    assert ch_sql(spark, "ALTER TABLE logs MATERIALIZE TTL",
                  logs=table) == 0
    assert tier_roots(table.path) == [("default", table.path)]
    before = _snapshot(table)
    _arm_cold(spark, table)  # 40d horizon; fixture months are 2025-*
    n = ch_sql(spark, "ALTER TABLE logs MATERIALIZE TTL", logs=table)
    assert n == 3  # all three months moved
    for m in (202507, 202508, 202509):
        assert month_volume(table.path, m) == "cold"
    assert _snapshot(table) == before  # read transparency
    # idempotent: second materialize moves nothing
    assert ch_sql(spark, "ALTER TABLE logs MATERIALIZE TTL",
                  logs=table) == 0
