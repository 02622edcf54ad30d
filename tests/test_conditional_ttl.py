"""Conditional TTL (r13): `TTL ts + INTERVAL n DAY DELETE WHERE
<pred>` — the last member of CH's table-TTL grammar. Aged rows
matching the predicate delete, everything else stays (reference
context: the reference arms only the unconditional DELETE form,
internal/db/db.go:59-66; this is the CH-analog depth increment).
Also pins the r12 advisor fixes: the policy-horizon tie-break for
months split across tiers (alphabetical != coldest), and the dry-run
preview covering every armed arm (conditional deletes, column
reverts, tier moves)."""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pytest

from clickhouse_observability_spark.functions.ch_dialect import (
    ChDialectError,
    ch_sql,
)
from clickhouse_observability_spark.sources.retention import (
    apply_retention,
    read_delete_where,
    read_table_ttl_spec,
    set_column_ttl,
    set_table_ttl,
)
from clickhouse_observability_spark.sources.tiering import (
    TIERS_DIR,
    consolidate_month,
    month_dirs,
    month_volume,
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


def _msgs(t):
    return sorted(r.msg for r in t.read().collect())


def test_conditional_delete_semantics(spark, table):
    """Aged rows matching the predicate delete; aged non-matching and
    young matching rows stay; reruns are idempotent; MATERIALIZE TTL
    counts the conditional months."""
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL ts + INTERVAL 40 DAY "
                  "DELETE WHERE level = 'INFO'", logs=table)
    assert read_delete_where(table.path) == [
        {"days": 40, "where": "level = 'INFO'"}]
    res = apply_retention(spark, table.path, now=NOW)
    # cutoff 2025-08-11: jul1 + aug1 are aged INFO -> deleted;
    # jul2 (WARN, aged) and aug2/sep1 (young or non-matching) stay
    assert res["delete_where"] == [
        {"days": 40, "where": "level = 'INFO'",
         "months": [202507, 202508]}]
    assert res["dropped_months"] == []
    assert _msgs(table) == ["aug2", "jul2", "sep1"]
    # idempotent rerun: probes find nothing, no rewrite reported
    res2 = apply_retention(spark, table.path, now=NOW)
    assert res2["delete_where"] == []
    assert _msgs(table) == ["aug2", "jul2", "sep1"]
    # MATERIALIZE TTL re-applies synchronously at the REAL now —
    # sep1 (INFO, 2025-09-15) is aged by any wall clock past
    # 2025-10-25, so the conditional arm fires on its month and the
    # statement's affected-count includes it
    assert ch_sql(spark, "ALTER TABLE logs MATERIALIZE TTL",
                  logs=table) == 1
    assert _msgs(table) == ["aug2", "jul2"]


def test_predicate_with_top_level_commas_roundtrips(spark, table):
    """IN-list predicates carry commas: the clause split must be
    token-level, and SHOW CREATE must render a TTL line that
    re-parses to the identical spec."""
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL "
                  "ts + INTERVAL 40 DAY DELETE WHERE "
                  "level IN ('INFO', 'WARN'), "
                  "ts + INTERVAL 400 DAY DELETE", logs=table)
    spec = read_table_ttl_spec(table.path)
    assert spec["retention_days"] == 400
    assert spec["delete_where"] == [
        {"days": 40, "where": "level IN ( 'INFO' , 'WARN' )"}]
    stmt = ch_sql(spark, "SHOW CREATE TABLE logs",
                  logs=table).collect()[0].statement
    ttl_line = [ln for ln in stmt.splitlines() if ln.startswith("TTL ")]
    assert len(ttl_line) == 1 and "DELETE WHERE" in ttl_line[0]
    ch_sql(spark, "ALTER TABLE logs MODIFY " + ttl_line[0], logs=table)
    assert read_table_ttl_spec(table.path) == spec  # round-trip
    res = apply_retention(spark, table.path, now=NOW)
    # cutoff 08-11: jul1 (INFO), jul2 (WARN), aug1 (INFO) delete;
    # the 400-day unconditional horizon drops nothing
    assert res["dropped_months"] == []
    assert _msgs(table) == ["aug2", "sep1"]


def test_conditional_delete_rewrites_cold_month_in_place(spark, table):
    """The tiering seam: a WHERE-delete over a tiered month rewrites
    on its own volume — matching rows vanish from the cold location,
    survivors stay cold (never migrate back to base)."""
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL ts + INTERVAL 40 DAY "
                  "TO VOLUME 'cold'", logs=table)
    res = apply_retention(spark, table.path, now=NOW)
    assert res["tiered"] == {"cold": [202507]}
    assert month_volume(table.path, 202507) == "cold"
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL "
                  "ts + INTERVAL 40 DAY TO VOLUME 'cold', "
                  "ts + INTERVAL 40 DAY DELETE WHERE level = 'INFO'",
           logs=table)
    res = apply_retention(spark, table.path, now=NOW)
    assert res["delete_where"] == [
        {"days": 40, "where": "level = 'INFO'",
         "months": [202507, 202508]}]
    assert month_volume(table.path, 202507) == "cold"  # in place
    assert len(month_dirs(table.path, 202507)) == 1
    assert _msgs(table) == ["aug2", "jul2", "sep1"]
    # every matching row in the whole cold month: the location drops
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL "
                  "ts + INTERVAL 40 DAY TO VOLUME 'cold', "
                  "ts + INTERVAL 40 DAY DELETE WHERE level = 'WARN'",
           logs=table)
    res = apply_retention(spark, table.path, now=NOW)
    assert res["delete_where"][0]["months"] == [202507]
    assert month_dirs(table.path, 202507) == []
    assert _msgs(table) == ["aug2", "sep1"]


def test_conditional_ttl_refusals(spark, table):
    """CH refuses a malformed TTL at ALTER time; so do we: untranslatable
    predicate vocabulary, empty predicate, non-positive horizon. A
    predicate that translates but names a missing column raises a
    TYPED error at enforcement."""
    for bad in (
        "ALTER TABLE logs MODIFY TTL ts + INTERVAL 5 DAY "
        "DELETE WHERE sleepEachRow(1)",  # refused vocabulary
        "ALTER TABLE logs MODIFY TTL ts + INTERVAL 0 DAY "
        "DELETE WHERE level = 'INFO'",  # non-positive horizon
    ):
        with pytest.raises(ChDialectError):
            ch_sql(spark, bad, logs=table)
    with pytest.raises(ValueError):
        set_table_ttl(table.path, None,
                      delete_where=[{"days": 5, "where": "   "}])
    assert read_table_ttl_spec(table.path) is None  # nothing armed
    set_table_ttl(table.path, None,
                  delete_where=[{"days": 40, "where": "nosuch = 1"}])
    with pytest.raises(ValueError, match="does not resolve"):
        apply_retention(spark, table.path, now=NOW)


def test_split_month_consolidates_policy_coldest(spark, table):
    """r12 advisor fix: a month split across two tiers consolidates
    into (and attributes to) the POLICY-coldest volume — the one with
    the longest armed horizon — not the alphabetically-last name.
    Volumes are named so the orders disagree: 'archive' (44 days,
    colder) sorts BEFORE 'cold' (40 days)."""
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL ts + INTERVAL 40 DAY "
                  "TO VOLUME 'cold'", logs=table)
    apply_retention(spark, table.path, now=NOW)
    assert month_volume(table.path, 202507) == "cold"
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL "
                  "ts + INTERVAL 40 DAY TO VOLUME 'cold', "
                  "ts + INTERVAL 44 DAY TO VOLUME 'archive'",
           logs=table)
    # simulate a crash mid tier-to-tier move: one file already landed
    # under archive, the rest still under cold
    (src,) = month_dirs(table.path, 202507)
    tgt = os.path.join(table.path, TIERS_DIR, "archive",
                       os.path.basename(src))
    os.makedirs(tgt, exist_ok=True)
    fname = next(f for f in os.listdir(src) if f.endswith(".parquet"))
    os.rename(os.path.join(src, fname), os.path.join(tgt, fname))
    assert len(month_dirs(table.path, 202507)) == 2
    # the policy-coldest wins both attribution and consolidation,
    # even though 'archive' < 'cold' alphabetically
    assert month_volume(table.path, 202507) == "archive"
    surviving = consolidate_month(table.path, 202507)
    assert f"{TIERS_DIR}/archive/" in surviving.replace(os.sep, "/")
    assert len(month_dirs(table.path, 202507)) == 1
    assert _msgs(table) == ["aug1", "aug2", "jul1", "jul2", "sep1"]


def test_retention_dry_run_previews_all_arms(spark, table):
    """r12 advisor fix: dry_run must report the conditional deletes,
    column reverts and tier moves a real run would perform — minus
    months the unconditional horizon would drop first — and must not
    touch disk. The subsequent real run matches the preview."""
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL "
                  "ts + INTERVAL 46 DAY DELETE, "
                  "ts + INTERVAL 44 DAY TO VOLUME 'cold', "
                  "ts + INTERVAL 44 DAY DELETE WHERE level = 'INFO'",
           logs=table)
    set_column_ttl(table.path, "msg", 20)
    before = _msgs(table)
    preview = apply_retention(spark, table.path, now=NOW, dry_run=True)
    # 46d cutoff month 202508: 202507 drops whole, 202508 boundary
    # rewrite; the 44d arms WOULD fire on 202507 too but it is
    # excluded from their previews (the real run drops it first)
    assert preview["dropped_months"] == [202507]
    assert preview["rewritten"] == 202508
    assert preview["delete_where"] == [
        {"days": 44, "where": "level = 'INFO'", "months": [202508]}]
    assert preview["column_ttl"] == {"msg": [202508]}
    assert preview["tiered"] == {}  # only 202507 would move — dropped
    assert _msgs(table) == before  # preview touched nothing
    assert not os.path.isdir(os.path.join(table.path, TIERS_DIR))

    res = apply_retention(spark, table.path, now=NOW)
    assert res["dropped_months"] == [202507]
    assert res["delete_where"] == preview["delete_where"]
    assert res["column_ttl"] == {"msg": [202508]}
    # survivors: aug1 deleted (aged INFO), aug2 ERROR kept with msg
    # reverted (20-day column TTL), sep1 young and untouched
    rows = {r.ts.isoformat(): r for r in table.read().collect()}
    assert sorted(rows) == ["2025-08-25T04:00:00", "2025-09-15T05:00:00"]
    assert rows["2025-08-25T04:00:00"].msg == ""
    assert rows["2025-09-15T05:00:00"].msg == "sep1"


def test_remove_ttl_clears_conditional_rules(spark, table):
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL ts + INTERVAL 40 DAY "
                  "DELETE WHERE level = 'INFO'", logs=table)
    assert read_delete_where(table.path)
    ch_sql(spark, "ALTER TABLE logs REMOVE TTL", logs=table)
    assert read_delete_where(table.path) == []
    assert read_table_ttl_spec(table.path) is None
    res = apply_retention(spark, table.path, now=NOW)
    assert res.get("skipped") is True
    assert _msgs(table) == ["aug1", "aug2", "jul1", "jul2", "sep1"]


def test_conditional_delete_drops_fully_matched_location(spark, table):
    """A location where EVERY row matches some armed rule must be
    dropped as a directory (the conditional analog of the
    unconditional arm dropping a fully-aged month) — and the table
    must not keep an empty month dir behind. Pins the r14 rewrite
    (write-then-footer-check replaced the pre-write emptiness probe)."""
    # every 202507 row matches: jul1 is INFO, jul2 is WARN
    ch_sql(spark, "ALTER TABLE logs MODIFY TTL ts + INTERVAL 40 DAY "
                  "DELETE WHERE level = 'INFO' OR level = 'WARN'",
           logs=table)
    res = apply_retention(spark, table.path, now=NOW)
    assert res["delete_where"] == [
        {"days": 40, "where": "level = 'INFO' OR level = 'WARN'",
         "months": [202507, 202508]}]
    # 202507 lost both rows -> directory gone entirely
    assert month_dirs(table.path, 202507) == []
    assert not os.path.exists(
        os.path.join(table.path, "month=202507"))
    # 202508 keeps its non-matching ERROR row in place
    assert _msgs(table) == ["aug2", "sep1"]
    # no .tmp debris left behind by the dropped location
    assert not any(".tmp" in d for d in os.listdir(table.path))
