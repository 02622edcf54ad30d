"""Cross-table partition movement + table name DDL + column rewrites
(`sources/mutations.py`, dialect routing in `functions/ch_dialect.py`).

CH statements pinned here, with their CH cost classes:
- ALTER TABLE src MOVE PARTITION p TO TABLE dst  (directory renames)
- ALTER TABLE dst REPLACE|ATTACH PARTITION p FROM src  (hardlinks —
  CH's zero-copy part attach; the source table is untouched)
- RENAME TABLE a TO b / EXCHANGE TABLES a AND b  (metadata-only name
  mapping edits, CH Atomic database semantics)
- ALTER TABLE t MATERIALIZE COLUMN c [IN PARTITION p]  (part rewrite
  storing an evolved column physically)
- ALTER TABLE t CLEAR COLUMN c IN PARTITION p  (reset to DEFAULT)

Reference context: the reference's store is ClickHouse (README.md);
these are the standard CH operations a user of that stack runs for
staging-table swaps, backfills, and cold-partition movement.
"""

from __future__ import annotations

import os

import pytest

from clickhouse_observability_spark.functions.ch_dialect import (
    ChDialectError,
    ch_sql,
)
from clickhouse_observability_spark.sources.writer import LogsTable


@pytest.fixture()
def two_tables(spark, tmp_path):
    a = LogsTable(spark, str(tmp_path / "a"))
    a.init_schema()
    b = LogsTable(spark, str(tmp_path / "b"))
    b.init_schema()
    return a, b


def _ins(spark, t, ts, svc, msg):
    ch_sql(spark, (
        "INSERT INTO logs (ts, service, level, msg) VALUES "
        f"('{ts}', '{svc}', 'INFO', '{msg}')"), logs=t)


def _msgs(t):
    return sorted(r.msg for r in t.read().collect())


def test_move_partition_to_table(spark, two_tables):
    a, b = two_tables
    _ins(spark, a, "2025-05-01 10:00:00", "api", "may")
    _ins(spark, a, "2025-06-01 10:00:00", "api", "jun")
    n = ch_sql(spark, "ALTER TABLE a MOVE PARTITION 202505 TO TABLE b",
               tables={"a": a, "b": b})
    assert n >= 1
    assert _msgs(a) == ["jun"]
    assert _msgs(b) == ["may"]
    # the month left `a` entirely (directory gone, no Spark rewrite)
    assert not os.path.isdir(os.path.join(a.path, "month=202505"))
    with pytest.raises(ChDialectError, match="no partition"):
        ch_sql(spark, "ALTER TABLE a MOVE PARTITION 202505 TO TABLE b",
               tables={"a": a, "b": b})


def test_move_merges_into_existing_month(spark, two_tables):
    a, b = two_tables
    _ins(spark, a, "2025-05-01 10:00:00", "api", "from_a")
    _ins(spark, b, "2025-05-02 10:00:00", "web", "already_b")
    ch_sql(spark, "ALTER TABLE a MOVE PARTITION 202505 TO TABLE b",
           tables={"a": a, "b": b})
    assert _msgs(a) == []
    assert _msgs(b) == ["already_b", "from_a"]


def test_move_refuses_structure_mismatch(spark, two_tables):
    a, b = two_tables
    _ins(spark, a, "2025-05-01 10:00:00", "api", "may")
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN env String DEFAULT 'x'",
           logs=b)
    with pytest.raises(ChDialectError, match="different structure"):
        ch_sql(spark, "ALTER TABLE a MOVE PARTITION 202505 TO TABLE b",
               tables={"a": a, "b": b})


def test_replace_partition_from(spark, two_tables):
    a, b = two_tables
    _ins(spark, a, "2025-05-01 10:00:00", "api", "golden")
    _ins(spark, b, "2025-05-02 10:00:00", "web", "stale1")
    _ins(spark, b, "2025-05-03 10:00:00", "web", "stale2")
    _ins(spark, b, "2025-06-01 10:00:00", "web", "junk")
    n = ch_sql(spark, "ALTER TABLE b REPLACE PARTITION 202505 FROM a",
               tables={"a": a, "b": b})
    assert n >= 1
    # dst's month swapped wholesale; other months and the source
    # table untouched
    assert _msgs(b) == ["golden", "junk"]
    assert _msgs(a) == ["golden"]
    # zero-copy: the attached files are HARDLINKS of a's files
    mdir = os.path.join(b.path, "month=202505")
    assert all(os.stat(os.path.join(mdir, f)).st_nlink >= 2
               for f in os.listdir(mdir) if f.endswith(".parquet"))


def test_attach_partition_from_adds(spark, two_tables):
    a, b = two_tables
    _ins(spark, a, "2025-05-01 10:00:00", "api", "extra")
    _ins(spark, b, "2025-05-02 10:00:00", "web", "kept")
    ch_sql(spark, "ALTER TABLE b ATTACH PARTITION 202505 FROM a",
           tables={"a": a, "b": b})
    assert _msgs(b) == ["extra", "kept"]
    assert _msgs(a) == ["extra"]
    # attaching again collision-renames rather than clobbering
    ch_sql(spark, "ALTER TABLE b ATTACH PARTITION 202505 FROM a",
           tables={"a": a, "b": b})
    assert _msgs(b) == ["extra", "extra", "kept"]


def test_rename_and_exchange_tables(spark, two_tables):
    a, b = two_tables
    _ins(spark, a, "2025-05-01 10:00:00", "api", "in_a")
    _ins(spark, b, "2025-05-01 10:00:00", "web", "in_b")
    tables = {"staging": a, "serving": b}
    ch_sql(spark, "RENAME TABLE staging TO loaded", tables=tables)
    assert set(tables) == {"loaded", "serving"}
    assert tables["loaded"] is a  # metadata-only: same object, path
    with pytest.raises(ChDialectError, match="already exists"):
        ch_sql(spark, "RENAME TABLE loaded TO serving", tables=tables)
    ch_sql(spark, "EXCHANGE TABLES loaded AND serving", tables=tables)
    assert tables["serving"] is a and tables["loaded"] is b
    # reads route by the CURRENT mapping
    rows = ch_sql(spark, "SELECT msg FROM serving", tables=tables)
    assert [r.msg for r in rows.collect()] == ["in_a"]
    with pytest.raises(ChDialectError, match="no table"):
        ch_sql(spark, "EXCHANGE TABLES loaded AND ghost", tables=tables)


def test_materialize_column(spark, two_tables):
    import pyarrow.parquet as pq

    a, _ = two_tables
    _ins(spark, a, "2025-05-01 10:00:00", "api", "old")
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN env String DEFAULT "
           "concat(service, '-prod')", logs=a)
    files = lambda: [  # noqa: E731
        os.path.join(r, f) for r, _, fs in os.walk(a.path)
        for f in fs if f.endswith(".parquet") and "month=" in r]
    # ADD COLUMN rewrote nothing: no file stores `env` yet
    assert not any("env" in pq.read_schema(f).names for f in files())
    n = ch_sql(spark, "ALTER TABLE logs MATERIALIZE COLUMN env",
               logs=a)
    assert n == 1  # rows rewritten
    assert all("env" in pq.read_schema(f).names for f in files())
    t2 = LogsTable(spark, a.path)
    assert [r.env for r in t2.read().collect()] == ["api-prod"]
    with pytest.raises(ChDialectError, match="no evolved column"):
        ch_sql(spark, "ALTER TABLE logs MATERIALIZE COLUMN msg", logs=a)


def test_materialize_column_in_partition(spark, two_tables):
    import pyarrow.parquet as pq

    a, _ = two_tables
    _ins(spark, a, "2025-05-01 10:00:00", "api", "may")
    _ins(spark, a, "2025-06-01 10:00:00", "web", "jun")
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN env String DEFAULT 'e'",
           logs=a)
    ch_sql(spark,
           "ALTER TABLE logs MATERIALIZE COLUMN env IN PARTITION 202505",
           logs=a)
    stored = lambda m: any(  # noqa: E731
        "env" in pq.read_schema(os.path.join(d, f)).names
        for d in [os.path.join(a.path, f"month={m}")]
        for f in os.listdir(d) if f.endswith(".parquet"))
    assert stored(202505) and not stored(202506)


def test_clear_column_core_and_evolved(spark, two_tables):
    a, _ = two_tables
    _ins(spark, a, "2025-05-01 10:00:00", "api", "may")
    _ins(spark, a, "2025-06-01 10:00:00", "web", "jun")
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN env String DEFAULT 'd'",
           logs=a)
    ch_sql(spark, "ALTER TABLE logs UPDATE env = 'live' WHERE 1 = 1",
           logs=a)
    # core column: resets to the INSERT default, scoped to the month
    n = ch_sql(spark, "ALTER TABLE logs CLEAR COLUMN msg "
               "IN PARTITION 202505", logs=a)
    assert n == 1
    t2 = LogsTable(spark, a.path)
    rows = {r.service: (r.msg, r.env) for r in t2.read().collect()}
    assert rows["api"][0] == "" and rows["web"][0] == "jun"
    # evolved column: resets to its DECLARED default
    ch_sql(spark, "ALTER TABLE logs CLEAR COLUMN env "
           "IN PARTITION 202505", logs=a)
    t3 = LogsTable(spark, a.path)
    rows = {r.service: r.env for r in t3.read().collect()}
    assert rows == {"api": "d", "web": "live"}
    # key columns refuse; IF EXISTS no-ops on a missing column
    with pytest.raises(ChDialectError, match="refuses CLEAR"):
        ch_sql(spark, "ALTER TABLE logs CLEAR COLUMN ts "
               "IN PARTITION 202505", logs=a)
    assert ch_sql(spark, "ALTER TABLE logs CLEAR COLUMN IF EXISTS ghost "
                  "IN PARTITION 202505", logs=a) == 0


def test_unknown_table_message(spark, two_tables):
    a, _ = two_tables
    with pytest.raises(ChDialectError, match="unknown table"):
        ch_sql(spark, "ALTER TABLE ghost DROP PARTITION 202505", logs=a)
    with pytest.raises(ChDialectError, match="tables="):
        ch_sql(spark, "RENAME TABLE a TO b", logs=a)


def test_drop_and_undrop_table(spark, two_tables):
    a, b = two_tables
    _ins(spark, a, "2025-05-01 10:00:00", "api", "keepme")
    tables = {"t1": a, "t2": b}
    ch_sql(spark, "DROP TABLE t1", tables=tables)
    assert "t1" not in tables
    # CH Atomic: the data is PARKED, not deleted — visible in
    # system.dropped_tables, gone from the active path
    assert not os.path.isdir(a.path)
    assert os.path.isdir(a.path.rstrip("/") + ".dropped")
    rows = ch_sql(spark, "SELECT name, data_path FROM "
                  "system.dropped_tables", tables=tables).collect()
    assert [r.name for r in rows] == ["t1"]
    with pytest.raises(ChDialectError, match="unknown table"):
        ch_sql(spark, "ALTER TABLE t1 DROP PARTITION 202505",
               tables=tables)
    ch_sql(spark, "UNDROP TABLE t1", tables=tables)
    assert "t1" in tables and os.path.isdir(tables["t1"].path)
    assert sorted(r.msg for r in tables["t1"].read().collect()) == [
        "keepme"]
    assert ch_sql(spark, "SELECT count() AS n FROM "
                  "system.dropped_tables",
                  tables=tables).collect()[0].n == 0
    with pytest.raises(ChDialectError, match="no dropped table"):
        ch_sql(spark, "UNDROP TABLE t1", tables=tables)


def test_reserved_names_guarded(spark, two_tables):
    a, _ = two_tables
    tables = {"t1": a}
    with pytest.raises(ChDialectError, match="reserved"):
        ch_sql(spark, "RENAME TABLE t1 TO __dropped__", tables=tables)
    ch_sql(spark, "DROP TABLE t1", tables=tables)
    # the bookkeeping key never resolves as a table
    with pytest.raises(ChDialectError, match="unknown table"):
        ch_sql(spark, "ALTER TABLE __dropped__ DROP PARTITION 202505",
               tables=tables)


def test_move_to_same_table_refused(spark, two_tables):
    """Merging a month into itself would collision-copy then unlink
    the directory — data loss; refused like CH refuses same-table
    MOVE PARTITION."""
    a, _ = two_tables
    _ins(spark, a, "2025-05-01 10:00:00", "api", "keep")
    with pytest.raises(ChDialectError, match="same table"):
        ch_sql(spark, "ALTER TABLE a MOVE PARTITION 202505 TO TABLE a2",
               tables={"a": a, "a2": a})
    assert _msgs(a) == ["keep"]


def test_show_tables_lists_mapping(spark, two_tables):
    a, b = two_tables
    tables = {"staging": a, "serving": b}
    names = [r.name for r in ch_sql(spark, "SHOW TABLES",
                                    tables=tables).collect()]
    assert names == ["serving", "staging"]
    ch_sql(spark, "DROP TABLE staging", tables=tables)
    names = [r.name for r in ch_sql(spark, "SHOW TABLES",
                                    tables=tables).collect()]
    assert names == ["serving"]  # parked table hidden, like CH
