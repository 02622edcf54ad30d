"""ALTER TABLE ADD/DROP/RENAME/MODIFY/COMMENT COLUMN — CH-style
metadata-only schema evolution (sources/schema_evolution.py).

Reference context: the backing store's standard DDL surface
(README.md; the fixed logs DDL at internal/db/db.go:41-49). CH
semantics pinned here: ADD COLUMN rewrites no data (old parts serve
the DEFAULT on read), RENAME is metadata-only (old physical names
keep serving through an alias), mutations/merges MATERIALIZE evolved
values into replaced files, and key/reference-DDL columns refuse
evolution honestly.
"""

from __future__ import annotations

import json
import os

import pytest

from clickhouse_observability_spark.functions.ch_dialect import (
    ChDialectError,
    ch_sql,
)
from clickhouse_observability_spark.sources.writer import LogsTable


@pytest.fixture()
def logs(spark, tmp_path):
    t = LogsTable(spark, str(tmp_path / "logs"))
    t.init_schema()
    return t


def _ins(spark, logs, msg, extra_cols="", extra_vals=""):
    ch_sql(spark, (
        f"INSERT INTO logs (ts, service, level, msg{extra_cols}) VALUES "
        f"('2025-05-01 10:00:00', 'api', 'INFO', '{msg}'{extra_vals})"),
        logs=logs)


def test_add_column_default_on_old_rows(spark, logs):
    """Rows written BEFORE the column exists serve the DEFAULT on
    read — no rewrite happens (pinned: the at-rest files gain no new
    column until a mutation materializes it)."""
    _ins(spark, logs, "old-row")
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN env String DEFAULT "
           "'prod'", logs=logs)
    # fresh handle: metadata must round-trip through the sidecar
    t2 = LogsTable(spark, logs.path)
    r = t2.read().collect()
    assert [x.env for x in r] == ["prod"]
    # new insert carries an explicit value
    _ins(spark, t2, "new-row", ", env", ", 'staging'")
    got = {x.msg: x.env for x in t2.read().collect()}
    assert got == {"old-row": "prod", "new-row": "staging"}
    # the old file was NOT rewritten: only the new file has the col
    import pyarrow.parquet as pq
    with_env = sum(
        1 for root, _, fs in os.walk(logs.path) for f in fs
        if f.endswith(".parquet")
        and "env" in pq.read_schema(os.path.join(root, f)).names)
    assert with_env == 1


def test_add_column_type_default_and_int(spark, logs):
    """No DEFAULT -> CH's type default ('' / 0), not NULL."""
    _ins(spark, logs, "r1")
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN note String", logs=logs)
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN retries UInt32", logs=logs)
    row = logs.read().collect()[0]
    assert row.note == "" and row.retries == 0
    # SELECT through the dialect sees the evolved columns
    n = ch_sql(spark, "SELECT count() AS n FROM logs WHERE retries = 0",
               logs=logs).collect()[0].n
    assert n == 1


def test_rename_column_alias_continuity(spark, logs):
    """RENAME is metadata-only: files written under the OLD name keep
    serving values through the alias chain; new writes use the new
    name; both appear as the new name."""
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN env String DEFAULT "
           "'none'", logs=logs)
    _ins(spark, logs, "a", ", env", ", 'prod'")
    ch_sql(spark, "ALTER TABLE logs RENAME COLUMN env TO environment",
           logs=logs)
    t2 = LogsTable(spark, logs.path)
    _ins(spark, t2, "b", ", environment", ", 'dev'")
    got = {x.msg: x.environment for x in t2.read().collect()}
    assert got == {"a": "prod", "b": "dev"}
    assert "env" not in t2.read().columns


def test_drop_and_refusals(spark, logs):
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN env String", logs=logs)
    ch_sql(spark, "ALTER TABLE logs DROP COLUMN env", logs=logs)
    assert "env" not in LogsTable(spark, logs.path).read().columns
    with pytest.raises(ChDialectError, match="no such column"):
        ch_sql(spark, "ALTER TABLE logs DROP COLUMN env", logs=logs)
    assert ch_sql(spark, "ALTER TABLE logs DROP COLUMN IF EXISTS env",
                  logs=logs) == 0
    # reference-DDL columns are immutable (engine API contract)
    for stmt in (
        "ALTER TABLE logs DROP COLUMN msg",
        "ALTER TABLE logs RENAME COLUMN service TO svc",
        "ALTER TABLE logs MODIFY COLUMN ts DEFAULT now()",
    ):
        with pytest.raises(ChDialectError, match="immutable"):
            ch_sql(spark, stmt, logs=logs)
    # duplicate / collision adds refused; IF NOT EXISTS tolerates
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN x String", logs=logs)
    with pytest.raises(ChDialectError, match="already exists"):
        ch_sql(spark, "ALTER TABLE logs ADD COLUMN x String", logs=logs)
    with pytest.raises(ChDialectError, match="already exists"):
        ch_sql(spark, "ALTER TABLE logs ADD COLUMN msg String", logs=logs)
    assert ch_sql(spark, "ALTER TABLE logs ADD COLUMN IF NOT EXISTS "
                  "x String", logs=logs) == 0
    # unsupported types refused honestly, not lossily mapped
    with pytest.raises(ChDialectError, match="unsupported column type"):
        ch_sql(spark, "ALTER TABLE logs ADD COLUMN a Array(String)",
               logs=logs)
    # type changes refused honestly
    with pytest.raises(ChDialectError, match="type change"):
        ch_sql(spark, "ALTER TABLE logs MODIFY COLUMN x UInt64",
               logs=logs)


def test_modify_default(spark, logs):
    """MODIFY COLUMN DEFAULT changes what UN-materialized rows serve
    (CH: the default is applied at read for parts lacking the
    column); REMOVE DEFAULT falls back to the type default."""
    _ins(spark, logs, "r")
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN env String DEFAULT "
           "'prod'", logs=logs)
    assert logs.read().collect()[0].env == "prod"
    ch_sql(spark, "ALTER TABLE logs MODIFY COLUMN env DEFAULT 'dev'",
           logs=logs)
    assert LogsTable(spark, logs.path).read().collect()[0].env == "dev"
    ch_sql(spark, "ALTER TABLE logs MODIFY COLUMN env REMOVE DEFAULT",
           logs=logs)
    assert LogsTable(spark, logs.path).read().collect()[0].env == ""


def test_mutation_materializes_evolved_column(spark, logs):
    """An UPDATE mutation rewrites affected months — evolved values
    MATERIALIZE into the replaced files (CH: mutations materialize
    defaults) and survive; evolved columns are assignable."""
    _ins(spark, logs, "keep")
    _ins(spark, logs, "flag-me")
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN env String DEFAULT "
           "'prod'", logs=logs)
    t2 = LogsTable(spark, logs.path)
    n = ch_sql(spark, "ALTER TABLE logs UPDATE env = 'flagged' "
               "WHERE msg = 'flag-me'", logs=t2)
    assert n == 1
    got = {x.msg: x.env for x in t2.read().collect()}
    assert got == {"keep": "prod", "flag-me": "flagged"}
    # the rewrite materialized the column into the at-rest files
    import pyarrow.parquet as pq
    files = [os.path.join(r, f) for r, _, fs in os.walk(logs.path)
             for f in fs if f.endswith(".parquet")]
    assert files and all(
        "env" in pq.read_schema(f).names for f in files)
    # a later DEFAULT change does NOT touch materialized rows (CH)
    ch_sql(spark, "ALTER TABLE logs MODIFY COLUMN env DEFAULT 'x'",
           logs=t2)
    got = {x.msg: x.env for x in LogsTable(spark, logs.path)
           .read().collect()}
    assert got == {"keep": "prod", "flag-me": "flagged"}


def test_delete_keeps_evolved_values(spark, logs):
    _ins(spark, logs, "a")
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN env String DEFAULT "
           "'p'", logs=logs)
    t2 = LogsTable(spark, logs.path)
    _ins(spark, t2, "b", ", env", ", 'q'")
    ch_sql(spark, "ALTER TABLE logs DELETE WHERE msg = 'a'", logs=t2)
    got = [(x.msg, x.env) for x in t2.read().collect()]
    assert got == [("b", "q")]


def test_compaction_materializes(spark, logs):
    from clickhouse_observability_spark.sources.retention import (
        compact_partition,
    )

    _ins(spark, logs, "a")
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN env String DEFAULT "
           "'prod'", logs=logs)
    t2 = LogsTable(spark, logs.path)
    _ins(spark, t2, "b", ", env", ", 'dev'")
    compact_partition(spark, logs.path, 202505, target_files=1)
    got = {x.msg: x.env for x in t2.read().collect()}
    assert got == {"a": "prod", "b": "dev"}


def test_show_create_describe_system_columns(spark, logs):
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN env String DEFAULT "
           "'prod' COMMENT 'deploy env'", logs=logs)
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN retries UInt32",
           logs=logs)
    t2 = LogsTable(spark, logs.path)
    ddl = ch_sql(spark, "SHOW CREATE TABLE logs",
                 logs=t2).collect()[0].statement
    assert "`env` String DEFAULT 'prod' COMMENT 'deploy env'" in ddl
    assert "`retries` UInt32" in ddl
    cols = {r.name: r.type for r in ch_sql(
        spark, "SELECT name, type FROM system.columns "
        "WHERE table = 'logs'", logs=t2).collect()}
    assert cols["env"] == "string" and cols["retries"] == "bigint"
    # sidecar is valid json with the expected shape
    with open(os.path.join(logs.path, "_schema_ext.json")) as f:
        meta = json.load(f)
    assert [c["name"] for c in meta["columns"]] == ["env", "retries"]


def test_ch_default_expression_translated(spark, logs):
    """DEFAULT expressions go through the dialect's expression
    translator — CH vocabulary like toYYYYMM(ts)/length(msg) works."""
    _ins(spark, logs, "hello")
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN msg_len UInt32 "
           "DEFAULT length(msg)", logs=logs)
    row = LogsTable(spark, logs.path).read().collect()[0]
    assert row.msg_len == 5


def test_insert_select_with_evolved_column(spark, logs):
    """INSERT ... SELECT carries evolved columns symmetrically with
    INSERT ... VALUES (positional mapping, typed cast)."""
    ch_sql(spark, "ALTER TABLE logs ADD COLUMN env String DEFAULT "
           "'none'", logs=logs)
    t2 = LogsTable(spark, logs.path)
    n = ch_sql(spark, (
        "INSERT INTO logs (ts, service, level, msg, env) "
        "SELECT '2025-05-01 10:00:00', 'api', 'INFO', 'via-select', "
        "'fromsel'"), logs=t2)
    assert n == 1
    row = t2.read().collect()[0]
    assert row.msg == "via-select" and row.env == "fromsel"
