"""ClickHouse schema evolution: `ALTER TABLE ... ADD / DROP / RENAME
/ MODIFY / COMMENT COLUMN` as metadata-only operations.

Reference context: the reference's store is ClickHouse (README.md
pitches the standard DDL surface; the fixed logs DDL lives at
internal/db/db.go:41-49), where ADD COLUMN is a metadata write — no
data part is rewritten; parts that predate the column serve its
DEFAULT on read, and later merges/mutations materialize the value.
The Spark analog stores the evolved columns in a `_schema_ext.json`
sidecar at the table path (underscore files are invisible to Spark's
listings, like every other marker this engine uses) and applies them
on READ: the scan schema grows by the stored physical names, and a
projection materializes `coalesce(stored, default)` per evolved
column. Old files lacking the column read as the default — CH's
exact read-path semantics — at zero rewrite cost.

CH-parity restrictions, raised not mistranslated:

- The seven reference-DDL columns (+ the derived `month` partition
  column) are IMMUTABLE here: they are the engine's API/query
  contract (db.go:41-49), and ClickHouse likewise refuses dropping
  or renaming key columns. DROP/RENAME/MODIFY on them raises.
- MODIFY COLUMN may change the DEFAULT (metadata-only in CH too).
  A TYPE change is refused honestly: in CH it rewrites every part
  in the background; a silent cast-on-read would misrepresent the
  at-rest bytes. (`DROP` + `ADD` under a new name is the explicit
  two-step this engine offers instead.)
- RENAME COLUMN is metadata-only: the old physical name is kept as
  an alias so files written before the rename keep serving values
  (`coalesce(new, old, default)`); new writes use the new name.

Mutations, retention boundary rewrites, z-order compaction and
OPTIMIZE go through `rewrite_columns()`/`read_overlay()` so a
rewrite MATERIALIZES evolved values into the replaced files (CH:
mutations materialize defaults) instead of silently dropping them.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import Column, DataFrame, functions as F

from clickhouse_observability_spark.schema import (
    LOGS_COLUMNS,
    PARTITION_COLUMN,
)

_EXT_FILE = "_schema_ext.json"

_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")

# CH type -> (Spark SQL type, canonical CH spelling). Nullable(T)
# wrappers are accepted and recorded (everything is nullable in this
# engine's Spark mapping anyway — SURVEY.md §1.3).
_CH_TYPES = {
    "string": ("string", "String"),
    "fixedstring": ("string", "String"),
    "uint8": ("int", "UInt8"),
    "uint16": ("int", "UInt16"),
    "uint32": ("bigint", "UInt32"),
    "uint64": ("bigint", "UInt64"),
    "int8": ("int", "Int8"),
    "int16": ("int", "Int16"),
    "int32": ("int", "Int32"),
    "int64": ("bigint", "Int64"),
    "float32": ("float", "Float32"),
    "float64": ("double", "Float64"),
    "bool": ("boolean", "Bool"),
    "boolean": ("boolean", "Bool"),
    "date": ("date", "Date"),
    "datetime": ("timestamp", "DateTime"),
    "datetime64": ("timestamp", "DateTime64"),
}

# CH type-default served when a column has no explicit DEFAULT and
# the file predates it (CH returns '' / 0, not NULL).
_TYPE_DEFAULTS = {
    "string": "''",
    "int": "0",
    "bigint": "0",
    "float": "cast(0.0 as float)",
    "double": "0.0",
    "boolean": "false",
    "date": "DATE'1970-01-01'",
    "timestamp": "TIMESTAMP'1970-01-01 00:00:00'",
}


def map_ch_type(ch_type: str) -> tuple[str, str]:
    """CH type spelling -> (spark sql type, canonical CH spelling).
    Raises ValueError for types this engine does not evolve to
    (arrays/maps/enums/decimals — honest refusal, not a lossy map).
    """
    t = ch_type.strip()
    low = re.sub(r"\s", "", t.lower())
    m = re.fullmatch(r"nullable\((.+)\)", low)
    if m:
        low = m.group(1)
    base = re.split(r"\(", low, 1)[0]
    if base == "lowcardinality":
        inner = re.fullmatch(r"lowcardinality\((.+)\)", low)
        return map_ch_type(inner.group(1)) if inner else ("string", "String")
    if base not in _CH_TYPES:
        raise ValueError(
            f"unsupported column type {ch_type!r}: ADD/MODIFY COLUMN "
            "supports scalar CH types "
            "(String/Int*/UInt*/Float*/Bool/Date/DateTime[64]); "
            "arrays, maps, enums and decimals are refused rather than "
            "lossily mapped")
    return _CH_TYPES[base]


class SchemaExt:
    """The evolved-column sidecar of one logs table."""

    def __init__(self, path: str):
        self.path = path
        self.file = os.path.join(path, _EXT_FILE)
        self.columns: list[dict] = []
        if os.path.exists(self.file):
            with open(self.file) as f:
                self.columns = json.load(f)["columns"]

    # -- persistence ---------------------------------------------------
    def _save(self) -> None:
        tmp = self.file + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"columns": self.columns}, f, indent=1)
        os.replace(tmp, self.file)

    # -- lookups -------------------------------------------------------
    def names(self) -> list[str]:
        return [c["name"] for c in self.columns]

    def stored_names(self) -> list[str]:
        """Every physical column name that may appear in data files
        (current names + pre-rename aliases), newest-first per col."""
        out = []
        for c in self.columns:
            out.append(c["name"])
            out.extend(c["aliases"])
        return out

    def get(self, name: str) -> dict | None:
        for c in self.columns:
            if c["name"] == name:
                return c
        return None

    # -- DDL operations ------------------------------------------------
    def _check_new_name(self, name: str) -> None:
        if not _NAME_RE.fullmatch(name):
            raise ValueError(f"invalid column name {name!r}")
        if name in LOGS_COLUMNS or name == PARTITION_COLUMN:
            raise ValueError(
                f"column {name!r} already exists (reference-DDL "
                "column, db.go:41-49)")
        if any(name == c["name"] or name in c["aliases"]
               for c in self.columns):
            raise ValueError(f"column {name!r} already exists")

    def add_column(self, name: str, ch_type: str,
                   default: str | None = None,
                   if_not_exists: bool = False,
                   comment: str | None = None) -> dict:
        if if_not_exists and (
            name in LOGS_COLUMNS or name == PARTITION_COLUMN
            or self.get(name) is not None
        ):
            return {"op": "add_column", "column": name, "skipped": True}
        self._check_new_name(name)
        spark_type, canon = map_ch_type(ch_type)
        col = {
            "name": name,
            "ch_type": canon,
            "spark_type": spark_type,
            "default": default,  # Spark SQL expression string or None
            "aliases": [],
            "comment": comment,
        }
        self.columns.append(col)
        self._save()
        return {"op": "add_column", "column": name, "type": canon}

    def _require_evolved(self, name: str, op: str) -> dict:
        if name in LOGS_COLUMNS or name == PARTITION_COLUMN:
            raise ValueError(
                f"cannot {op} column {name!r}: the reference-DDL "
                "columns (db.go:41-49) are this engine's API/query "
                "contract and are immutable (ClickHouse likewise "
                "refuses key-column DDL)")
        col = self.get(name)
        if col is None:
            raise ValueError(f"no such column {name!r}")
        return col

    def drop_column(self, name: str, if_exists: bool = False) -> dict:
        if if_exists and self.get(name) is None and \
                name not in LOGS_COLUMNS and name != PARTITION_COLUMN:
            return {"op": "drop_column", "column": name, "skipped": True}
        col = self._require_evolved(name, "drop")
        self.columns.remove(col)
        self._save()
        # metadata-only like CH: bytes in existing files become
        # unreferenced and fall out at the next rewrite/merge
        return {"op": "drop_column", "column": name}

    def rename_column(self, old: str, new: str) -> dict:
        col = self._require_evolved(old, "rename")
        self._check_new_name(new)
        col["aliases"].insert(0, col["name"])
        col["name"] = new
        self._save()
        return {"op": "rename_column", "from": old, "to": new}

    def modify_default(self, name: str, default: str | None) -> dict:
        col = self._require_evolved(name, "modify")
        col["default"] = default
        self._save()
        return {"op": "modify_column", "column": name}

    def comment_column(self, name: str, comment: str) -> dict:
        col = self._require_evolved(name, "comment")
        col["comment"] = comment
        self._save()
        return {"op": "comment_column", "column": name}

    # -- read/write overlay --------------------------------------------
    def read_fields(self):
        """Extra StructFields for the scan schema: every stored
        physical name, read as the column's Spark type."""
        from pyspark.sql import types as T

        atomic = {
            "string": T.StringType(), "int": T.IntegerType(),
            "bigint": T.LongType(), "float": T.FloatType(),
            "double": T.DoubleType(), "boolean": T.BooleanType(),
            "date": T.DateType(), "timestamp": T.TimestampType(),
        }
        fields = []
        for c in self.columns:
            for stored in [c["name"], *c["aliases"]]:
                fields.append(
                    T.StructField(stored, atomic[c["spark_type"]]))
        return fields

    def value_expr(self, c: dict) -> Column:
        """coalesce(current, aliases..., default) — CH's read-path
        default materialization for parts predating the column."""
        default = c["default"]
        if default is None:
            default = _TYPE_DEFAULTS[c["spark_type"]]
        chain = [F.col(c["name"])] + [F.col(a) for a in c["aliases"]]
        chain.append(F.expr(default).cast(c["spark_type"]))
        return F.coalesce(*chain).alias(c["name"])

    def overlay(self, df: DataFrame) -> DataFrame:
        """Project the raw widened scan to the logical schema:
        core columns + one materialized column per evolved column
        (+ month when present)."""
        if not self.columns:
            return df
        cols = [F.col(c) for c in LOGS_COLUMNS]
        cols += [self.value_expr(c) for c in self.columns]
        if PARTITION_COLUMN in df.columns:
            cols.append(F.col(PARTITION_COLUMN))
        return df.select(*cols)

    def write_columns(self, df: DataFrame) -> list[str]:
        """Evolved columns present in an insert block (by CURRENT
        name) — these get written; absent ones cost nothing and read
        as their default."""
        return [c["name"] for c in self.columns if c["name"] in df.columns]

    def ddl_clauses(self) -> list[str]:
        """SHOW CREATE TABLE lines for the evolved columns."""
        out = []
        for c in self.columns:
            line = f"  `{c['name']}` {c['ch_type']}"
            if c["default"] is not None:
                line += f" DEFAULT {c['default']}"
            if c.get("comment"):
                line += f" COMMENT '{c['comment']}'"
            out.append(line)
        return out
