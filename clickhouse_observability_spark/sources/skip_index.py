"""ClickHouse data-skipping indexes as per-file sidecar summaries.

Reference context: the reference's store is ClickHouse (README.md),
whose secondary "skip" indexes (minmax / set(N) / bloom_filter /
tokenbf_v1) let a scan skip GRANULES on non-sort-key predicates —
the standard answer to "my WHERE column isn't in ORDER BY". The
Spark-native analog prunes FILES: each index keeps one summary per
at-rest parquet file under `_skip_idx/<name>.json`; a lookup maps an
equality / token predicate to the set of files that might match and
the read scans only those. Parquet row-group footer stats already
cover CH's intra-file (granule) tier for the SORT-KEY columns
(sources/parquet.py); this sidecar covers the inter-file tier for
everything else — at 100 TB, file-level skipping is the lever that
matters (a selective set/bloom index turns a full-table scan into a
handful of file reads, exactly CH's cost model).

Index types and their CH contracts:
- ``minmax``      — [min, max] of the expression per file; prunes
                    when the probe value falls outside.
- ``set(N)``      — up to N distinct values per file; a file that
                    exceeds N stores an overflow marker and is never
                    pruned (CH: the granule index degrades to
                    "might contain anything").
- ``bloom_filter``— m-bit / k-hash Bloom filter over VALUES; no
                    false negatives, so pruning is always sound.
- ``tokenbf_v1``  — the Bloom filter over the TOKENS of a string
                    expression (CH's hasToken / LIKE '%tok%' index).

Freshness contract (CH parity): files written AFTER materialize are
unknown to the sidecar and are always scanned (CH parts without a
built index aren't skipped); files that no longer exist are ignored.
``MATERIALIZE INDEX`` rebuilds the summaries in ONE Spark job
(groupBy input_file_name, map-side combine). Divergence, documented:
ClickHouse consults skip indexes automatically inside its scan;
here `read_pruned` / the structured query helpers apply them, and
arbitrary SQL reads stay full-scan + footer stats.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_IDX_DIR = "_skip_idx"
TYPES = ("minmax", "set", "bloom_filter", "tokenbf_v1")

# Bloom geometry defaults (CH tokenbf_v1 takes (size_bytes, hashes,
# seed); bloom_filter takes a false-positive rate — both map onto the
# same m/k here, seed folded into the double-hash stream)
_DEFAULT_M_BITS = 1 << 16
_DEFAULT_K = 4
_MAX_M_BITS = 1 << 24  # cap a hostile size_bytes before it allocates


def _index_path(table_path: str, name: str) -> str:
    return os.path.join(table_path, _IDX_DIR, f"{name}.json")


def _tokens_expr(value_expr: str) -> str:
    """CH's tokenbf tokenizer: split on NON-ALPHANUMERIC boundaries
    (exactly what hasToken matches — 'error:zeta' holds the token
    'zeta'), lowercased so one filter serves both hasToken (probe
    lowercases, sound: raw-token presence implies lowercase-token
    presence) and hasTokenCaseInsensitive."""
    return (f"filter(split(lower({value_expr}), '[^a-z0-9_]+'), "
            "x -> x != '')")


class SkipIndex:
    """One named skip index on a LogsTable-layout directory."""

    def __init__(self, table_path: str, meta: dict):
        self.table_path = table_path
        self.meta = meta

    # -- metadata lifecycle ------------------------------------------------
    @staticmethod
    def create(table_path: str, name: str, expr_sql: str, type_: str,
               param: Any = None, granularity: int = 1) -> "SkipIndex":
        """`ALTER TABLE ... ADD INDEX` — metadata only, like CH (the
        index builds on MATERIALIZE INDEX / future merges, never
        here). `expr_sql` is a Spark SQL expression over the logical
        columns (the dialect translates CH vocabulary first)."""
        if type_ not in TYPES:
            raise ValueError(
                f"unknown index type {type_!r}; supported: {TYPES}")
        if not name.replace("_", "").isalnum():
            raise ValueError(f"bad index name {name!r}")
        p = _index_path(table_path, name)
        if os.path.exists(p):
            raise ValueError(f"index {name!r} already exists")
        meta = {
            "name": name,
            "expr": expr_sql,
            "type": type_,
            "granularity": int(granularity),
            "param": param,
            "files": {},  # relpath -> summary; empty until MATERIALIZE
        }
        if type_ == "set":
            meta["param"] = int(param or 100)
        elif type_ in ("bloom_filter", "tokenbf_v1"):
            m, k = _DEFAULT_M_BITS, _DEFAULT_K
            if isinstance(param, (list, tuple)) and param:
                # CH tokenbf_v1(size_bytes, hashes, seed)
                m = min(int(param[0]) * 8, _MAX_M_BITS)
                if len(param) > 1:
                    k = max(1, min(int(param[1]), 16))
            meta["param"] = [int(m), int(k)]
        os.makedirs(os.path.dirname(p), exist_ok=True)
        idx = SkipIndex(table_path, meta)
        idx._save()
        return idx

    @staticmethod
    def load(table_path: str, name: str) -> "SkipIndex | None":
        p = _index_path(table_path, name)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return SkipIndex(table_path, json.load(fh))

    @staticmethod
    def load_all(table_path: str) -> list["SkipIndex"]:
        d = os.path.join(table_path, _IDX_DIR)
        if not os.path.isdir(d):
            return []
        out = []
        for f in sorted(os.listdir(d)):
            if f.endswith(".json"):
                with open(os.path.join(d, f)) as fh:
                    out.append(SkipIndex(table_path, json.load(fh)))
        return out

    def _save(self) -> None:
        p = _index_path(self.table_path, self.meta["name"])
        tmp = p + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self.meta, fh)
        os.replace(tmp, p)

    def drop(self) -> None:
        os.remove(_index_path(self.table_path, self.meta["name"]))
        d = os.path.join(self.table_path, _IDX_DIR)
        if not os.listdir(d):
            os.rmdir(d)

    def clear(self) -> None:
        """`CLEAR INDEX`: drop the built summaries, keep the
        definition (CH removes the index files from parts)."""
        self.meta["files"] = {}
        self._save()

    # -- build ---------------------------------------------------------
    def materialize(self, spark: SparkSession,
                    incremental: bool = False) -> dict:
        """`MATERIALIZE INDEX`: ONE job computes per-file summaries
        — the scan reads only the indexed expression's column(s)
        (column pruning reaches the parquet reader), groups by
        input_file_name with map-side combine, and collects
        O(#files) rows (bloom types: #files x m/64 words).

        ``incremental=True`` summarizes ONLY files the sidecar has
        never seen — CH's model, where parts built after the index
        definition get their index at write/merge time: a steady
        ingest keeps the index fresh at O(new files) per call, never
        O(table). Dead entries (files replaced by mutations or
        compaction) are dropped either way — the read path ignores
        them, but pruning them keeps the sidecar O(live files)."""
        import glob as _glob

        from clickhouse_observability_spark.schema import (
            LOGS_SCHEMA,
            PARTITION_COLUMN,
        )
        from clickhouse_observability_spark.sources.writer import LogsTable

        t = LogsTable(spark, self.table_path)
        typ = self.meta["type"]
        root = os.path.abspath(self.table_path)
        live = {
            os.path.relpath(f, root)
            for f in _glob.glob(os.path.join(
                root, f"{PARTITION_COLUMN}=*", "*.parquet"))
        }
        prior = {k: v for k, v in self.meta["files"].items()
                 if k in live}
        if incremental:
            todo = sorted(live - set(prior))
            if not todo:
                self.meta["files"] = prior
                self._save()
                return {"op": "materialize_index",
                        "name": self.meta["name"], "files": len(prior)}
            from pyspark.sql import types as T

            full = T.StructType(
                LOGS_SCHEMA.fields
                + t.schema_ext.read_fields()
                + [T.StructField(PARTITION_COLUMN, T.IntegerType())]
            )
            scan = t.schema_ext.overlay(
                spark.read.option("basePath", root).schema(full)
                .parquet(*[os.path.join(root, f) for f in todo])
            )
        else:
            prior = {}
            scan = t.read()
        base = scan.select(
            F.expr(self.meta["expr"]).alias("v"),
            F.input_file_name().alias("f"),
        )
        files: dict[str, Any] = {}
        if typ == "minmax":
            for r in base.groupBy("f").agg(
                    F.min("v").alias("lo"), F.max("v").alias("hi")
            ).collect():
                files[self._rel(r.f)] = [_plain(r.lo), _plain(r.hi)]
        elif typ == "set":
            n = int(self.meta["param"])
            for r in base.groupBy("f").agg(
                F.slice(F.sort_array(F.collect_set("v")), 1, n + 1)
                .alias("vals")
            ).collect():
                vals = r.vals or []
                # overflow marker: the file exceeds N distinct values
                # and can never be pruned (CH set(N) contract)
                files[self._rel(r.f)] = (
                    None if len(vals) > n else [_plain(x) for x in vals])
        else:
            m, k = self.meta["param"]
            vex = ("explode(" + _tokens_expr("v") + ")"
                   if typ == "tokenbf_v1" else "v")
            pos = (
                base.select("f", F.expr(vex).alias("tok"))
                .select("f", F.explode(F.expr(
                    f"transform(sequence(0, {k - 1}), "
                    f"i -> pmod(xxhash64(tok, i), {m}))")).alias("p"))
                .select(
                    "f",
                    F.expr("CAST(p DIV 64 AS INT)").alias("w"),
                    F.expr("shiftleft(CAST(1 AS BIGINT), "
                           "CAST(pmod(p, 64) AS INT))").alias("b"),
                )
                .groupBy("f", "w").agg(F.expr("bit_or(b)").alias("bits"))
                .collect()
            )
            for r in pos:
                files.setdefault(self._rel(r.f), {})[str(r.w)] = r.bits
        self.meta["files"] = {**prior, **files}
        self._save()
        return {"op": "materialize_index", "name": self.meta["name"],
                "files": len(self.meta["files"])}

    def _rel(self, uri: str) -> str:
        # input_file_name returns a file: URI; store table-relative
        p = uri.split("://", 1)[-1]
        root = os.path.abspath(self.table_path)
        ap = os.path.abspath(p)
        return os.path.relpath(ap, root)

    # -- lookup --------------------------------------------------------
    def might_contain(self, summary, value) -> bool:
        """minmax / set summaries only — the Bloom types probe
        through `read_pruned`, which computes the positions with
        Spark's own xxhash64 (zero reimplementation drift)."""
        typ = self.meta["type"]
        if summary is None:  # set overflow / missing summary
            return True
        if typ == "minmax":
            lo, hi = summary
            if lo is None or hi is None:
                return True
            return lo <= value <= hi
        if typ == "set":
            return value in summary
        raise ValueError(
            f"{typ} indexes probe via read_pruned (Spark-side hash)")

    def prune(self, value) -> "tuple[set, set]":
        """(keep, skipped) — table-relative paths of indexed files.
        Unindexed files are the CALLER's to include (conservative);
        dead sidecar entries are ignored by the read path anyway."""
        keep, skipped = set(), set()
        for rel, summary in self.meta["files"].items():
            if self.might_contain(summary, value):
                keep.add(rel)
            else:
                skipped.add(rel)
        return keep, skipped


def _plain(v):
    """JSON-safe summary values; timestamps refuse (the sort key is
    footer-stat territory, not a skip-index use case)."""
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        raise ValueError(
            "skip indexes on timestamp expressions are redundant: ts "
            "is the sort key and parquet footer min/max already "
            "prunes it (sources/parquet.py)")
    return v


def _probe_positions(spark: SparkSession, s: str, k: int, m: int
                     ) -> list[int]:
    """The k Bloom positions of probe value `s`, computed BY SPARK
    (one 1-row local job) so the probe uses the exact same xxhash64
    the build used — no reimplementation to drift."""
    row = spark.range(1).select(
        F.expr(
            "transform(sequence(0, {k}), i -> pmod(xxhash64({lit}, i), {m}))"
            .format(k=k - 1, m=m, lit="'" + s.replace("'", "''") + "'")
        ).alias("p")
    ).collect()[0]
    return list(row.p)


def read_pruned_range(
    spark: SparkSession,
    table_path: str,
    index_name: str,
    lo,
    hi,
) -> tuple[DataFrame, dict]:
    """Range probe ([lo, hi], closed) against a minmax index — the
    BETWEEN shape minmax exists for in CH. Keeps files whose
    [min, max] overlaps the probe range; same conservative contract
    as read_pruned (unindexed files always scan)."""
    idx = SkipIndex.load(table_path, index_name)
    if idx is None:
        raise ValueError(f"no skip index {index_name!r}")
    if idx.meta["type"] != "minmax":
        raise ValueError(
            f"range probes need a minmax index; {index_name!r} is "
            f"{idx.meta['type']!r}")
    keep_rel, skip_rel = set(), set()
    for rel, summary in idx.meta["files"].items():
        if summary is None or summary[0] is None or summary[1] is None:
            keep_rel.add(rel)
        elif summary[0] <= hi and summary[1] >= lo:
            keep_rel.add(rel)
        else:
            skip_rel.add(rel)
    return _assemble_pruned(spark, table_path, keep_rel, skip_rel)


def read_pruned(
    spark: SparkSession,
    table_path: str,
    index_name: str,
    value,
) -> tuple[DataFrame, dict]:
    """Read the table scanning ONLY files the index can't rule out
    (plus any file the index has never seen — conservative). For a
    tokenbf_v1 index, `value` is the TOKEN being probed (the CH
    hasToken / LIKE '%tok%' shape). Returns (DataFrame, stats) where
    stats carries files_total / files_read / files_skipped for plan
    assertions. The frame is the same logical schema as
    LogsTable.read() (evolved-column overlay included)."""
    idx = SkipIndex.load(table_path, index_name)
    if idx is None:
        raise ValueError(f"no skip index {index_name!r}")
    if idx.meta["type"] in ("bloom_filter", "tokenbf_v1"):
        # compute probe positions with Spark's own xxhash64 (see
        # _probe_positions) and test membership driver-side. tokenbf
        # stores LOWERCASED tokens (hasToken tokenizer): lowercase
        # the probe so a case-sensitive hasToken('Zeta') still finds
        # the files whose raw tokens would match it.
        m, k = idx.meta["param"]
        probe = (str(value).lower()
                 if idx.meta["type"] == "tokenbf_v1" else str(value))
        pos = _probe_positions(spark, probe, k, m)
        keep_rel, skip_rel = set(), set()
        for rel, summary in idx.meta["files"].items():
            ok = True
            for p in pos:
                w = (summary or {}).get(str(p // 64))
                if w is None or not (w >> (p % 64)) & 1:
                    ok = False
                    break
            (keep_rel if ok else skip_rel).add(rel)
    else:
        keep_rel, skip_rel = idx.prune(value)
    return _assemble_pruned(spark, table_path, keep_rel, skip_rel)


def _assemble_pruned(spark, table_path, keep_rel, skip_rel):
    """Shared tail of the pruned-read paths: reconcile sidecar
    verdicts with the LIVE file set (unindexed files always scan,
    dead entries vanish), then read the surviving files with the
    table's logical schema."""
    import glob as _glob

    from clickhouse_observability_spark.schema import PARTITION_COLUMN
    from clickhouse_observability_spark.sources.writer import LogsTable

    t = LogsTable(spark, table_path)
    root = os.path.abspath(table_path)
    live = {
        os.path.relpath(f, root)
        for f in _glob.glob(os.path.join(
            root, f"{PARTITION_COLUMN}=*", "*.parquet"))
    }
    unindexed = live - keep_rel - skip_rel
    keep = sorted((keep_rel & live) | unindexed)
    stats = {
        "files_total": len(live),
        "files_read": len(keep),
        "files_skipped": len(live) - len(keep),
        "files_unindexed": len(unindexed),
    }
    if len(keep) == len(live):
        return t.read(), stats
    if not keep:
        # schema-true empty frame
        return t.read().limit(0), stats
    from pyspark.sql import types as T

    from clickhouse_observability_spark.schema import LOGS_SCHEMA

    full = T.StructType(
        LOGS_SCHEMA.fields
        + t.schema_ext.read_fields()
        + [T.StructField(PARTITION_COLUMN, T.IntegerType())]
    )
    df = (
        spark.read.option("basePath", root)
        .schema(full)
        .parquet(*[os.path.join(root, f) for f in keep])
    )
    return t.schema_ext.overlay(df), stats
