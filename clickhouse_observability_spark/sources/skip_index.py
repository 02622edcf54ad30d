"""ClickHouse data-skipping indexes as a PARQUET-SHARDED sidecar.

Reference context: the reference's store is ClickHouse (README.md),
whose secondary "skip" indexes (minmax / set(N) / bloom_filter /
tokenbf_v1) let a scan skip GRANULES on non-sort-key predicates —
the standard answer to "my WHERE column isn't in ORDER BY". The
Spark-native analog prunes FILES: each index keeps one summary row
per at-rest parquet file, a lookup maps an equality / token / range
predicate to the set of files that might match, and the read scans
only those. Parquet row-group footer stats already cover CH's
intra-file (granule) tier for the SORT-KEY columns
(sources/parquet.py); this sidecar covers the inter-file tier for
everything else — at 100 TB, file-level skipping is the lever that
matters.

Storage layout (r9 — replaces the r8 single-JSON sidecar, which was
a driver-memory O(total-files) load per probe and an O(total-files)
REWRITE per streaming micro-batch):

    <table>/_skip_idx/<name>.json          # metadata ONLY (no summaries)
    <table>/_skip_idx/<name>_shards/*.parquet   # one row per indexed file

- ``MATERIALIZE INDEX`` builds summaries in ONE Spark job and WRITES
  them with Spark (``mode("append")``) — summaries never pass
  through the driver.
- Incremental materialize (streaming maintenance, post-mutation
  refresh) APPENDS a delta shard covering only never-seen files:
  O(new files) bytes written per micro-batch, prior shards untouched.
  A later summary for the same file supersedes an earlier one via the
  monotone ``seq`` column (CH parts: newest part index wins).
- Probes are adaptive: a sidecar under ``FAST_PATH_MAX_BYTES`` is
  read driver-side with pyarrow (zero Spark jobs on the request
  path — the common observability-table case); a larger one probes
  IN SPARK (filter over the shard table, collect only file-path
  verdicts — O(#files) strings, the same order as the live-file
  listing the read needs anyway). Correctness is identical on both
  paths; tests pin them against each other.
- Dead entries (files replaced by mutations/compaction) are ignored
  at probe time (live-set intersection) and dropped physically by a
  FULL materialize, which rewrites the shard set from scratch.

Index types and their CH contracts:
- ``minmax``      — [min, max] of the expression per file; prunes
                    when the probe value falls outside. Stored as
                    canonical strings, compared in the probe's
                    domain (numeric probes cast, string probes
                    compare directly).
- ``set(N)``      — up to N distinct values per file; a file that
                    exceeds N stores an overflow marker and is never
                    pruned (CH: the granule index degrades to
                    "might contain anything").
- ``bloom_filter``— m-bit / k-hash Bloom filter over VALUES, stored
                    as a dense array<long> of m/64 words; no false
                    negatives, so pruning is always sound.
- ``tokenbf_v1``  — the Bloom filter over the TOKENS of a string
                    expression (CH's hasToken / LIKE '%tok%' index).

Freshness contract (CH parity): files written AFTER materialize are
unknown to the sidecar and are always scanned (CH parts without a
built index aren't skipped); files that no longer exist are ignored.
Divergence, documented: ClickHouse consults skip indexes
automatically inside its scan; here `read_pruned` / the structured
query helpers apply them, and arbitrary SQL reads stay full-scan +
footer stats.
"""

from __future__ import annotations

import glob as _glob
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

# sidecars under this many bytes probe driver-side (pyarrow, zero
# Spark jobs on the request path); larger ones probe in Spark.
# Tests set it to 0 to force the distributed path on small data.
FAST_PATH_MAX_BYTES = 8 << 20

# unified shard schema across index types (unused columns NULL)
_SHARD_DDL = ("f STRING, seq BIGINT, lo STRING, hi STRING, "
              "vals ARRAY<STRING>, overflow BOOLEAN, words ARRAY<BIGINT>")

_NUMERIC_TYPES = ("int", "bigint", "smallint", "tinyint", "float",
                  "double", "decimal")


def _index_path(table_path: str, name: str) -> str:
    return os.path.join(table_path, _IDX_DIR, f"{name}.json")


def _shards_dir(table_path: str, name: str) -> str:
    return os.path.join(table_path, _IDX_DIR, f"{name}_shards")


def _tokens_expr(value_expr: str) -> str:
    """CH's tokenbf tokenizer: split on ALL non-alphanumeric ASCII —
    underscore included, like ClickHouse (hasToken('a_b','a') is
    true; r9 fix) — lowercased so one filter serves both hasToken
    (probe lowercases, sound: raw-token presence implies
    lowercase-token presence) and hasTokenCaseInsensitive. Shares
    the boundary class with the dialect's hasToken rewrites."""
    return (f"filter(split(lower({value_expr}), '[^a-z0-9]+'), "
            "x -> x != '')")


def _sql_str(s: str) -> str:
    return "'" + str(s).replace("'", "''") + "'"


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
            "next_seq": 0,
            "n_files": 0,  # live indexed files after last materialize
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
        import shutil

        os.remove(_index_path(self.table_path, self.meta["name"]))
        sd = _shards_dir(self.table_path, self.meta["name"])
        if os.path.isdir(sd):
            shutil.rmtree(sd)
        d = os.path.join(self.table_path, _IDX_DIR)
        if not os.listdir(d):
            os.rmdir(d)

    def clear(self) -> None:
        """`CLEAR INDEX`: drop the built summaries, keep the
        definition (CH removes the index files from parts)."""
        import shutil

        sd = _shards_dir(self.table_path, self.meta["name"])
        if os.path.isdir(sd):
            shutil.rmtree(sd)
        self.meta["n_files"] = 0
        self._save()

    # -- sidecar access ------------------------------------------------
    def shard_files(self) -> list[str]:
        sd = _shards_dir(self.table_path, self.meta["name"])
        return sorted(_glob.glob(os.path.join(sd, "*.parquet")))

    def sidecar_bytes(self) -> int:
        return sum(os.path.getsize(f) for f in self.shard_files())

    def is_materialized(self) -> bool:
        return bool(self.shard_files())

    def _use_fast_path(self) -> bool:
        return self.sidecar_bytes() <= FAST_PATH_MAX_BYTES

    def _shards_df(self, spark: SparkSession) -> DataFrame | None:
        files = self.shard_files()
        if not files:
            return None
        return spark.read.schema(_SHARD_DDL).parquet(*files)

    def _latest_rows(self) -> dict[str, dict]:
        """Driver fast path: newest summary row per file (pyarrow —
        zero Spark jobs). Only called when the sidecar is under
        FAST_PATH_MAX_BYTES."""
        import pyarrow.parquet as pq

        best: dict[str, dict] = {}
        for sf in self.shard_files():
            for row in pq.read_table(sf).to_pylist():
                cur = best.get(row["f"])
                if cur is None or row["seq"] >= cur["seq"]:
                    best[row["f"]] = row
        return best

    def indexed_files(self, spark: SparkSession | None = None) -> set[str]:
        """Table-relative paths the sidecar has summaries for (any
        seq). Driver-side under the fast-path threshold, else one
        Spark distinct over the shard table."""
        if self._use_fast_path() or spark is None:
            import pyarrow.parquet as pq

            out: set[str] = set()
            for sf in self.shard_files():
                out |= set(
                    pq.read_table(sf, columns=["f"]).column("f").to_pylist()
                )
            return out
        df = self._shards_df(spark)
        if df is None:
            return set()
        return {r.f for r in df.select("f").distinct().collect()}

    # -- build ---------------------------------------------------------
    def materialize(self, spark: SparkSession,
                    incremental: bool = False) -> dict:
        """`MATERIALIZE INDEX`: ONE job computes per-file summaries
        — the scan reads only the indexed expression's column(s)
        (column pruning reaches the parquet reader), groups by
        input_file_name with map-side combine — and a second writes
        them as a parquet shard. Summaries NEVER pass through the
        driver (no collect; the r8 JSON sidecar did).

        ``incremental=True`` summarizes ONLY files the sidecar has
        never seen and APPENDS a delta shard — CH's model, where
        parts built after the index definition get their index at
        write/merge time: a steady ingest keeps the index fresh at
        O(new files) bytes per call, prior shards byte-untouched.
        A full materialize rewrites the shard set (dropping dead
        entries), which doubles as sidecar compaction."""
        from clickhouse_observability_spark.schema import (
            LOGS_SCHEMA,
            PARTITION_COLUMN,
        )
        from clickhouse_observability_spark.sources.tiering import (
            live_files,
            read_files,
        )
        from clickhouse_observability_spark.sources.writer import LogsTable

        t = LogsTable(spark, self.table_path)
        # live set spans every volume (base ∪ tiers): a cold file the
        # index never saw would scan forever; one the index can't
        # enumerate would break the dead-entry reconciliation. The
        # root-RELATIVE key (month=<m>/<file>) is volume-independent,
        # so summaries survive tier moves untouched.
        live = set(live_files(self.table_path))
        if incremental:
            prior = self.indexed_files(spark)
            todo = sorted(live - prior)
            n_live_indexed = len(prior & live)
            if not todo:
                self.meta["n_files"] = n_live_indexed
                self._save()
                return {"op": "materialize_index",
                        "name": self.meta["name"],
                        "files": n_live_indexed}
            from pyspark.sql import types as T

            full = T.StructType(
                LOGS_SCHEMA.fields
                + t.schema_ext.read_fields()
                + [T.StructField(PARTITION_COLUMN, T.IntegerType())]
            )
            scan = t.schema_ext.overlay(
                read_files(spark, self.table_path, todo, full)
            )
            mode = "append"
            n_after = n_live_indexed + len(todo)
        else:
            scan = t.read()
            mode = "overwrite"
            n_after = len(live)
        summaries = self._summarize(scan)
        sd = _shards_dir(self.table_path, self.meta["name"])
        (summaries.write.mode(mode).parquet(sd))
        self.meta["next_seq"] = int(self.meta.get("next_seq", 0)) + 1
        self.meta["n_files"] = n_after
        self._save()
        return {"op": "materialize_index", "name": self.meta["name"],
                "files": n_after}

    def _summarize(self, scan: DataFrame) -> DataFrame:
        """Per-file summary rows in the unified shard schema. The
        table layout is fixed (<PARTITION>=<v>/<file>.parquet), so
        the table-relative path is the last two URI components —
        computed IN SPARK, never on the driver."""
        typ = self.meta["type"]
        seq = int(self.meta.get("next_seq", 0))
        base = scan.select(
            F.expr(self.meta["expr"]).alias("v"),
            F.expr(
                "concat(element_at(split(input_file_name(), '/'), -2), "
                "'/', element_at(split(input_file_name(), '/'), -1))"
            ).alias("f"),
        )
        null_s = F.lit(None).cast("string")
        null_a = F.lit(None).cast("array<string>")
        null_b = F.lit(None).cast("boolean")
        null_w = F.lit(None).cast("array<bigint>")
        if typ == "minmax":
            # min/max in the expression's NATIVE type (numeric order,
            # not lexicographic), then canonicalized to string by
            # Spark's cast — probes re-cast into the probe's domain
            out = base.groupBy("f").agg(
                F.min("v").cast("string").alias("lo"),
                F.max("v").cast("string").alias("hi"),
            ).select(
                "f", F.lit(seq).alias("seq"), "lo", "hi",
                null_a.alias("vals"), null_b.alias("overflow"),
                null_w.alias("words"),
            )
        elif typ == "set":
            n = int(self.meta["param"])
            agg = base.groupBy("f").agg(
                F.slice(
                    F.sort_array(F.collect_set(F.col("v").cast("string"))),
                    1, n + 1,
                ).alias("raw")
            )
            out = agg.select(
                "f", F.lit(seq).alias("seq"),
                null_s.alias("lo"), null_s.alias("hi"),
                # overflow marker: the file exceeds N distinct values
                # and can never be pruned (CH set(N) contract)
                F.when(F.size("raw") > n, null_a)
                .otherwise(F.col("raw")).alias("vals"),
                (F.size("raw") > n).alias("overflow"),
                null_w.alias("words"),
            )
        else:
            m, k = self.meta["param"]
            vex = ("explode(" + _tokens_expr("v") + ")"
                   if typ == "tokenbf_v1" else "v")
            words = (
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
                .groupBy("f").agg(
                    F.map_from_arrays(
                        F.collect_list("w"), F.collect_list("bits")
                    ).alias("mw"))
                .select(
                    "f", F.lit(seq).alias("seq"),
                    null_s.alias("lo"), null_s.alias("hi"),
                    null_a.alias("vals"), null_b.alias("overflow"),
                    F.expr(
                        f"transform(sequence(0, {m // 64 - 1}), "
                        "i -> coalesce(element_at(mw, i), "
                        "CAST(0 AS BIGINT)))"
                    ).alias("words"),
                )
            )
            out = words
        return out

    # -- lookup --------------------------------------------------------
    def might_contain(self, summary, value) -> bool:
        """Driver-side verdict for one minmax/set summary row (the
        Bloom types probe with Spark's own xxhash64 positions). A
        None summary (set overflow / unknown) always keeps."""
        typ = self.meta["type"]
        if summary is None:  # set overflow / missing summary
            return True
        if typ == "minmax":
            lo, hi = summary
            if lo is None or hi is None:
                return True
            lo, hi = _from_canon(lo, value), _from_canon(hi, value)
            if lo is None or hi is None:
                return True  # unparseable in probe domain: keep
            return lo <= value <= hi
        if typ == "set":
            return _canon(value) in summary
        raise ValueError(
            f"{typ} indexes probe Bloom positions (Spark-side hash)")

    def _verdicts(self, spark: SparkSession, pred_sql: str,
                  pred_py) -> tuple[set, set]:
        """(keep, skipped) table-relative paths over the LATEST
        summary per file. `pred_sql` filters the shard frame in
        Spark (big sidecars); `pred_py(row) -> bool` is the
        equivalent driver-side test (small sidecars). Both paths are
        pinned equal in tests."""
        if self._use_fast_path():
            keep, skipped = set(), set()
            for f, row in self._latest_rows().items():
                (keep if pred_py(row) else skipped).add(f)
            return keep, skipped
        df = self._shards_df(spark)
        if df is None:
            return set(), set()
        latest = (
            df.groupBy("f").agg(
                F.max_by(
                    F.struct("lo", "hi", "vals", "overflow", "words"),
                    "seq",
                ).alias("s"))
            .select("f", "s.*")
        )
        rows = latest.select(
            "f", F.expr(pred_sql).alias("keep")).collect()
        keep = {r.f for r in rows if r.keep}
        return keep, {r.f for r in rows if not r.keep}

    def prune(self, spark: SparkSession, value) -> "tuple[set, set]":
        """(keep, skipped) for an equality/containment probe.
        Unindexed files are the CALLER's to include (conservative);
        dead sidecar entries are ignored by the read path anyway."""
        typ = self.meta["type"]
        if typ == "minmax":
            return self._prune_minmax_range(spark, value, value)
        if typ == "set":
            # non-string probes canonicalize through Spark's own
            # CAST(x AS STRING) (one 1-row local job) so the probe
            # string can never drift from the build's cast
            if isinstance(value, str):
                probe = value
            else:
                probe = spark.range(1).select(
                    F.lit(value).cast("string").alias("c")
                ).collect()[0].c
            sql = ("overflow OR vals IS NULL OR "
                   f"array_contains(vals, {_sql_str(probe)})")
            return self._verdicts(
                spark, sql,
                lambda r: (r["overflow"] or r["vals"] is None
                           or probe in r["vals"]))
        # bloom types: positions via Spark's own xxhash64 (zero
        # reimplementation drift), membership tested on the words
        m, k = self.meta["param"]
        probe = (str(value).lower()
                 if typ == "tokenbf_v1" else str(value))
        pos = _probe_positions(spark, probe, k, m)
        sql = " AND ".join(
            f"(element_at(words, {p // 64 + 1}) & "
            f"shiftleft(CAST(1 AS BIGINT), {p % 64})) != 0"
            for p in pos
        )
        sql = f"words IS NULL OR ({sql})"

        def py(r):
            w = r["words"]
            if w is None:
                return True
            return all((w[p // 64] >> (p % 64)) & 1 for p in pos)

        return self._verdicts(spark, sql, py)

    def _prune_minmax_range(self, spark: SparkSession, lo, hi
                            ) -> tuple[set, set]:
        """Overlap test [file.lo, file.hi] ∩ [lo, hi] ≠ ∅ in the
        probe's domain (numeric probes cast the canonical strings
        back to numbers; string probes compare directly)."""
        if isinstance(lo, bool) or isinstance(hi, bool):
            raise ValueError("boolean minmax probes are unsupported")
        if isinstance(lo, (int, float)):
            # DOUBLE domain for every numeric probe (an int probe on
            # a double-typed index must not TRY_CAST('5.3' AS BIGINT)
            # to NULL); coalesce(..., true) keeps any file whose
            # bounds don't parse — unparseable is "can't rule out"
            sql = ("lo IS NULL OR hi IS NULL OR "
                   "coalesce(TRY_CAST(lo AS DOUBLE) <= "
                   f"CAST({hi!r} AS DOUBLE) AND "
                   "TRY_CAST(hi AS DOUBLE) >= "
                   f"CAST({lo!r} AS DOUBLE), true)")

            def py(r):
                flo, fhi = _num(r["lo"]), _num(r["hi"])
                if flo is None or fhi is None:
                    return True
                return flo <= hi and fhi >= lo
        else:
            sql = (f"lo IS NULL OR hi IS NULL OR "
                   f"(lo <= {_sql_str(hi)} AND hi >= {_sql_str(lo)})")

            def py(r):
                if r["lo"] is None or r["hi"] is None:
                    return True
                return r["lo"] <= str(hi) and r["hi"] >= str(lo)

        return self._verdicts(spark, sql, py)


def _canon(v) -> str:
    """Python-side canonical string form matching Spark's
    CAST(x AS STRING) for the value domains skip indexes serve
    (strings, integers; floats documented best-effort)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _num(s):
    if s is None:
        return None
    try:
        f = float(s)
    except (TypeError, ValueError):
        return None
    return f


def _from_canon(s, probe):
    """Parse a canonical summary string back into the probe's
    comparison domain."""
    if isinstance(probe, (int, float)) and not isinstance(probe, bool):
        return _num(s)
    return s


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
    keep_rel, skip_rel = idx._prune_minmax_range(spark, lo, hi)
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
    keep_rel, skip_rel = idx.prune(spark, value)
    return _assemble_pruned(spark, table_path, keep_rel, skip_rel)


def _assemble_pruned(spark, table_path, keep_rel, skip_rel):
    """Shared tail of the pruned-read paths: reconcile sidecar
    verdicts with the LIVE file set (unindexed files always scan,
    dead entries vanish), then read the surviving files with the
    table's logical schema. The live set spans every tier volume
    (sources/tiering.py): a cold file MISSING from a pruned read is
    silent data loss — the one unacceptable failure mode — and the
    volume-independent relative key means a tier move neither
    invalidates a verdict nor un-indexes a file."""
    from clickhouse_observability_spark.schema import PARTITION_COLUMN
    from clickhouse_observability_spark.sources.tiering import (
        live_files,
        read_files,
    )
    from clickhouse_observability_spark.sources.writer import LogsTable

    t = LogsTable(spark, table_path)
    live = set(live_files(table_path))
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
    df = read_files(spark, table_path, keep, full)
    return t.schema_ext.overlay(df), stats
