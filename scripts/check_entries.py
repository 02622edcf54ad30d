"""Spot-check named registry entries against DuckDB (driver-style hash).

Usage: python scripts/check_entries.py [sf_dir] name [name ...]
Mirrors tests/test_oracle_registry.py's canonicalization at an
arbitrary scale factor (default sf0.01 — the driver's gate scale).
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb

_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    args = sys.argv[1:]
    sf = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    from clickhouse_observability_spark.registry import oracle_sql, queries

    qs, oracles = queries(), oracle_sql()
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = 0
    for name in args:
        try:
            sdf = qs[name](spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERR {type(e).__name__}: {e}")
            bad += 1
            continue
        schema_ok = sorted(scols) == sorted(dcols)
        rows_ok = len(srows) == len(drows)
        hash_ok = (
            schema_ok
            and rows_ok
            and _table_hash(scols, srows) == _table_hash(dcols, drows)
        )
        status = "OK" if (schema_ok and rows_ok and hash_ok) else "FAIL"
        print(
            f"{name}: {status} schema={schema_ok} rows={len(srows)}/{len(drows)}"
            f" hash={hash_ok}"
        )
        if status == "FAIL":
            bad += 1
            if schema_ok and rows_ok:
                key = lambda r: tuple(_norm_cell(v) for v in r)  # noqa: E731
                ss = sorted(srows, key=key)
                dd = sorted(drows, key=key)
                shown = 0
                for a, b in zip(ss, dd):
                    if key(a) != key(b):
                        print(f"  spark={a}\n  duck ={b}")
                        shown += 1
                        if shown >= 3:
                            break
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
