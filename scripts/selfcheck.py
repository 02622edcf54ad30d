"""Mimic the driver's correctness gate locally.

Runs every `queries()` entry on Spark and its `oracle_sql()` on DuckDB
at a given sf dir, then compares row-count + column names + an
order-insensitive value hash. Usage:

    python scripts/selfcheck.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as e
from clickhouse_observability_spark.session import get_spark


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    flt = sys.argv[2:]
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if flt and not any(f in name for f in flt):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt_s = time.time() - t0
        if name not in oracles:
            print(f"OK?  {name}: rows={len(srows)} (no oracle; rows-only) [{dt_s:.1f}s]")
            n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_rows = len(srows) == len(drows)
        sh, dh = table_hash(scols, srows), table_hash(dcols, drows)
        if ok_cols and ok_rows and sh == dh:
            print(f"PASS {name}: rows={len(srows)} hash={sh} [{dt_s:.1f}s]")
            n_pass += 1
        else:
            print(
                f"FAIL {name}: cols {scols} vs {dcols} | rows {len(srows)} vs "
                f"{len(drows)} | hash {sh} vs {dh}"
            )
            if len(srows) and len(drows):
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                do = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = {tuple(norm_cell(r[i]) for i in so) for r in srows}
                dset = {tuple(norm_cell(r[i]) for i in do) for r in drows}
                for x in list(sset - dset)[:3]:
                    print("   spark-only:", x)
                for x in list(dset - sset)[:3]:
                    print("   duck-only :", x)
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
