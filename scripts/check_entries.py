"""Focused cross-engine check for named registry entries (the
test_oracle_registry comparison, scoped): usage
  python scripts/check_entries.py sf0.001 name1 name2 ...
"""
import hashlib, math, sys

import duckdb

sys.path.insert(0, ".")
from pyspark.sql import SparkSession

from clickhouse_observability_spark.registry import oracle_sql, queries

_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
           "lineitem", "events", "documents", "embeddings"]


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


def main():
    sf = sys.argv[1]
    names = sys.argv[2:]
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    qs, oracles = queries(), oracle_sql()
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/{sf}/{t}.parquet'")
    bad = 0
    for name in names:
        try:
            sdf = qs[name](spark, f"/root/testdata/{sf}")
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"{name}: ERR {type(e).__name__}: {str(e)[:500]}")
            bad += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"{name}: SCHEMA {scols} vs {dcols}")
            bad += 1
            continue
        if len(srows) != len(drows):
            print(f"{name}: ROWS {len(srows)} vs {len(drows)}")
            bad += 1
            continue
        sh, dh = _table_hash(scols, srows), _table_hash(dcols, drows)
        if sh != dh:
            print(f"{name}: HASH {sh} vs {dh} ({len(srows)} rows)")
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = sorted("\x01".join(_norm_cell(r[i]) for i in order)
                          for r in srows)
            dset = sorted("\x01".join(_norm_cell(r[i]) for i in order)
                          for r in drows)
            for a, b in zip(sset, dset):
                if a != b:
                    print("  spark:", a.replace("\x01", " | ")[:200])
                    print("  duck :", b.replace("\x01", " | ")[:200])
                    break
            bad += 1
            continue
        print(f"{name}: OK ({len(srows)} rows)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
