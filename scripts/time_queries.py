"""Time a subset of bench HEADLINE queries exactly like bench.py does
(min-of-N, collect/noop per the HEADLINE mode), without the full bench.

Usage: SPARK_GRAFT_BENCH_RUNS=3 python scripts/time_queries.py name [name...]

For fast optimize-measure iteration on individual queries; the full
bench.py stays the number of record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    from bench import HEADLINE

    import __spark_entry__ as entrymod
    from clickhouse_observability_spark.session import get_spark
    from clickhouse_observability_spark.sources.parquet import load_table

    modes = dict(HEADLINE)
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    load_table(spark, SF_DIR, "events").count()  # warm listing/JVM

    def calib() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            spark.range(2_000_000_000, numPartitions=32).selectExpr(
                "sum(id) AS s").collect()
            best = min(best, time.time() - t0)
        return round(best, 3)

    calib()  # JIT warm
    pre = calib()

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        mode = modes.get(name, "noop")
        samples = []
        for _ in range(n_runs):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            if mode == "collect":
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        out[name] = round(min(samples), 3)
        out[name + "__mean"] = round(sum(samples) / len(samples), 3)
    out["calib_pre"] = pre
    out["calib_post"] = calib()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
