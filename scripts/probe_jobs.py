"""r14 probe: Spark job count + wall time per declared query.

At sf0.1 a query's seconds are ~ job count x 0.15-0.3s fixed overhead,
so the first optimization question for a slow entry is "how many jobs
does it run and which phase owns them" (guide §1). Runs each named
query once inside a job group and reports len(jobIds) + wall seconds.

Usage: python scripts/probe_jobs.py name [name...]
"""

from __future__ import annotations

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
    spark = get_spark("probe-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entrymod.queries()
    load_table(spark, SF_DIR, "events").count()

    for name in names:
        fn = qs[name]
        mode = modes.get(name, "noop")
        group = f"probe-{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = fn(spark, SF_DIR)
        t_build = time.time() - t0
        if mode == "collect":
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        sc.setJobGroup("idle", "idle")
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        print(f"{name:40s} jobs={len(jobs):3d} build={t_build:6.3f}s "
              f"total={dt:6.3f}s")


if __name__ == "__main__":
    main()
