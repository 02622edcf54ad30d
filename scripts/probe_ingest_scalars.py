"""r13 attribution probe for the two counter-moving r12 bench scalars
(VERDICT r12 "What's wrong" #2): `ingest_100k_rows` 0.669 -> 0.790s
and `streaming_ingest_rows_per_sec_tuned` 93.5k -> 78.7k.

Code-diff facts first (the bisect the probe confirms): the r11->r12
diff to `sources/writer.py` touches ONLY the read side (`read()` /
`parts()` went tier-aware); `insert()`/`_write()` are byte-identical,
and `streaming/` had zero diff. The only shared-path change is the
between-micro-batch `apply_retention` no-op (now stats `_tiers/` once
per pass), so this probe (a) bounds that no-op's per-call cost and
(b) re-measures both bench blocks verbatim on an idle host. Run it
with nothing else on the box (the r10/r12 lesson: single measurements
here swing +/-2x under contention).

Usage: python scripts/probe_ingest_scalars.py [reps]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from clickhouse_observability_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("chobs-probe")
    from pyspark.sql import functions as Fn

    from clickhouse_observability_spark.sources.retention import (
        apply_retention,
    )
    from clickhouse_observability_spark.sources.writer import (
        LogsTable,
        normalize_ingest,
    )
    from clickhouse_observability_spark.streaming.batcher import (
        IngestStream,
    )

    # (a) the no-op retention pass the tuned stream runs between
    # micro-batches — the ONLY r11->r12 code change on that path
    tmp0 = tempfile.mkdtemp(prefix="chobs-probe-noop-")
    try:
        t0tab = LogsTable(spark, tmp0 + "/logs")
        t0tab.init_schema()
        t = time.time()
        n_calls = 200
        for _ in range(n_calls):
            apply_retention(spark, t0tab.path)
        per_call_ms = (time.time() - t) / n_calls * 1000
    finally:
        shutil.rmtree(tmp0, ignore_errors=True)
    print(f"noop_retention_pass_ms_per_call={per_call_ms:.3f}")

    # (b) ingest_100k_rows, bench.py's block verbatim (min-of-3),
    # repeated `reps` times for a distribution
    n_rows = 100_000
    wire = spark.range(n_rows).select(
        Fn.concat(
            Fn.lit("2025-0"),
            (Fn.col("id") % 2 + 7).cast("string"),
            Fn.lit("-15T10:"),
            Fn.lpad((Fn.col("id") % 60).cast("string"), 2, "0"),
            Fn.lit(":00Z"),
        ).alias("ts"),
        Fn.concat(Fn.lit("svc-"),
                  (Fn.col("id") % 8).cast("string")).alias("service"),
        Fn.element_at(
            Fn.array(Fn.lit("INFO"), Fn.lit("WARN"), Fn.lit("ERROR")),
            (Fn.col("id") % 3 + 1).cast("int"),
        ).alias("level"),
        Fn.concat(Fn.lit("msg-"), Fn.col("id").cast("string")).alias("msg"),
        Fn.create_map(
            Fn.lit("user"),
            Fn.concat(Fn.lit("u"), (Fn.col("id") % 100).cast("string")),
        ).alias("attrs"),
        Fn.concat(Fn.lit("trace-"),
                  (Fn.col("id") % 1000).cast("string")).alias("trace_id"),
        Fn.concat(Fn.lit("span-"),
                  Fn.col("id").cast("string")).alias("span_id"),
    )
    mins = []
    for rep in range(reps):
        dt_ingest = None
        for _ in range(3):
            tmp = tempfile.mkdtemp(prefix="chobs-probe-ingest-")
            try:
                table = LogsTable(spark, tmp + "/logs")
                t0 = time.time()
                table.insert(normalize_ingest(wire))
                dt = time.time() - t0
                dt_ingest = dt if dt_ingest is None else min(dt_ingest, dt)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        mins.append(round(dt_ingest, 3))
    print(f"ingest_100k_rows_min_of_3_reps={mins} best={min(mins)}")

    # (c) tuned streaming, bench.py's block verbatim (min-of-3),
    # repeated `reps` times
    n_stream = 50_000
    wire_rows = [
        {
            "ts": f"2025-07-15T10:{i % 60:02d}:00Z",
            "service": f"svc-{i % 8}",
            "level": ("INFO", "WARN", "ERROR")[i % 3],
            "msg": f"msg-{i}",
            "attrs": {"user": f"u{i % 100}"},
            "trace_id": f"trace-{i % 1000}",
            "span_id": f"span-{i}",
        }
        for i in range(n_stream)
    ]
    rpss = []
    for rep in range(reps):
        dt_tuned = None
        for _ in range(3):
            tmp3 = tempfile.mkdtemp(prefix="chobs-probe-tuned-")
            try:
                stable3 = LogsTable(spark, tmp3 + "/logs")
                stream3 = IngestStream(
                    spark,
                    stable3,
                    inbox_dir=tmp3 + "/inbox",
                    checkpoint_dir=tmp3 + "/ckpt",
                    flush_every_ms=500,
                    flush_size=5000,
                    max_files_per_trigger=16,
                )
                stream3.submit_many(wire_rows)
                t0 = time.time()
                stream3.start()
                stream3.query.processAllAvailable()
                dt = time.time() - t0
                stream3.stop(drain=False)
                assert stable3.read().count() == n_stream
                dt_tuned = dt if dt_tuned is None else min(dt_tuned, dt)
            finally:
                shutil.rmtree(tmp3, ignore_errors=True)
        rpss.append(round(n_stream / dt_tuned, 1))
    print(f"streaming_tuned_rows_per_sec_reps={rpss} best={max(rpss)}")


if __name__ == "__main__":
    main()
