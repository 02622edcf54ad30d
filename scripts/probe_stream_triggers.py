"""r14 probe: where does streaming_ingest_50k_rows's per-trigger time go?

Replays the bench's streaming block verbatim (50k rows, flush_size=500,
maxFilesPerTrigger=16 -> ~7 triggers) and dumps each micro-batch's
`lastProgress.durationMs` breakdown (addBatch / getBatch / latestOffset /
queryPlanning / walCommit / commitOffsets / triggerExecution), so the
optimization targets the measured component, not a guess (guide §1).

Usage: python scripts/probe_stream_triggers.py [reps]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from clickhouse_observability_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("chobs-probe-stream")
    from clickhouse_observability_spark.sources.writer import LogsTable
    from clickhouse_observability_spark.streaming.batcher import IngestStream

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
    for rep in range(reps):
        tmp = tempfile.mkdtemp(prefix="chobs-probe-stream-")
        try:
            table = LogsTable(spark, tmp + "/logs")
            stream = IngestStream(
                spark,
                table,
                inbox_dir=tmp + "/inbox",
                checkpoint_dir=tmp + "/ckpt",
                flush_size=500,
                max_files_per_trigger=16,
            )
            stream.submit_many(wire_rows)
            progresses = []
            t0 = time.time()
            q = stream.start()
            # poll recentProgress while the query drains
            q.processAllAvailable()
            dt = time.time() - t0
            for p in q.recentProgress:
                progresses.append(p)
            stream.stop(drain=False)
            assert table.read().count() == n_stream
            print(f"== rep {rep}: wall {dt:.3f}s, "
                  f"{len(progresses)} progress entries")
            keys = ("addBatch", "getBatch", "latestOffset",
                    "queryPlanning", "walCommit", "commitOffsets",
                    "triggerExecution")
            tot = dict.fromkeys(keys, 0)
            for p in progresses:
                d = p.get("durationMs", {})
                row = {k: d.get(k, 0) for k in keys}
                n = p.get("numInputRows", 0)
                print(f"  batch {p.get('batchId')}: rows={n} " +
                      " ".join(f"{k}={row[k]}" for k in keys))
                for k in keys:
                    tot[k] += row[k]
            print("  TOTALS: " + " ".join(f"{k}={tot[k]}" for k in keys))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
