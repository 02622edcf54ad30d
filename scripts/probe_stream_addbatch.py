"""r14 probe: inside addBatch — insert vs marker vs views bookkeeping.

Subclasses IngestStream with a timed _write_batch to attribute the
~600ms warm addBatch of streaming_ingest_50k_rows (guide §1).

Usage: python scripts/probe_stream_addbatch.py [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from clickhouse_observability_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("chobs-probe-addbatch")
    from clickhouse_observability_spark.sources.writer import (
        LogsTable,
        normalize_ingest,
    )
    from clickhouse_observability_spark.streaming.batcher import IngestStream

    class TimedStream(IngestStream):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.samples = []

        def _write_batch(self, batch_df, batch_id):
            t0 = time.time()
            marker = os.path.join(self.committed_dir, str(int(batch_id)))
            if os.path.exists(marker):
                return
            t1 = time.time()
            if self.write_partitions and self.write_partitions > 0:
                batch_df = batch_df.coalesce(self.write_partitions)
            normalized = normalize_ingest(batch_df)
            t2 = time.time()
            self.table.insert(normalized)
            t3 = time.time()
            with open(marker, "w"):
                pass
            floor_id = int(batch_id) - self.MARKER_RETENTION
            if floor_id > 0:
                for name in os.listdir(self.committed_dir):
                    try:
                        stale = int(name) < floor_id
                    except ValueError:
                        continue
                    if stale:
                        try:
                            os.remove(os.path.join(self.committed_dir, name))
                        except OSError:
                            pass
            t4 = time.time()
            self.samples.append(
                (batch_id, t1 - t0, t2 - t1, t3 - t2, t4 - t3))

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
        tmp = tempfile.mkdtemp(prefix="chobs-probe-ab-")
        try:
            table = LogsTable(spark, tmp + "/logs")
            stream = TimedStream(
                spark,
                table,
                inbox_dir=tmp + "/inbox",
                checkpoint_dir=tmp + "/ckpt",
                flush_size=500,
                max_files_per_trigger=16,
            )
            stream.submit_many(wire_rows)
            t0 = time.time()
            q = stream.start()
            q.processAllAvailable()
            dt = time.time() - t0
            stream.stop(drain=False)
            assert table.read().count() == n_stream
            print(f"== rep {rep}: wall {dt:.3f}s")
            for bid, m, plan, ins, mk in stream.samples:
                print(f"  batch {bid}: marker-check {m*1e3:.0f}ms "
                      f"plan-build {plan*1e3:.0f}ms insert {ins*1e3:.0f}ms "
                      f"marker+prune {mk*1e3:.0f}ms")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
