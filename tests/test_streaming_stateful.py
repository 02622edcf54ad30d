"""Custom stateful streaming operator test (applyInPandasWithState)."""

from __future__ import annotations

import json
import os
import uuid

from clickhouse_observability_spark.schema import INGEST_SCHEMA
from clickhouse_observability_spark.sources.writer import normalize_ingest
from clickhouse_observability_spark.streaming.stateful import trace_aggregates


def _write_batch(inbox, rows):
    os.makedirs(inbox, exist_ok=True)
    with open(os.path.join(inbox, f"{uuid.uuid4().hex}.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _wire(ts, trace, level="INFO"):
    return {
        "ts": ts, "service": "orders", "level": level, "msg": "m",
        "attrs": {}, "trace_id": trace, "span_id": uuid.uuid4().hex,
    }


def test_trace_aggregates_incremental(spark, tmp_path):
    inbox = str(tmp_path / "in")
    os.makedirs(inbox, exist_ok=True)
    raw = spark.readStream.schema(INGEST_SCHEMA).option("maxFilesPerTrigger", 1).json(inbox)
    out = trace_aggregates(normalize_ingest(raw))

    # batch 1: trace A gets 2 spans; batch 2: A gets 1 more (ERROR) + B starts
    _write_batch(inbox, [
        _wire("2025-09-01T10:00:00Z", "A"), _wire("2025-09-01T10:00:02Z", "A"),
    ])
    _write_batch(inbox, [
        _wire("2025-09-01T10:00:05Z", "A", level="ERROR"),
        _wire("2025-09-01T10:00:01Z", "B"),
    ])
    q = (
        out.writeStream.format("memory").queryName("traces").outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="100 milliseconds").start()
    )
    try:
        # NOTE: processAllAvailable() never returns under
        # ProcessingTimeTimeout (state-cleanup batches are always
        # pending) — poll the sink instead.
        import time

        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.table("traces").collect()
            if any(r.trace_id == "A" and r.n_spans == 3 for r in rows) and any(
                r.trace_id == "B" for r in rows
            ):
                break
            time.sleep(0.5)
        # state accumulates ACROSS batches: the last update for A has all 3 spans
        last_a = max((r for r in rows if r.trace_id == "A"), key=lambda r: r.n_spans)
        assert last_a.n_spans == 3
        assert last_a.duration_us == 5_000_000
        assert last_a.has_error
        b = [r for r in rows if r.trace_id == "B"]
        assert len(b) == 1 and b[0].n_spans == 1 and not b[0].has_error
    finally:
        q.stop()
