"""EXT streaming-window tests: event-time windows honor event time
(not arrival order), watermark bounds state, streaming dedup drops
in-horizon duplicates."""

from __future__ import annotations

import datetime as dt
import json
import os
import uuid

import pytest

from clickhouse_observability_spark.schema import INGEST_SCHEMA
from clickhouse_observability_spark.sources.writer import normalize_ingest
from clickhouse_observability_spark.streaming.windows import (
    dedup_within_watermark,
    session_windows,
    windowed_counts,
)


def _write_batch(inbox: str, rows: list[dict]) -> None:
    os.makedirs(inbox, exist_ok=True)
    p = os.path.join(inbox, f"{uuid.uuid4().hex}.jsonl")
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _wire(ts, service="orders", trace="t1", span=None):
    return {
        "ts": ts, "service": service, "level": "INFO", "msg": "m",
        "attrs": {}, "trace_id": trace, "span_id": span or uuid.uuid4().hex,
    }


def _stream(spark, inbox):
    raw = spark.readStream.schema(INGEST_SCHEMA).json(inbox)
    return normalize_ingest(raw)


def _run_to_memory(df, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    q.processAllAvailable()
    return q


def test_windowed_counts_event_time(spark, tmp_path):
    inbox = str(tmp_path / "in")
    # out-of-order arrival: 10:00 batch arrives AFTER 10:01 batch
    _write_batch(inbox, [
        _wire("2025-09-01T10:01:10Z"), _wire("2025-09-01T10:01:20Z"),
    ])
    _write_batch(inbox, [
        _wire("2025-09-01T10:00:30Z", service="payments"),
        _wire("2025-09-01T10:00:40Z"),
    ])
    out = windowed_counts(_stream(spark, inbox), "1 minute", "2 minutes")
    q = _run_to_memory(out, "wc", mode="complete")
    try:
        rows = {
            (r.window_start.minute, r.service): r.n
            for r in spark.table("wc").collect()
        }
        assert rows[(1, "orders")] == 2
        assert rows[(0, "orders")] == 1  # late-arriving but within watermark
        assert rows[(0, "payments")] == 1
    finally:
        q.stop()


def test_session_window_gap(spark, tmp_path):
    inbox = str(tmp_path / "in")
    _write_batch(inbox, [
        _wire("2025-09-01T10:00:00Z", trace="a"),
        _wire("2025-09-01T10:02:00Z", trace="a"),   # same session (< 5 min gap)
        _wire("2025-09-01T10:30:00Z", trace="a"),   # new session
        _wire("2025-09-01T10:00:00Z", trace="b"),
    ])
    out = session_windows(_stream(spark, inbox), gap="5 minutes")
    q = _run_to_memory(out, "sess", mode="complete")
    try:
        rows = [
            (r.trace_id, r.n_events) for r in spark.table("sess").collect()
        ]
        assert sorted(rows) == [("a", 1), ("a", 2), ("b", 1)]
    finally:
        q.stop()


def test_dedup_within_watermark(spark, tmp_path):
    inbox = str(tmp_path / "in")
    _write_batch(inbox, [
        _wire("2025-09-01T10:00:00Z", trace="t", span="s1"),
        _wire("2025-09-01T10:00:01Z", trace="t", span="s1"),  # dup key
        _wire("2025-09-01T10:00:02Z", trace="t", span="s2"),
    ])
    out = dedup_within_watermark(_stream(spark, inbox))
    q = _run_to_memory(out, "dd")
    try:
        spans = sorted(r.span_id for r in spark.table("dd").collect())
        assert spans == ["s1", "s2"]
    finally:
        q.stop()


def test_streaming_document_dedup_on_fingerprint(spark, tmp_path):
    # Streaming corpus ingestion with online content dedup: crawled
    # docs stream in, the content fingerprint (md5 of normalized
    # text) keys dropDuplicatesWithinWatermark — re-crawls and
    # whitespace/case variants are dropped online, state bounded by
    # the watermark horizon. Same operator as the logs stream dedup;
    # keyed on content, not identity.
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from clickhouse_observability_spark.operators.text_analysis import (
        fingerprint_md5,
    )

    inbox = str(tmp_path / "docs_in")
    os.makedirs(inbox, exist_ok=True)
    docs = [
        {"doc_id": 0, "ts": "2025-09-01T10:00:00Z", "text": "the quick brown fox"},
        {"doc_id": 1, "ts": "2025-09-01T10:00:01Z", "text": "The  QUICK brown fox"},
        {"doc_id": 2, "ts": "2025-09-01T10:00:02Z", "text": "something else"},
        {"doc_id": 3, "ts": "2025-09-01T10:00:03Z", "text": "the quick brown fox"},
    ]
    with open(os.path.join(inbox, "batch.jsonl"), "w") as f:
        for d in docs:
            f.write(_json.dumps(d) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    raw = (
        spark.readStream.schema(schema).json(inbox)
        .withColumn("ts", F.to_timestamp("ts"))
        .withColumn("fp", fingerprint_md5("text"))
    )
    out = dedup_within_watermark(raw, keys=["fp"], watermark="10 minutes")
    q = _run_to_memory(out, "doc_dd")
    try:
        kept = sorted(r.doc_id for r in spark.table("doc_dd").collect())
        # one survivor per content fingerprint (0≡1≡3 normalize equal)
        assert len(kept) == 2 and 2 in kept
        assert len({0, 1, 3} & set(kept)) == 1
    finally:
        q.stop()


def test_stream_stream_trace_join(spark, tmp_path):
    """Two live streams joined on trace within an event-time bound:
    in-window pairs emit, out-of-window and cross-trace pairs don't."""
    from clickhouse_observability_spark.streaming.windows import (
        stream_stream_trace_join,
    )

    req_in, err_in = str(tmp_path / "req"), str(tmp_path / "err")
    _write_batch(req_in, [
        _wire("2025-09-01T10:00:00Z", service="gw", trace="a"),
        _wire("2025-09-01T10:00:00Z", service="gw", trace="b"),
        _wire("2025-09-01T10:00:00Z", service="gw", trace="c"),
    ])
    _write_batch(err_in, [
        _wire("2025-09-01T10:01:00Z", service="db", trace="a"),  # in window
        _wire("2025-09-01T10:05:00Z", service="db", trace="b"),  # > max_lag
        _wire("2025-09-01T10:01:00Z", service="db", trace="zz"),  # no req
    ])
    out = stream_stream_trace_join(
        _stream(spark, req_in), _stream(spark, err_in), max_lag="2 minutes"
    )
    q = _run_to_memory(out, "ssj", mode="append")
    try:
        # advance both watermarks past the pairs so append emits them
        _write_batch(req_in, [_wire("2025-09-01T11:00:00Z", trace="wm1")])
        _write_batch(err_in, [_wire("2025-09-01T11:00:00Z", trace="wm1")])
        q.processAllAvailable()
        rows = spark.table("ssj").collect()
        got = {(r.trace_id, r.lag_ms) for r in rows}
        assert ("a", 60_000) in got
        traces = {r.trace_id for r in rows}
        assert "b" not in traces and "zz" not in traces
    finally:
        q.stop()
