"""EXT streaming operators: event-time windows, watermarks, streaming
dedup (SURVEY.md §2.9 — explicitly absent from the reference, which
rewrites bad timestamps and never drops late data; these are the
standard Spark upgrades a log pipeline grows into).

All state here is watermark-bounded: Spark evicts window/dedup state
older than the watermark, so memory is O(windows-in-flight), not
O(stream length) — the property that makes these safe on unbounded
100 TB/day streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    logs_stream: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Per-service tumbling (or sliding) event-time window counts with
    late-data handling: rows later than the watermark are dropped,
    everything else lands in its event-time window regardless of
    arrival order."""
    w = (
        F.window("ts", window_duration)
        if slide is None
        else F.window("ts", window_duration, slide)
    )
    return (
        logs_stream.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "service")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "service",
            "n",
        )
    )


def session_windows(
    logs_stream: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows per trace: a session closes after `gap` of
    inactivity. State per open session, evicted by watermark."""
    return (
        logs_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "trace_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "trace_id",
            "n_events",
        )
    )


def dedup_within_watermark(
    logs_stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming exactly-once-per-key delivery within the watermark
    horizon: duplicate (trace_id, span_id) rows arriving within the
    watermark are dropped; state for old keys is evicted. The bounded
    version of batch dropDuplicates a stream can actually afford."""
    keys = keys or ["trace_id", "span_id"]
    return logs_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys
    )


def stream_stream_trace_join(
    requests: DataFrame,
    errors: DataFrame,
    max_lag: str = "2 minutes",
    watermark: str = "4 minutes",
) -> DataFrame:
    """Stream-stream join (r5): correlate a live error stream with the
    REQUEST that preceded it on the same trace, within an event-time
    bound — the trace-correlation query (§2.3 EXT) upgraded to two
    unbounded streams.

    Spark buffers both sides in state; the two ingredients that keep
    that state bounded (and that this operator therefore REQUIRES) are
    a watermark on each side and an event-time RANGE in the join
    condition — together they let the engine evict any buffered row
    that can no longer match (errors older than the watermark,
    requests older than watermark + max_lag). Without the range bound
    Spark would buffer both streams forever.

    Output: one row per (request, error) pair with the lag between
    them; append-mode emits once both sides' watermarks pass the pair.
    """
    req = requests.withWatermark("ts", watermark).select(
        F.col("trace_id").alias("req_trace"),
        F.col("ts").alias("req_ts"),
        F.col("service").alias("req_service"),
        F.col("msg").alias("req_msg"),
    )
    err = errors.withWatermark("ts", watermark).select(
        F.col("trace_id").alias("err_trace"),
        F.col("ts").alias("err_ts"),
        F.col("service").alias("err_service"),
        F.col("msg").alias("err_msg"),
    )
    lag = f"INTERVAL {max_lag}"
    joined = req.join(
        err,
        (F.col("req_trace") == F.col("err_trace"))
        & (F.col("err_ts") >= F.col("req_ts"))
        & (F.col("err_ts") <= F.col("req_ts") + F.expr(lag)),
        "inner",
    )
    return joined.select(
        F.col("req_trace").alias("trace_id"),
        "req_service",
        "req_msg",
        "err_service",
        "err_msg",
        "req_ts",
        "err_ts",
        (F.unix_millis("err_ts") - F.unix_millis("req_ts")).alias("lag_ms"),
    )
