"""Engine self-observability: the `system.query_log` analogue.

ClickHouse ships `system.query_log` — every query the server ran,
with timing, result size, and outcome — and an observability product
built on ClickHouse leans on it for meta-monitoring (is the log store
itself slow? which dashboard query burns the cluster?). This module
is the Spark-native counterpart for this engine's API surface: every
handler invocation (/v1/logs, /v1/query, /v1/stats, /v1/alerts) is
recorded with route, query detail, HTTP status, duration, and result
rows.

Design:
- Recording is IN-MEMORY (bounded deque, lock-guarded, O(1) per
  request — never a Spark job on the request path; a query-log write
  that slowed queries would be observability eating the SLO).
- `to_df(spark)` exposes the buffer as a DataFrame for ad-hoc
  inspection; `flush(spark, path)` appends it to a parquet table and
  clears — the periodic job that turns telemetry into an at-rest
  table the engine can then query, alert on (SLO burn rate over its
  OWN latencies), and retain/compact like any other logs table.
- Bounded driver memory: maxlen ring buffer; a flush cadence under
  maxlen loses nothing.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from clickhouse_observability_spark.session import local_df

QUERY_LOG_SCHEMA = (
    "ts timestamp, route string, detail string, status int, "
    "duration_ms double, result_rows bigint, error string"
)


class QueryLog:
    """Bounded in-memory request log with parquet flush."""

    def __init__(self, maxlen: int = 10_000):
        self._buf: deque = deque(maxlen=maxlen)
        self._lock = threading.Lock()

    def record(
        self,
        route: str,
        detail: str = "",
        status: int = 0,
        duration_ms: float = 0.0,
        result_rows: int | None = None,
        error: str | None = None,
    ) -> None:
        row = (
            datetime.now(timezone.utc).replace(tzinfo=None),
            route,
            detail[:500],
            int(status),
            float(duration_ms),
            None if result_rows is None else int(result_rows),
            error,
        )
        with self._lock:
            self._buf.append(row)

    def __len__(self) -> int:
        with self._lock:
            return len(self._buf)

    def snapshot(self) -> list[tuple]:
        with self._lock:
            return list(self._buf)

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The current buffer as a DataFrame (bounded: maxlen rows)."""
        rows = self.snapshot()
        return local_df(spark, rows, QUERY_LOG_SCHEMA)

    def flush(self, spark: SparkSession, path: str) -> int:
        """Append the buffer to an at-rest parquet table and clear it.
        Returns rows flushed. The at-rest table is a normal logs-like
        table: partition/retain/compact it with sources/retention like
        any other; alerting ops (SLO burn rate, z-score) run on it
        unchanged."""
        rows = self.snapshot()
        if not rows:
            return 0
        # write FIRST, clear only what was written and only on
        # success: a failed append (disk full, stopped session —
        # exactly the conditions plausible during a best-effort
        # shutdown flush) must not lose the buffered telemetry.
        # Records that arrive DURING the write stay queued for the
        # next flush; a crash between write and clear re-flushes
        # them (duplicate rows in an at-rest log beat lost ones).
        from clickhouse_observability_spark.sources.writer import (
            parquet_ts_micros,
        )

        with parquet_ts_micros(spark):  # ts footer stats for retention
            local_df(spark, rows, QUERY_LOG_SCHEMA).write.mode(
                "append").parquet(path)
        with self._lock:
            # remove exactly the rows that were written: they are a
            # deque prefix unless ring eviction dropped some during
            # the write (then they are simply gone already)
            for r in rows:
                if self._buf and self._buf[0] is r:
                    self._buf.popleft()
        return len(rows)

    def timed(self, route: str, detail: str = ""):
        """Context manager that records one request around a handler
        call; the caller sets .status/.result_rows/.error on the
        returned token before exit."""
        return _Timed(self, route, detail)


class _Timed:
    def __init__(self, log: QueryLog, route: str, detail: str):
        self._log = log
        self._route = route
        self._detail = detail
        self.status = 0
        self.result_rows: int | None = None
        self.error: str | None = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc is not None and self.error is None:
            self.error = repr(exc)[:200]
            self.status = self.status or 500
        self._log.record(
            self._route,
            detail=self._detail,
            status=self.status,
            duration_ms=(time.time() - self._t0) * 1000.0,
            result_rows=self.result_rows,
            error=self.error,
        )
        return False
