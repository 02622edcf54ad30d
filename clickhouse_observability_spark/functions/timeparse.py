"""Timestamp parsing / formatting (F2/F3/F7/F8 in SURVEY.md §2.8).

The reference parses wire timestamps with a three-step fallback —
RFC3339Nano, then RFC3339, then `now().UTC()`
(internal/service/service.go:27-34) — and partitions storage by
`toYYYYMM(ts)` (internal/db/db.go:51). Spark's `to_timestamp` returns
NULL on unparseable input, so the whole fallback chain is a single
`coalesce`; nanosecond inputs are truncated to Spark's µs precision
(a superset of the reference's ms).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_ts_with_fallback(col: Column | str, now: Column | None = None) -> Column:
    """RFC3339Nano -> RFC3339 -> ingest-time fallback (service.go:27-34).

    `try_to_timestamp` handles both RFC3339 flavors (fractional seconds
    optional) in one parse; NULL/garbage falls back to the current
    timestamp exactly like the reference replaces bad event times.
    """
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.try_to_timestamp(c)
    return F.coalesce(parsed, now if now is not None else F.current_timestamp())


def month_of(col: Column | str) -> Column:
    """toYYYYMM(ts) (db.go:51) as an int like ClickHouse returns (e.g. 202409)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.year(c) * 100 + F.month(c)).cast("int")


def format_rfc3339(col: Column | str) -> Column:
    """RFC3339 output formatting (api.go:115-116 echoes from/to)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ssXXX")
