"""EXT custom stateful streaming operator: incremental trace
aggregation via applyInPandasWithState.

The reference stores raw spans and leaves correlation to query time
(trace_id is just a column, db.go:47). A streaming engine can instead
maintain per-trace running state — span count, first/last event time,
error flag — updated incrementally as spans arrive. This is the
canonical `applyInPandasWithState` shape: grouped stream, Arrow
batches per key, explicit GroupState, bounded by timeouts.

Scale: state is one tiny row per OPEN trace; ProcessingTimeTimeout
expires idle traces so state never grows with stream length.

Operational note: under ProcessingTimeTimeout the engine always has a
future state-cleanup batch pending, so
`StreamingQuery.processAllAvailable()` never returns — poll the sink
(or use awaitTermination with a timeout) instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

TRACE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_spans", T.LongType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("has_error", T.BooleanType()),
    ]
)

TRACE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.StringType()),
        T.StructField("n_spans", T.LongType()),
        T.StructField("duration_us", T.LongType()),
        T.StructField("has_error", T.BooleanType()),
    ]
)


def _update_trace(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (trace_id,) = key
    if state.hasTimedOut:
        # idle trace: emit nothing further, drop the state row
        state.remove()
        return
    n, first_us, last_us, has_err = (
        state.get if state.exists else (0, None, None, False)
    )
    for pdf in pdfs:
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
        n += len(pdf)
        lo, hi = min(ts_us), max(ts_us)
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
        has_err = bool(has_err or (pdf["level"] == "ERROR").any())
    state.update((n, first_us, last_us, has_err))
    state.setTimeoutDuration(60_000)  # expire idle traces after 60 s
    yield pd.DataFrame(
        {
            "trace_id": [trace_id],
            "n_spans": [n],
            "duration_us": [last_us - first_us],
            "has_error": [has_err],
        }
    )


def trace_aggregates(logs_stream: DataFrame) -> DataFrame:
    """Running per-trace aggregates, one update row per trace per
    micro-batch in which it received spans."""
    return (
        logs_stream.select("trace_id", "ts", "level")
        .groupBy("trace_id")
        .applyInPandasWithState(
            _update_trace,
            outputStructType=TRACE_OUTPUT_SCHEMA,
            stateStructType=TRACE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
