"""End-to-end integration: wire batches -> streaming micro-batcher ->
partitioned logs table -> reference query template -> API envelope.
The full reference data path (SURVEY.md §3 entry points 1+2) in one
flow."""

from __future__ import annotations

import datetime as dt

from clickhouse_observability_spark.api.http import LogsApi
from clickhouse_observability_spark.operators.query_logs import query_logs
from clickhouse_observability_spark.sources.writer import LogsTable
from clickhouse_observability_spark.streaming.batcher import IngestStream


def test_stream_to_query_to_api(spark, tmp_path):
    table = LogsTable(spark, str(tmp_path / "logs"))
    table.init_schema()
    stream = IngestStream(
        spark, table, str(tmp_path / "inbox"), str(tmp_path / "ckpt")
    )
    q = stream.start()
    try:
        accepted = stream.submit_many(
            [
                {"ts": f"2025-09-01T10:{m:02d}:00Z", "service": "orders",
                 "level": "WARN" if m % 2 else "INFO", "msg": f"m{m}",
                 "attrs": {"user": "jane.smith" if m < 5 else "bob"},
                 "trace_id": f"t{m}", "span_id": f"s{m}"}
                for m in range(10)
            ]
        )
        assert accepted == 10
        q.processAllAvailable()

        # reference read-path template over the streamed table
        out = query_logs(
            table.read(), "orders",
            "2025-09-01 00:00:00", "2025-09-02 00:00:00",
            level="WARN", user="jane.smith", limit=5,
        ).collect()
        assert [r.msg for r in out] == ["m3", "m1"]  # desc by ts

        # API layer over the same table
        status, body = LogsApi(table.read).query_logs_handler(
            {"service": "orders", "from": "2025-09-01T00:00:00Z",
             "to": "2025-09-02T00:00:00Z", "user": "bob"}
        )
        assert status == 200
        assert body["count"] == 5
        assert all(l["Attrs"]["user"] == "bob" for l in body["logs"])
        ts_list = [l["Ts"] for l in body["logs"]]
        assert ts_list == sorted(ts_list, reverse=True)
    finally:
        stream.stop(drain=False)
