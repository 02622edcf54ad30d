"""API parity-layer tests: validation rules + envelope (api.go:31-128)."""

from __future__ import annotations

import datetime as dt
import json
import threading
import urllib.request

import pytest

from clickhouse_observability_spark.api.http import LogsApi
from clickhouse_observability_spark.schema import LOGS_SCHEMA


@pytest.fixture(scope="module")
def api(spark):
    rows = [
        (dt.datetime(2025, 9, 1, 20, 5), "orders", "WARN", "pending",
         '{"user":"jane.smith"}', "t1", "s1"),
        (dt.datetime(2025, 9, 1, 20, 6), "orders", "INFO", "ok", "", "t2", "s2"),
    ]
    df = spark.createDataFrame(rows, LOGS_SCHEMA)
    return LogsApi(lambda: df)


BASE = {"service": "orders", "from": "2025-09-01T00:00:00Z", "to": "2025-09-02T00:00:00Z"}


def test_happy_path_envelope(api):
    status, body = api.query_logs_handler(dict(BASE))
    assert status == 200
    assert body["count"] == 2 and len(body["logs"]) == 2
    first = body["logs"][0]  # ORDER BY ts DESC
    assert first["Msg"] == "ok" and first["Attrs"] == {}
    assert body["logs"][1]["Attrs"] == {"user": "jane.smith"}
    assert body["query"]["limit"] == 100  # default (api.go:73)
    assert body["query"]["from"] == "2025-09-01T00:00:00Z"


def test_missing_service_400(api):
    p = dict(BASE); del p["service"]
    status, body = api.query_logs_handler(p)
    assert status == 400 and "service" in body["error"]


def test_bad_rfc3339_400(api):
    status, body = api.query_logs_handler({**BASE, "from": "yesterday"})
    assert status == 400 and "RFC3339" in body["error"]


def test_from_after_to_400(api):
    status, _ = api.query_logs_handler(
        {**BASE, "from": "2025-09-03T00:00:00Z", "to": "2025-09-01T00:00:00Z"}
    )
    assert status == 400


@pytest.mark.parametrize("limit", ["0", "-5", "abc"])
def test_invalid_limit_400(api, limit):
    status, body = api.query_logs_handler({**BASE, "limit": limit})
    assert status == 400 and "limit" in body["error"]


def test_absurd_limit_bounded_400(api):
    # Spark top-k allocates O(limit) per task: an unbounded limit is a
    # one-request driver OOM (found live; api.go has no such bound —
    # documented safety divergence).
    status, body = api.query_logs_handler({**BASE, "limit": "1000000000"})
    assert status == 400 and "too large" in body["error"]


def test_non_get_405(api):
    status, _ = api.query_logs_handler(dict(BASE), method="POST")
    assert status == 405


def test_level_and_user_filters(api):
    status, body = api.query_logs_handler({**BASE, "level": "WARN"})
    assert status == 200 and body["count"] == 1
    status, body = api.query_logs_handler({**BASE, "user": "jane.smith"})
    assert status == 200 and body["logs"][0]["Msg"] == "pending"


def test_tz_normalization(api):
    # +02:00 offset input -> same instant as UTC (api.go:66-67)
    status, body = api.query_logs_handler(
        {**BASE, "from": "2025-09-01T02:00:00+02:00"}
    )
    assert status == 200 and body["count"] == 2


def test_query_timeout_504_envelope(api, monkeypatch):
    # A timeout must come back as the documented 504 JSON envelope,
    # not crash the request (api.go:95-96).
    from clickhouse_observability_spark.api.http import ApiError, LogsApi

    def boom(df, timeout_s=30):
        raise ApiError(504, "query timeout")

    monkeypatch.setattr(LogsApi, "_collect_with_timeout", staticmethod(boom))
    status, body = api.query_logs_handler(dict(BASE))
    assert status == 504 and body["error"] == "query timeout"


def test_execution_failure_500_envelope(api, monkeypatch):
    from clickhouse_observability_spark.api.http import LogsApi

    def boom(df, timeout_s=30):
        raise RuntimeError("executor lost")

    monkeypatch.setattr(LogsApi, "_collect_with_timeout", staticmethod(boom))
    status, body = api.query_logs_handler(dict(BASE))
    assert status == 500 and "error" in body


def test_ping_live_ready(api):
    assert api.ping_handler() == (200, "pong")
    assert api.live_handler()[0] == 200
    assert api.ready_handler()[0] == 200


def test_http_server_end_to_end(api):
    server = api.serve(port=0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/api/ping") as r:
            assert r.read() == b"pong"
        qs = "service=orders&from=2025-09-01T00:00:00Z&to=2025-09-02T00:00:00Z"
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/v1/logs?{qs}") as r:
            body = json.loads(r.read())
            assert body["count"] == 2
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/logs", data=b"{}", method="POST"
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected 405"
        except urllib.error.HTTPError as e:
            assert e.code == 405
    finally:
        server.shutdown()
