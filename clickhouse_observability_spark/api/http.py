"""Query API parity layer (SURVEY.md §2.11; reference internal/api/api.go).

Re-implements the reference HTTP surface's CONTRACT — parameter
validation rules, status codes, and the JSON response envelope — as a
transport-agnostic handler plus an optional stdlib HTTP server. The
heavy lifting is the same `query_logs` plan as everywhere else;
this layer only parses, validates, and encodes.

Validation rules mirrored 1:1 from api.go:
- service required, else 400                      (api.go:41-46)
- from/to required RFC3339, 400 on parse error    (api.go:48-63)
- UTC normalization of from/to                    (api.go:66-67)
- level/user optional                             (api.go:69-70)
- limit optional positive int, default 100        (api.go:72-82)
- 400 if from > to                                (api.go:85-89)
- 405 on non-GET                                  (api.go:32-36)
- 30 s query timeout                              (api.go:95-96)
- envelope {logs, count, query:{echo}}            (api.go:108-126)
- GET /api/ping -> "pong"                         (api.go:23-26)
- GET /live, /ready -> 200 empty                  (main.go:58-59)
"""

from __future__ import annotations

import datetime as dt
import json
from dataclasses import dataclass

from pyspark.sql import DataFrame


from clickhouse_observability_spark.operators.query_logs import query_logs

DEFAULT_LIMIT = 100  # api.go:73
QUERY_TIMEOUT_S = 30  # api.go:95
# Safety divergence from the reference (which accepts any positive
# limit and lets ClickHouse stream): Spark's top-k allocates O(limit)
# buffers per task, so an unbounded limit is a one-request OOM. Bound
# it at the boundary.
MAX_LIMIT = 100_000


@dataclass
class ApiError(Exception):
    status: int
    message: str


def _parse_rfc3339(name: str, raw: str | None) -> dt.datetime:
    if not raw:
        raise ApiError(400, f"missing required parameter: {name}")
    try:
        d = dt.datetime.fromisoformat(raw.replace("Z", "+00:00"))
    except ValueError:
        raise ApiError(400, f"invalid {name}: must be RFC3339") from None
    if d.tzinfo is None:
        d = d.replace(tzinfo=dt.timezone.utc)
    return d.astimezone(dt.timezone.utc)  # api.go:66-67 .UTC()


class LogsApi:
    """Transport-agnostic handler over a logs DataFrame provider."""

    def __init__(self, logs_df_provider):
        """logs_df_provider: () -> DataFrame with the logs schema."""
        self._provider = logs_df_provider

    # -- GET /v1/logs ---------------------------------------------------
    def query_logs_handler(self, params: dict, method: str = "GET") -> tuple[int, dict]:
        if method != "GET":
            return 405, {"error": "method not allowed"}  # api.go:32-36
        try:
            service = params.get("service")
            if not service:
                raise ApiError(400, "missing required parameter: service")
            frm = _parse_rfc3339("from", params.get("from"))
            to = _parse_rfc3339("to", params.get("to"))
            if frm > to:
                raise ApiError(400, "from must be <= to")  # api.go:85-89
            raw_limit = params.get("limit")
            limit = DEFAULT_LIMIT
            if raw_limit is not None:
                try:
                    limit = int(raw_limit)
                except (TypeError, ValueError):
                    raise ApiError(400, "limit must be a positive integer") from None
                if limit <= 0:
                    raise ApiError(400, "limit must be a positive integer")
                if limit > MAX_LIMIT:
                    raise ApiError(400, f"limit too large (max {MAX_LIMIT})")
            level = params.get("level") or None
            user = params.get("user") or None
            df = query_logs(
                self._provider(),
                service,
                frm.replace(tzinfo=None),
                to.replace(tzinfo=None),
                level=level,
                user=user,
                limit=limit,
            )
            rows = self._collect_with_timeout(df)
        except ApiError as e:
            # covers validation 400s AND the 504 query timeout raised
            # by _collect_with_timeout (api.go:95-96 behavior)
            return e.status, {"error": e.message}
        except Exception:
            # execution failure -> 500 envelope, never a crashed request
            return 500, {"error": "internal error"}
        logs = [
            {
                "Ts": r["ts"].isoformat() + "Z",
                "Service": r["service"],
                "Level": r["level"],
                "Msg": r["msg"],
                "Attrs": json.loads(r["attrs"]) if r["attrs"] else {},
                "TraceID": r["trace_id"],
                "SpanID": r["span_id"],
            }
            for r in (row.asDict() for row in rows)
        ]
        envelope = {
            "logs": logs,
            "count": len(logs),  # count of the LIMITED result (api.go:110)
            "query": {
                "service": service,
                "from": frm.strftime("%Y-%m-%dT%H:%M:%S%z").replace("+0000", "Z"),
                "to": to.strftime("%Y-%m-%dT%H:%M:%S%z").replace("+0000", "Z"),
                "level": level or "",
                "user": user or "",
                "limit": limit,
            },
        }
        return 200, envelope

    @staticmethod
    def _collect_with_timeout(df: DataFrame, timeout_s: int = QUERY_TIMEOUT_S):
        """30 s query budget (api.go:95-96) via an interruptible
        collect on a tagged job group."""
        import threading

        result, error = [], []

        sc = df.sparkSession.sparkContext

        def run():
            try:
                sc.setLocalProperty("spark.jobGroup.id", "api-query")
                result.extend(df.collect())
            except Exception as e:  # pragma: no cover
                error.append(e)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        t.join(timeout_s)
        if t.is_alive():
            sc.cancelJobGroup("api-query")
            raise ApiError(504, "query timeout")
        if error:
            raise error[0]
        return result

    # -- ops endpoints --------------------------------------------------
    @staticmethod
    def ping_handler() -> tuple[int, str]:
        return 200, "pong"  # api.go:23-26

    @staticmethod
    def live_handler() -> tuple[int, str]:
        return 200, ""  # main.go:58

    @staticmethod
    def ready_handler() -> tuple[int, str]:
        return 200, ""  # main.go:59

    # -- optional stdlib HTTP transport --------------------------------
    def serve(self, host: str = "127.0.0.1", port: int = 8080):
        """Start a blocking stdlib HTTP server exposing the reference
        routes. Returns the server (call .shutdown() from another
        thread to stop)."""
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
        from urllib.parse import parse_qsl, urlparse

        api = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence
                pass

            def _send(self, status: int, body, content_type="application/json"):
                raw = (
                    json.dumps(body).encode()
                    if not isinstance(body, str)
                    else body.encode()
                )
                self.send_response(status)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(raw)))
                self.end_headers()
                self.wfile.write(raw)

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/v1/logs":
                    status, body = api.query_logs_handler(dict(parse_qsl(u.query)))
                    self._send(status, body)
                elif u.path == "/api/ping":
                    self._send(*api.ping_handler(), content_type="text/plain")
                elif u.path == "/live":
                    self._send(*api.live_handler(), content_type="text/plain")
                elif u.path == "/ready":
                    self._send(*api.ready_handler(), content_type="text/plain")
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                u = urlparse(self.path)
                if u.path == "/v1/logs":
                    self._send(405, {"error": "method not allowed"})
                else:
                    self._send(404, {"error": "not found"})

        server = ThreadingHTTPServer((host, port), Handler)
        return server
