"""Streams-mode REST API: named-stream CRUD + stats over HTTP.

Reference: lib/api/api.go:177-220 (the endpoints `benthos streams`
serves) + lib/stream/manager/api.go.  A stdlib ThreadingHTTPServer in
a daemon thread fronts StreamManager — each request body is a YAML (or
JSON, which YAML subsumes) stream config, compiled and launched by the
same stream.py front-end the CLI uses.  Spark drives the actual work;
this layer is control-plane only, so stdlib HTTP is plenty.

Endpoints (reference parity):
    GET    /ping                liveness
    GET    /ready               readiness (Spark session reachable)
    GET    /version             engine version document
    GET    /streams             name → {active, config} map
    GET    /streams/{id}        one stream's document
    POST   /streams/{id}        create from YAML body
    PUT    /streams/{id}        replace (delete + create)
    DELETE /streams/{id}        stop + remove
    GET    /streams/{id}/stats  per-stream counters
    GET    /metrics             Prometheus exposition text
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from benthos_spark.metrics import prometheus_text
from benthos_spark.streaming.manager import StreamManager

VERSION = {"version": "benthos-spark", "built": "source"}


class StreamsAPI:
    """Serve StreamManager over HTTP (daemon thread; port 0 = pick an
    ephemeral port, returned by start())."""

    def __init__(self, manager: StreamManager, host: str = "127.0.0.1",
                 port: int = 0):
        self.manager = manager
        self._host, self._port = host, port
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -------------------------------------------------- lifecycle

    def start(self) -> tuple[str, int]:
        api = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def _send(self, code: int, payload, content_type="application/json"):
                body = (payload if isinstance(payload, bytes)
                        else json.dumps(payload).encode()
                        if content_type == "application/json"
                        else str(payload).encode())
                self.send_response(code)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> str:
                n = int(self.headers.get("Content-Length") or 0)
                return self.rfile.read(n).decode() if n else ""

            def _route(self):
                parts = [p for p in self.path.split("?")[0].split("/") if p]
                return parts

            def do_GET(self):
                parts = self._route()
                try:
                    if parts == ["ping"]:
                        return self._send(200, "pong", "text/plain")
                    if parts == ["ready"]:
                        api.manager.spark.sparkContext  # raises if gone
                        return self._send(200, {"ready": True})
                    if parts == ["version"]:
                        return self._send(200, VERSION)
                    if parts == ["streams"]:
                        return self._send(200, api.manager.list())
                    if len(parts) == 2 and parts[0] == "streams":
                        h = api.manager.read(parts[1])
                        active = h.query is not None and h.query.isActive
                        return self._send(200, {"name": h.name,
                                                "active": active,
                                                "config": h.config})
                    if (len(parts) == 3 and parts[0] == "streams"
                            and parts[2] == "stats"):
                        return self._send(200, api._stats(parts[1]))
                    if parts == ["metrics"]:
                        totals: dict[str, float] = {}
                        for name in api.manager.list():
                            for k, v in api._stats(name).items():
                                if isinstance(v, (int, float)):
                                    totals[f"{name}_{k}"] = v
                        return self._send(200, prometheus_text(totals),
                                          "text/plain; version=0.0.4")
                    return self._send(404, {"error": "not found"})
                except KeyError:
                    return self._send(404, {"error": "stream not found"})
                except Exception as e:  # control plane must answer
                    return self._send(500, {"error": str(e)[:500]})

            def do_POST(self):
                self._mutate("create")

            def do_PUT(self):
                self._mutate("update")

            def do_DELETE(self):
                parts = self._route()
                if len(parts) == 2 and parts[0] == "streams":
                    try:
                        api.manager.delete(parts[1])
                        return self._send(200, {"deleted": parts[1]})
                    except KeyError:
                        return self._send(404, {"error": "stream not found"})
                return self._send(404, {"error": "not found"})

            def _mutate(self, verb: str):
                parts = self._route()
                if len(parts) != 2 or parts[0] != "streams":
                    return self._send(404, {"error": "not found"})
                try:
                    fn = getattr(api.manager, verb)
                    fn(parts[1], self._body())
                    return self._send(200, {verb + "d": parts[1]})
                except ValueError as e:
                    return self._send(400, {"error": str(e)[:500]})
                except Exception as e:
                    return self._send(500, {"error": str(e)[:500]})

        self._server = ThreadingHTTPServer((self._host, self._port), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self._server.server_address[:2]

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    # -------------------------------------------------- stats

    def _stats(self, name: str) -> dict:
        h = self.manager.read(name)
        out: dict = {"active": bool(h.query is not None and h.query.isActive)}
        if h.query is not None:
            prog = h.query.lastProgress
            if prog:
                out["rows_in"] = prog.get("numInputRows", 0)
                src = prog.get("sources") or []
                if src:
                    out["rows_per_sec"] = src[0].get("inputRowsPerSecond") or 0
        elif h.result is not None and not h.result.isStreaming:
            out["batch_complete"] = 1
        return out
