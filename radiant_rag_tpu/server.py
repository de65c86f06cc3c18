"""HTTP serving layer: JSON API over the application facade.

The reference exposes only CLI/TUI/Python surfaces; a production TPU
deployment serves queries over the network. Endpoints:

  GET  /health            component health (503 when degraded)
  GET  /stats             index + pipeline statistics
  POST /query             {"question": str, "conversation_id"?: str}
  POST /search            {"query": str, "mode"?: "hybrid|dense|bm25", "top_k"?: int}
  POST /simple_query      {"question": str}
  POST /ingest/documents  {"paths": [str], "recursive"?: bool}
  POST /ingest/urls       {"urls": [str]}
  POST /ingest/github     {"url": str}
  POST /conversations     {} -> {"conversation_id": str}

Implementation: stdlib ThreadingHTTPServer (no framework dependency). Device
work is serialized through a lock — JAX dispatch is not thread-safe across
concurrent host threads mutating the same engine; batching across requests is
the intended scaling path (see index/hybrid.py batched-first design).
"""

from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional, Tuple

logger = logging.getLogger(__name__)


class RagAPI:
    """Transport-independent request handlers (unit-testable)."""

    def __init__(self, app) -> None:
        self.app = app
        self._lock = threading.Lock()

    def handle(self, method: str, path: str, body: Dict[str, Any]) -> Tuple[int, Dict[str, Any]]:
        try:
            if method == "GET" and path == "/health":
                health = self.app.check_health()
                return (200 if health.get("ok") else 503), health
            if method == "GET" and path == "/stats":
                return 200, self.app.get_stats()
            if method == "POST" and path == "/query":
                question = body.get("question", "")
                if not question:
                    return 400, {"error": "missing 'question'"}
                with self._lock:
                    result = self.app.query(question,
                                            conversation_id=body.get("conversation_id", ""))
                return 200, result.to_dict() | {"answer": result.answer}
            if method == "POST" and path == "/search":
                query = body.get("query", "")
                if not query:
                    return 400, {"error": "missing 'query'"}
                with self._lock:
                    hits = self.app.search(query, mode=body.get("mode", "hybrid"),
                                           top_k=int(body.get("top_k", 10)))
                return 200, {"hits": [
                    {"doc_id": d.doc_id, "score": s, "source": d.source,
                     "content": d.content[:1000], "meta": d.meta}
                    for d, s in hits
                ]}
            if method == "POST" and path == "/simple_query":
                question = body.get("question", "")
                if not question:
                    return 400, {"error": "missing 'question'"}
                with self._lock:
                    return 200, {"answer": self.app.simple_query(question)}
            if method == "POST" and path == "/ingest/documents":
                paths = body.get("paths") or []
                if not paths:
                    return 400, {"error": "missing 'paths'"}
                with self._lock:
                    return 200, self.app.ingest_documents(
                        paths, recursive=bool(body.get("recursive", True)))
            if method == "POST" and path == "/ingest/urls":
                urls = body.get("urls") or []
                if not urls:
                    return 400, {"error": "missing 'urls'"}
                with self._lock:
                    return 200, self.app.ingest_urls(urls)
            if method == "POST" and path == "/ingest/github":
                url = body.get("url", "")
                if not url:
                    return 400, {"error": "missing 'url'"}
                with self._lock:
                    return 200, self.app.ingest_github(url)
            if method == "POST" and path == "/conversations":
                return 200, {"conversation_id": self.app.start_conversation()}
            return 404, {"error": f"unknown endpoint {method} {path}"}
        except Exception as exc:
            logger.exception("request failed: %s %s", method, path)
            return 500, {"error": f"{type(exc).__name__}: {exc}"}


def make_server(app, host: str = "0.0.0.0", port: int = 8080) -> ThreadingHTTPServer:
    api = RagAPI(app)

    class Handler(BaseHTTPRequestHandler):
        def _respond(self, method: str) -> None:
            length = int(self.headers.get("Content-Length", 0) or 0)
            try:
                body = json.loads(self.rfile.read(length)) if length else {}
            except json.JSONDecodeError:
                body = None
            if body is None:
                status, payload = 400, {"error": "invalid JSON body"}
            else:
                status, payload = api.handle(method, self.path.rstrip("/") or "/", body)
            data = json.dumps(payload, default=str).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):  # noqa: N802
            self._respond("GET")

        def do_POST(self):  # noqa: N802
            self._respond("POST")

        def log_message(self, fmt, *args):  # route through logging
            logger.info("%s %s", self.address_string(), fmt % args)

    return ThreadingHTTPServer((host, port), Handler)


def serve(app, host: str = "0.0.0.0", port: int = 8080) -> None:
    server = make_server(app, host, port)
    logger.info("serving on %s:%d", host, port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
