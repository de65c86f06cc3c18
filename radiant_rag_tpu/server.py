"""HTTP serving layer: JSON API over the application facade.

The reference exposes only CLI/TUI/Python surfaces; a production TPU
deployment serves queries over the network. Endpoints:

  GET  /health            component health (503 when degraded)
  GET  /stats             index + pipeline statistics
  POST /query             {"question": str, "conversation_id"?: str}
  POST /query/stream      same body; Server-Sent Events: per-phase progress
                          events, live generation tokens ({"event": "token"}),
                          then a final {"event": "result"} event
  POST /search            {"query": str, "mode"?: "hybrid|dense|bm25", "top_k"?: int}
  POST /simple_query      {"question": str}
  POST /ingest/documents  {"paths": [str], "recursive"?: bool}
  POST /ingest/urls       {"urls": [str]}
  POST /ingest/github     {"url": str}
  POST /conversations     {} -> {"conversation_id": str}

Implementation: stdlib ThreadingHTTPServer (no framework dependency). Device
work is serialized through a lock — JAX dispatch is not thread-safe across
concurrent host threads mutating the same engine. /search scales past the
lock via cross-request coalescing (`utils/batching.py`): concurrent searches
with the same (mode, top_k) merge into ONE batched device program, so N
simultaneous clients cost ~one search (the engine is batched-first).
"""

from __future__ import annotations

import collections
import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional, Tuple

from radiant_rag_tpu.utils.batching import RequestCoalescer

logger = logging.getLogger(__name__)

_SEARCH_MODES = ("hybrid", "dense", "bm25")


class _null_gate:
    """No-op context manager used when the work gate is disabled."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class RagAPI:
    """Transport-independent request handlers (unit-testable)."""

    def __init__(self, app, coalesce: Optional[bool] = None,
                 max_batch: Optional[int] = None,
                 max_wait_ms: Optional[float] = None) -> None:
        self.app = app
        self._lock = threading.Lock()
        # per-request /search wall-time ring for /stats latency percentiles
        # (bounded: last 4096 requests; ~32 KB)
        self._lat = collections.deque(maxlen=4096)
        self._lat_lock = threading.Lock()
        self._lat_count = 0
        scfg = getattr(getattr(app, "config", None), "server", None)
        if coalesce is None:
            coalesce = scfg.coalesce if scfg is not None else True
        # Bounded host-path concurrency (see ServerConfig.request_workers):
        # caps how many connection threads run their CPU sections at once so
        # oversubscribed clients queue FIFO instead of GIL-thrashing every
        # in-flight request's parse/serialize. Device waits (coalescer,
        # device lock) do NOT hold a slot.
        workers = scfg.request_workers if scfg is not None else 8
        self.work_gate = (threading.BoundedSemaphore(workers)
                          if workers and workers > 0 else None)
        self._coalescer: Optional[RequestCoalescer] = None
        if coalesce and hasattr(app, "search_batch"):
            depth = scfg.pipeline_depth if scfg is not None else 2
            self._coalescer = RequestCoalescer(
                self._run_search_batch,
                max_batch=max_batch if max_batch is not None else
                (scfg.max_batch if scfg is not None else 32),
                max_wait_ms=max_wait_ms if max_wait_ms is not None else
                (scfg.max_wait_ms if scfg is not None else 4.0),
                name="search",
                # two-phase dispatch keeps batches in flight: one batch's
                # device->host fetch overlaps the next batch's dispatch
                run_batch_async=(self._dispatch_search_batch
                                 if depth > 1 and hasattr(app, "search_batch_async")
                                 else None),
                pipeline_depth=depth)

    def _run_search_batch(self, key, queries):
        mode, top_k = key
        with self._lock:
            return self.app.search_batch(list(queries), mode=mode, top_k=top_k)

    def _dispatch_search_batch(self, key, queries):
        """Dispatch under the device lock; the returned complete() blocks on
        the transfer WITHOUT holding the lock (docstore reads are internally
        locked)."""
        mode, top_k = key
        with self._lock:
            return self.app.search_batch_async(list(queries), mode=mode,
                                               top_k=top_k)

    def close(self) -> None:
        if self._coalescer is not None:
            self._coalescer.stop()
            self._coalescer = None

    def stream_query(self, question: str, conversation_id: str = ""):
        """Generator of event dicts for SSE (holds the device lock for the
        run — progress events flow from the orchestrator's observer hook)."""
        with self._lock:
            yield from self.app.query_stream(question, conversation_id)

    def handle(self, method: str, path: str, body: Dict[str, Any]) -> Tuple[int, Dict[str, Any]]:
        try:
            if method == "GET" and path == "/health":
                health = self.app.check_health()
                return (200 if health.get("ok") else 503), health
            if method == "GET" and path == "/stats":
                stats = dict(self.app.get_stats())
                if self._coalescer is not None:
                    stats["serving"] = dict(self._coalescer.stats)
                with self._lat_lock:
                    lat = sorted(self._lat)
                    total = self._lat_count
                if lat:
                    pick = lambda q: round(lat[min(len(lat) - 1,
                                                   int(q * len(lat)))] * 1000, 1)
                    stats["search_latency_ms"] = {
                        "count": total, "window": len(lat),
                        "p50": pick(0.50), "p90": pick(0.90), "p99": pick(0.99)}
                return 200, stats
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
                queries = body.get("queries")
                if not query and not queries:
                    return 400, {"error": "missing 'query' (or 'queries')"}
                mode = body.get("mode", "hybrid")
                if mode not in _SEARCH_MODES:
                    return 400, {"error": f"mode must be one of {_SEARCH_MODES}"}
                top_k = int(body.get("top_k", 10))

                def hit_dicts(hits):
                    return [{"doc_id": d.doc_id, "score": s, "source": d.source,
                             "content": d.content[:1000], "meta": d.meta}
                            for d, s in hits]

                if queries:
                    # batch API: the throughput-correct client interface —
                    # one request = one batched device program for N queries
                    # (per-query HTTP costs this host ~4 ms of socket+JSON
                    # each; the chip serves 4096-query batches in ~200 ms).
                    if not isinstance(queries, list) or \
                            not all(isinstance(q, str) and q for q in queries):
                        return 400, {"error": "'queries' must be a list of "
                                              "non-empty strings"}
                    t0 = time.perf_counter()
                    with self._lock:
                        batched = self.app.search_batch(
                            list(queries), mode=mode, top_k=top_k)
                    dt = time.perf_counter() - t0
                    with self._lat_lock:
                        self._lat.append(dt / max(len(queries), 1))
                        self._lat_count += len(queries)
                    return 200, {"hits_batch": [hit_dicts(h) for h in batched]}
                t0 = time.perf_counter()
                if self._coalescer is not None:
                    hits = self._coalescer.submit((mode, top_k), query, timeout=120.0)
                else:
                    with self._lock:
                        hits = self.app.search(query, mode=mode, top_k=top_k)
                with self._lat_lock:
                    self._lat.append(time.perf_counter() - t0)
                    self._lat_count += 1
                return 200, {"hits": hit_dicts(hits)}
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
        # HTTP/1.1 keep-alive: every JSON response carries Content-Length, so
        # clients can reuse the connection — per-request TCP setup/teardown
        # was measurable under concurrent load (tools/bench_serving.py). The
        # SSE stream path has no Content-Length and closes its connection
        # explicitly instead.
        protocol_version = "HTTP/1.1"

        def _respond(self, method: str) -> None:
            # CPU sections (parse / serialize+write) run under the bounded
            # work gate; api.handle's internal waits (coalescer, device
            # lock) run outside it so batch formation stays unbounded.
            gate = api.work_gate

            def gated():
                return gate if gate is not None else _null_gate()

            # socket read stays OUTSIDE the gate: it can block on a slow
            # client (I/O wait, GIL released) and must not hold a slot
            length = int(self.headers.get("Content-Length", 0) or 0)
            raw = self.rfile.read(length) if length else b""
            with gated():
                try:
                    body = json.loads(raw) if raw else {}
                except json.JSONDecodeError:
                    body = None
            if body is None:
                status, payload = 400, {"error": "invalid JSON body"}
            else:
                status, payload = api.handle(method, self.path.rstrip("/") or "/", body)
            with gated():
                data = json.dumps(payload, default=str).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

        def do_GET(self):  # noqa: N802
            self._respond("GET")

        def do_POST(self):  # noqa: N802
            if (self.path.rstrip("/") or "/") == "/query/stream":
                self._stream_query()
                return
            self._respond("POST")

        def _stream_query(self) -> None:
            length = int(self.headers.get("Content-Length", 0) or 0)
            try:
                body = json.loads(self.rfile.read(length)) if length else {}
            except json.JSONDecodeError:
                body = None
            question = (body or {}).get("question", "")
            if body is None or not question:
                data = json.dumps({"error": "missing 'question'"}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            # unbounded body: under HTTP/1.1 the client detects end-of-stream
            # by connection close, so opt this response out of keep-alive
            self.send_header("Connection", "close")
            self.close_connection = True
            self.end_headers()
            try:
                for ev in api.stream_query(question,
                                           body.get("conversation_id", "")):
                    payload = json.dumps(ev, default=str)
                    self.wfile.write(f"data: {payload}\n\n".encode())
                    self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                logger.info("stream client disconnected")

        def log_message(self, fmt, *args):  # route through logging
            logger.info("%s %s", self.address_string(), fmt % args)

    server = ThreadingHTTPServer((host, port), Handler)
    server.api = api  # type: ignore[attr-defined] — for tests / clean close
    return server


def serve(app, host: str = "0.0.0.0", port: int = 8080) -> None:
    server = make_server(app, host, port)
    logger.info("serving on %s:%d", host, port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    finally:
        server.api.close()  # type: ignore[attr-defined]
