"""End-to-end app facade tests: ingest -> query -> search -> admin.

The reference has no end-to-end tests at all (SURVEY.md §4); this exercises
the full stack on the CPU backend with a scripted LLM.
"""

import dataclasses
import json

import numpy as np
import pytest
import jax.numpy as jnp

from radiant_rag_tpu.config import (
    AppConfig, BM25Config, ConversationConfig, CrossEncoderConfig,
    EmbeddingConfig, IndexConfig, StrategyMemoryConfig,
)
from radiant_rag_tpu.app import RadiantTPU, build_parser
from radiant_rag_tpu.llm.backends import MockLLMBackend
from radiant_rag_tpu.llm.client import LLMClient
from radiant_rag_tpu.models.bert import BertConfig
from radiant_rag_tpu.models.cross_encoder import CrossEncoder
from radiant_rag_tpu.models.embedder import Embedder
from radiant_rag_tpu.models.registry import LocalNLPModels

GOOD_CRITIQUE = json.dumps({
    "ok": True, "confidence": 0.85, "relevance": 9, "faithfulness": 8,
    "coverage": 8, "issues": [], "should_retry": False, "issue_type": "none",
})


def responder(messages):
    last = messages[-1]["content"]
    if "query-planning agent" in last:
        return json.dumps({"retrieval_mode": "hybrid", "use_rewrite": False,
                           "use_critic": True})
    if "Evaluate this answer" in last:
        return GOOD_CRITIQUE
    if "atomic factual claims" in last or "Match each answer" in last:
        return "[]"
    if "Context:" in last and "Question:" in last:
        return "Solar panels convert sunlight into electricity [DOC 1]."
    return "ok"


@pytest.fixture(scope="module")
def app(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("app")
    cfg = AppConfig(
        index=IndexConfig(dim=64, initial_capacity=256, data_dir=str(tmp / "idx")),
        embedding=EmbeddingConfig(dim=64, num_layers=2, num_heads=4, hidden_dim=128,
                                  vocab_size=1000, max_seq_len=64, batch_size=8),
        cross_encoder=CrossEncoderConfig(max_seq_len=64, batch_size=8),
        bm25=BM25Config(index_path=str(tmp / "bm25.json.gz"), sketch_dim=256),
        conversation=ConversationConfig(data_dir=str(tmp / "convs")),
        strategy_memory=StrategyMemoryConfig(path=str(tmp / "sm.json.gz")),
    )
    embedder = Embedder(cfg.embedding)
    ce = CrossEncoder(cfg.cross_encoder, bert_cfg=BertConfig(
        vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, dtype=jnp.float32))
    models = LocalNLPModels(cfg, embedder=embedder, cross_encoder=ce)
    llm = LLMClient(backend=MockLLMBackend(responder=responder))
    application = RadiantTPU(config=cfg, llm=llm, local_models=models)

    docs_dir = tmp_path_factory.mktemp("docs")
    (docs_dir / "energy.txt").write_text(
        "Solar panels convert sunlight into electricity using photovoltaic cells. "
        "Wind turbines generate power from moving air. " * 4)
    (docs_dir / "biology.md").write_text(
        "# Cells\n\nMitochondria produce ATP for the cell. "
        "The nucleus stores genetic material. " * 4)
    application._docs_dir = docs_dir
    return application


def test_ingest_documents(app):
    stats = app.ingest_documents([str(app._docs_dir)])
    assert stats["chunks_ingested"] > 0
    assert stats["parents"] > 0
    assert stats["bm25_added"] == stats["chunks_ingested"]
    assert app.store.count_documents() > 0


def test_hierarchical_parents_exist(app):
    parents = [d for d in app.store.docstore
               if d.doc_level == "parent"]
    leaves = [d for d in app.store.docstore if d.doc_level == "leaf"]
    assert parents and leaves
    assert all(not app.store.has_embedding(p.doc_id) for p in parents)
    assert all(l.parent_id for l in leaves)


def test_search_modes(app):
    for mode in ("dense", "bm25", "hybrid"):
        hits = app.search("solar panels electricity", mode=mode, top_k=5)
        assert hits, mode
        if mode == "bm25":
            assert any("solar" in d.content.lower() for d, _ in hits)


def test_full_query(app):
    result = app.query("How do solar panels work?")
    assert result.success
    assert "sunlight" in result.answer
    assert result.docs


def test_conversation_flow(app):
    cid = app.start_conversation()
    r1 = app.query("How do solar panels work?", conversation_id=cid)
    assert r1.answer
    conv = app.conversations.get(cid)
    assert len(conv.turns) == 1
    history = app.conversations.get_history_for_synthesis(cid)
    assert history[0]["role"] == "user"


def test_simple_query(app):
    answer = app.simple_query("what produces ATP?")
    assert isinstance(answer, str) and answer


def test_health_and_stats(app):
    health = app.check_health()
    assert health["store"] and health["models"] and health["ok"]
    stats = app.get_stats()
    assert stats["index"]["num_embedded"] > 0
    assert stats["bm25"]["num_docs"] > 0


def test_ingest_idempotent(app):
    before = app.store.count_documents()
    app.ingest_documents([str(app._docs_dir)])
    assert app.store.count_documents() == before  # content-hash idempotency


def test_rebuild_bm25(app):
    n = app.rebuild_bm25_index()
    assert n == len(app.store.list_doc_ids_with_embeddings())


def test_save_index(app, tmp_path):
    app.save_index(str(tmp_path / "saved"))
    from radiant_rag_tpu.index.store import TpuVectorStore

    loaded = TpuVectorStore.load(str(tmp_path / "saved"))
    assert loaded.count_documents() == app.store.count_documents()


def test_report_generation(app, tmp_path):
    from radiant_rag_tpu.ui.reports import QueryReport

    result = app.query("How do solar panels work?")
    report = QueryReport.from_pipeline_result(result)
    md = report.to_markdown()
    assert "# Query Report" in md and result.query in md
    html = report.to_html()
    assert "<html" in html
    parsed = json.loads(report.to_json())
    assert parsed["query"] == result.query
    text = report.to_text()
    assert "QUERY REPORT" in text
    for ext in ("md", "html", "json", "txt"):
        report.save(str(tmp_path / f"r.{ext}"))
        assert (tmp_path / f"r.{ext}").stat().st_size > 0


def test_cli_parser():
    parser = build_parser()
    args = parser.parse_args(["query", "hello", "--report", "out.md"])
    assert args.command == "query" and args.question == "hello"
    args = parser.parse_args(["search", "x", "--mode", "bm25", "--top-k", "3"])
    assert args.mode == "bm25" and args.top_k == 3
    args = parser.parse_args(["ingest", "a", "b"])
    assert args.paths == ["a", "b"]


def test_query_cache_hits_and_invalidation(app):
    app.query_cache.clear()
    r1 = app.query("How do solar panels work?")
    r2 = app.query("How do solar panels work?")
    assert r2 is r1  # served from cache
    assert app.query_cache.stats()["hits"] >= 1
    # search cache (returns a copy to protect the cached list)
    h1 = app.search("solar", mode="bm25", top_k=3)
    hits_before = app.query_cache.stats()["hits"]
    h2 = app.search("solar", mode="bm25", top_k=3)
    assert h2 == h1 and h2 is not h1
    assert app.query_cache.stats()["hits"] == hits_before + 1
    # ingest invalidates
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as d:
        pathlib.Path(d, "new.txt").write_text("Fresh document about cache invalidation testing. " * 4)
        app.ingest_documents([d])
    r3 = app.query("How do solar panels work?")
    assert r3 is not r1


def test_index_durability_across_restart(tmp_path_factory):
    """Ingest in one app instance; a fresh instance sees the corpus
    (the durability the reference delegates to Redis)."""
    tmp = tmp_path_factory.mktemp("durable")
    cfg = AppConfig(
        index=IndexConfig(dim=32, initial_capacity=256, data_dir=str(tmp / "idx")),
        embedding=EmbeddingConfig(dim=32, num_layers=1, num_heads=2, hidden_dim=64,
                                  vocab_size=500, max_seq_len=32, batch_size=4),
        cross_encoder=CrossEncoderConfig(max_seq_len=32, batch_size=4),
        bm25=BM25Config(index_path=str(tmp / "bm25.json.gz"), sketch_dim=128),
        conversation=ConversationConfig(data_dir=str(tmp / "convs")),
        strategy_memory=StrategyMemoryConfig(path=str(tmp / "sm.json.gz")),
    )
    embedder = Embedder(cfg.embedding)
    models = LocalNLPModels(cfg, embedder=embedder, cross_encoder=None)
    llm = LLMClient(backend=MockLLMBackend(responder=responder))
    app1 = RadiantTPU(config=cfg, llm=llm, local_models=models)
    docs = tmp_path_factory.mktemp("ddocs")
    (docs / "x.txt").write_text("Volcanoes erupt molten lava from deep underground chambers. " * 5)
    app1.ingest_documents([str(docs)])
    n = app1.store.count_documents()
    assert n > 0

    app2 = RadiantTPU(config=cfg, llm=llm, local_models=models)  # fresh "restart"
    assert app2.store.count_documents() == n
    hits = app2.search("volcanoes lava", mode="bm25", top_k=3)
    assert hits and "lava" in hits[0][0].content


def test_hybrid_search_after_bm25_rebuild(app):
    """The fused hybrid path must track the live BM25 index across
    build_from_store/load replacements (staleness regression test)."""
    app.rebuild_bm25_index()  # REPLACES the inner BM25Index object
    app.query_cache.clear()
    hits = app.search("solar panels electricity", mode="hybrid", top_k=5)
    assert hits
    assert any("solar" in d.content.lower() for d, _ in hits)


def test_warmup_compiles_buckets(app):
    """warmup() must run clean through the search program buckets and
    report per-stage timings (serve --warmup path)."""
    timings = app.warmup(max_batch=8, modes=("hybrid", "dense"))
    # every coalescer-reachable bucket <= max_batch (an unwarmed bucket
    # ambushes a live request with the first-execution stall)
    assert set(timings) == {f"{m}/b{b}" for m in ("hybrid", "dense")
                            for b in (1, 4, 8)}
    # the deploy-time full ladder additionally warms the ingest-side
    # bulk-embed bucket (a distinct program shape)
    full = app.warmup(max_batch=1, modes=("dense",), full_ladder=True)
    assert f"ingest_embed/b{app.config.embedding.batch_size}" in full
    assert all(t >= 0 for t in timings.values())
    # empty store short-circuits
    from radiant_rag_tpu.app import RadiantTPU

    class EmptyStore:
        def count_documents(self):
            return 0

    bare = RadiantTPU.__new__(RadiantTPU)
    bare.store = EmptyStore()
    assert bare.warmup() == {}


def test_warmup_full_ladder_warms_qdev_fusion_variants(app, monkeypatch):
    """The deploy-time full ladder must warm the device-resident (qdev)
    program for BOTH fusion modes — serving dispatch uses the qdev variant,
    whose jit cache key includes the fusion string, so a host-blob-only warm
    leaves the first post-recalibration query on a cold compile."""
    searcher = app._fused_searcher()
    assert searcher is not None
    calls = []
    orig = searcher.search_rows

    def spy(queries_dense, queries_text, *args, **kwargs):
        calls.append((kwargs.get("fusion"), kwargs.get("_qdev") is not None))
        return orig(queries_dense, queries_text, *args, **kwargs)

    monkeypatch.setattr(searcher, "search_rows", spy)
    timings = app.warmup(max_batch=1, modes=("hybrid",), full_ladder=True)
    assert "hybrid/score/b1" in timings and "hybrid/confidence/b1" in timings
    # each fusion variant saw a device-resident warm AND a host-blob warm
    for fv in ("score", "confidence"):
        assert (fv, True) in calls, f"qdev variant not warmed for {fv}"
        assert (fv, False) in calls, f"host-blob variant not warmed for {fv}"
