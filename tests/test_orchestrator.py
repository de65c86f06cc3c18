"""Orchestrator pipeline tests with a scripted mock LLM + real device index
(CPU backend). Reference analog: lifecycle fakes in
`tests/test_base_agent_lifecycle.py` — extended here to full pipeline runs,
which the reference never tests end-to-end (SURVEY.md §4)."""

import json

import numpy as np
import pytest

from radiant_rag_tpu.config import AppConfig, EmbeddingConfig, CrossEncoderConfig, \
    PipelineConfig, StrategyMemoryConfig, IndexConfig
from radiant_rag_tpu.index.bm25 import PersistentBM25Index
from radiant_rag_tpu.index.store import TpuVectorStore
from radiant_rag_tpu.llm.backends import MockLLMBackend
from radiant_rag_tpu.llm.client import LLMClient
from radiant_rag_tpu.models.bert import BertConfig
from radiant_rag_tpu.models.cross_encoder import CrossEncoder
from radiant_rag_tpu.models.embedder import Embedder
from radiant_rag_tpu.models.registry import LocalNLPModels
from radiant_rag_tpu.orchestrator import (
    LOW_CONFIDENCE_RESPONSE, PipelineResult, RAGOrchestrator, SimplifiedOrchestrator,
)

import dataclasses
import jax.numpy as jnp

DOCS = [
    "The mitochondria is the powerhouse of the cell, producing ATP through respiration.",
    "Photosynthesis converts sunlight into chemical energy in plant chloroplasts.",
    "The cell nucleus contains DNA organized into chromosomes.",
    "Ribosomes synthesize proteins by translating messenger RNA.",
    "The Golgi apparatus packages proteins for transport out of the cell.",
    "ATP is the energy currency used by all living cells.",
]

GOOD_CRITIQUE = json.dumps({
    "ok": True, "confidence": 0.9, "relevance": 9, "faithfulness": 9,
    "coverage": 8, "issues": [], "should_retry": False, "issue_type": "none",
})

DEFAULT_PLAN = json.dumps({
    "use_decomposition": False, "use_rewrite": False, "use_expansion": False,
    "use_rrf": True, "use_automerge": True, "use_rerank": True,
    "use_critic": True, "use_web_search": False, "use_multihop": False,
    "retrieval_mode": "hybrid", "tools_to_use": [],
})


def scripted_llm(extra=None):
    def responder(messages):
        last = messages[-1]["content"]
        script = dict(extra or {})
        for key, resp in script.items():
            if key in last:
                return resp
        if "query-planning agent" in last:
            return DEFAULT_PLAN
        if "Evaluate this answer" in last:
            return GOOD_CRITIQUE
        if "Rewrite each query" in last:
            return "[]"
        if "atomic factual claims" in last:
            return "[]"
        if "Match each answer sentence" in last:
            return "[]"
        if "Context:" in last and "Question:" in last:
            return "Mitochondria produce ATP, the cell's energy currency [DOC 1]."
        return "ok"
    return LLMClient(backend=MockLLMBackend(responder=responder))


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("orch")
    cfg = AppConfig(
        index=IndexConfig(dim=64, initial_capacity=256, data_dir=str(tmp / "idx")),
        embedding=EmbeddingConfig(dim=64, num_layers=2, num_heads=4, hidden_dim=128,
                                  vocab_size=1000, max_seq_len=64, batch_size=8),
        cross_encoder=CrossEncoderConfig(max_seq_len=64, batch_size=8),
        strategy_memory=StrategyMemoryConfig(path=str(tmp / "sm.json.gz")),
    )
    store = TpuVectorStore(dim=64, index_config=cfg.index, quantization=cfg.quantization)
    embedder = Embedder(cfg.embedding)
    ce = CrossEncoder(cfg.cross_encoder, bert_cfg=BertConfig(
        vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, dtype=jnp.float32))
    models = LocalNLPModels(cfg, embedder=embedder, cross_encoder=ce)
    embs = models.embed(DOCS)
    store.upsert_batch([(t, {"source": f"doc{i}.txt"}, embs[i]) for i, t in enumerate(DOCS)])
    bm25 = PersistentBM25Index(store, path=str(tmp / "bm25.json.gz"))
    bm25.build_from_store()
    return cfg, store, bm25, models


def _orch(stack, llm=None, **cfg_overrides):
    cfg, store, bm25, models = stack
    if cfg_overrides:
        cfg = dataclasses.replace(cfg, **cfg_overrides)
    return RAGOrchestrator(cfg, store, bm25, models, llm or scripted_llm())


def test_full_pipeline_run(stack):
    orch = _orch(stack)
    result = orch.run("What do mitochondria produce?")
    assert result.success
    assert "ATP" in result.answer
    assert result.confidence >= 0.8
    assert not result.low_confidence
    assert result.docs  # context docs retrieved
    assert result.plan["retrieval_mode"] == "hybrid"
    step_names = [s["name"] for s in result.metrics["steps"]]
    for phase in ("planning", "retrieval", "post_retrieval", "generation", "critique"):
        assert phase in step_names, step_names


def test_simple_query_heuristic():
    assert RAGOrchestrator._is_simple_query("What is ATP?")
    assert RAGOrchestrator._is_simple_query("who discovered penicillin today ok")
    assert not RAGOrchestrator._is_simple_query(
        "What is the difference between photosynthesis and respiration, and how "
        "do both processes relate to ATP production in plant cells?")


def test_retry_on_context_issue(stack):
    calls = {"critic": 0}

    def responder(messages):
        last = messages[-1]["content"]
        if "query-planning agent" in last:
            return DEFAULT_PLAN
        if "Evaluate this answer" in last:
            calls["critic"] += 1
            if calls["critic"] == 1:
                return json.dumps({
                    "ok": False, "confidence": 0.3, "relevance": 3,
                    "faithfulness": 4, "coverage": 2,
                    "issues": ["missing context"], "should_retry": True,
                    "issue_type": "context",
                })
            return GOOD_CRITIQUE
        if "Rewrite each query" in last:
            return "[]"
        if "alternative phrasings" in last:
            return "[]"
        if "atomic factual claims" in last or "Match each answer" in last:
            return "[]"
        if "Context:" in last and "Question:" in last:
            return "ATP is produced by mitochondria."
        return "ok"

    orch = _orch(stack, llm=LLMClient(backend=MockLLMBackend(responder=responder)))
    result = orch.run("Explain how the energy currency of cells gets produced and used")
    assert result.retry_count >= 1
    assert calls["critic"] == 2
    assert result.confidence >= 0.8  # second round accepted


def test_low_confidence_give_up(stack):
    bad_critique = json.dumps({
        "ok": False, "confidence": 0.1, "relevance": 1, "faithfulness": 1,
        "coverage": 1, "issues": ["hopeless"], "should_retry": True,
        "issue_type": "answer",
    })
    orch = _orch(stack, llm=scripted_llm({"Evaluate this answer": bad_critique}))
    result = orch.run("What is the meaning of everything?")
    assert result.low_confidence
    assert result.answer == LOW_CONFIDENCE_RESPONSE


def test_dense_only_mode(stack):
    plan = json.dumps({**json.loads(DEFAULT_PLAN), "retrieval_mode": "dense"})
    orch = _orch(stack, llm=scripted_llm({"query-planning agent": plan}))
    result = orch.run("cell nucleus DNA contents")
    assert result.plan["retrieval_mode"] == "dense"
    assert result.dense_docs
    assert not result.bm25_docs


def test_bm25_only_mode(stack):
    plan = json.dumps({**json.loads(DEFAULT_PLAN), "retrieval_mode": "bm25"})
    orch = _orch(stack, llm=scripted_llm({"query-planning agent": plan}))
    result = orch.run("ribosomes proteins")
    assert result.bm25_docs
    assert not result.dense_docs


def test_tool_execution(stack):
    plan = json.dumps({**json.loads(DEFAULT_PLAN), "tools_to_use": ["calculator"]})
    orch = _orch(stack, llm=scripted_llm({"query-planning agent": plan}))
    result = orch.run("what is 2*3+4")
    assert result.tool_results
    assert result.tool_results[0]["tool"] == "calculator"


def test_simplified_orchestrator(stack):
    cfg, store, bm25, models = stack
    so = SimplifiedOrchestrator(store, models, scripted_llm())
    answer = so.run("What do mitochondria produce?")
    assert "ATP" in answer


def test_pipeline_result_serializable(stack):
    orch = _orch(stack)
    result = orch.run("What is ATP?")
    d = result.to_dict()
    json.dumps(d)  # must be JSON-serializable
    assert d["query"] == "What is ATP?"


def test_multihop_merges_docs(stack):
    calls = {"n": 0}

    def responder(messages):
        last = messages[-1]["content"]
        if "query-planning agent" in last:
            return json.dumps({**json.loads(DEFAULT_PLAN), "use_multihop": True})
        if "SEQUENCE of sub-questions" in last:
            return '["What is the energy currency?", "What produces {prev}?"]'
        if "Answer the sub-question" in last:
            calls["n"] += 1
            return json.dumps({"answer": "ATP" if calls["n"] == 1 else "mitochondria",
                               "entities": [], "confidence": 0.9,
                               "sufficient": calls["n"] >= 2})
        if "Evaluate this answer" in last:
            return GOOD_CRITIQUE
        if "atomic factual claims" in last or "Match each answer" in last:
            return "[]"
        if "Context:" in last and "Question:" in last:
            return "Mitochondria produce ATP."
        return "[]"

    # force multihop regex trigger with a bridge-style question
    orch = _orch(stack, llm=LLMClient(backend=MockLLMBackend(responder=responder)))
    result = orch.run("What organelle is the producer of the energy currency of the cell?")
    assert result.success
    assert calls["n"] >= 2  # both hops executed
    assert result.docs


def test_web_search_fallback_on_empty_index(stack, tmp_path):
    cfg, _store, _bm25, models = stack
    import dataclasses
    from radiant_rag_tpu.config import PipelineConfig, WebSearchConfig
    from radiant_rag_tpu.index.store import TpuVectorStore
    from radiant_rag_tpu.index.bm25 import PersistentBM25Index
    from radiant_rag_tpu.orchestrator import RAGOrchestrator

    cfg2 = dataclasses.replace(
        cfg,
        pipeline=dataclasses.replace(cfg.pipeline, use_web_search=True,
                                     use_context_eval=False),
        web_search=WebSearchConfig(enabled=True),
    )
    empty_store = TpuVectorStore(dim=64, index_config=cfg.index)
    empty_bm25 = PersistentBM25Index(empty_store, path=str(tmp_path / "w.json.gz"))

    class FakeCrawler:
        def crawl_single(self, url):
            return {"text": "Mitochondria produce ATP, the energy currency.",
                    "title": "bio"}

    def responder(messages):
        last = messages[-1]["content"]
        if "public web page URLs" in last:
            return '["https://example.com/biology"]'
        if "Evaluate this answer" in last:
            return GOOD_CRITIQUE
        if "atomic factual claims" in last or "Match each answer" in last:
            return "[]"
        if "Context:" in last and "Question:" in last:
            return "Mitochondria produce ATP [DOC 1]."
        return "{}"

    orch = RAGOrchestrator(cfg2, empty_store, empty_bm25, models,
                           LLMClient(backend=MockLLMBackend(responder=responder)),
                           web_crawler=FakeCrawler())
    result = orch.run("What produces ATP in cells today?")
    assert result.web_docs  # web fallback supplied the context
    assert "ATP" in result.answer


def test_cross_query_rank_aggregation(stack):
    """A doc ranked 2nd by BOTH decomposed queries must beat a doc ranked 1st
    by only one (reference `orchestrator.py:1147-1196` semantics; VERDICT r1
    weak #6: round 1 just truncated the per-query lists)."""
    cfg, store, bm25, models = stack
    orch = _orch(stack)
    ctx_rows = {}
    for i in range(4):
        doc_id = store.id_for_row(i)
        assert doc_id is not None
        ctx_rows[chr(ord("A") + i)] = i
    A, B, C = ctx_rows["A"], ctx_rows["B"], ctx_rows["C"]

    def fake_search_rows(embs, texts, **kw):
        import numpy as np
        k = kw.get("fused_k", 15)
        pad = lambda lst: lst + [-1] * (k - len(lst))
        rows = np.asarray([pad([A, B]), pad([C, B])], np.int64)
        scores = np.where(rows >= 0, 1.0, -1e30).astype(np.float32)
        blank_r = np.full((2, k), -1, np.int64)
        blank_s = np.full((2, k), -1e30, np.float32)
        return {"dense": (blank_s, blank_r), "bm25": (blank_s, blank_r),
                "fused": (scores, rows)}

    orch._hybrid.search_rows = fake_search_rows
    orch._hybrid._calibrated_at = orch._hybrid.engine.count  # skip probe
    from radiant_rag_tpu.agents.base import new_agent_context

    ctx = new_agent_context("multi")
    ctx.plan = {}
    orch._run_hybrid_fused(ctx, ["sub-question one", "sub-question two"])
    fused_ids = [d.doc_id for d, _ in ctx.fused_docs]
    assert fused_ids[0] == store.id_for_row(B), fused_ids
    assert set(fused_ids[:3]) == {store.id_for_row(A), store.id_for_row(B),
                                  store.id_for_row(C)}


def test_single_query_fused_order_preserved(stack):
    """With one effective query the device fused order passes through."""
    cfg, store, bm25, models = stack
    orch = _orch(stack)
    orch._hybrid._calibrated_at = orch._hybrid.engine.count
    from radiant_rag_tpu.agents.base import new_agent_context

    ctx = new_agent_context("single")
    ctx.plan = {}
    orch._run_hybrid_fused(ctx, ["What produces ATP in the cell?"])
    assert ctx.fused_docs, "fused results expected"
    ids = [d.doc_id for d, _ in ctx.fused_docs]
    assert len(ids) == len(set(ids))


def test_calibration_propagates_to_sharded_store(stack):
    """A store exposing set_fusion (the pod sharded store) must receive the
    calibrated fusion config — otherwise pod serving silently stays on
    equal-weight RRF regardless of what the probes measured."""
    orch = _orch(stack)
    received = {}
    orch.store.set_fusion = lambda mode, w: received.update(
        mode=mode, weights=list(map(float, w)))
    try:
        orch._hybrid.invalidate_calibration()
        orch._ensure_fusion_calibration()
    finally:
        del orch.store.set_fusion
    assert received["mode"] == orch._hybrid.fusion_mode
    assert received["weights"] == [float(x) for x in orch._hybrid.leg_weights]


def _big_stack(tmp_path, n_docs=96):
    """A corpus big enough for the rerank auto-disable probe gate."""
    cfg = AppConfig(
        index=IndexConfig(dim=64, initial_capacity=256, data_dir=str(tmp_path / "idx")),
        embedding=EmbeddingConfig(dim=64, num_layers=2, num_heads=4, hidden_dim=128,
                                  vocab_size=1000, max_seq_len=64, batch_size=8),
        cross_encoder=CrossEncoderConfig(max_seq_len=64, batch_size=16),
        strategy_memory=StrategyMemoryConfig(path=str(tmp_path / "sm.json.gz")),
    )
    store = TpuVectorStore(dim=64, index_config=cfg.index, quantization=cfg.quantization)
    embedder = Embedder(cfg.embedding)
    ce = CrossEncoder(cfg.cross_encoder, bert_cfg=BertConfig(
        vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, dtype=jnp.float32))
    models = LocalNLPModels(cfg, embedder=embedder, cross_encoder=ce)
    topics = ["mitochondria energy", "photosynthesis light", "nucleus dna",
              "ribosome protein", "golgi transport", "membrane lipid"]
    texts = [f"Document {i} about {topics[i % len(topics)]} with unique "
             f"token zq{i} describing cellular biology mechanisms in detail."
             for i in range(n_docs)]
    embs = models.embed(texts)
    store.upsert_batch([(t, {"source": f"d{i}.txt"}, embs[i])
                        for i, t in enumerate(texts)])
    bm25 = PersistentBM25Index(store, path=str(tmp_path / "bm25.json.gz"))
    bm25.build_from_store()
    return cfg, store, bm25, models


def test_rerank_auto_disable_measured(tmp_path):
    """A CE blend that cannot beat the fused order it consumes by the
    configured margin is switched off after the probe run (VERDICT r4 #3:
    the stage costs ~10x serving QPS; a passenger must not ride by
    default) — and the verdict is recorded with the probe MRRs."""
    from radiant_rag_tpu.config import RerankConfig

    cfg, store, bm25, models = _big_stack(tmp_path)
    cfg = dataclasses.replace(cfg, rerank=RerankConfig(
        auto_disable_probes=8, auto_disable_min_gain=0.005))
    orch = RAGOrchestrator(cfg, store, bm25, models, scripted_llm())
    assert orch.rerank.enabled
    orch._ensure_rerank_calibration()
    v = orch.rerank_calibration
    assert v and v["probes"] >= 4
    # random-init CE + prior blend: gain ~0 -> the measured auto-disable
    assert v["auto_disabled"] == (v["gain"] < v["min_gain"])
    assert orch.rerank.enabled == (not v["auto_disabled"])
    # verdict is sticky until growth/invalidation: second call is a no-op
    stamp = orch._rerank_calibrated_at
    orch._ensure_rerank_calibration()
    assert orch._rerank_calibrated_at == stamp
    # retrain/hot-swap invalidation re-arms the probe AND the stage
    orch.invalidate_fusion_calibration()
    assert orch._rerank_calibrated_at == -1
    if v["auto_disabled"]:
        assert orch.rerank.enabled  # re-measure before trusting the off


def test_rerank_auto_disable_opt_out(tmp_path):
    """auto_disable_probes=0 leaves the stage exactly as configured."""
    from radiant_rag_tpu.config import RerankConfig

    cfg, store, bm25, models = _big_stack(tmp_path)
    cfg = dataclasses.replace(cfg, rerank=RerankConfig(auto_disable_probes=0))
    orch = RAGOrchestrator(cfg, store, bm25, models, scripted_llm())
    orch._ensure_rerank_calibration()
    assert orch.rerank.enabled and not orch.rerank_calibration
