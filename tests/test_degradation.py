"""Failure-injection tests: the pipeline must complete degraded, never crash
(reference §5.3: every agent catches, falls back, and the orchestrator marks
degradation — `base_agent.py:548-584`, `orchestrator.py:766+`)."""

import json

import numpy as np
import pytest
import jax.numpy as jnp

from radiant_rag_tpu.config import AppConfig, CrossEncoderConfig, EmbeddingConfig, \
    IndexConfig, StrategyMemoryConfig
from radiant_rag_tpu.index.bm25 import PersistentBM25Index
from radiant_rag_tpu.index.store import TpuVectorStore
from radiant_rag_tpu.llm.backends import BaseLLMBackend, LLMError, MockLLMBackend
from radiant_rag_tpu.llm.client import LLMClient
from radiant_rag_tpu.models.bert import BertConfig
from radiant_rag_tpu.models.cross_encoder import CrossEncoder
from radiant_rag_tpu.models.embedder import Embedder
from radiant_rag_tpu.models.registry import LocalNLPModels
from radiant_rag_tpu.orchestrator import LOW_CONFIDENCE_RESPONSE, RAGOrchestrator

DOCS = ["The sun is a star at the center of the solar system.",
        "Planets orbit the sun in elliptical paths.",
        "The moon orbits the earth once every month."]

GOOD_CRITIQUE = json.dumps({"ok": True, "confidence": 0.8, "relevance": 8,
                            "faithfulness": 8, "coverage": 8, "issues": [],
                            "should_retry": False, "issue_type": "none"})


def good_llm():
    def responder(messages):
        last = messages[-1]["content"]
        if "Evaluate this answer" in last:
            return GOOD_CRITIQUE
        if "atomic factual claims" in last or "Match each answer" in last:
            return "[]"
        if "Context:" in last and "Question:" in last:
            return "The sun is a star [DOC 1]."
        return "{}"
    return LLMClient(backend=MockLLMBackend(responder=responder))


class FlakyLLM(BaseLLMBackend):
    """Fails planning and critique; answers synthesis."""

    def chat(self, messages, **kw):
        last = messages[-1]["content"]
        if "query-planning" in last or "Evaluate this answer" in last:
            raise LLMError("500 injected", status=500)
        if "Context:" in last and "Question:" in last:
            return "The sun is a star."
        return "[]"


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("degrade")
    cfg = AppConfig(
        index=IndexConfig(dim=32, initial_capacity=256, data_dir=str(tmp / "idx")),
        embedding=EmbeddingConfig(dim=32, num_layers=1, num_heads=2, hidden_dim=64,
                                  vocab_size=500, max_seq_len=32, batch_size=4),
        cross_encoder=CrossEncoderConfig(max_seq_len=32, batch_size=4),
        strategy_memory=StrategyMemoryConfig(path=str(tmp / "sm.json.gz")),
    )
    store = TpuVectorStore(dim=32, index_config=cfg.index)
    embedder = Embedder(cfg.embedding)
    ce = CrossEncoder(cfg.cross_encoder, bert_cfg=BertConfig(
        vocab_size=500, hidden_size=32, num_layers=1, num_heads=2,
        intermediate_size=64, dtype=jnp.float32))
    models = LocalNLPModels(cfg, embedder=embedder, cross_encoder=ce)
    embs = models.embed(DOCS)
    store.upsert_batch([(t, {"source": f"d{i}"}, embs[i]) for i, t in enumerate(DOCS)])
    bm25 = PersistentBM25Index(store, path=str(tmp / "b.json.gz"))
    bm25.build_from_store()
    return cfg, store, bm25, models


def test_llm_failures_degrade_not_crash(stack):
    cfg, store, bm25, models = stack
    # LLM that fails planning + critique with retryable 500s
    import dataclasses

    from radiant_rag_tpu.config import LLMConfig

    llm = LLMClient(LLMConfig(max_retries=0, retry_backoff_s=0), backend=FlakyLLM())
    orch = RAGOrchestrator(cfg, store, bm25, models, llm)
    result = orch.run("Is the sun a star?")
    # planning failed -> default plan; critique failed -> default accept
    assert result.answer  # pipeline completed
    assert "sun" in result.answer.lower()


def test_total_llm_outage_gives_low_confidence(stack):
    cfg, store, bm25, models = stack

    class DeadLLM(BaseLLMBackend):
        def chat(self, messages, **kw):
            raise LLMError("connection refused")

    from radiant_rag_tpu.config import LLMConfig

    llm = LLMClient(LLMConfig(max_retries=0, retry_backoff_s=0), backend=DeadLLM())
    orch = RAGOrchestrator(cfg, store, bm25, models, llm)
    result = orch.run("Is the sun a star?")
    assert result.answer == LOW_CONFIDENCE_RESPONSE
    assert result.low_confidence and not result.success
    assert "generation" in result.degraded


def test_broken_reranker_passthrough(stack):
    cfg, store, bm25, models = stack

    class BrokenRerank:
        embedder = models.embedder

        def embed(self, texts):
            return models.embed(texts)

        def embed_single(self, text):
            return models.embed_single(text)

        def rerank(self, *a, **kw):
            raise RuntimeError("injected rerank failure")

    orch = RAGOrchestrator(cfg, store, bm25, BrokenRerank(), good_llm())
    result = orch.run("Is the sun a star?")
    assert result.answer and "sun" in result.answer.lower()
    assert "rerank" not in result.degraded  # PARTIAL (fallback), not failure
    assert result.reranked_docs  # passthrough of fused docs


def test_empty_index_low_confidence(stack, tmp_path):
    cfg, _store, _bm25, models = stack
    empty_store = TpuVectorStore(dim=32, index_config=cfg.index)
    empty_bm25 = PersistentBM25Index(empty_store, path=str(tmp_path / "e.json.gz"))
    orch = RAGOrchestrator(cfg, empty_store, empty_bm25, models, good_llm())
    result = orch.run("Is the sun a star?")
    # context-eval gate aborts before generation on empty retrieval
    assert result.low_confidence
    assert result.answer == LOW_CONFIDENCE_RESPONSE


def test_strategy_memory_failure_is_isolated(stack, monkeypatch):
    cfg, store, bm25, models = stack
    orch = RAGOrchestrator(cfg, store, bm25, models, good_llm())
    monkeypatch.setattr(orch.strategy_memory, "record_outcome",
                        lambda *a, **k: (_ for _ in ()).throw(OSError("disk full")))
    result = orch.run("Is the sun a star?")
    assert result.answer and "strategy_memory" in result.degraded
