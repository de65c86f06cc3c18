"""The agent development scaffold must stay executable: every template in
agents/agent_template.py runs its success path, its degradation path, and
the SKIPPED short-circuit (reference analog: the 993-line documented
scaffold, agents/agent_template.py)."""

import numpy as np
import pytest

from radiant_rag_tpu.agents.agent_template import (
    TemplateAgent,
    TemplateDeviceOpAgent,
    TemplateLLMAgent,
    TemplateOutput,
    TemplateRetrievalAgent,
)
from radiant_rag_tpu.agents.base import new_agent_context
from radiant_rag_tpu.agents.base_agent import AgentStatus
from radiant_rag_tpu.llm.backends import MockLLMBackend
from radiant_rag_tpu.llm.client import LLMClient


def _ctx(q="what makes a laser emit coherent photons"):
    return new_agent_context(q)


def test_plain_template_success_and_ctx_write():
    agent = TemplateAgent(max_keywords=3)
    ctx = _ctx()
    res = agent.run(ctx)
    assert res.status is AgentStatus.SUCCESS
    assert isinstance(res.data, TemplateOutput)
    assert 0 < len(res.data.keywords) <= 3
    assert ctx.extras["template"]["keywords"] == res.data.keywords


def test_plain_template_skipped_when_disabled():
    agent = TemplateAgent(enabled=False)
    res = agent.run(_ctx())
    assert res.status is AgentStatus.SKIPPED
    assert res.data is None


def test_llm_template_json_contract():
    llm = LLMClient(backend=MockLLMBackend(default='["laser", "coherence"]'))
    agent = TemplateLLMAgent(llm)
    res = agent.run(_ctx())
    assert res.status is AgentStatus.SUCCESS
    assert res.data == ["laser", "coherence"]


def test_llm_template_degrades_to_heuristic():
    class Boom(MockLLMBackend):
        def chat(self, *a, **k):
            raise RuntimeError("backend down")

    from radiant_rag_tpu.config import LLMConfig

    agent = TemplateLLMAgent(LLMClient(config=LLMConfig(max_retries=0),
                                       backend=Boom()))
    res = agent.run(_ctx())
    assert res.status is AgentStatus.PARTIAL  # fallback engaged
    assert res.data  # heuristic keywords, not empty
    assert res.warnings


@pytest.fixture(scope="module")
def store_and_models():
    from radiant_rag_tpu.config import (AppConfig, CrossEncoderConfig,
                                        EmbeddingConfig, IndexConfig)
    from radiant_rag_tpu.index.store import TpuVectorStore
    from radiant_rag_tpu.models.bert import BertConfig
    from radiant_rag_tpu.models.cross_encoder import CrossEncoder
    from radiant_rag_tpu.models.embedder import Embedder
    from radiant_rag_tpu.models.registry import LocalNLPModels

    cfg = AppConfig(
        index=IndexConfig(dim=32, initial_capacity=256),
        embedding=EmbeddingConfig(dim=32, num_layers=1, num_heads=2,
                                  hidden_dim=64, vocab_size=500,
                                  max_seq_len=32, batch_size=4),
        cross_encoder=CrossEncoderConfig(max_seq_len=32, batch_size=4),
    )
    store = TpuVectorStore(dim=32, index_config=cfg.index)
    models = LocalNLPModels(cfg, embedder=Embedder(cfg.embedding),
                            cross_encoder=CrossEncoder(
                                cfg.cross_encoder,
                                bert_cfg=BertConfig(vocab_size=500, hidden_size=32,
                                                    num_layers=1, num_heads=2,
                                                    intermediate_size=64)))
    texts = ["lasers emit coherent light", "bm25 ranks by term frequency",
             "tpus multiply matrices", "rivers flow to the sea"]
    embs = models.embed(texts)
    store.upsert_batch([(t, {"doc_level": "leaf"}, embs[i]) for i, t in enumerate(texts)])
    return store, models


def test_retrieval_template_batches_effective_queries(store_and_models):
    store, models = store_and_models
    agent = TemplateRetrievalAgent(store, models, min_similarity=-1.0)
    ctx = _ctx("coherent laser light")
    ctx.effective_queries = ["coherent laser light", "laser physics"]
    res = agent.run(ctx, top_k=3)
    assert res.status is AgentStatus.SUCCESS
    assert 0 < len(res.data) <= 3
    assert ctx.dense_docs == res.data
    # dedup across queries: doc_ids unique
    ids = [d.doc_id for d, _ in res.data]
    assert len(ids) == len(set(ids))


def test_device_op_template_mmr(store_and_models):
    store, models = store_and_models
    agent = TemplateDeviceOpAgent(store, models, lam=0.7)
    ctx = _ctx("coherent laser light")
    # seed fused docs from a plain retrieval
    ret = TemplateRetrievalAgent(store, models, min_similarity=-1.0)
    ret.run(ctx, top_k=4)
    ctx.fused_docs = ctx.dense_docs
    res = agent.run(ctx, top_k=3)
    assert res.status is AgentStatus.SUCCESS
    assert len(res.data) == 3
    ids = [d.doc_id for d, _ in res.data]
    assert len(ids) == len(set(ids))  # MMR picks are distinct docs


def test_device_op_template_fallback(store_and_models):
    store, models = store_and_models
    agent = TemplateDeviceOpAgent(store, models)

    def boom(*a, **k):
        raise RuntimeError("embedder exploded")

    agent._embed_batch = boom  # simulate device failure
    ctx = _ctx()
    ctx.fused_docs = [(d, s) for d, s in []]
    ret = TemplateRetrievalAgent(store, models, min_similarity=-1.0)
    ret.run(ctx, top_k=4)
    ctx.fused_docs = ctx.dense_docs
    res = agent.run(ctx, top_k=2)
    assert res.status is AgentStatus.PARTIAL
    assert res.data == ctx.fused_docs[:2]  # input order preserved
