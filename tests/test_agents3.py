"""Post-retrieval agent tests: automerge, RRF agent, rerank, web search
(reference analogs: `tests/test_all.py:1318-1392` RRF math, `:1823-1911`
web-search trigger/blocked-domain logic)."""

import numpy as np
import pytest

from radiant_rag_tpu.agents.automerge import HierarchicalAutoMergingAgent
from radiant_rag_tpu.agents.base import new_agent_context
from radiant_rag_tpu.agents.fusion import RRFAgent
from radiant_rag_tpu.agents.rerank import CrossEncoderRerankingAgent
from radiant_rag_tpu.agents.web_search import WebSearchAgent
from radiant_rag_tpu.index.doc import StoredDoc
from radiant_rag_tpu.llm.backends import MockLLMBackend
from radiant_rag_tpu.llm.client import LLMClient


class DictStore:
    def __init__(self, docs):
        self.docs = {d.doc_id: d for d in docs}

    def get_doc(self, doc_id):
        return self.docs.get(doc_id)


def leaf(i, parent=None, content="leaf content"):
    return StoredDoc(f"leaf{i}", f"{content} {i}",
                     {"doc_level": "leaf", "parent_id": parent or ""})


# ---------------------------------------------------------------- automerge -
def test_automerge_replaces_siblings_with_parent():
    parent = StoredDoc("p1", "the full parent document", {"doc_level": "parent"})
    agent = HierarchicalAutoMergingAgent(DictStore([parent]), min_children_to_merge=2)
    docs = [(leaf(1, "p1"), 0.9), (leaf(2, "p1"), 0.7), (leaf(3, ""), 0.5)]
    merged = agent.merge(docs)
    ids = [d.doc_id for d, _ in merged]
    assert "p1" in ids and "leaf1" not in ids and "leaf2" not in ids
    assert "leaf3" in ids  # orphan kept
    # parent gets the best child's score
    assert dict((d.doc_id, s) for d, s in merged)["p1"] == 0.9


def test_automerge_threshold_not_met():
    parent = StoredDoc("p1", "parent", {"doc_level": "parent"})
    agent = HierarchicalAutoMergingAgent(DictStore([parent]), min_children_to_merge=3)
    docs = [(leaf(1, "p1"), 0.9), (leaf(2, "p1"), 0.7)]
    merged = agent.merge(docs)
    ids = {d.doc_id for d, _ in merged}
    assert ids == {"leaf1", "leaf2"}  # only 2 siblings < threshold


def test_automerge_parent_too_large():
    parent = StoredDoc("p1", "x" * 100, {"doc_level": "parent"})
    agent = HierarchicalAutoMergingAgent(DictStore([parent]),
                                         min_children_to_merge=2, max_parent_chars=50)
    docs = [(leaf(1, "p1"), 0.9), (leaf(2, "p1"), 0.7)]
    merged = agent.merge(docs)
    assert {d.doc_id for d, _ in merged} == {"leaf1", "leaf2"}


def test_automerge_missing_parent_keeps_children():
    agent = HierarchicalAutoMergingAgent(DictStore([]), min_children_to_merge=2)
    docs = [(leaf(1, "ghost"), 0.9), (leaf(2, "ghost"), 0.7)]
    merged = agent.merge(docs)
    assert {d.doc_id for d, _ in merged} == {"leaf1", "leaf2"}


# ---------------------------------------------------------------- rrf agent -
def test_rrf_agent_formula_and_order():
    agent = RRFAgent(rrf_k=60, top_k=10)
    a, b, c = leaf(1), leaf(2), leaf(3)
    fused = agent.fuse([[(a, 0.9), (b, 0.5)], [(b, 12.0), (c, 3.0)]])
    scores = {d.doc_id: s for d, s in fused}
    np.testing.assert_allclose(scores["leaf2"], 1 / 62 + 1 / 61, rtol=1e-9)
    np.testing.assert_allclose(scores["leaf1"], 1 / 61, rtol=1e-9)
    np.testing.assert_allclose(scores["leaf3"], 1 / 62, rtol=1e-9)
    assert [d.doc_id for d, _ in fused][0] == "leaf2"


def test_rrf_agent_on_error_passthrough():
    agent = RRFAgent(top_k=2)
    ctx = new_agent_context("q")
    ctx.dense_docs = [(leaf(1), 0.9), (leaf(2), 0.8), (leaf(3), 0.7)]
    out = agent._on_error(ctx, RuntimeError("x"))
    assert len(out) == 2 and out[0][0].doc_id == "leaf1"


# ---------------------------------------------------------------- rerank ----
class FakeModels:
    def rerank(self, query, docs, top_k=None, max_chars=3000):
        # reverse order with descending fake scores
        order = list(range(len(docs)))[::-1]
        if top_k:
            order = order[:top_k]
        return [(i, float(len(docs) - rank)) for rank, i in enumerate(order)]


def test_rerank_candidate_window_and_remap():
    # prior_weight=0: pure CE ordering (reference parity semantics)
    agent = CrossEncoderRerankingAgent(FakeModels(), top_k=2,
                                       candidate_multiplier=2, min_candidates=3,
                                       prior_weight=0.0)
    docs = [(leaf(i), 1.0 - i * 0.1) for i in range(6)]
    out = agent.rerank("q", docs, top_k=2)
    # candidates = max(2*2, 3) = 4 -> fake reranker reverses -> leaf3 first
    assert [d.doc_id for d, _ in out] == ["leaf3", "leaf2"]
    assert out[0][1] >= out[1][1]


def test_rerank_prior_blend_guards_against_weak_ce():
    """With a large prior weight the blend degenerates to the incoming
    order — an adversarial (reversing) CE cannot destroy the fused ranking
    it consumes (BENCH_NOTES round 4: pure CE order with a from-scratch CE
    = 0.54 MRR vs incoming 0.82)."""
    agent = CrossEncoderRerankingAgent(FakeModels(), top_k=3,
                                       candidate_multiplier=2,
                                       prior_weight=100.0)
    docs = [(leaf(i), 1.0 - i * 0.1) for i in range(8)]
    out = agent.rerank("q", docs, top_k=3)
    assert [d.doc_id for d, _ in out] == ["leaf0", "leaf1", "leaf2"]
    # returned scores are the raw CE logits of the selected docs
    assert out[0][1] == 1.0  # FakeModels CE score of index 0 in a 6-window


def test_rerank_prior_blend_breaks_prior_ties():
    """Equal incoming scores: the CE decides (the blend's tie-break role)."""
    agent = CrossEncoderRerankingAgent(FakeModels(), top_k=2,
                                       candidate_multiplier=2,
                                       prior_weight=1.0)
    docs = [(leaf(i), 0.5) for i in range(4)]
    out = agent.rerank("q", docs, top_k=2)
    # prior all-tied -> z(prior)=0 -> CE (reversed) order wins
    assert [d.doc_id for d, _ in out] == ["leaf3", "leaf2"]


def test_rerank_on_error_truncates_input():
    agent = CrossEncoderRerankingAgent(FakeModels(), top_k=2)
    ctx = new_agent_context("q")
    ctx.fused_docs = [(leaf(i), 0.5) for i in range(5)]
    out = agent._on_error(ctx, RuntimeError("x"))
    assert len(out) == 2 and out[0][0].doc_id == "leaf0"


# ---------------------------------------------------------------- web search
def _ws(script=None, crawler=None, **kw):
    llm = LLMClient(backend=MockLLMBackend(script=script or {}, default="[]"))
    return WebSearchAgent(llm, crawler=crawler, **kw)


def test_web_search_triggers():
    agent = _ws()
    ctx = new_agent_context("what is the latest news on X")
    assert agent.should_trigger(ctx)
    ctx2 = new_agent_context("explain photosynthesis")
    assert not agent.should_trigger(ctx2)
    ctx2.plan = {"use_web_search": True}
    assert agent.should_trigger(ctx2)


def test_web_search_blocked_domains():
    agent = _ws(blocked_domains=("evil.com",))
    assert agent.is_blocked("https://evil.com/x")
    assert agent.is_blocked("https://sub.evil.com/x")
    assert not agent.is_blocked("https://notevil.com/x")


def test_web_search_fetch_and_cache():
    class Crawler:
        calls = 0

        def crawl_single(self, url):
            Crawler.calls += 1
            return {"text": f"page content for {url}", "title": "t"}

    script = {"Suggest up to": '["https://a.com/1", "ftp://bad", "https://b.com/2"]'}
    agent = _ws(script=script, crawler=Crawler())
    ctx = new_agent_context("latest today news")
    docs = agent.execute(ctx)
    assert len(docs) == 2  # ftp filtered
    assert docs[0][1] > docs[1][1]  # descending scores
    assert docs[0][0].meta["web"] is True
    # cached second run: no new fetches
    before = Crawler.calls
    agent.execute(new_agent_context("latest today news"))
    assert Crawler.calls == before
