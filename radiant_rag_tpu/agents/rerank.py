"""Cross-encoder reranking agent.

Capability parity with reference `agents/rerank.py:25-131`: scores the top
k x candidate_multiplier (at least min_candidates) docs with the cross-encoder
over truncated text and remaps indices; `_on_error` returns input[:k].
The scoring itself runs on the TPU (`models/cross_encoder.py`).
"""

from __future__ import annotations

from typing import Any, List

from radiant_rag_tpu.agents.base import AgentContext, DocScore
from radiant_rag_tpu.agents.base_agent import AgentCategory, BaseAgent


class CrossEncoderRerankingAgent(BaseAgent):
    name = "rerank"
    category = AgentCategory.POST_RETRIEVAL

    def __init__(self, local_models, top_k: int = 8, candidate_multiplier: int = 4,
                 min_candidates: int = 16, max_chars: int = 3000,
                 enabled: bool = True) -> None:
        super().__init__(enabled=enabled)
        self.local_models = local_models
        self.top_k = top_k
        self.candidate_multiplier = candidate_multiplier
        self.min_candidates = min_candidates
        self.max_chars = max_chars

    def _execute(self, ctx: AgentContext, **kwargs: Any) -> List[DocScore]:
        docs = kwargs.get("docs")
        if docs is None:
            docs = ctx.auto_merged_docs or ctx.fused_docs or ctx.dense_docs or ctx.bm25_docs
        top_k = kwargs.get("top_k", self.top_k)
        reranked = self.rerank(ctx.query, docs, top_k)
        ctx.reranked_docs = reranked
        return reranked

    def rerank(self, query: str, docs: List[DocScore], top_k: int) -> List[DocScore]:
        if not docs:
            return []
        n_cand = max(top_k * self.candidate_multiplier, self.min_candidates)
        candidates = docs[:n_cand]
        ranked = self.local_models.rerank(
            query, [d.content for d, _ in candidates],
            top_k=top_k, max_chars=self.max_chars,
        )
        return [(candidates[i][0], float(score)) for i, score in ranked]

    def _on_error(self, ctx: AgentContext, exc: Exception, **kwargs: Any) -> List[DocScore]:
        docs = kwargs.get("docs") or ctx.auto_merged_docs or ctx.fused_docs or []
        top_k = kwargs.get("top_k", self.top_k)
        ctx.reranked_docs = list(docs[:top_k])
        return ctx.reranked_docs
