"""Agent development template (reference `agents/agent_template.py` — a
documented scaffold for writing new agents; dev doc, not runtime).

Three starting points below: a plain agent, an LLM agent, and a retrieval
agent. Copy one, rename, and follow the checklist.

Checklist for a new agent
-------------------------
1. Pick a unique ``name`` and the right ``category`` (AgentCategory).
2. Implement ``_execute(ctx, **kwargs)``: read inputs from the AgentContext
   (or kwargs), write your outputs back onto it, and also return them.
3. Decide the failure policy in ``_on_error``: return a safe fallback value
   (status becomes PARTIAL) or re-raise (status FAILED — the orchestrator
   marks the feature degraded and continues).
4. Keep _execute pure control-flow: heavy numeric work belongs in
   ``radiant_rag_tpu/ops`` (device kernels), LLM calls go through
   ``self._chat``/``self._chat_json`` so retries and JSON repair apply.
5. Add the agent to the orchestrator (construction + a phase call site), gate
   it behind a ``pipeline.use_*`` flag and/or a plan key.
6. Write lifecycle tests: success path, failure -> fallback, disabled ->
   SKIPPED (see tests/test_agents.py patterns).
"""

from __future__ import annotations

from typing import Any, Dict, List

from radiant_rag_tpu.agents.base import AgentContext, DocScore
from radiant_rag_tpu.agents.base_agent import (
    AgentCategory, BaseAgent, LLMAgent, RetrievalAgent,
)


class TemplateAgent(BaseAgent):
    """Minimal agent: no LLM, no store."""

    name = "template"
    category = AgentCategory.UTILITY

    def __init__(self, some_option: int = 3, enabled: bool = True) -> None:
        super().__init__(enabled=enabled)
        self.some_option = some_option

    def _execute(self, ctx: AgentContext, **kwargs: Any) -> Dict[str, Any]:
        # Read from ctx, compute, write back, return.
        out = {"query_length": len(ctx.query), "option": self.some_option}
        ctx.extras[self.name] = out
        return out

    def _on_error(self, ctx: AgentContext, exc: Exception, **kwargs: Any) -> Dict[str, Any]:
        return {}  # safe fallback -> status PARTIAL


class TemplateLLMAgent(LLMAgent):
    """LLM-backed agent: use _chat_json for structured output."""

    name = "template_llm"
    category = AgentCategory.QUERY_PROCESSING

    def _execute(self, ctx: AgentContext, **kwargs: Any) -> List[str]:
        arr = self._chat_json([{
            "role": "user",
            "content": ("Return a JSON array with up to 3 keywords from this "
                        f"query:\n{ctx.query}"),
        }], expect=list)
        return [str(x) for x in (arr or [])][:3]

    def _on_error(self, ctx: AgentContext, exc: Exception, **kwargs: Any) -> List[str]:
        return []


class TemplateRetrievalAgent(RetrievalAgent):
    """Store-backed agent: embed on device, retrieve from the index engine."""

    name = "template_retrieval"
    category = AgentCategory.RETRIEVAL

    def _execute(self, ctx: AgentContext, **kwargs: Any) -> List[DocScore]:
        emb = self._embed(ctx.query)
        return self._retrieve(emb, top_k=kwargs.get("top_k", 5))

    def _on_error(self, ctx: AgentContext, exc: Exception, **kwargs: Any) -> List[DocScore]:
        return []
