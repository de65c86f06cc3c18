"""Agent development scaffold — the complete guide to adding an agent.

Capability analog of the reference's 993-line developer template
(`agents/agent_template.py`): copy one of the four templates at the bottom,
rename it, and work through the walkthrough below. Everything in this file
is executable and covered by tests/test_agent_template.py, so the scaffold
cannot silently rot.

=======================================================================
THE SHAPE OF AN AGENT
=======================================================================

An agent is one pipeline phase with a uniform lifecycle::

    result = agent.run(ctx, **kwargs)   # -> AgentResult
    result.data                         # whatever _execute returned
    result.status                       # SUCCESS | PARTIAL | FAILED | SKIPPED
    result.metrics.duration_ms          # timing, exported when configured

`run()` (base_agent.py:122) handles for you: disabled -> SKIPPED short
circuit, timing + per-agent stats, correlation-id logging, the
`_on_error` degradation protocol, and metrics export. You write `_execute`
and decide the failure policy in `_on_error`.

Three degradation outcomes, chosen by `_on_error`:

    re-raise (default)       -> FAILED: orchestrator marks the feature
                                degraded and continues without it
    return fallback value    -> PARTIAL: pipeline proceeds on the fallback,
                                a warning is attached to the result
    (raise inside _on_error) -> FAILED with the secondary error

=======================================================================
WALKTHROUGH: ADDING `keyword_boost`, STEP BY STEP
=======================================================================

Suppose you want an agent that extracts salient keywords and boosts
BM25-matched docs that contain them.

1.  **Pick a base class** by dependency:

    =================  ===========================  =====================
    base               you get                      for
    =================  ===========================  =====================
    BaseAgent          lifecycle only               pure/rule-based logic
    LLMAgent           self._chat / self._chat_json prompted steps
    RetrievalAgent     self._embed / self._retrieve store-touching steps
    =================  ===========================  =====================

    Heavy numeric work does NOT go in the agent: put it in
    `radiant_rag_tpu/ops` as a jitted kernel and call it (see
    TemplateDeviceOpAgent below). Agents are host-side control flow; the
    device program is where the FLOPs belong.

2.  **Config.** Add a frozen dataclass section and register it — the
    generic section registry replaces the reference's 36 hand-written
    parsers (config.py)::

        @dataclass(frozen=True)
        class KeywordBoostConfig:
            enabled: bool = True
            max_keywords: int = 5

    then add a field `keyword_boost: KeywordBoostConfig = field(...)` to
    AppConfig. YAML/env override come for free:
    `RAD_KEYWORD_BOOST_MAX_KEYWORDS=3`.

3.  **Write the agent** (copy a template below). Contract details that
    matter:

    - `name` must be unique — it keys metrics, degradation marks, and the
      registry.
    - `_execute(ctx, **kwargs)` reads inputs from the AgentContext
      (`agents/base.py`: query, effective_queries, dense/bm25/fused docs,
      extras) or kwargs, returns its output, and — when later phases need
      it — also writes it onto ctx (`ctx.extras[self.name] = out`).
    - LLM calls ONLY through `self._chat` / `self._chat_json(expect=...)`:
      the client layers retries, backoff, and JSON extraction/repair
      (llm/json_parser.py). Never json.loads raw model output.
    - `_chat_json` returns None when repair fails — treat None as a
      degraded result, not an exception.

4.  **Wire into the orchestrator** (orchestrator.py). Construction in
    `__init__` next to its peers, then a phase call site inside the
    relevant `metrics.track_step` block::

        with metrics.track_step("keyword_boost"):
            res = self.keyword_boost.run(ctx)
            if res.status is AgentStatus.FAILED:
                metrics.mark_degraded("keyword_boost", res.error)

    Gate it twice: statically via `pipeline.use_*` (config) and, when the
    planner should control it per-query, a plan key
    (`plan.get("use_keyword_boost", True)`).

5.  **Register it** (optional but free)::

        from radiant_rag_tpu.agents.registry import register_agent
        @register_agent
        class KeywordBoostAgent(LLMAgent): ...

    Registration enables lookup by name for tools/diagnostics; the
    orchestrator wires explicitly either way.

6.  **Tests** (tests/test_agents.py patterns). The minimum set:

    - success path with a scripted MockLLMBackend / tiny TpuVectorStore
    - failure -> fallback: make the LLM raise, assert status is PARTIAL
      and the fallback value flows
    - disabled -> run() returns SKIPPED without calling anything
    - if the agent writes ctx: assert the field lands where the next
      phase reads it

=======================================================================
PITFALLS (each one observed while building the 20+ shipped agents)
=======================================================================

- **Don't cache jitted functions per-instance.** Module-level
  `@partial(jax.jit, static_argnames=...)` functions are traced once per
  static signature; an agent constructing lambdas per call re-traces per
  call and destroys throughput.
- **Static shapes.** If your device op's input length varies per query,
  pad to the engine's bucket sizes (see models/embedder.py bucketing) or
  you will compile one program per length.
- **ctx is shared, not yours.** Namespace anything you stash:
  `ctx.extras["keyword_boost"]`, never `ctx.extras["keywords"]`.
- **_on_error must be cheap and must not raise** unless you mean FAILED:
  a second LLM call inside _on_error multiplies tail latency exactly when
  the backend is already struggling.
- **Don't swallow disabled-ness**: check nothing, just pass
  `enabled=config.<section>.enabled` to `super().__init__` — run()
  handles SKIPPED uniformly and tests can assert it.
- **Confidence**: if your agent produces one, set
  `metrics.confidence` via `_after_execute` so it exports.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

from radiant_rag_tpu.agents.base import AgentContext, DocScore
from radiant_rag_tpu.agents.base_agent import (
    AgentCategory,
    BaseAgent,
    LLMAgent,
    RetrievalAgent,
)

# ---------------------------------------------------------------------------
# Result dataclass pattern
# ---------------------------------------------------------------------------
# Agents returning more than a scalar should return a small frozen dataclass
# with to_dict() (report/JSON surface). Keep it flat — nested trees make the
# report builders and the /query JSON ugly.


@dataclass(frozen=True)
class TemplateOutput:
    keywords: List[str] = field(default_factory=list)
    boosted: int = 0
    confidence: float = 0.0

    def to_dict(self) -> Dict[str, Any]:
        return {"keywords": list(self.keywords), "boosted": self.boosted,
                "confidence": self.confidence}


# ---------------------------------------------------------------------------
# TEMPLATE 1: plain agent (BaseAgent) — rule-based, no dependencies
# ---------------------------------------------------------------------------


class TemplateAgent(BaseAgent):
    """Pure-logic agent: reads ctx, computes, writes back, returns.

    Use for: heuristics, routing decisions, bookkeeping phases. If you find
    yourself embedding text or scoring docs here, you want Template 3/4.
    """

    name = "template"
    category = AgentCategory.UTILITY

    def __init__(self, max_keywords: int = 5, enabled: bool = True) -> None:
        # config flows through the constructor; the agent never reads
        # AppConfig directly (keeps agents reusable outside the app facade)
        super().__init__(enabled=enabled)
        self.max_keywords = max_keywords

    def _execute(self, ctx: AgentContext, **kwargs: Any) -> TemplateOutput:
        # naive keyword heuristic: longest unique terms of the query
        words = sorted({w.lower().strip("?,.") for w in ctx.query.split()},
                       key=len, reverse=True)
        out = TemplateOutput(keywords=words[: self.max_keywords],
                             confidence=0.5 if words else 0.0)
        ctx.extras[self.name] = out.to_dict()  # visible to later phases
        return out

    def _after_execute(self, ctx: AgentContext, result: TemplateOutput,
                       **kwargs: Any) -> TemplateOutput:
        # hook: post-process/validate; also the place to attach confidence
        return result

    def _on_error(self, ctx: AgentContext, exc: Exception, **kwargs: Any) -> TemplateOutput:
        # fallback -> PARTIAL; the pipeline proceeds with empty keywords
        return TemplateOutput()


# ---------------------------------------------------------------------------
# TEMPLATE 2: LLM agent (LLMAgent) — structured JSON contract
# ---------------------------------------------------------------------------


class TemplateLLMAgent(LLMAgent):
    """Prompted agent with a strict JSON output contract.

    The pattern every shipped LLM agent follows (planning.py, critic.py,
    fact_verification.py): one system-style instruction, the smallest
    possible JSON schema spelled out literally in the prompt, `_chat_json`
    with `expect=` for shape validation, and a None-tolerant unpack.
    """

    name = "template_llm"
    category = AgentCategory.QUERY_PROCESSING

    def __init__(self, llm, max_keywords: int = 3, enabled: bool = True) -> None:
        super().__init__(llm, enabled=enabled)
        self.max_keywords = max_keywords

    def _execute(self, ctx: AgentContext, **kwargs: Any) -> List[str]:
        arr = self._chat_json([{
            "role": "user",
            "content": (
                "Extract the most salient search keywords from the query.\n"
                f'Reply ONLY a JSON array of at most {self.max_keywords} '
                'strings, e.g. ["laser", "coherence"].\n\n'
                f"Query: {ctx.query}"
            ),
        }], expect=list)
        if not arr:  # _chat_json returns None when extraction/repair failed
            return []
        return [str(x) for x in arr][: self.max_keywords]

    def _on_error(self, ctx: AgentContext, exc: Exception, **kwargs: Any) -> List[str]:
        # LLM down -> degrade to the rule-based extraction instead of dying
        words = sorted({w.lower().strip("?,.") for w in ctx.query.split()},
                       key=len, reverse=True)
        return words[: self.max_keywords]


# ---------------------------------------------------------------------------
# TEMPLATE 3: retrieval agent (RetrievalAgent) — store + embedder
# ---------------------------------------------------------------------------


class TemplateRetrievalAgent(RetrievalAgent):
    """Store-backed agent: embed on device, retrieve, post-filter.

    `self._embed` batches through the cache-aware bucketed embedder;
    `self._retrieve` runs the store's fused two-stage device program. Both
    are jit-cached — an agent adds ZERO per-call compile cost as long as
    it sticks to the store/model surfaces.
    """

    name = "template_retrieval"
    category = AgentCategory.RETRIEVAL

    def __init__(self, store, local_models, min_similarity: float = 0.0,
                 doc_level: Optional[str] = "leaf", enabled: bool = True) -> None:
        super().__init__(store, local_models, enabled=enabled)
        self.min_similarity = min_similarity
        self.doc_level = doc_level

    def _execute(self, ctx: AgentContext, **kwargs: Any) -> List[DocScore]:
        top_k = int(kwargs.get("top_k", 5))
        # batch all effective queries in ONE device call — per-query loops
        # pay the fixed dispatch+fetch cost (27 ms on tunnel links) per query
        queries = ctx.effective_queries or [ctx.query]
        embs = self._embed_batch(queries)
        seen: Dict[str, DocScore] = {}
        batches = self.store.retrieve_by_embedding_batch(
            embs, top_k=top_k, min_similarity=self.min_similarity,
            doc_level_filter=self.doc_level)
        for hits in batches:
            for doc, score in hits:
                prev = seen.get(doc.doc_id)
                if prev is None or score > prev[1]:
                    seen[doc.doc_id] = (doc, score)
        out = sorted(seen.values(), key=lambda ds: -ds[1])[:top_k]
        ctx.dense_docs = out  # the conventional landing field for dense hits
        return out

    def _on_error(self, ctx: AgentContext, exc: Exception, **kwargs: Any) -> List[DocScore]:
        return []  # retrieval degraded -> other legs still feed fusion


# ---------------------------------------------------------------------------
# TEMPLATE 4 (tpu-specific, no reference analog): device-op agent
# ---------------------------------------------------------------------------
# When an agent needs numeric work that is neither embedding nor store
# retrieval, write a module-level jitted function (traced once per static
# shape signature) and call it from _execute. The division of labor:
# similarity/fusion/quantization kernels live in radiant_rag_tpu/ops; an
# agent-local jit like this is for small glue math that would otherwise be
# a python loop.

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from functools import partial  # noqa: E402


@partial(jax.jit, static_argnames=("k",))
def _mmr_select(doc_vecs: jax.Array, query_vec: jax.Array, lam: jax.Array, k: int):
    """Maximal-marginal-relevance over (n, d) candidate vectors: greedy
    lax.scan, no python loop over docs inside the trace."""
    n = doc_vecs.shape[0]
    rel = doc_vecs @ query_vec  # (n,)

    def step(carry, _):
        chosen_mask, max_sim = carry
        mmr = lam * rel - (1.0 - lam) * max_sim
        mmr = jnp.where(chosen_mask, -jnp.inf, mmr)
        idx = jnp.argmax(mmr)
        sim_to_new = doc_vecs @ doc_vecs[idx]
        return (chosen_mask.at[idx].set(True),
                jnp.maximum(max_sim, sim_to_new)), idx

    (_, _), picks = jax.lax.scan(
        step, (jnp.zeros(n, bool), jnp.full(n, -jnp.inf)), None, length=k)
    return picks


class TemplateDeviceOpAgent(RetrievalAgent):
    """Diversity re-selection via an agent-owned jitted kernel (MMR)."""

    name = "template_device_op"
    category = AgentCategory.POST_RETRIEVAL

    def __init__(self, store, local_models, lam: float = 0.7,
                 enabled: bool = True) -> None:
        super().__init__(store, local_models, enabled=enabled)
        self.lam = lam

    def _execute(self, ctx: AgentContext, **kwargs: Any) -> List[DocScore]:
        docs = ctx.fused_docs or ctx.dense_docs
        k = min(int(kwargs.get("top_k", 5)), len(docs))
        if k <= 1:
            return docs[:k]
        vecs = self._embed_batch([d.content for d, _ in docs])
        qv = self._embed(ctx.query)
        # lam as a traced array (not static): one compile serves all values
        picks = np.asarray(_mmr_select(jnp.asarray(vecs), jnp.asarray(qv),
                                       jnp.float32(self.lam), k))
        return [docs[int(i)] for i in picks]

    def _on_error(self, ctx: AgentContext, exc: Exception, **kwargs: Any) -> List[DocScore]:
        docs = ctx.fused_docs or ctx.dense_docs
        return docs[: int(kwargs.get("top_k", 5))]  # fall back to input order
