"""RAGOrchestrator: the multi-agent query pipeline control loop.

Capability parity with reference `radiant/orchestrator.py` (1775 LoC):
  * 9 phases with a critic-retry loop (max_critic_retries), `run()` at
    `orchestrator.py:388`
  * simple-query fast path heuristic disabling decomposition/expansion
    (`orchestrator.py:353-386,428-433`)
  * targeted retry: queries + retrieval cached across retries; "context
    issue" re-retrieves (with `plan_retry` mode switching) while "answer
    issue" only regenerates (`orchestrator.py:450-573`)
  * low-confidence "I don't know" template (`orchestrator.py:100-112`)
  * strategy-memory outcome recording (`orchestrator.py:588-597`)
  * fact verification + citation in a 2-worker pool (`orchestrator.py:607-625`)
  * web-search fallback when retrieval returns nothing (`orchestrator.py:1103`)
  * per-phase RunMetrics steps + graceful degradation marks

TPU-first difference: hybrid retrieval is NOT two host threads against
external services (`orchestrator.py:994-1028`) — it is the fused device
program in `index/hybrid.py` (dense scan + BM25 + RRF in one jit), batched
over all effective queries at once.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from radiant_rag_tpu.agents.base import AgentContext, DocScore, new_agent_context
from radiant_rag_tpu.agents.automerge import HierarchicalAutoMergingAgent
from radiant_rag_tpu.agents.citation import CitationTrackingAgent
from radiant_rag_tpu.agents.context_eval import ContextEvaluationAgent
from radiant_rag_tpu.agents.critic import CriticAgent
from radiant_rag_tpu.agents.fact_verification import FactVerificationAgent
from radiant_rag_tpu.agents.fusion import RRFAgent
from radiant_rag_tpu.agents.language import LanguageDetectionAgent, TranslationAgent
from radiant_rag_tpu.agents.multihop import MultiHopReasoningAgent
from radiant_rag_tpu.agents.planning import PLAN_DEFAULTS, PlanningAgent
from radiant_rag_tpu.agents.query_processing import (
    QueryDecompositionAgent, QueryExpansionAgent, QueryRewriteAgent,
)
from radiant_rag_tpu.agents.rerank import CrossEncoderRerankingAgent
from radiant_rag_tpu.agents.retrieval import BM25RetrievalAgent, DenseRetrievalAgent, dedup_best_score
from radiant_rag_tpu.agents.strategy_memory import RetrievalStrategyMemory
from radiant_rag_tpu.agents.summarization import SummarizationAgent
from radiant_rag_tpu.agents.synthesis import AnswerSynthesisAgent
from radiant_rag_tpu.agents.tools import ToolSelector, create_default_tool_registry
from radiant_rag_tpu.agents.web_search import WebSearchAgent
from radiant_rag_tpu.config import AppConfig
from radiant_rag_tpu.index.hybrid import HybridSearcher, resolve_fused_depth
from radiant_rag_tpu.utils.metrics import RunMetrics

logger = logging.getLogger(__name__)

LOW_CONFIDENCE_RESPONSE = (
    "I don't have enough reliable information in the indexed documents to "
    "answer this question confidently. The retrieved context either doesn't "
    "cover the topic or doesn't support a grounded answer."
)


@dataclass
class PipelineResult:
    """Everything a run produced (reference `orchestrator.py:115-179`)."""

    query: str
    answer: str
    success: bool = True
    run_id: str = ""
    docs: List[DocScore] = field(default_factory=list)
    plan: Dict[str, Any] = field(default_factory=dict)
    effective_queries: List[str] = field(default_factory=list)
    dense_docs: List[DocScore] = field(default_factory=list)
    bm25_docs: List[DocScore] = field(default_factory=list)
    web_docs: List[DocScore] = field(default_factory=list)
    fused_docs: List[DocScore] = field(default_factory=list)
    reranked_docs: List[DocScore] = field(default_factory=list)
    confidence: float = 0.0
    low_confidence: bool = False
    critic_notes: List[str] = field(default_factory=list)
    retry_count: int = 0
    fact_verification: Dict[str, Any] = field(default_factory=dict)
    citations: Dict[str, Any] = field(default_factory=dict)
    language: Dict[str, Any] = field(default_factory=dict)
    tool_results: List[Dict[str, Any]] = field(default_factory=list)
    warnings: List[str] = field(default_factory=list)
    degraded: Dict[str, str] = field(default_factory=dict)
    metrics: Dict[str, Any] = field(default_factory=dict)
    conversation_id: str = ""

    def to_dict(self) -> Dict[str, Any]:
        return {
            "query": self.query,
            "answer": self.answer,
            "success": self.success,
            "run_id": self.run_id,
            "confidence": self.confidence,
            "low_confidence": self.low_confidence,
            "retry_count": self.retry_count,
            "plan": dict(self.plan),
            "effective_queries": list(self.effective_queries),
            "num_docs": len(self.docs),
            "warnings": list(self.warnings),
            "degraded": dict(self.degraded),
            "fact_verification": dict(self.fact_verification),
            "citations": dict(self.citations),
            "metrics": self.metrics,
        }


class RAGOrchestrator:
    def __init__(
        self,
        config: AppConfig,
        store,
        bm25_index,
        local_models,
        llm,
        conversation_manager=None,
        web_crawler=None,
        metrics_collector=None,
        metrics_exporter=None,
    ) -> None:
        self.config = config
        self.store = store
        self.bm25_index = bm25_index
        self.local_models = local_models
        self.llm = llm
        self.conversation_manager = conversation_manager
        self.metrics_collector = metrics_collector
        cfg = config
        if metrics_exporter is None and (cfg.metrics.prometheus_enabled or cfg.metrics.otel_enabled):
            from radiant_rag_tpu.utils.metrics_export import UnifiedMetrics

            metrics_exporter = UnifiedMetrics.create(
                prometheus_enabled=cfg.metrics.prometheus_enabled,
                prometheus_port=cfg.metrics.prometheus_port,
                otel_enabled=cfg.metrics.otel_enabled,
                otel_endpoint=cfg.metrics.otel_endpoint,
            )
        self.metrics_exporter = metrics_exporter
        if metrics_exporter is not None:
            from radiant_rag_tpu.agents.base_agent import BaseAgent

            BaseAgent.metrics_sink = metrics_exporter

        # fused device retrieval path (hybrid fast path). For a sharded pod
        # store the searcher is built over the single-device SOURCE engine —
        # calibration probes run there (same rows) and the result propagates
        # to the pod via set_fusion — but serving must NOT dispatch through
        # it (_hybrid_serves=False routes retrieval to the collective path).
        self._hybrid = None
        self._hybrid_serves = False
        if hasattr(store, "engine") and hasattr(bm25_index, "index"):
            self._hybrid = HybridSearcher(store.engine, bm25_index._index)
            self._hybrid_serves = True
        elif (hasattr(store, "source") and hasattr(store.source, "engine")
              and hasattr(bm25_index, "index")):
            self._hybrid = HybridSearcher(store.source.engine, bm25_index._index)
        if self._hybrid is not None:
            # candidate-pool deepening (retrieval.fused_depth; -1 = auto
            # 4 x fused_top_k): every search_rows through this searcher —
            # serving dispatch, the agentic path, warmup, calibration —
            # fuses at the same depth, so one jit program serves them all
            self._hybrid.default_fused_depth = resolve_fused_depth(cfg.retrieval)

        self.strategy_memory = (
            RetrievalStrategyMemory(cfg.strategy_memory.path, cfg.strategy_memory.decay)
            if cfg.strategy_memory.enabled else None
        )
        p = cfg.pipeline
        self.planning = PlanningAgent(
            llm, strategy_memory=self.strategy_memory, enabled=p.use_planning,
            memory_min_confidence=cfg.strategy_memory.min_confidence)
        self.decomposition = QueryDecompositionAgent(
            llm, max_queries=cfg.query.max_decomposed_queries, enabled=p.use_decomposition)
        self.rewrite = QueryRewriteAgent(llm, enabled=p.use_rewrite)
        self.expansion = QueryExpansionAgent(
            llm, max_expansions=cfg.query.max_expansions, enabled=p.use_expansion)
        self.dense = DenseRetrievalAgent(
            store, local_models, top_k=cfg.retrieval.dense_top_k,
            min_similarity=cfg.retrieval.min_similarity,
            search_scope=cfg.retrieval.search_scope)
        self.bm25 = BM25RetrievalAgent(bm25_index, top_k=cfg.retrieval.bm25_top_k)
        self.web_search = WebSearchAgent(
            llm, crawler=web_crawler, max_urls=cfg.web_search.max_urls,
            cache_ttl_s=cfg.web_search.cache_ttl_s,
            blocked_domains=cfg.web_search.blocked_domains,
            trigger_keywords=cfg.web_search.trigger_keywords,
            enabled=p.use_web_search)
        self.fusion = RRFAgent(rrf_k=cfg.retrieval.rrf_k, top_k=cfg.retrieval.fused_top_k,
                               enabled=p.use_rrf)
        self.automerge = HierarchicalAutoMergingAgent(
            store, min_children_to_merge=cfg.automerge.min_children_to_merge,
            max_parent_chars=cfg.automerge.max_parent_chars,
            enabled=p.use_automerge and cfg.automerge.enabled)
        self.rerank = CrossEncoderRerankingAgent(
            local_models, top_k=cfg.rerank.top_k,
            candidate_multiplier=cfg.rerank.candidate_multiplier,
            min_candidates=cfg.rerank.min_candidates,
            max_chars=cfg.rerank.max_chars,
            enabled=p.use_rerank and cfg.rerank.enabled,
            prior_weight=getattr(cfg.rerank, "prior_weight", 1.0))
        # measured CE auto-disable state (`_ensure_rerank_calibration`):
        # corpus size at last probe run (-1 = never) + the probe verdict
        self._rerank_calibrated_at = -1
        self.rerank_calibration: Dict[str, Any] = {}
        self.synthesis = AnswerSynthesisAgent(
            llm, max_context_docs=cfg.synthesis.max_context_docs,
            max_chars_per_doc=cfg.synthesis.max_chars_per_doc,
            include_history=cfg.synthesis.include_conversation_history)
        self.critic = CriticAgent(
            llm, max_chars_per_doc=cfg.critic.max_chars_per_doc,
            max_docs=cfg.critic.max_docs,
            confidence_threshold=cfg.agentic.confidence_threshold,
            give_up_confidence=cfg.agentic.give_up_confidence,
            enabled=p.use_critic)
        self.context_eval = ContextEvaluationAgent(
            llm=llm, use_llm=cfg.context_eval.use_llm,
            min_mean_score=cfg.context_eval.min_mean_score,
            min_docs=cfg.context_eval.min_docs,
            enabled=p.use_context_eval and cfg.context_eval.enabled)
        self.summarization = SummarizationAgent(
            llm, local_models=local_models,
            max_total_context_chars=cfg.summarization.max_total_context_chars,
            max_doc_chars=cfg.summarization.max_doc_chars,
            dedup_similarity=cfg.summarization.dedup_similarity,
            keep_recent_turns=cfg.summarization.keep_recent_turns,
            enabled=p.use_summarization)
        self.multihop = MultiHopReasoningAgent(
            llm, store, local_models, max_hops=cfg.multihop.max_hops,
            docs_per_hop=cfg.multihop.docs_per_hop,
            min_hop_confidence=cfg.multihop.min_hop_confidence,
            enabled=p.use_multihop and cfg.multihop.enabled)
        self.fact_verifier = FactVerificationAgent(
            llm, max_claims=cfg.fact_verification.max_claims,
            correct_answer=cfg.fact_verification.correct_answer) \
            if p.use_fact_verification and cfg.fact_verification.enabled else None
        self.citation = CitationTrackingAgent(
            llm, style=cfg.citation.style,
            min_confidence=cfg.citation.min_confidence,
            include_bibliography=cfg.citation.include_bibliography) \
            if p.use_citation and cfg.citation.enabled else None
        self.language_detector = LanguageDetectionAgent(
            llm=llm, min_confidence=cfg.language.min_confidence) \
            if cfg.language.enabled else None
        self.translator = TranslationAgent(
            llm, canonical_language=cfg.language.canonical_language,
            max_chars_per_llm_call=cfg.language.max_chars_per_llm_call) \
            if cfg.language.enabled else None
        self.tool_registry = create_default_tool_registry(cfg.tools.allow_code_execution) \
            if p.use_tools and cfg.tools.enabled else None
        self.tool_selector = ToolSelector(llm, self.tool_registry) if self.tool_registry else None

    # ------------------------------------------------------------------
    @staticmethod
    def _is_simple_query(query: str) -> bool:
        """Fast-path heuristic (reference `orchestrator.py:353-386`):
        short wh-questions and short queries without conjunctions skip
        decomposition/expansion."""
        words = query.strip().split()
        if len(words) <= 5:
            return True
        wh = ("what", "who", "when", "where", "which", "how", "is", "are", "does", "do")
        if len(words) <= 10 and words[0].lower() in wh:
            conjunctions = {"and", "or", "but", "also", "plus", "versus", "vs"}
            return not any(w.lower().strip(",.?") in conjunctions for w in words)
        return False

    # ------------------------------------------------------------------
    def run(self, query: str, conversation_id: str = "",
            conversation_history: Optional[List[Dict[str, str]]] = None,
            progress: Optional[Any] = None,
            token_sink: Optional[Any] = None) -> PipelineResult:
        """`progress(event, step_name, info)` — optional live observer called
        at every phase boundary; `token_sink(chunk)` — optional live
        generation-token callback (both drive server.py /query/stream)."""
        ctx = new_agent_context(query)
        if token_sink is not None:
            ctx.extras["token_sink"] = token_sink
        if conversation_history:
            # compress long histories, keeping recent turns verbatim
            # (reference `summarization.py` conversation compression)
            keep = self.config.summarization.keep_recent_turns
            if self.summarization.enabled and len(conversation_history) > 2 * keep:
                try:
                    conversation_history = self.summarization.compress_conversation(
                        conversation_history)
                except Exception:
                    pass
            ctx.conversation_history = conversation_history
        metrics = RunMetrics(run_id=ctx.run_id)
        metrics.observer = progress
        result = PipelineResult(query=query, answer="", run_id=ctx.run_id,
                                conversation_id=conversation_id)
        cfg = self.config

        # Phase 0: language (reference TranslatingDocumentProcessor analog at query time)
        if self.language_detector is not None and self.translator is not None:
            with metrics.track_step("language"):
                try:
                    info = self.translator.translate_with_detection(query, self.language_detector)
                    ctx.language = {"source_language": info["source_language"],
                                    "translated": info["translated"],
                                    "confidence": info["confidence"]}
                    if info["translated"]:
                        ctx.query = info["text"]
                except Exception as exc:
                    metrics.mark_degraded("language", str(exc))

        simple = self._is_simple_query(ctx.query)

        # Phase 1: planning
        with metrics.track_step("planning", simple=simple):
            plan_res = self.planning.run(ctx)
            if not plan_res.success or plan_res.status.value == "skipped":
                ctx.plan = dict(PLAN_DEFAULTS)
                ctx.retrieval_mode = ctx.plan["retrieval_mode"]
            if plan_res.status.value == "partial":
                metrics.mark_degraded("planning", plan_res.error)
            if simple:  # fast path disables heavy query processing
                ctx.plan["use_decomposition"] = False
                ctx.plan["use_expansion"] = False
                ctx.plan["use_multihop"] = False
        result.plan = dict(ctx.plan)

        # Phase 2: tools
        if self.tool_selector is not None and ctx.plan.get("tools_to_use") is not None:
            with metrics.track_step("tools"):
                try:
                    planned = [{"tool": t, "input": self._tool_input(t, ctx.query)}
                               for t in ctx.plan.get("tools_to_use", [])]
                    if not planned and not simple:
                        planned = self.tool_selector.select(ctx.query)
                    for item in planned[:3]:
                        tr = self.tool_registry.run(item["tool"], item["input"])
                        if tr.success:
                            ctx.tool_results.append(tr.to_dict())
                except Exception as exc:
                    metrics.mark_degraded("tools", str(exc))
        result.tool_results = list(ctx.tool_results)

        # Retry loop (phases 3-7)
        critique: Dict[str, Any] = {}
        retrieval_cached = False
        for attempt in range(cfg.agentic.max_critic_retries + 1):
            is_retry = attempt > 0
            if not is_retry or not retrieval_cached:
                # Phase 3: query processing
                with metrics.track_step("query_processing", attempt=attempt):
                    self._run_query_processing(ctx, metrics)
                # Phase 4: retrieval
                with metrics.track_step("retrieval", attempt=attempt,
                                        mode=ctx.retrieval_mode):
                    self._run_retrieval(ctx, metrics)
                # Phase 4.5: multihop
                if ctx.plan.get("use_multihop") and self.multihop.enabled:
                    with metrics.track_step("multihop"):
                        # the planner explicitly requested multihop — skip the
                        # agent's own indicator re-check
                        mh = self.multihop.run(ctx, force=True)
                        if mh.success and mh.data and mh.data.get("used"):
                            extra = [(d, 0.7) for d, _s in mh.data.get("docs", [])]
                            ctx.fused_docs = dedup_best_score(ctx.fused_docs + extra)
                # Phase 5: post-retrieval
                with metrics.track_step("post_retrieval"):
                    self._run_post_retrieval(ctx, metrics)
                # retrieval-quality heuristic (reference `orchestrator.py:490`)
                ctx.confidences["retrieval_quality"] = \
                    self.critic.evaluate_retrieval_quality(ctx.context_docs)
                retrieval_cached = True

            # Phase 5.5: context evaluation (pre-generation gate)
            if self.context_eval.enabled:
                with metrics.track_step("context_eval"):
                    ev_res = self.context_eval.run(ctx)
                    if ev_res.success and ev_res.data is not None:
                        ev = ev_res.data
                        exhausted_and_empty = (not ev.sufficient
                                               and attempt >= cfg.agentic.max_critic_retries
                                               and not ctx.context_docs)
                        if ev.recommendation == "abort" or exhausted_and_empty:
                            result.answer = LOW_CONFIDENCE_RESPONSE
                            result.low_confidence = True
                            result.confidence = ev.confidence
                            break
                        if ev.recommendation in ("expand_retrieval", "rewrite_query") \
                                and attempt < cfg.agentic.max_critic_retries:
                            ctx.plan["use_expansion"] = True
                            if ev.recommendation == "rewrite_query":
                                self.planning.plan_retry(ctx, {"issues": ["rewrite_query"]})
                            retrieval_cached = False
                            ctx.retry_history.append({"attempt": attempt,
                                                      "reason": ev.recommendation})
                            continue

            # Phase 5.6: summarization / context compression
            if self.summarization.enabled:
                with metrics.track_step("summarization"):
                    sum_res = self.summarization.run(ctx)
                    if sum_res.success and sum_res.data:
                        # compressed docs replace the best available stage
                        # (reference swaps in CompressedDocWrappers,
                        # `orchestrator.py:1360-1378`)
                        if ctx.reranked_docs:
                            ctx.reranked_docs = sum_res.data
                        else:
                            ctx.fused_docs = sum_res.data

            # Phase 6: generation
            with metrics.track_step("generation", attempt=attempt):
                gen_res = self.synthesis.run(ctx)
                if not gen_res.success:
                    metrics.mark_degraded("generation", gen_res.error)
                    result.answer = LOW_CONFIDENCE_RESPONSE
                    result.low_confidence = True
                    result.success = False
                    break
                result.answer = ctx.final_answer

            # Phase 7: critique
            if not self.critic.enabled or not ctx.plan.get("use_critic", True):
                result.confidence = 0.7
                break
            with metrics.track_step("critique", attempt=attempt):
                crit_res = self.critic.run(ctx)
                critique = crit_res.data if crit_res.success and crit_res.data else {}
            result.confidence = critique.get("confidence", 0.5)
            result.critic_notes = list(ctx.critic_notes)

            if not critique.get("should_retry") or attempt >= cfg.agentic.max_critic_retries:
                if self.critic.should_give_up(critique, attempt, cfg.agentic.max_critic_retries):
                    result.answer = LOW_CONFIDENCE_RESPONSE
                    result.low_confidence = True
                break
            # Retry decision (reference `orchestrator.py:537-573`): context
            # issues re-retrieve with a mutated plan; answer issues regenerate.
            issue = critique.get("issue_type", "answer")
            ctx.retry_history.append({"attempt": attempt, "issue_type": issue,
                                      "confidence": result.confidence})
            result.retry_count = attempt + 1
            if issue == "context":
                self.planning.plan_retry(ctx, critique)
                retrieval_cached = False

        # Phase 7.5: strategy memory
        if self.strategy_memory is not None:
            with metrics.track_step("strategy_memory"):
                try:
                    self.strategy_memory.record_outcome(
                        query, ctx.retrieval_mode,
                        success=not result.low_confidence,
                        confidence=result.confidence)
                except Exception as exc:
                    metrics.mark_degraded("strategy_memory", str(exc))

        # Phases 8/9: fact verification || citation (reference 2-worker pool)
        docs_for_verification = ctx.context_docs
        if result.answer and not result.low_confidence and docs_for_verification:
            with metrics.track_step("verification_and_citation"):
                with ThreadPoolExecutor(max_workers=2) as pool:
                    fv_future = pool.submit(self._run_fact_verification, ctx, result) \
                        if self.fact_verifier else None
                    cite_future = pool.submit(self._run_citation, ctx, result) \
                        if self.citation else None
                    if fv_future is not None:
                        try:
                            fv_future.result()
                        except Exception as exc:
                            metrics.mark_degraded("fact_verification", str(exc))
                    if cite_future is not None:
                        try:
                            cite_future.result()
                        except Exception as exc:
                            metrics.mark_degraded("citation", str(exc))

        # conversation turn
        if self.conversation_manager is not None and conversation_id:
            try:
                self.conversation_manager.add_turn(conversation_id, query, result.answer)
            except Exception as exc:
                metrics.mark_degraded("conversation", str(exc))

        # finalize
        result.effective_queries = list(ctx.effective_queries)
        result.dense_docs = ctx.dense_docs
        result.bm25_docs = ctx.bm25_docs
        result.web_docs = ctx.web_docs
        result.fused_docs = ctx.fused_docs
        result.reranked_docs = ctx.reranked_docs
        result.docs = ctx.context_docs
        result.language = dict(ctx.language)
        result.warnings = list(ctx.warnings)
        result.degraded = dict(metrics.degraded)
        result.metrics = metrics.to_dict()
        if self.metrics_collector is not None:
            self.metrics_collector.record(metrics)
        return result

    @staticmethod
    def _tool_input(tool: str, query: str) -> str:
        """Derive a tool input from the query (calculator: extract the
        longest arithmetic-looking span)."""
        if tool == "calculator":
            import re

            spans = re.findall(r"[\d\.\s\+\-\*\/\(\)%]+", query)
            spans = [s.strip() for s in spans if any(c.isdigit() for c in s)]
            if spans:
                return max(spans, key=len)
        return query

    # ------------------------------------------------------------------
    def _run_query_processing(self, ctx: AgentContext, metrics: RunMetrics) -> None:
        queries = [ctx.query]
        if ctx.plan.get("use_decomposition") and self.decomposition.enabled:
            res = self.decomposition.run(ctx)
            if res.success and res.data:
                queries = list(res.data)
        if ctx.plan.get("use_rewrite") and self.rewrite.enabled:
            res = self.rewrite.run(ctx, queries=queries)
            if res.success and res.data:
                queries = [res.data.get(q, q) for q in queries]
            elif not res.success:
                metrics.mark_degraded("rewrite", res.error)
        if ctx.plan.get("use_expansion") and self.expansion.enabled:
            res = self.expansion.run(ctx, queries=queries)
            if res.success and res.data:
                queries = queries + list(res.data)
        ctx.effective_queries = queries[:8]

    def _run_retrieval(self, ctx: AgentContext, metrics: RunMetrics) -> None:
        mode = ctx.retrieval_mode
        queries = ctx.effective_queries or [ctx.query]
        if mode == "hybrid" and self._hybrid is not None and self._hybrid_serves:
            self._run_hybrid_fused(ctx, queries)
        elif mode == "hybrid" and getattr(self.store, "can_hybrid", False):
            self._run_hybrid_pod(ctx, queries)
        else:
            if mode in ("hybrid", "dense"):
                res = self.dense.run(ctx, queries=queries)
                if not res.success:
                    metrics.mark_degraded("dense_retrieval", res.error)
            if mode in ("hybrid", "bm25"):
                res = self.bm25.run(ctx, queries=queries)
                if not res.success:
                    metrics.mark_degraded("bm25_retrieval", res.error)
            runs = [r for r in (ctx.dense_docs, ctx.bm25_docs) if r]
            if ctx.plan.get("use_rrf", True) and len(runs) > 1 and self.fusion.enabled:
                self.fusion.run(ctx, runs=runs)
            else:
                ctx.fused_docs = dedup_best_score([h for r in runs for h in r])[
                    : self.config.retrieval.fused_top_k]

        # web-search fallback on empty retrieval (reference `orchestrator.py:1103-1144`)
        if not ctx.fused_docs and self.web_search.enabled:
            res = self.web_search.run(ctx, force=True)
            if res.success and res.data:
                ctx.fused_docs = list(res.data)[: self.config.retrieval.fused_top_k]
        elif ctx.plan.get("use_web_search") and self.web_search.enabled:
            res = self.web_search.run(ctx)
            if res.success and res.data:
                ctx.fused_docs = self.fusion.fuse(
                    [ctx.fused_docs, res.data],
                    top_k=self.config.retrieval.fused_top_k)

    def invalidate_fusion_calibration(self) -> None:
        """Re-calibrate leg weights on the next query. Call after anything
        that changes a leg's quality out-of-band of corpus growth: embedder
        retrain/hot-swap, BM25 analyzer change (VERDICT r2 weak #6)."""
        if self._hybrid is not None:
            self._hybrid.invalidate_calibration()
        # leg quality shifts change the incoming order the CE is priced
        # against, so the rerank verdict must be re-earned too
        self._rerank_calibrated_at = -1
        if self.rerank_calibration.get("auto_disabled") and \
                self.config.pipeline.use_rerank and self.config.rerank.enabled:
            self.rerank.enabled = True  # re-measure before trusting the off

    def _ensure_rerank_calibration(self) -> None:
        """Measured CE auto-disable (VERDICT r4 #3): price the rerank stage
        against the fused order it consumes, on the LIVE corpus.

        Self-retrieval probes (ICT spans + synonym paraphrases, the fusion
        calibrator's probe family) are answered by the fused hybrid at the
        rerank candidate depth; the CE blend reranks them and both orders
        are scored by probe-target MRR. A stage that cannot beat its own
        input by rerank.auto_disable_min_gain is switched off for the
        session — it costs ~10x serving QPS when on (BENCH_NOTES r4: 1,262
        vs ~16k QPS at 1M). Re-runs after >20% corpus growth or
        invalidate_fusion_calibration() (retrain changes both orders).
        Small corpora (< 8x probe count) skip the check: the probe MRRs
        would be near-1.0 for every order and the verdict noise."""
        rcfg = self.config.rerank
        n_probes = int(getattr(rcfg, "auto_disable_probes", 64))
        if n_probes <= 0 or self._hybrid is None or not self._hybrid_serves:
            return
        if not (self.rerank.enabled or self.rerank_calibration.get("auto_disabled")):
            return
        try:
            count = int(self.store.count_documents())
        except Exception:
            return
        if self._rerank_calibrated_at >= 0 and \
                (count - self._rerank_calibrated_at) <= 0.2 * max(self._rerank_calibrated_at, 1):
            return
        if count < 8 * n_probes:
            self._rerank_calibrated_at = count
            return
        import numpy as np

        from radiant_rag_tpu.parallel.data import (
            make_paraphrase_query, make_pseudo_query,
        )

        try:
            engine = self._hybrid.engine
            rng = np.random.default_rng(17)
            rows, queries = [], []
            tries = 0
            while len(rows) < n_probes and tries < 20 * n_probes:
                tries += 1
                r = int(rng.integers(0, engine.count))
                doc_id = self.store.id_for_row(r)
                doc = self.store.get_doc(doc_id) if doc_id else None
                if doc is None or not doc.content or len(doc.content.split()) < 6:
                    continue
                q = (make_paraphrase_query(doc.content, rng)
                     if len(rows) % 2 else make_pseudo_query(doc.content, rng))
                if not q.strip():
                    continue
                rows.append(r)
                queries.append(q)
            if len(rows) < max(4, n_probes // 2):
                self._rerank_calibrated_at = count
                return
            kc = max(self.rerank.top_k * self.rerank.candidate_multiplier,
                     self.rerank.min_candidates)
            q_embs = np.asarray(self.local_models.embed(queries), np.float32)
            res = self._hybrid.search_rows(
                q_embs, queries, dense_k=kc, bm25_k=kc, fused_k=kc)
            f_scores, f_rows = res["fused"]

            def rr_incoming(qi: int) -> float:
                hits = [int(x) for x in f_rows[qi] if x >= 0]
                return 1.0 / (hits.index(rows[qi]) + 1) if rows[qi] in hits else 0.0

            was_enabled = self.rerank.enabled
            self.rerank.enabled = True  # probe the stage even if it was off
            rr_in, rr_ce = [], []
            for qi in range(len(rows)):
                docs = []
                for j, r in enumerate(f_rows[qi]):
                    r = int(r)
                    if r < 0:
                        continue
                    did = self.store.id_for_row(r)
                    d = self.store.get_doc(did) if did else None
                    if d is not None:
                        docs.append((d, float(f_scores[qi][j])))
                if not docs:
                    continue
                reranked = self.rerank.rerank(queries[qi], docs, top_k=kc)
                rr_in.append(rr_incoming(qi))
                rank = 0.0
                for pos, (d, _) in enumerate(reranked, start=1):
                    if self.store.row_of(d.doc_id) == rows[qi]:
                        rank = 1.0 / pos
                        break
                rr_ce.append(rank)
            self.rerank.enabled = was_enabled
            gain = float(np.mean(rr_ce) - np.mean(rr_in)) if rr_ce else 0.0
            min_gain = float(getattr(rcfg, "auto_disable_min_gain", 0.005))
            verdict = {
                "probes": len(rr_ce), "incoming_mrr": round(float(np.mean(rr_in)), 4),
                "rerank_mrr": round(float(np.mean(rr_ce)), 4),
                "gain": round(gain, 4), "min_gain": min_gain,
                "auto_disabled": gain < min_gain,
            }
            self.rerank_calibration = verdict
            self._rerank_calibrated_at = count
            if verdict["auto_disabled"]:
                self.rerank.enabled = False
                logger.warning(
                    "rerank auto-disabled: CE blend adds %+.4f MRR over the "
                    "fused order on %d probes (< %.3f); the stage costs ~10x "
                    "serving QPS — re-enable via rerank.auto_disable_probes=0 "
                    "or retrain the cross-encoder", gain, len(rr_ce), min_gain)
            else:
                self.rerank.enabled = True
                logger.info("rerank calibration: %s", verdict)
        except Exception as exc:  # never block retrieval on calibration
            logger.warning("rerank calibration failed (%s); stage unchanged", exc)
            self._rerank_calibrated_at = count

    def _ensure_fusion_calibration(self) -> None:
        """Lazily calibrate per-leg RRF weights against the live corpus
        (unsupervised ICT probes; `index/hybrid.py:calibrate_fusion`). Re-runs
        after >20% corpus growth. Skipped under fusion_weighting='equal'."""
        hy = self._hybrid
        if hy is None or not hy.needs_calibration():
            return
        if getattr(self.config.retrieval, "fusion_weighting", "confidence") == "equal":
            return

        def text_of(row: int):
            doc_id = self.store.id_for_row(row)
            doc = self.store.get_doc(doc_id) if doc_id else None
            return doc.content if doc is not None else None

        rcfg = self.config.retrieval
        try:
            hy.calibrate_fusion(
                self.local_models.embed, text_of,
                n_probes=getattr(rcfg, "calibration_probes", 128),
                paraphrase_fraction=getattr(
                    rcfg, "calibration_paraphrase_fraction", 0.5),
                seeds=getattr(rcfg, "calibration_seeds", 1))
            logger.info("fusion calibration: %s", hy.last_calibration)
            # Pod serving: carry the calibrated config onto a sharded store,
            # which otherwise serves equal-weight RRF regardless of what the
            # probes measured (`parallel/sharded_store.set_fusion`).
            if hasattr(self.store, "set_fusion"):
                self.store.set_fusion(hy.fusion_mode, hy.leg_weights)
        except Exception as exc:  # never block retrieval on calibration
            logger.warning("fusion calibration failed (%s); equal weights", exc)

    def _run_hybrid_fused(self, ctx: AgentContext, queries: Sequence[str]) -> None:
        """Fused on-device hybrid retrieval: one program for all queries."""
        cfg = self.config.retrieval
        # re-resolve the live BM25 index: load/rebuild replaces the object
        self._hybrid.rebind_bm25(self.bm25_index.index)
        self._ensure_fusion_calibration()
        # device-resident embed->search hand-off when available (saves the
        # blocking d2h fetch + re-upload; see hybrid.embed_queries_device)
        from radiant_rag_tpu.index.hybrid import embed_queries_device

        embeddings = None
        qdev = embed_queries_device(self.local_models, self._hybrid.engine,
                                    list(queries))
        if qdev is None:
            embeddings = self.local_models.embed(list(queries))
        level = {"leaves": 0, "parents": 1, "all": -1}.get(cfg.search_scope, -1)
        res = self._hybrid.search_rows(
            embeddings, list(queries), _qdev=qdev,
            dense_k=cfg.dense_top_k, bm25_k=cfg.bm25_top_k,
            fused_k=cfg.fused_top_k, rrf_k=cfg.rrf_k,
            mode=self.store.default_search_mode,
            rescore_multiplier=self.config.quantization.rescore_multiplier,
            level_code=level,
            fusion=getattr(cfg, "fusion_weighting", "confidence"),
        )

        def hydrate(scores: np.ndarray, rows: np.ndarray, min_sim: float = -1e30) -> List[DocScore]:
            hits: List[DocScore] = []
            for qi in range(rows.shape[0]):
                for s, r in zip(scores[qi], rows[qi]):
                    if r < 0 or s < min_sim:
                        continue
                    doc_id = self.store.id_for_row(int(r))
                    doc = self.store.get_doc(doc_id) if doc_id else None
                    if doc is not None:
                        hits.append((doc, float(s)))
            return dedup_best_score(hits)

        ctx.dense_docs = hydrate(*res["dense"], min_sim=cfg.min_similarity)
        ctx.bm25_docs = hydrate(*res["bm25"], min_sim=0.0)
        # Cross-query rank aggregation (reference `orchestrator.py:1147-1196`):
        # each effective query's fused list is one RRF run, so a doc ranked
        # well by SEVERAL decomposed/expanded queries beats a doc ranked first
        # by only one. Host-side — k is tiny.
        fs, fr = res["fused"]
        per_query_runs: List[List[DocScore]] = []
        for qi in range(fr.shape[0]):
            run: List[DocScore] = []
            for s, r in zip(fs[qi], fr[qi]):
                if r < 0:
                    continue
                doc_id = self.store.id_for_row(int(r))
                doc = self.store.get_doc(doc_id) if doc_id else None
                if doc is not None:
                    run.append((doc, float(s)))
            if run:
                per_query_runs.append(run)
        if len(per_query_runs) > 1:
            ctx.fused_docs = self.fusion.fuse(per_query_runs, top_k=cfg.fused_top_k)
        else:
            ctx.fused_docs = (per_query_runs[0] if per_query_runs else [])[: cfg.fused_top_k]

    def calibrate_pod_fusion(self) -> None:
        """Fusion calibration for a sharded (pod) store: probes run over the
        single-device source engine (same rows — `self._hybrid` was built on
        `store.source.engine`), and `_ensure_fusion_calibration` installs the
        selected mode+weights on the pod store via set_fusion."""
        if self._hybrid is None:
            return
        self._hybrid.rebind_bm25(self.bm25_index.index)
        self._ensure_fusion_calibration()

    def _run_hybrid_pod(self, ctx: AgentContext, queries: Sequence[str]) -> None:
        """Hybrid retrieval over a sharded pod store: per-shard top-k with
        collective merges (`parallel/sharded_store.search_hybrid`), base+delta
        per leg, calibrated fusion, then the same cross-query rank aggregation
        as the single-device fused path."""
        cfg = self.config.retrieval
        self.calibrate_pod_fusion()
        embeddings = self.local_models.embed(list(queries))
        res = self.store.search_hybrid(
            embeddings, list(queries), top_k=max(cfg.dense_top_k, cfg.bm25_top_k),
            fused_k=cfg.fused_top_k, rrf_k=cfg.rrf_k, return_legs=True,
            fused_depth=resolve_fused_depth(cfg))
        ctx.dense_docs = dedup_best_score(
            [h for run in res["dense"] for h in run
             if h[1] >= cfg.min_similarity])
        ctx.bm25_docs = dedup_best_score([h for run in res["bm25"] for h in run])
        per_query_runs = [run for run in res["fused"] if run]
        if len(per_query_runs) > 1:
            ctx.fused_docs = self.fusion.fuse(per_query_runs, top_k=cfg.fused_top_k)
        else:
            ctx.fused_docs = (per_query_runs[0] if per_query_runs else [])[: cfg.fused_top_k]

    def _run_post_retrieval(self, ctx: AgentContext, metrics: RunMetrics) -> None:
        if ctx.plan.get("use_automerge", True) and self.automerge.enabled:
            res = self.automerge.run(ctx)
            if not res.success:
                metrics.mark_degraded("automerge", res.error)
        if ctx.plan.get("use_rerank", True):
            self._ensure_rerank_calibration()
        if ctx.plan.get("use_rerank", True) and self.rerank.enabled:
            res = self.rerank.run(ctx)
            if not res.success:
                metrics.mark_degraded("rerank", res.error)

    def _run_fact_verification(self, ctx: AgentContext, result: PipelineResult) -> None:
        report = self.fact_verifier.verify(result.answer, ctx.context_docs, ctx.query)
        result.fact_verification = report.to_dict()
        ctx.fact_verification = result.fact_verification
        if report.corrected_answer and \
                report.overall_score < self.config.fact_verification.min_overall_score:
            result.answer = report.corrected_answer

    def _run_citation(self, ctx: AgentContext, result: PipelineResult) -> None:
        cited = self.citation.cite(result.answer, ctx.context_docs)
        result.citations = cited.to_dict()
        ctx.citations = result.citations
        if cited.matches:
            result.answer = cited.text
            if cited.bibliography:
                result.answer += "\n" + cited.bibliography

    def get_agent_stats(self) -> List[Dict[str, Any]]:
        agents = [self.planning, self.decomposition, self.rewrite, self.expansion,
                  self.dense, self.bm25, self.web_search, self.fusion,
                  self.automerge, self.rerank, self.synthesis, self.critic,
                  self.context_eval, self.summarization, self.multihop]
        return [a.get_stats() for a in agents]


class SimplifiedOrchestrator:
    """Minimal RAG: embed -> retrieve top-k -> numbered context -> LLM
    (reference `orchestrator.py:1715-1775`)."""

    def __init__(self, store, local_models, llm, top_k: int = 5) -> None:
        self.store = store
        self.local_models = local_models
        self.llm = llm
        self.top_k = top_k

    def run(self, query: str) -> str:
        emb = self.local_models.embed_single(query)
        docs = self.store.retrieve_by_embedding(emb, top_k=self.top_k)
        context = "\n\n".join(f"[{i}] {d.content[:2000]}"
                              for i, (d, _s) in enumerate(docs, start=1))
        return self.llm.chat([
            {"role": "system", "content":
                "Answer from the numbered context only. Cite like [1]."},
            {"role": "user", "content": f"Context:\n{context}\n\nQuestion: {query}"},
        ])
