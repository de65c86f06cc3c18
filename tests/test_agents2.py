"""Individual pipeline agent tests with scripted LLMs: citation styles,
language detection/translation, multihop detection, summarization dedup,
context evaluation, fact verification, planning retry mutation."""

import json

import numpy as np
import pytest

from radiant_rag_tpu.agents.base import new_agent_context
from radiant_rag_tpu.agents.citation import CitationStyle, CitationTrackingAgent
from radiant_rag_tpu.agents.context_eval import ContextEvaluationAgent
from radiant_rag_tpu.agents.fact_verification import ClaimStatus, FactVerificationAgent
from radiant_rag_tpu.agents.language import LanguageDetectionAgent, TranslationAgent
from radiant_rag_tpu.agents.multihop import MultiHopReasoningAgent
from radiant_rag_tpu.agents.planning import PLAN_DEFAULTS, PlanningAgent
from radiant_rag_tpu.agents.query_processing import QueryRewriteAgent
from radiant_rag_tpu.agents.summarization import SummarizationAgent
from radiant_rag_tpu.agents.critic import CriticAgent
from radiant_rag_tpu.index.doc import StoredDoc
from radiant_rag_tpu.llm.backends import MockLLMBackend
from radiant_rag_tpu.llm.client import LLMClient


def llm(script=None, default="ok", responder=None):
    return LLMClient(backend=MockLLMBackend(script=script, default=default,
                                            responder=responder))


def docs(*contents):
    return [(StoredDoc(f"id{i}", c, {"source": f"s{i}.txt"}), 0.9 - 0.1 * i)
            for i, c in enumerate(contents)]


# ---------------------------------------------------------------- planning --
def test_planning_validates_and_defaults():
    agent = PlanningAgent(llm(default=json.dumps(
        {"use_rerank": "yes", "retrieval_mode": "bogus", "tools_to_use": "nope"})))
    ctx = new_agent_context("q")
    plan = agent.execute(ctx)
    assert plan["use_rerank"] is True  # truthy coercion
    assert plan["retrieval_mode"] == "hybrid"  # invalid -> default
    assert plan["tools_to_use"] == []  # non-list -> empty


def test_planning_fallback_on_garbage():
    agent = PlanningAgent(llm(default="not json"))
    ctx = new_agent_context("q")
    plan = agent.execute(ctx)
    assert plan == {**PLAN_DEFAULTS}  # chat_json returns None -> validated defaults


def test_plan_retry_mode_cycling():
    agent = PlanningAgent(llm(default="{}"))
    ctx = new_agent_context("q")
    ctx.plan = dict(PLAN_DEFAULTS, use_expansion=True, use_decomposition=True)
    modes = [ctx.plan["retrieval_mode"]]
    for _ in range(3):
        agent.plan_retry(ctx, {"issues": ["something vague"]})
        modes.append(ctx.plan["retrieval_mode"])
    assert modes == ["hybrid", "dense", "bm25", "hybrid"]


def test_plan_retry_enables_expansion_on_coverage_issue():
    agent = PlanningAgent(llm(default="{}"))
    ctx = new_agent_context("q")
    ctx.plan = dict(PLAN_DEFAULTS)
    assert not ctx.plan["use_expansion"]
    agent.plan_retry(ctx, {"issues": ["coverage is missing key aspects"]})
    assert ctx.plan["use_expansion"]
    assert ctx.plan["retrieval_mode"] == "hybrid"  # unchanged when plan mutated


# ---------------------------------------------------------------- rewrite ---
def test_rewrite_batch_falls_back_on_wrong_cardinality():
    agent = QueryRewriteAgent(llm(default='["only one"]'))
    out = agent.rewrite_batch(["q1", "q2"])
    assert out == {"q1": "q1", "q2": "q2"}


# ---------------------------------------------------------------- critic ----
def test_critic_confidence_derived_from_scores():
    agent = CriticAgent(llm(default="{}"))
    norm = agent.normalize({"relevance": 9, "faithfulness": 9, "coverage": 9,
                            "confidence": "bad"})
    np.testing.assert_allclose(norm["confidence"], 0.9)
    norm = agent.normalize({"relevance": 99, "coverage": -5})
    assert norm["relevance"] == 10 and norm["coverage"] == 0


def test_critic_should_give_up():
    agent = CriticAgent(llm(default="{}"), give_up_confidence=0.2,
                        confidence_threshold=0.5)
    assert agent.should_give_up({"confidence": 0.1}, attempt=0, max_retries=2)
    assert not agent.should_give_up({"confidence": 0.4}, attempt=0, max_retries=2)
    assert agent.should_give_up({"confidence": 0.4}, attempt=2, max_retries=2)
    assert not agent.should_give_up({"confidence": 0.9}, attempt=2, max_retries=2)


def test_critic_retrieval_quality():
    agent = CriticAgent(llm(default="{}"))
    assert agent.evaluate_retrieval_quality([]) == 0.0
    q = agent.evaluate_retrieval_quality(docs("a", "b"))
    np.testing.assert_allclose(q, (0.9 + 0.8) / 2)


# ---------------------------------------------------------------- citation --
def test_citation_inline_markers_and_bibliography():
    answer = "Mitochondria produce ATP for the cell. Plants use photosynthesis instead."
    arr = json.dumps([
        {"sources": ["1"], "confidence": 0.9},
        {"sources": ["2"], "confidence": 0.8},
    ])
    agent = CitationTrackingAgent(llm(default=arr), style="inline")
    cited = agent.cite(answer, docs("ATP is made in mitochondria",
                                    "Photosynthesis happens in plants"))
    assert "[1]" in cited.text and "[2]" in cited.text
    assert "Sources:" in cited.bibliography
    assert len(cited.audit_id) == 16


@pytest.mark.parametrize("style,marker", [
    ("footnote", "[^1]"), ("enterprise", "[DOC-1]"),
])
def test_citation_styles(style, marker):
    arr = json.dumps([{"sources": ["1"], "confidence": 0.9}])
    agent = CitationTrackingAgent(llm(default=arr), style=style)
    cited = agent.cite("A single factual sentence about mitochondria here.",
                       docs("mitochondria text"))
    assert marker in cited.text


def test_citation_regex_fallback():
    agent = CitationTrackingAgent(llm(default="not json"), style="inline")
    cited = agent.cite(
        "The mitochondria generates cellular energy through respiration processes.",
        docs("mitochondria cellular energy respiration in detail explained"))
    assert cited.matches  # token-overlap fallback found the source


# ---------------------------------------------------------------- language --
def test_language_heuristic_detection():
    det = LanguageDetectionAgent()
    assert det.detect("the quick brown fox is one of the animals")[0] == "en"
    assert det.detect("der hund ist nicht auf der straße und das ist gut")[0] == "de"
    assert det.detect("это русский текст и он написан на русском языке")[0] == "ru"
    code, conf = det.detect("日本語のテキストです。これはテストです。")
    assert code == "ja"


def test_translation_splits_long_text():
    calls = []

    def responder(messages):
        calls.append(messages[-1]["content"])
        return "TRANSLATED"

    agent = TranslationAgent(llm(responder=responder), max_chars_per_llm_call=100)
    text = "\n\n".join(["para " + "x" * 40] * 5)  # ~230 chars
    out = agent.translate(text, target="en")
    assert out.count("TRANSLATED") == len(calls) >= 2


def test_translate_with_detection_skips_canonical():
    agent = TranslationAgent(llm(default="SHOULD NOT BE CALLED"))
    det = LanguageDetectionAgent()
    res = agent.translate_with_detection(
        "the quick brown fox is an animal of the forest", det)
    assert res["translated"] is False
    assert res["text"].startswith("the quick")


# ---------------------------------------------------------------- multihop --
def test_multihop_detection_regex():
    agent = MultiHopReasoningAgent.__new__(MultiHopReasoningAgent)  # no LLM needed
    assert agent.detect("Who is the author of the book that won in 1997?")[0]
    assert agent.detect("What is the difference between X and Y?")[0]
    assert not agent.detect("What is photosynthesis?")[0]


# ------------------------------------------------------------- summarization
def test_summarization_dedup_with_embedder():
    class FakeModels:
        def embed(self, texts):
            # two near-identical, one distinct
            base = np.eye(3, 8, dtype=np.float32)
            out = [base[0], base[0] + 0.01, base[2]]
            return np.stack([v / np.linalg.norm(v) for v in out])

    agent = SummarizationAgent(llm(default="summary"), local_models=FakeModels(),
                               max_total_context_chars=10, dedup_similarity=0.9)
    d = docs("first duplicate text", "second duplicate text", "unique other")
    from radiant_rag_tpu.agents.summarization import CompressionStats

    stats = CompressionStats()
    kept = agent.dedup(d, stats)
    assert len(kept) == 2 and stats.docs_deduped == 1


def test_summarization_compresses_long_docs():
    agent = SummarizationAgent(llm(default="SHORT SUMMARY"), local_models=None,
                               max_total_context_chars=100, max_doc_chars=50)
    d = docs("x" * 200, "short")
    ctx = new_agent_context("q")
    ctx.fused_docs = d
    out = agent.execute(ctx)
    assert out[0][0].content == "SHORT SUMMARY"
    assert out[0][0].meta["compressed"] is True
    assert out[1][0].content == "short"


# ------------------------------------------------------------- context eval -
def test_context_eval_heuristic_gates():
    agent = ContextEvaluationAgent()
    ev = agent.heuristic_eval([])
    assert not ev.sufficient and ev.recommendation == "expand_retrieval"
    low = [(StoredDoc("a", "x", {}), 0.05), (StoredDoc("b", "y", {}), 0.04)]
    ev = agent.heuristic_eval(low)
    assert not ev.sufficient and ev.recommendation == "rewrite_query"
    good = [(StoredDoc("a", "x", {}), 0.8)]
    ev = agent.heuristic_eval(good)
    assert ev.sufficient and ev.recommendation == "proceed"


# ------------------------------------------------------- fact verification --
def test_fact_verification_flow():
    def responder(messages):
        last = messages[-1]["content"]
        if "atomic factual claims" in last:
            return '["The sky is green", "Water is wet"]'
        if "For each claim" in last:
            return json.dumps([
                {"status": "contradicted", "evidence": "sky is blue", "confidence": 0.9},
                {"status": "supported", "evidence": "water wetness", "confidence": 0.95},
            ])
        return "CORRECTED ANSWER"

    agent = FactVerificationAgent(llm(responder=responder))
    report = agent.verify("The sky is green. Water is wet.",
                          docs("The sky is blue. Water is wet."))
    assert len(report.claims) == 2
    assert report.claims[0].status is ClaimStatus.CONTRADICTED
    assert report.claims[1].status is ClaimStatus.SUPPORTED
    assert report.needs_correction
    assert report.corrected_answer == "CORRECTED ANSWER"
    np.testing.assert_allclose(report.overall_score, 0.25)  # (1 + -0.5)/2 clipped


def test_fact_verification_all_supported_no_correction():
    def responder(messages):
        last = messages[-1]["content"]
        if "atomic factual claims" in last:
            return '["Water is wet"]'
        if "For each claim" in last:
            return '[{"status": "supported", "confidence": 1.0}]'
        raise AssertionError("correction should not be requested")

    agent = FactVerificationAgent(llm(responder=responder))
    report = agent.verify("Water is wet.", docs("Water is wet."))
    assert report.overall_score == 1.0 and not report.needs_correction
