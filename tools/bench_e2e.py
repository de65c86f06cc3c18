#!/usr/bin/env python
"""End-to-end agentic pipeline latency (VERDICT r2 #10).

Measures the FULL `query` pipeline — planning, retrieval, post-retrieval,
generation, critique (+ fact-verify/citation) — for three scenarios against
the reference's published budgets (2.2 s simple / 3.05 s complex,
`/root/reference/docs/POST_OPTIMIZATION_ANALYSIS.md:152-227`):

  simple  : short factual question, heuristic simple path + mock LLM
  complex : long multi-clause question, full plan (rewrite/rerank/critic)
  retry   : critic rejects the first answer (issue_type=context) once

With --llm mock (default) LLM turns cost ~0, so the numbers isolate the
ENGINE + agent-framework contribution to e2e latency — the part this
framework owns. --llm local swaps in the local transformers backend
(llm/local_backend.py) so generation cost is real.

Prints a JSON report with per-scenario wall medians and a per-phase
breakdown (RunMetrics step aggregation).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REFERENCE_BUDGETS_S = {"simple": 2.2, "complex": 3.05}

GOOD_CRITIQUE = json.dumps({
    "ok": True, "confidence": 0.9, "relevance": 9, "faithfulness": 9,
    "coverage": 8, "issues": [], "should_retry": False, "issue_type": "none",
})
BAD_CRITIQUE = json.dumps({
    "ok": False, "confidence": 0.3, "relevance": 3, "faithfulness": 4,
    "coverage": 2, "issues": ["missing context"], "should_retry": True,
    "issue_type": "context",
})
FULL_PLAN = json.dumps({
    "use_decomposition": True, "use_rewrite": True, "use_expansion": True,
    "use_rrf": True, "use_automerge": True, "use_rerank": True,
    "use_critic": True, "use_web_search": False, "use_multihop": False,
    "retrieval_mode": "hybrid", "tools_to_use": [],
})

SIMPLE_Q = "What is ATP?"
COMPLEX_Q = ("Explain how the energy currency of cells is produced and "
             "consumed across respiration and photosynthesis, and why the "
             "two processes are coupled in plant cells")


def _mock_llm(fail_critic_once: bool):
    from radiant_rag_tpu.llm.backends import MockLLMBackend
    from radiant_rag_tpu.llm.client import LLMClient

    state = {"critic_calls": 0}

    def responder(messages):
        last = messages[-1]["content"]
        if "query-planning agent" in last:
            return FULL_PLAN
        if "Evaluate this answer" in last:
            state["critic_calls"] += 1
            if fail_critic_once and state["critic_calls"] == 1:
                return BAD_CRITIQUE
            return GOOD_CRITIQUE
        if "Context:" in last and "Question:" in last:
            return ("ATP is produced in mitochondria through respiration and "
                    "consumed wherever cells do work [DOC 1].")
        if last.rstrip().endswith("]") or "JSON" in last:
            return "[]"
        return "ok"

    def reset():
        state["critic_calls"] = 0

    return LLMClient(backend=MockLLMBackend(responder=responder)), reset


def _local_llm(cfg):
    """Real transformers generation loop (zero-egress: a tiny random-weight
    GPT-2 through the same AutoTokenizer/generate path real weights use —
    measures the local-backend integration cost, not a production model's
    decode time)."""
    import dataclasses
    import tempfile

    import torch
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import (AutoTokenizer, GPT2Config, GPT2LMHeadModel,
                              PreTrainedTokenizerFast)

    from radiant_rag_tpu.llm.client import LLMClient
    from radiant_rag_tpu.llm.local_backend import LocalTransformersLLMBackend

    words = ["<unk>", "<eos>", "User", "Assistant", "System", ":", "atp",
             "is", "the", "energy", "currency", "of", "cells", "produced",
             "in", "mitochondria", "good", "answer", "ok"]
    vocab = {w: i for i, w in enumerate(words)}
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>",
                                   eos_token="<eos>", pad_token="<eos>")
    tmp = tempfile.mkdtemp(prefix="bench_e2e_tok_")
    fast.save_pretrained(tmp)
    tokenizer = AutoTokenizer.from_pretrained(tmp)
    gcfg = GPT2Config(vocab_size=len(vocab), n_positions=512, n_embd=64,
                      n_layer=4, n_head=4, bos_token_id=1, eos_token_id=1)
    torch.manual_seed(0)
    model = GPT2LMHeadModel(gcfg).eval()
    llm_cfg = dataclasses.replace(cfg.llm, backend="local", device="cpu",
                                  temperature=0.0)
    backend = LocalTransformersLLMBackend(llm_cfg, model=model,
                                          tokenizer=tokenizer)
    return LLMClient(backend=backend), (lambda: None)


def build_stack(n_docs: int, dim: int, embed_layers: int = 2,
                ce_layers: int = 2, synthetic_embs: bool = False):
    """The retrieval + model stack the orchestrator runs over.

    synthetic_embs (the >=100k tier): store embeddings are clustered
    synthetic vectors streamed into upsert_batch — query-time latency is
    what this bench measures, and the REAL embedder/cross-encoder still run
    at query time at their real sizes (embedding 1M docs through the real
    encoder would add 2+ minutes of constant without changing any latency
    being measured). Texts are zipfian token strings at this tier."""
    import jax.numpy as jnp

    from radiant_rag_tpu.config import (
        AppConfig, CrossEncoderConfig, EmbeddingConfig, IndexConfig,
        StrategyMemoryConfig,
    )
    from radiant_rag_tpu.index.bm25 import PersistentBM25Index
    from radiant_rag_tpu.index.store import TpuVectorStore
    from radiant_rag_tpu.models.bert import BertConfig
    from radiant_rag_tpu.models.cross_encoder import CrossEncoder
    from radiant_rag_tpu.models.embedder import Embedder
    from radiant_rag_tpu.models.registry import LocalNLPModels

    import tempfile

    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    cfg = AppConfig(
        index=IndexConfig(dim=dim, initial_capacity=n_docs, data_dir=tmp + "/idx"),
        embedding=EmbeddingConfig(dim=dim, num_layers=embed_layers, num_heads=4,
                                  hidden_dim=dim * 2, vocab_size=8192,
                                  max_seq_len=64, batch_size=64,
                                  checkpoint_dir=""),
        cross_encoder=CrossEncoderConfig(max_seq_len=128, batch_size=64),
        strategy_memory=StrategyMemoryConfig(path=tmp + "/sm.json.gz"),
    )
    store = TpuVectorStore(dim=dim, index_config=cfg.index,
                           quantization=cfg.quantization)
    embedder = Embedder(cfg.embedding)
    ce = CrossEncoder(cfg.cross_encoder, bert_cfg=BertConfig(
        vocab_size=8192, hidden_size=dim, num_layers=ce_layers, num_heads=4,
        intermediate_size=dim * 2,
        dtype=jnp.float32 if not synthetic_embs else jnp.bfloat16))
    models = LocalNLPModels(cfg, embedder=embedder, cross_encoder=ce)

    rng = np.random.default_rng(3)
    if synthetic_embs:
        store.reserve(n_docs)
        centers = rng.standard_normal((256, dim)).astype(np.float32)
        zipf = rng.zipf(1.3, size=(n_docs, 24)) % 30_000
        chunk = 65_536
        for s in range(0, n_docs, chunk):
            e = min(s + chunk, n_docs)
            blk = centers[rng.integers(0, 256, e - s)] + \
                0.7 * rng.standard_normal((e - s, dim)).astype(np.float32)
            blk /= np.linalg.norm(blk, axis=1, keepdims=True)
            store.upsert_batch([
                (" ".join(f"w{t}" for t in zipf[i]),
                 {"doc_level": "leaf", "source": f"d{i}.txt"}, blk[i - s])
                for i in range(s, e)])
    else:
        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
        from quality_harness import make_corpus

        docs = make_corpus(rng, n_docs)
        embs = models.embed([t for t, _ in docs])
        store.upsert_batch([(t, {"topic": tp, "source": f"d{i}.txt"}, embs[i])
                            for i, (t, tp) in enumerate(docs)])
    bm25 = PersistentBM25Index(store, path=tmp + "/bm25.json.gz")
    bm25.build_from_store()
    return cfg, store, bm25, models


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=5000)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--embed-layers", type=int, default=2)
    parser.add_argument("--ce-layers", type=int, default=2)
    parser.add_argument("--runs", type=int, default=8)
    parser.add_argument("--llm", choices=("mock", "local"), default="mock")
    parser.add_argument("--synthetic-embs", action="store_true",
                        help=">=100k tier: synthetic store embeddings, real "
                             "models at query time (see build_stack)")
    parser.add_argument("--out", default="")
    args = parser.parse_args(argv)

    from radiant_rag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from radiant_rag_tpu.orchestrator import RAGOrchestrator

    print(f"building stack ({args.docs} docs)...", file=sys.stderr)
    cfg, store, bm25, models = build_stack(
        args.docs, args.dim, embed_layers=args.embed_layers,
        ce_layers=args.ce_layers, synthetic_embs=args.synthetic_embs)

    scenarios = {
        "simple": (SIMPLE_Q, False),
        "complex": (COMPLEX_Q, False),
        "retry": (COMPLEX_Q, True),
    }
    report = {"llm": args.llm, "docs": args.docs, "runs": args.runs,
              "scenarios": {}}
    for name, (question, fail_once) in scenarios.items():
        if args.llm == "local":
            llm, reset = _local_llm(cfg)
        else:
            llm, reset = _mock_llm(fail_once)
        orch = RAGOrchestrator(cfg, store, bm25, models, llm)
        orch.run(question)  # warmup: compile + calibration outside timing
        times, phase_ms = [], {}
        for _ in range(args.runs):
            reset()
            t0 = time.perf_counter()
            result = orch.run(question)
            times.append(time.perf_counter() - t0)
            for s in result.metrics["steps"]:
                phase_ms.setdefault(s["name"], []).append(s["duration_ms"])
        med = float(np.median(times))
        entry = {
            "median_s": round(med, 4),
            "p90_s": round(float(np.quantile(times, 0.9)), 4),
            "retry_count": result.retry_count,
            "phases_ms": {k: round(float(np.median(v)), 2)
                          for k, v in sorted(phase_ms.items())},
        }
        if name in REFERENCE_BUDGETS_S:
            entry["reference_budget_s"] = REFERENCE_BUDGETS_S[name]
            entry["vs_reference"] = round(REFERENCE_BUDGETS_S[name] / med, 1)
        report["scenarios"][name] = entry
        print(f"{name}: {med*1000:.0f} ms median", file=sys.stderr)

    report["device"] = _device_kind()
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    return 0


def _device_kind() -> str:
    try:
        import jax

        return jax.devices()[0].device_kind
    except Exception:
        return "unknown"


if __name__ == "__main__":
    sys.exit(main())
