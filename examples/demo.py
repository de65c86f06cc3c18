#!/usr/bin/env python
"""End-to-end demo: build an app, ingest documents, search, query, report.

Runs fully offline: tiny encoder (deterministic init), mock LLM. Swap the LLM
config for a real OpenAI-compatible endpoint (`llm.base_url`) and drop the
model overrides for production shapes.

    python examples/demo.py
"""

import dataclasses
import json
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from radiant_rag_tpu.config import (AppConfig, BM25Config, ConversationConfig,
                                    CrossEncoderConfig, EmbeddingConfig,
                                    IndexConfig, StrategyMemoryConfig)
from radiant_rag_tpu.app import RadiantTPU
from radiant_rag_tpu.llm.backends import MockLLMBackend
from radiant_rag_tpu.llm.client import LLMClient

CORPUS = {
    "solar.txt": "Solar panels convert sunlight into electricity using "
                 "photovoltaic cells made of silicon. Efficiency ranges from "
                 "15 to 23 percent for commercial modules. " * 3,
    "wind.txt": "Wind turbines generate electricity from moving air. Modern "
                "offshore turbines exceed 10 megawatts of capacity. " * 3,
    "storage.txt": "Grid-scale batteries store surplus renewable energy. "
                   "Lithium iron phosphate chemistry dominates new storage "
                   "deployments for safety and cycle life. " * 3,
}

GOOD_CRITIQUE = json.dumps({"ok": True, "confidence": 0.9, "relevance": 9,
                            "faithfulness": 9, "coverage": 8, "issues": [],
                            "should_retry": False, "issue_type": "none"})


def mock_responder(messages):
    last = messages[-1]["content"]
    if "Evaluate this answer" in last:
        return GOOD_CRITIQUE
    if "atomic factual claims" in last:
        return '["Solar panels convert sunlight into electricity"]'
    if "For each claim" in last:
        return '[{"status": "supported", "evidence": "photovoltaic cells", "confidence": 0.95}]'
    if "Match each answer sentence" in last:
        return '[{"sources": ["1"], "confidence": 0.9}]'
    if "Context:" in last and "Question:" in last:
        return ("Solar panels convert sunlight into electricity with "
                "photovoltaic silicon cells at 15-23% efficiency [DOC 1].")
    if ("Rewrite each query" in last or "alternative phrasings" in last
            or "JSON array" in last):
        return "[]"
    return "{}"


def main() -> None:
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="radiant_demo_"))
    docs = tmp / "docs"
    docs.mkdir()
    for name, text in CORPUS.items():
        (docs / name).write_text(text)

    cfg = AppConfig(
        index=IndexConfig(dim=64, initial_capacity=256, data_dir=str(tmp / "idx")),
        embedding=EmbeddingConfig(dim=64, num_layers=2, num_heads=4, hidden_dim=128,
                                  vocab_size=2000, max_seq_len=64, batch_size=16),
        cross_encoder=CrossEncoderConfig(max_seq_len=64, batch_size=8),
        bm25=BM25Config(index_path=str(tmp / "bm25.json.gz"), sketch_dim=256),
        conversation=ConversationConfig(data_dir=str(tmp / "convs")),
        strategy_memory=StrategyMemoryConfig(path=str(tmp / "sm.json.gz")),
    )
    app = RadiantTPU(config=cfg, llm=LLMClient(backend=MockLLMBackend(responder=mock_responder)))

    print("== ingest ==")
    print(json.dumps(app.ingest_documents([str(docs)]), indent=2))

    print("\n== hybrid search: 'battery storage chemistry' ==")
    for i, (doc, score) in enumerate(app.search("battery storage chemistry", top_k=3), 1):
        print(f"  {i}. [{score:.3f}] {doc.source}: {doc.content[:60]!r}")

    print("\n== full agentic query ==")
    result = app.query("How efficient are solar panels?")
    print("answer:", result.answer)
    print("confidence:", result.confidence)
    print("phases:", {s['name']: f"{s['duration_ms']:.0f}ms"
                      for s in result.metrics['steps']})

    from radiant_rag_tpu.ui.reports import QueryReport

    report_path = tmp / "report.md"
    QueryReport.from_pipeline_result(result).save(str(report_path))
    print(f"\nreport written to {report_path}")


if __name__ == "__main__":
    main()
