#!/usr/bin/env python
"""Framework self-validation (analog of reference `tools/validate_bugfix.py`:
syntax pass, import checks, agent API surface, result structure).

Checks every module compiles, the public API surface exists, agents expose
the lifecycle contract, and an AgentResult round-trips through run().
"""

from __future__ import annotations

import importlib
import pathlib
import py_compile
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
PKG = REPO / "radiant_rag_tpu"
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

FAILED = []


def check(name, fn):
    try:
        fn()
        print(f"  ok   {name}")
    except Exception as exc:
        FAILED.append(name)
        print(f"  FAIL {name}: {type(exc).__name__}: {exc}")


def syntax_pass():
    for py in sorted(PKG.rglob("*.py")):
        py_compile.compile(str(py), doraise=True)


def imports():
    for mod in ("radiant_rag_tpu", "radiant_rag_tpu.app", "radiant_rag_tpu.orchestrator",
                "radiant_rag_tpu.agents", "radiant_rag_tpu.index", "radiant_rag_tpu.models",
                "radiant_rag_tpu.parallel", "radiant_rag_tpu.ops", "radiant_rag_tpu.llm",
                "radiant_rag_tpu.ingestion", "radiant_rag_tpu.ui.reports"):
        importlib.import_module(mod)


def agent_api():
    from radiant_rag_tpu.agents import base_agent as ba

    for attr in ("run", "execute", "_execute", "_on_error", "get_stats"):
        assert hasattr(ba.BaseAgent, attr), attr
    assert set(s.name for s in ba.AgentStatus) == {
        "SUCCESS", "PARTIAL", "FAILED", "SKIPPED", "TIMEOUT"}


def result_structure():
    from radiant_rag_tpu.agents.base import new_agent_context
    from radiant_rag_tpu.agents.base_agent import AgentResult, AgentStatus, BaseAgent

    class A(BaseAgent):
        name = "probe"

        def _execute(self, ctx, **kw):
            return 42

    r = A().run(new_agent_context("q"))
    assert isinstance(r, AgentResult) and r.data == 42
    assert r.status is AgentStatus.SUCCESS and r.metrics.agent_name == "probe"


def store_api():
    from radiant_rag_tpu.index.base import BaseVectorStore
    from radiant_rag_tpu.index.store import TpuVectorStore

    for m in ("ping", "make_doc_id", "upsert", "upsert_doc_only", "upsert_batch",
              "get_doc", "has_embedding", "delete_doc", "retrieve_by_embedding",
              "retrieve_by_embedding_quantized", "retrieve_by_embedding_batch",
              "list_doc_ids", "list_doc_ids_with_embeddings", "get_index_info",
              "drop_index", "count_documents"):
        assert callable(getattr(TpuVectorStore, m, None)), m
        assert hasattr(BaseVectorStore, m), m


def main() -> int:
    check("syntax pass (py_compile all modules)", syntax_pass)
    check("imports", imports)
    check("agent API surface", agent_api)
    check("AgentResult structure", result_structure)
    check("vector store API surface", store_api)
    total = 5
    print(f"{total - len(FAILED)}/{total} checks passed")
    return 1 if FAILED else 0


if __name__ == "__main__":
    sys.exit(main())
