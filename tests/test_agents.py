"""Agent framework tests: lifecycle, registry, tools, strategy memory,
individual agents with mock LLMs.

Reference analog: `tests/test_base_agent_lifecycle.py` (fake agents as
fixtures exercising success/failure/disabled/fallback/metrics) and
`tests/test_all.py:1104-1238` (registry), `:976-1061` (JSONParser).
"""

import json

import numpy as np
import pytest

from radiant_rag_tpu.agents.base import new_agent_context
from radiant_rag_tpu.agents.base_agent import (
    AgentCategory, AgentError, AgentStatus, BaseAgent, LLMAgent,
)
from radiant_rag_tpu.agents.registry import AgentRegistry, register_agent
from radiant_rag_tpu.agents.tools import (
    CalculatorTool, CodeExecutionTool, ToolRegistry, create_default_tool_registry,
)
from radiant_rag_tpu.agents.strategy_memory import RetrievalStrategyMemory
from radiant_rag_tpu.llm.backends import MockLLMBackend
from radiant_rag_tpu.llm.client import LLMClient
from radiant_rag_tpu.llm.json_parser import JSONParser


# ---------------------------------------------------------------- lifecycle --
class SimpleTestAgent(BaseAgent):
    name = "simple_test"

    def __init__(self, fail=False, **kw):
        super().__init__(**kw)
        self.fail = fail
        self.hooks = []

    def _before_execute(self, ctx, **kw):
        self.hooks.append("before")

    def _execute(self, ctx, **kw):
        self.hooks.append("execute")
        if self.fail:
            raise RuntimeError("boom")
        return {"ok": True, "echo": kw.get("extra")}

    def _after_execute(self, ctx, result, **kw):
        self.hooks.append("after")
        return result


class FallbackTestAgent(SimpleTestAgent):
    name = "fallback_test"

    def _on_error(self, ctx, exc, **kw):
        self.hooks.append("on_error")
        return {"fallback": True}


def test_lifecycle_success():
    agent = SimpleTestAgent()
    ctx = new_agent_context("q")
    result = agent.run(ctx, extra=42)
    assert result.success and result.status is AgentStatus.SUCCESS
    assert result.data == {"ok": True, "echo": 42}
    assert agent.hooks == ["before", "execute", "after"]
    assert result.metrics.duration_ms >= 0
    assert result.metrics.agent_name == "simple_test"


def test_lifecycle_failure_no_fallback():
    agent = SimpleTestAgent(fail=True)
    result = agent.run(new_agent_context("q"))
    assert not result.success and result.status is AgentStatus.FAILED
    assert "boom" in result.error


def test_lifecycle_fallback_partial():
    agent = FallbackTestAgent(fail=True)
    result = agent.run(new_agent_context("q"))
    assert result.success and result.status is AgentStatus.PARTIAL
    assert result.data == {"fallback": True}
    assert "on_error" in agent.hooks
    assert result.warnings


def test_lifecycle_disabled_skipped():
    agent = SimpleTestAgent(enabled=False)
    result = agent.run(new_agent_context("q"))
    assert result.status is AgentStatus.SKIPPED
    assert agent.hooks == []


def test_execute_raises_on_failure():
    agent = SimpleTestAgent(fail=True)
    with pytest.raises(AgentError):
        agent.execute(new_agent_context("q"))


def test_agent_stats_accumulate():
    agent = SimpleTestAgent()
    ctx = new_agent_context("q")
    agent.run(ctx)
    agent.run(ctx)
    stats = agent.get_stats()
    assert stats["runs"] == 2 and stats["failures"] == 0


def test_llm_agent_requires_llm():
    class L(LLMAgent):
        name = "l"

        def _execute(self, ctx, **kw):
            return "x"

    with pytest.raises(ValueError):
        L(None)


def test_correlation_id_propagates():
    agent = SimpleTestAgent()
    ctx = new_agent_context("q")
    agent.run(ctx)
    assert agent.log.correlation_id == ctx.run_id


# ---------------------------------------------------------------- registry --
def test_registry_roundtrip():
    reg = AgentRegistry()
    reg.register(lambda x: x * 2, name="doubler", category="math", tags=["t1"])
    assert "doubler" in reg
    assert reg.invoke("doubler", 21) == 42
    assert reg.list_agents(category="math")[0].name == "doubler"
    assert reg.find_by_tag("t1")
    assert reg.unregister("doubler")
    assert "doubler" not in reg
    with pytest.raises(KeyError):
        reg.invoke("doubler")


def test_register_decorator():
    reg = AgentRegistry()

    @register_agent("deco-agent", description="d", registry=reg)
    def fn():
        return "hi"

    assert reg.invoke("deco-agent") == "hi"


# ---------------------------------------------------------------- tools -----
def test_calculator_whitelist():
    calc = CalculatorTool()
    assert calc.run("2*(3+4)").output == 14
    assert calc.run("sqrt(16) + 1").output == 5.0
    assert abs(calc.run("pi").output - 3.14159) < 1e-4
    assert calc.run("min(3, 1, 2)").output == 1


def test_calculator_rejects_code():
    calc = CalculatorTool()
    assert not calc.run("__import__('os')").success
    assert not calc.run("open('/etc/passwd')").success
    assert not calc.run("'a' * 99999999").success
    assert not calc.run("2**99999").success  # exponent cap


def test_code_execution_gated():
    tool = CodeExecutionTool(allowed=False)
    assert not tool.run("result = 1").success
    tool = CodeExecutionTool(allowed=True)
    r = tool.run("result = sum(range(10))")
    assert r.success and r.output == 45
    assert not tool.run("import os").success  # no __import__ in scope


def test_default_tool_registry():
    reg = create_default_tool_registry()
    assert reg.run("calculator", "1+1").output == 2
    assert not reg.run("code_execution", "result=1").success  # disabled by default
    assert not reg.run("nope", "x").success


# ---------------------------------------------------------------- memory ----
def test_strategy_memory_learning(tmp_path):
    mem = RetrievalStrategyMemory(path=str(tmp_path / "m.json.gz"))
    assert mem.classify("what is X") == "definition"
    assert mem.classify("how do I fly") == "howto"
    # no data -> no recommendation
    mode, conf = mem.recommend_strategy("what is Y")
    assert mode is None
    for _ in range(6):
        mem.record_outcome("what is A", "bm25", success=True, persist=False)
        mem.record_outcome("what is A", "dense", success=False, persist=False)
    mode, conf = mem.recommend_strategy("what is B")
    assert mode == "bm25" and conf > 0.5
    # persistence round-trip
    mem.save()
    mem2 = RetrievalStrategyMemory(path=str(tmp_path / "m.json.gz"))
    mode2, conf2 = mem2.recommend_strategy("what is C")
    assert mode2 == "bm25"


# ---------------------------------------------------------------- parser ----
def test_json_parser_fenced():
    assert JSONParser.parse('Here:\n```json\n{"a": 1}\n```\ndone') == {"a": 1}


def test_json_parser_bare_and_comments():
    assert JSONParser.parse('noise {"a": 1, // note\n "b": [1,2,],} tail') == \
        {"a": 1, "b": [1, 2]}


def test_json_parser_truncation_repair():
    assert JSONParser.parse('{"items": [{"x": 1}, {"y": 2')["items"][0] == {"x": 1}
    assert JSONParser.parse('{"text": "unterminated') == {"text": "unterminated"}


def test_json_parser_type_validation():
    assert JSONParser.parse('[1,2,3]', expect=list) == [1, 2, 3]
    assert JSONParser.parse('[1,2,3]', expect=dict) is None
    assert JSONParser.parse('no json here') is None


def test_chat_json_clarification_retry():
    backend = MockLLMBackend(responder=lambda msgs: (
        "not json at all" if len(msgs) <= 1 else '{"fixed": true}'))
    client = LLMClient(backend=backend)
    out = client.chat_json([{"role": "user", "content": "give json"}])
    assert out == {"fixed": True}
    assert backend.call_count == 2


def test_llm_retry_on_retryable_error():
    from radiant_rag_tpu.llm.backends import BaseLLMBackend, LLMError
    from radiant_rag_tpu.config import LLMConfig

    class Flaky(BaseLLMBackend):
        def __init__(self):
            self.n = 0

        def chat(self, messages, **kw):
            self.n += 1
            if self.n < 3:
                raise LLMError("503", status=503)
            return "recovered"

    client = LLMClient(LLMConfig(retry_backoff_s=0.0), backend=Flaky())
    assert client.chat([{"role": "user", "content": "x"}]) == "recovered"
    assert client.backend.n == 3


def test_llm_no_retry_on_4xx():
    from radiant_rag_tpu.llm.backends import BaseLLMBackend, LLMError
    from radiant_rag_tpu.config import LLMConfig

    class Denied(BaseLLMBackend):
        def __init__(self):
            self.n = 0

        def chat(self, messages, **kw):
            self.n += 1
            raise LLMError("401", status=401)

    client = LLMClient(LLMConfig(retry_backoff_s=0.0), backend=Denied())
    with pytest.raises(LLMError):
        client.chat([{"role": "user", "content": "x"}])
    assert client.backend.n == 1


# ------------------------------------------------------- model backends -----
def test_llm_reranking_backend():
    from radiant_rag_tpu.llm.model_backends import LLMRerankingBackend

    backend = LLMRerankingBackend(llm_client("[2, 9, 5]"))
    ranked = backend.rerank("q", ["a", "b", "c"])
    assert [i for i, _ in ranked] == [1, 2, 0]
    assert ranked[0][1] == 9.0


def test_jax_embedding_backend_factory():
    from radiant_rag_tpu.config import AppConfig, EmbeddingConfig
    from radiant_rag_tpu.llm.model_backends import create_embedding_backend
    import dataclasses

    cfg = dataclasses.replace(AppConfig(), embedding=EmbeddingConfig(
        dim=32, num_layers=1, num_heads=2, hidden_dim=64, vocab_size=500,
        max_seq_len=32, batch_size=4))
    backend = create_embedding_backend(cfg)
    out = backend.embed(["hello", "world"])
    assert out.shape == (2, 32)
    assert backend.embedding_dimension == 32


def llm_client(default):
    return LLMClient(backend=MockLLMBackend(default=default))
