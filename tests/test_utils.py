"""Utility-layer tests: metrics, caches, conversations, exporters, profiling,
hashing, logging (reference analog: `tests/test_all.py:180-345,702-810`)."""

import time

import numpy as np
import pytest

from radiant_rag_tpu.utils.cache import EmbeddingCache, QueryCache
from radiant_rag_tpu.utils.conversation import (
    Conversation, ConversationManager, ConversationStore, ConversationTurn,
)
from radiant_rag_tpu.utils.hashing import make_doc_id, stable_hash32
from radiant_rag_tpu.utils.metrics import MetricsCollector, RunMetrics
from radiant_rag_tpu.utils.metrics_export import (
    OpenTelemetryExporter, PrometheusMetricsExporter, UnifiedMetrics,
)


# ---------------------------------------------------------------- metrics ---
def test_track_step_captures_timing_and_errors():
    rm = RunMetrics("run1")
    with rm.track_step("fast", detail=1):
        pass
    with pytest.raises(ValueError):
        with rm.track_step("boom"):
            raise ValueError("nope")
    assert [s.name for s in rm.steps] == ["fast", "boom"]
    assert rm.steps[0].ok and not rm.steps[1].ok
    assert "ValueError" in rm.steps[1].error
    assert rm.steps[0].extra == {"detail": 1}
    d = rm.to_dict()
    assert d["run_id"] == "run1" and len(d["steps"]) == 2


def test_metrics_collector_stats():
    mc = MetricsCollector(max_history=2)
    for i in range(3):
        rm = RunMetrics(f"r{i}")
        with rm.track_step("phase"):
            pass
        rm.mark_degraded("x", "why")
        mc.record(rm)
    assert len(mc.history) == 2  # bounded
    stats = mc.step_stats()
    assert stats["phase"]["count"] == 2
    assert mc.summary()["degraded_total"] == 2


# ---------------------------------------------------------------- caches ----
def test_embedding_cache_lru_eviction():
    c = EmbeddingCache(max_size=2)
    c.put("a", np.ones(3))
    c.put("b", np.ones(3) * 2)
    c.get("a")  # refresh a
    c.put("c", np.ones(3) * 3)  # evicts b
    assert c.get("b") is None
    assert c.get("a") is not None and c.get("c") is not None
    found, missing = c.get_batch(["a", "zz", "c"])
    assert set(found) == {0, 2} and missing == [1]


def test_query_cache_ttl_expiry():
    c = QueryCache(max_size=4, ttl_s=0.05)
    c.put("op", "q", "value", k=1)
    assert c.get("op", "q", k=1) == "value"
    assert c.get("op", "q", k=2) is None  # kwargs are part of the key
    time.sleep(0.06)
    assert c.get("op", "q", k=1) is None  # expired


# ---------------------------------------------------------------- hashing ---
def test_doc_id_meta_sensitivity():
    a = make_doc_id("text", {"source": "s", "irrelevant": "x"})
    b = make_doc_id("text", {"source": "s", "irrelevant": "y"})
    c = make_doc_id("text", {"source": "OTHER"})
    assert a == b  # non-identity keys ignored
    assert a != c
    assert stable_hash32("abc") == stable_hash32("abc")
    assert stable_hash32("abc") != stable_hash32("abd")


# ------------------------------------------------------------ conversations -
def test_conversation_store_ttl(tmp_path):
    store = ConversationStore(str(tmp_path), ttl_s=0.05)
    conv = Conversation("c1")
    conv.add_turn("q", "a")
    store.save(conv)
    assert store.load("c1") is not None
    time.sleep(0.06)
    assert store.load("c1") is None  # expired and pruned
    assert store.list_ids() == []


def test_conversation_manager_flow(tmp_path):
    mgr = ConversationManager(data_dir=str(tmp_path), max_turns=2)
    cid = mgr.start_conversation()
    mgr.add_turn(cid, "q1", "a1")
    mgr.add_turn(cid, "q2", "a2")
    mgr.add_turn(cid, "q3", "a3")  # exceeds max_turns -> oldest dropped
    conv = mgr.get(cid)
    assert len(conv.turns) == 2
    assert conv.turns[0].query == "q2"
    history = mgr.get_history_for_synthesis(cid)
    assert history[-1] == {"role": "assistant", "content": "a3"}
    # reload from disk via a fresh manager
    mgr2 = ConversationManager(data_dir=str(tmp_path))
    assert len(mgr2.get(cid).turns) == 2


def test_conversation_path_sanitization(tmp_path):
    store = ConversationStore(str(tmp_path))
    conv = Conversation("../../evil")
    store.save(conv)
    files = list(tmp_path.glob("*.json"))
    assert len(files) == 1
    assert ".." not in files[0].name and "/" not in files[0].name


# ---------------------------------------------------------------- export ----
def test_prometheus_exporter_records():
    exp = PrometheusMetricsExporter(port=0, namespace="radiant_test")
    from radiant_rag_tpu.agents.base_agent import AgentMetrics

    m = AgentMetrics(agent_name="probe", started=0.0, ended=0.1, confidence=0.8)
    exp.record_agent(m)  # must not raise regardless of lib availability
    exp.record_error("probe")
    with exp.track_run():
        pass


def test_otel_exporter_noop_context():
    exp = OpenTelemetryExporter()  # no endpoint
    from radiant_rag_tpu.agents.base_agent import AgentMetrics

    with exp.trace_agent("probe", AgentMetrics(agent_name="probe")):
        pass


def test_unified_metrics_facade():
    um = UnifiedMetrics.create(prometheus_enabled=False, otel_enabled=False)
    from radiant_rag_tpu.agents.base_agent import AgentMetrics

    um.record_agent(AgentMetrics(agent_name="x"))
    with um.trace_agent("x"):
        pass


# ---------------------------------------------------------------- profiling -
def test_device_timer_forces_materialization():
    import jax.numpy as jnp

    from radiant_rag_tpu.utils.profiling import device_timer

    x = jnp.ones((64, 64))
    stats = device_timer(lambda: x @ x, iters=3, warmup=1)
    assert stats["median_ms"] >= 0 and stats["iters"] == 3
    assert stats["min_ms"] <= stats["median_ms"] <= stats["max_ms"]


def test_annotate_is_safe():
    from radiant_rag_tpu.utils.profiling import annotate

    with annotate("region"):
        pass
