"""TUI view model (ui/tui_model.py): live timeline from observer events,
tab rendering from a PipelineResult, report export. Headless — no textual
required (reference parity target: ui/tui.py tabs + timeline widgets)."""

from radiant_rag_tpu.index.doc import StoredDoc
from radiant_rag_tpu.orchestrator import PipelineResult
from radiant_rag_tpu.ui.tui_model import TAB_NAMES, QuerySession, run_query


def _result():
    d1 = StoredDoc("id1", "alpha content about lasers", {"source": "a.txt"})
    d2 = StoredDoc("id2", "beta content about optics", {"source": "b.txt"})
    return PipelineResult(
        query="what is a laser?",
        answer="A laser emits coherent light.",
        confidence=0.83,
        plan={"use_decomposition": False, "retrieval_k": 10},
        effective_queries=["what is a laser?", "laser physics"],
        dense_docs=[(d1, 0.91)], bm25_docs=[(d2, 7.3)],
        fused_docs=[(d1, 0.05), (d2, 0.04)], reranked_docs=[(d1, 2.2)],
        docs=[(d1, 2.2)],
        metrics={"steps": [
            {"name": "planning", "duration_ms": 12.0, "ok": True},
            {"name": "retrieval", "duration_ms": 48.0, "ok": True},
            {"name": "synthesis", "duration_ms": 200.0, "ok": False,
             "error": "LLMError: boom"},
        ], "total_ms": 260.0},
    )


def test_observer_builds_timeline():
    s = QuerySession()
    s.begin()
    s.observer("step_start", "planning", {})
    s.observer("step_end", "planning", {"ok": True, "duration_ms": 12.5})
    s.observer("step_start", "retrieval", {})
    lines = s.timeline_lines()
    assert len(lines) == 2
    assert "+" in lines[0] and "planning" in lines[0] and "12" in lines[0]
    assert "…" in lines[1] and "retrieval" in lines[1]  # still running
    s.observer("step_end", "retrieval", {"ok": False, "duration_ms": 3.0,
                                         "error": "ValueError: x"})
    assert "x" in s.timeline_lines()[1]


def test_all_tabs_render():
    s = QuerySession()
    s.finish(result=_result())
    for name in TAB_NAMES:
        text = s.tab(name)
        assert isinstance(text, str) and text


def test_tab_contents():
    s = QuerySession()
    s.finish(result=_result())
    assert "coherent light" in s.tab("overview")
    assert "0.83" in s.tab("overview")
    assert "retrieval_k" in s.tab("plan")
    assert "laser physics" in s.tab("queries")
    retrieval = s.tab("retrieval")
    assert "--- dense (1) ---" in retrieval and "a.txt" in retrieval
    assert "--- bm25 (1) ---" in retrieval and "b.txt" in retrieval
    agents = s.tab("agents")
    assert "planning" in agents and "synthesis" in agents
    assert "LLMError" in agents  # failed step shows its error
    assert "TOTAL" in agents
    assert "total_ms" in s.tab("metrics")


def test_tabs_before_result():
    s = QuerySession()
    assert s.tab("overview") == "(no result yet)"
    assert s.tab("logs") == "(no logs)"


def test_report_markdown():
    s = QuerySession()
    s.finish(result=_result())
    md = s.report_markdown()
    assert md.startswith("# Query report")
    for section in ("## Answer", "## Plan", "## Agents"):
        assert section in md
    assert "coherent light" in md


def test_run_query_feeds_observer_via_app():
    """run_query wires the observer into the real app.query(progress=...)
    path (not a mock of the signature)."""

    class FakeApp:
        def query(self, q, conversation_id="", progress=None):
            assert progress is not None
            progress("step_start", "retrieval", {})
            progress("step_end", "retrieval", {"ok": True, "duration_ms": 5.0})
            return _result()

    s = QuerySession()
    run_query(s, FakeApp(), "what is a laser?")
    assert not s.running and s.error is None
    assert s.result is not None
    assert any("retrieval" in l for l in s.timeline_lines())


def test_run_query_captures_errors():
    class BoomApp:
        def query(self, q, conversation_id="", progress=None):
            raise RuntimeError("backend down")

    s = QuerySession()
    run_query(s, BoomApp(), "q")
    assert s.error == "backend down"
    assert not s.running


def test_app_facade_progress_passthrough(monkeypatch):
    """RadiantTPU.query forwards progress= to the orchestrator (integration
    with the real facade signature, mocked orchestrator)."""
    from radiant_rag_tpu.app import RadiantTPU

    captured = {}

    class FakeOrch:
        def run(self, q, conversation_id="", conversation_history=None,
                progress=None, token_sink=None):
            captured["progress"] = progress
            return _result()

    app = RadiantTPU.__new__(RadiantTPU)
    app.orchestrator = FakeOrch()
    app.conversations = None
    from radiant_rag_tpu.utils.cache import QueryCache

    app.query_cache = QueryCache(4, 60)
    sentinel = object()
    app.query("q", progress=sentinel, use_cache=False)
    assert captured["progress"] is sentinel
