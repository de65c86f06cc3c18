"""Terminal UI (reference `ui/tui.py:285-822`: Textual app with query input,
per-agent timeline, and result tabs).

Textual-based when importable; otherwise falls back to a rich/plain
interactive loop so the `tui` subcommand always works.
"""

from __future__ import annotations

import threading
from typing import Any, Optional

try:
    from textual.app import App, ComposeResult
    from textual.containers import Vertical, VerticalScroll
    from textual.widgets import Footer, Header, Input, Static

    HAVE_TEXTUAL = True
except ImportError:  # pragma: no cover
    HAVE_TEXTUAL = False


if HAVE_TEXTUAL:

    class RunTimeline(Static):
        """Per-phase timing display (reference `ui/tui.py:143-195`)."""

        def show(self, steps) -> None:
            lines = []
            for s in steps:
                mark = "+" if s.get("ok", True) else "x"
                lines.append(f"  {mark} {s['name']:<24} {s['duration_ms']:8.0f} ms")
            self.update("\n".join(lines) or "(no steps)")

    class AgenticRAGApp(App):
        """Query TUI (reference `ui/tui.py:285`)."""

        CSS = """
        #answer { height: auto; border: solid green; padding: 1; }
        #timeline { height: auto; border: solid blue; padding: 1; }
        """
        BINDINGS = [("ctrl+c", "quit", "Quit")]

        def __init__(self, rag_app: Any) -> None:
            super().__init__()
            self.rag_app = rag_app

        def compose(self) -> ComposeResult:
            yield Header(show_clock=True)
            yield Input(placeholder="Ask a question…", id="query")
            with VerticalScroll():
                yield Static("(answer will appear here)", id="answer")
                yield RunTimeline("", id="timeline")
            yield Footer()

        def on_input_submitted(self, event: Input.Submitted) -> None:
            query = event.value.strip()
            if not query:
                return
            self.query_one("#answer", Static).update("thinking…")

            def work() -> None:
                try:
                    result = self.rag_app.query(query)
                    self.call_from_thread(self._show, result)
                except Exception as exc:
                    self.call_from_thread(
                        self.query_one("#answer", Static).update, f"error: {exc}")

            threading.Thread(target=work, daemon=True).start()

        def _show(self, result) -> None:
            self.query_one("#answer", Static).update(
                f"{result.answer}\n\n(confidence {result.confidence:.2f})")
            self.query_one("#timeline", RunTimeline).show(
                result.metrics.get("steps", []))


def run_tui(rag_app: Any) -> None:
    if HAVE_TEXTUAL:
        AgenticRAGApp(rag_app).run()
        return
    # plain fallback loop
    from radiant_rag_tpu.ui.display import display_answer

    print("(textual not installed — plain interactive mode; empty line exits)")
    while True:
        try:
            q = input("query> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not q:
            break
        display_answer(rag_app.query(q))
