"""User-facing surfaces: console display, reports, TUI
(reference `radiant/ui/`)."""
