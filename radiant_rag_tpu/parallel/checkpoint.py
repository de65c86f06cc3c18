"""Training + index checkpointing via orbax.

The reference has no training; its "checkpointing" is index/state persistence
(SURVEY.md §5.4 — BM25 gzip-JSON, Redis durability, strategy memory). Here
the same durable-state story covers the training loop: TrainState (params +
optimizer + step) checkpoints through orbax with retention, and the index
engine arrays round-trip through the store's own save/load
(`index/store.py`). Content-hash doc ids keep re-ingestion idempotent either
way (`utils/hashing.py`).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

logger = logging.getLogger(__name__)


class TrainCheckpointer:
    def __init__(self, directory: str, max_to_keep: int = 3) -> None:
        import orbax.checkpoint as ocp

        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            str(self.directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any) -> None:
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()
