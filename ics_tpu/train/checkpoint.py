"""Model checkpointing via orbax (model-level checkpoint/resume — the
capability the reference only had at domain level, SURVEY.md §5)."""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, variables: dict, opt_state: Any = None,
             metadata: Optional[dict] = None) -> None:
        payload = {"variables": variables}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        if metadata is not None:
            payload["metadata"] = metadata
        self._manager.save(step, args=ocp.args.StandardSave(payload))
        self._manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._manager.latest_step()

    def restore(self, step: Optional[int] = None, template: Any = None) -> dict:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            return self._manager.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._manager.restore(step)

    def close(self) -> None:
        self._manager.close()
