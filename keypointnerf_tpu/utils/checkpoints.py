"""Orbax checkpointing with the reference's retention policy.

The reference saves every epoch, keeps everything plus `last.ckpt`, and
tracks the best `val_total_loss` (reference train.py:34-50,
configs/zju.json:20-27); training auto-resumes from the latest checkpoint
if one exists. Orbax gives the same policy with async saves.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,          # None = keep all (reference save_top_k=-1)
            best_fn=None,
            create=True,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self._dir, options=options)

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Restore into the structure of `state_template`; latest step when
        step is None. Returns (state, step) or (None, None) if empty."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None, None
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))
        return state, step

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
