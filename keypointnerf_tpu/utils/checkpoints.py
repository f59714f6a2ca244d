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
    def __init__(
        self,
        directory: str,
        max_to_keep: Optional[int] = None,
        monitor: str = "val_total_loss",
        monitor_mode: str = "min",
    ):
        """`monitor` tracks the best checkpoint by a metric passed to
        `save(..., metrics=...)` — the reference's ModelCheckpoint monitors
        min `val_total_loss` (reference train.py:34-43). With
        max_to_keep=None everything is kept (reference save_top_k=-1) and
        `best_step()` still resolves the monitored optimum."""
        self._dir = os.path.abspath(directory)
        self._monitor = monitor
        os.makedirs(self._dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,          # None = keep all (reference save_top_k=-1)
            best_fn=(lambda metrics: metrics.get(monitor, float("inf")))
            if monitor
            else None,
            best_mode=monitor_mode,
            keep_checkpoints_without_metrics=True,
            create=True,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self._dir, options=options)

    def save(self, step: int, state: Any, metrics: Optional[dict] = None,
             extra: Optional[dict] = None):
        """Save the train state plus an optional JSON `extra` sidecar.

        `extra` carries training-schedule metadata that must survive a
        restart but does not belong in the state pytree — e.g. the current
        epoch, which the reference gets for free from Lightning's ckpt
        `epoch` field (reference src/model.py:113-117). Stored as an orbax
        Composite item so multi-host saves stay coordinated."""
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                extra=ocp.args.JsonSave(extra or {}),
            ),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def restore(self, state_template: Any, step: Optional[int] = None,
                best: bool = False):
        """Restore into the structure of `state_template`; latest step when
        step is None, or the best monitored step when `best=True` (falls
        back to latest if no checkpoint has metrics yet). Returns
        (state, step) or (None, None) if empty."""
        if step is None:
            # explicit None checks: step 0 is a valid best/latest step
            step = self.best_step() if best else None
            if step is None:
                step = self._mgr.latest_step()
        if step is None:
            return None, None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(state_template)),
        )
        return restored["state"], step

    def load_extra(self, step: Optional[int] = None) -> dict:
        """The JSON `extra` metadata saved alongside a checkpoint ({} when
        none was stored or the step predates the sidecar)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return {}
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.Composite(extra=ocp.args.JsonRestore())
            )
            return dict(restored["extra"] or {})
        except (KeyError, FileNotFoundError, ValueError):
            return {}

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        """Step with the best monitored metric (reference ModelCheckpoint
        min-val_total_loss selection, train.py:34-43)."""
        return self._mgr.best_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
