"""Metrics / observability: scalar + image logging.

The reference logs per-loss scalars and validation image strips to
TensorBoard via Lightning's TestTubeLogger (reference train.py:53-58,
src/model.py:422-424, 519-520). Here: an always-on JSONL stream (cheap,
dependency-free, machine-readable) plus TensorBoard event files when a
writer backend is importable. Host-0-only under multi-process jax.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict

import jax
import numpy as np


def _tb_writer(logdir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(logdir)
    except Exception:
        return None


class MetricsWriter:
    def __init__(self, out_dir: str, enable_tensorboard: bool = True):
        self.is_main = jax.process_index() == 0
        self._tb = None
        self._f = None
        if self.is_main:
            os.makedirs(out_dir, exist_ok=True)
            self._f = open(os.path.join(out_dir, "metrics.jsonl"), "a", buffering=1)
            if enable_tensorboard:
                self._tb = _tb_writer(os.path.join(out_dir, "tb"))

    def scalars(self, step: int, values: Dict[str, float], prefix: str = ""):
        if not self.is_main:
            return
        rec = {"step": int(step), "time": time.time()}
        for k, v in values.items():
            key = f"{prefix}{k}"
            rec[key] = float(np.asarray(v))
            if self._tb is not None:
                self._tb.add_scalar(key, rec[key], step)
        self._f.write(json.dumps(rec) + "\n")

    def image(self, step: int, tag: str, image: np.ndarray):
        """image: (H, W, 3) float in [0, 1]."""
        if not self.is_main:
            return
        if self._tb is not None:
            self._tb.add_image(tag, np.asarray(image), step, dataformats="HWC")

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._tb is not None:
            self._tb.close()
