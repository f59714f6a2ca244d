"""Config system: JSON/YAML experiment configs -> typed dataclass configs.

The reference drives everything from a nested JSON dict
(configs/zju.json, loaded by src/config.py:56-70) and stamps the saved
config with the git HEAD hash for reproducibility (src/config.py:72-97).
Here configs are real dataclasses (KeypointNeRFConfig / LossConfig /
OptimConfig / ExperimentConfig) built from the same JSON shape, with
unknown keys rejected to catch typos.
"""
from __future__ import annotations

import dataclasses
import json
import os
import subprocess
from typing import Any, Dict, Optional

from ..models.keypoint_nerf import KeypointNeRFConfig
from ..training.losses import LossConfig
from ..training.train import OptimConfig


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "synthetic"        # "synthetic" | "zju"
    data_root: str = ""
    image_size: int = 512             # after 0.5x ratio (reference zju_dataset.py:52)
    image_ratio: float = 0.5
    n_source_views: int = 3
    max_len_val: int = 2              # reference zju.json:7-9
    sample_frame: int = 30            # test subsampling (zju_dataset.py:434)
    # native prefetcher threads; 0 = load inline. Opt-in: combined with the
    # 8-virtual-device CPU mesh, sustained prefetcher load once triggered a
    # stuck XLA InProcessCommunicator all-reduce (see memory notes); real
    # TPU meshes don't use that communicator.
    num_workers: int = 0
    # samples per device per optimizer step (global batch = this * n_dev).
    # The reference trains at batch 1/GPU (reference src/model.py:46); >1
    # amortizes the CNN encoder cost across samples on big-HBM chips.
    batch_per_device: int = 1


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str = "keypointnerf"
    out_dir: str = "out"
    # what the preset is tuned for: "train" or "eval". Eval/serve presets
    # (configs/zju_fast.json) carry inference-only model flags
    # (gather_lerp, fused_map_half, topk/cull ratios) that are inert in
    # training — and the fused map is a measured training PESSIMIZATION
    # (docs/PERF.md: 2.73 vs 0.88 s/step) — so train.py warns loudly when
    # fitting a purpose="eval" config.
    purpose: str = "train"
    seed: int = 125
    max_epochs: int = 30              # reference zju.json:18
    val_every_steps: int = 500
    ckpt_every_steps: int = 1000
    log_every_steps: int = 50
    vgg_weights: str = ""             # optional torchvision vgg19 .pth to convert
    model: KeypointNeRFConfig = dataclasses.field(default_factory=KeypointNeRFConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)


_DTYPES = {
    "float32": "float32", "f32": "float32",
    "bfloat16": "bfloat16", "bf16": "bfloat16",
}


def _build(cls, d: Dict[str, Any]):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            raise KeyError(f"unknown config key {k!r} for {cls.__name__}")
        if isinstance(v, dict) and dataclasses.is_dataclass(_SUB.get(k)):
            kwargs[k] = _build(_SUB[k], v)
        elif k == "compute_dtype" and isinstance(v, str):
            import jax.numpy as jnp

            kwargs[k] = jnp.dtype(_DTYPES.get(v, v)).type
        elif isinstance(v, list):
            kwargs[k] = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


_SUB = {
    "model": KeypointNeRFConfig,
    "loss": LossConfig,
    "optim": OptimConfig,
    "data": DataConfig,
}


def load_config(path: Optional[str] = None, overrides: Optional[Dict[str, Any]] = None) -> ExperimentConfig:
    """Load an ExperimentConfig from a JSON/YAML file plus CLI overrides.

    Overrides use dotted keys: {"optim.learning_rate": 1e-3}.
    """
    d: Dict[str, Any] = {}
    if path:
        with open(path) as f:
            if path.endswith((".yml", ".yaml")):
                import yaml

                d = yaml.safe_load(f)
            else:
                d = json.load(f)
    for k, v in (overrides or {}).items():
        parts = k.split(".")
        cur = d
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return _build(ExperimentConfig, d)


def git_head_hash() -> str:
    """Best-effort git HEAD stamp (reference src/config.py:89-97)."""
    try:
        return (
            subprocess.check_output(
                ["git", "rev-parse", "HEAD"],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                stderr=subprocess.DEVNULL,
            )
            .decode()
            .strip()
        )
    except Exception:
        return "unknown"


def save_config(cfg: ExperimentConfig, out_dir: str) -> str:
    """Save the merged config + git hash next to checkpoints
    (reference src/config.py:72-87)."""
    os.makedirs(out_dir, exist_ok=True)
    d = dataclasses.asdict(cfg)
    d["__git_head__"] = git_head_hash()
    # dtypes aren't JSON-serializable
    d["model"]["compute_dtype"] = str(d["model"]["compute_dtype"])
    path = os.path.join(out_dir, "config.json")
    with open(path, "w") as f:
        json.dump(d, f, indent=2, default=str)
    return path


def get_model(cfg: ExperimentConfig):
    """Model factory (reference src/config.py:100-104 `get_model`):
    instantiate the flagship model from an experiment config."""
    from ..models import KeypointNeRF

    return KeypointNeRF(cfg.model)
