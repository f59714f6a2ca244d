"""Training loss stack.

Reimplements the reference loss assembly (src/utils.py:97-196
`compute_error` / `compute_error_nerf` / `pix_loss`): coarse L1
(lambda_l1_c=1.0), fine L1 (lambda_l1=10), fine VGG perceptual
(lambda_vgg=0.5), plus the optional l2 / lp / top-k% / mask-MSE terms.
All terms are plain jnp so XLA fuses them with the render graph.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.vgg import vgg_loss


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Defaults reproduce configs/zju.json:109-119."""

    lambda_l1_c: float = 1.0
    lambda_l1: float = 10.0
    lambda_l2: float = 0.0
    lambda_lp: float = 0.0
    lambda_vgg: float = 0.5
    lambda_mloss: float = 0.0
    # "l1top25"-style importance terms: (kind, percent, weight)
    top_losses: Tuple[Tuple[str, float, float], ...] = ()


def pix_loss(pred, target, kind: str, top_percent: Optional[float] = None):
    """Per-pixel photometric losses (reference src/utils.py:173-196)."""
    diff = pred - target
    if kind == "l1":
        per_pix = jnp.abs(diff)
    elif kind == "l2":
        per_pix = diff * diff
    elif kind == "lp":
        per_pix = (jnp.abs(diff) + 1e-4) ** 0.4
    else:
        raise ValueError(f"unknown pixel loss {kind}")
    if top_percent is None:
        return jnp.mean(per_pix)
    # top-k% hardest pixels: channel-summed, sorted descending (utils.py:185-196)
    per = jnp.sum(per_pix, axis=-1).reshape(-1)
    k = max(1, int(per.shape[0] * top_percent / 100.0))
    top = jax.lax.top_k(per, k)[0]
    return jnp.mean(top)


def compute_losses(
    out: Dict[str, jnp.ndarray],
    cfg: LossConfig,
    vgg_params=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total training loss + per-term dict (reference compute_error).

    `out` is the model forward output: rgb_coarse/rgb_fine (P, P, 3),
    acc_* (P, P), target_rgb (P, P, 3), target_alpha (P, P, 1).
    """
    tar = out["target_rgb"]
    err = {}

    if cfg.lambda_l1_c > 0.0 and "rgb_coarse" in out:
        err["e_pix_c"] = cfg.lambda_l1_c * pix_loss(out["rgb_coarse"], tar, "l1")

    fine = out.get("rgb_fine")
    if fine is not None:
        if cfg.lambda_l1 > 0.0:
            err["e_pix_l1"] = cfg.lambda_l1 * pix_loss(fine, tar, "l1")
        if cfg.lambda_l2 > 0.0:
            err["e_pix_l2"] = cfg.lambda_l2 * pix_loss(fine, tar, "l2")
        if cfg.lambda_lp > 0.0:
            err["e_pix_lp"] = cfg.lambda_lp * pix_loss(fine, tar, "lp")
        for kind, pct, w in cfg.top_losses:
            err[f"e_pix_{kind}top{int(pct)}"] = w * pix_loss(fine, tar, kind, pct)
        if cfg.lambda_vgg > 0.0 and vgg_params is not None:
            err["e_vgg"] = cfg.lambda_vgg * vgg_loss(vgg_params, fine, tar)

    if cfg.lambda_mloss > 0.0 and "target_alpha" in out:
        ta = out["target_alpha"][..., 0]
        if "acc_coarse" in out:
            a = jnp.clip(out["acc_coarse"], 1e-3, 1.0)
            err["mask_loss_c"] = cfg.lambda_mloss * jnp.mean((a - ta) ** 2)
        if "acc_fine" in out:
            a = jnp.clip(out["acc_fine"], 1e-3, 1.0)
            err["mask_loss_f"] = cfg.lambda_mloss * jnp.mean((a - ta) ** 2)

    total = jnp.asarray(0.0)
    for v in err.values():
        total = total + v
    err["e_all"] = total
    return total, err
