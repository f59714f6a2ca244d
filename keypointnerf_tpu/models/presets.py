"""The benched inference presets — ONE definition site.

Round 4 shipped the "fast" inference configuration in four hand-rolled
copies (bench.py, configs/zju_fast.json, scripts/quality_gate.py,
scripts/reference_parity.py) and two of them drifted into the
cull-compose-topk composition the repo itself measured at −2.0 dB GT and
rejected (docs/PERF.md, README culling table). This module is the single
source of truth: every consumer builds its preset here, and
tests/test_presets.py pins the field-for-field agreement with
configs/zju_fast.json and the parity drill.

Two presets, matching bench.py's two measurements:

* ``fast_preset``   — the headline inference path: bf16, single fused
  half-res feature map, stride-2 epipolar gather-lerp, exact empty-ray
  cull (budget 0.25 on the bench orbit), and a MILD fine cut
  (fine 0.75) *inside* the culled set. Measured GT budget −0.32 dB on the
  trained fixture (scripts/quality_gate.json). No coarse topk and no
  aggressive fine topk: post-cull chunks are nearly all subject rays, so
  per-chunk topk 0.5 composed with the cull cuts REAL rays
  (−2.0 dB measured; docs/PERF.md "the cull+topk quality trap").
  Round 5: halving the fused map respects
  ``fused_map_half_min_side`` (default 512) — at inputs below it the
  full-res map is already in the fast gather regime, and the 20k-step
  sharp-fixture trend showed forced halving there erodes GT by up to
  −3.2 dB for zero speed (quality_gate.json trend_runs; the same knob
  at 512² inputs measures ~free).
* ``strict_preset`` — strict reference semantics (reference
  src/model.py:942-1108): full 128-depth union composited, exact per-map
  bilinear lookups, softplus100, every ray marched or provably-zero.
  Outputs are BIT-IDENTICAL to marching every ray: the only
  optimizations on are the exact coarse-value-reuse merge, the one-hot
  MXU tex lookup (same bilinear math), and the exact empty-ray cull with
  its runtime ``cull_overflow`` guard (HW-verified sum_rel_delta=0,
  scripts/measure_strict_variants.py).

Both presets force every training-only flag off (remat, gather-VJP
variants): they describe EVAL programs.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from .keypoint_nerf import KeypointNeRFConfig

# Exact-cull budgets for the bench orbit scene (512² inputs, 3.5-radius
# cameras, measured hull max 0.1546 — scripts/cull_hull_fraction.py).
# Other scene classes need larger budgets (the quality gate's 128²
# close-ups measured ~0.40); pass cull_budget explicitly, size it with
# render.suggest_cull_budget, and watch the runtime cull_overflow guard.
FAST_CULL_BUDGET = 0.25
STRICT_CULL_BUDGET = 0.1875

# eval presets never carry training-path flags
_TRAIN_FLAGS_OFF = dict(
    remat=False,
    remat_save_gathers=False,
    train_matmul_gather_vjp=False,
    train_pallas_dmap=False,
)


def fast_preset(
    base: Optional[KeypointNeRFConfig] = None,
    *,
    cull_budget: float = FAST_CULL_BUDGET,
) -> KeypointNeRFConfig:
    """The benched fast inference configuration (bench.py headline).

    `base` supplies the architecture (dims, sample counts, resolution
    behavior); defaults to the reference zju architecture. Only the
    inference-path flags are overridden.
    """
    base = KeypointNeRFConfig() if base is None else base
    return dataclasses.replace(
        base,
        compute_dtype=jnp.bfloat16,
        fused_feature_map=True,
        fused_map_half=True,
        gather_lerp=True,
        gather_lerp_stride=2,
        nl_relu_approx=False,  # measured +0.1%: not the bottleneck
        tex_onehot_sample=False,  # fused map already amortizes its gather
        cull_empty_rays_ratio=cull_budget,
        # mild fine cut INSIDE the culled set: −0.32 dB GT measured,
        # +11% speed. NEVER 0.5/0.5 — that is the rejected trap.
        fine_topk_ratio=0.75,
        coarse_topk_ratio=1.0,
        **_TRAIN_FLAGS_OFF,
    )


def strict_preset(
    base: Optional[KeypointNeRFConfig] = None,
    *,
    cull_budget: float = STRICT_CULL_BUDGET,
) -> KeypointNeRFConfig:
    """Strict reference semantics (bench.py strict_*), bf16 compute.

    Output is bit-identical to marching every ray of the full coarse+fine
    union with exact per-map lookups; see module docstring. For the f32
    variant the reference itself evaluates (its CUDA model runs f32), use
    scripts/reference_parity.py --preset strict.
    """
    base = KeypointNeRFConfig() if base is None else base
    return dataclasses.replace(
        base,
        compute_dtype=jnp.bfloat16,
        fused_feature_map=False,
        fused_map_half=False,
        gather_lerp=False,
        nl_relu_approx=False,
        fine_topk_ratio=1.0,
        coarse_topk_ratio=1.0,
        tex_onehot_sample=True,
        cull_empty_rays_ratio=cull_budget,
        **_TRAIN_FLAGS_OFF,
    )
