#!/usr/bin/env python
"""Quantify the rendering error of the fast-path approximations.

Renders several synthetic-rig scenes at full resolution with the STRICT
reference-semantics config (march every ray, re-evaluate the full coarse+
fine union — reference src/model.py:942-1108) and with each fast-path
flag, then reports PSNR/SSIM of the fast render against the strict render
(and of both against GT where the target view is available).

Usage:
  python scripts/culling_error.py [--size 512] [--scenes 3] [--trained CKPT]

Output: one JSON line per (scene, variant) + a markdown table on stdout.
"""
import argparse
import dataclasses
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument(
        "--ckpt", default=None,
        help="run dir with config.json + ckpts/ — measure on TRAINED params "
        "(a random-init model underestimates the visual cost of culling)",
    )
    ap.add_argument(
        "--only", default=None,
        help="comma-separated variant subset (skip recompiling the full table)",
    )
    args = ap.parse_args()

    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.evaluation.metrics import psnr, structural_similarity
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
    from keypointnerf_tpu.render import render_image

    cdt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    base_cfg = KeypointNeRFConfig()
    trained = None
    if args.ckpt:
        # build the model with the ckpt run's own architecture
        run_cfg = json.load(open(os.path.join(args.ckpt, "config.json")))
        md = dict(run_cfg["model"])
        md["compute_dtype"] = "f32"  # overridden per-variant below
        from keypointnerf_tpu.utils.config import _build
        base_cfg = _build(KeypointNeRFConfig, md)
    # strict reference semantics: all rays coarse+fine at the reference's
    # 64+64 sample counts, full union re-eval (sample counts are a render-
    # time choice — params from a 16+16-trained run evaluate fine at 64+64)
    strict_cfg = dataclasses.replace(
        base_cfg, compute_dtype=cdt, fused_feature_map=False,
        n_coarse=64, n_fine=64,
        fine_topk_ratio=1.0, coarse_topk_ratio=1.0, reuse_coarse_eval=False,
    )
    variants = {
        "reuse_coarse": dataclasses.replace(strict_cfg, reuse_coarse_eval=True),
        "fused_map": dataclasses.replace(strict_cfg, fused_feature_map=True),
        "fine_cull_0.5": dataclasses.replace(strict_cfg, fine_topk_ratio=0.5),
        "coarse_cull_0.5": dataclasses.replace(strict_cfg, coarse_topk_ratio=0.5),
        "relu_approx": dataclasses.replace(strict_cfg, nl_relu_approx=True),
        "fast_all": dataclasses.replace(
            strict_cfg, fused_feature_map=True, reuse_coarse_eval=True,
            fine_topk_ratio=0.5, coarse_topk_ratio=0.5, nl_relu_approx=True,
        ),
        # epipolar feature lerp (requires the fused map)
        "gather_lerp": dataclasses.replace(
            strict_cfg, fused_feature_map=True, gather_lerp=True,
        ),
        "fast_all_lerp": dataclasses.replace(
            strict_cfg, fused_feature_map=True, reuse_coarse_eval=True,
            fine_topk_ratio=0.5, coarse_topk_ratio=0.5, gather_lerp=True,
        ),
        "gather_lerp_s4": dataclasses.replace(
            strict_cfg, fused_feature_map=True, gather_lerp=True,
            gather_lerp_stride=4,
        ),
        "fast_all_lerp_s4": dataclasses.replace(
            strict_cfg, fused_feature_map=True, reuse_coarse_eval=True,
            fine_topk_ratio=0.5, coarse_topk_ratio=0.5, gather_lerp=True,
            gather_lerp_stride=4,
        ),
        # half-resolution fused map (gather area-regime lever, docs/PERF.md)
        "fused_half": dataclasses.replace(
            strict_cfg, fused_feature_map=True, fused_map_half=True,
        ),
        # half map x lerp interaction WITHOUT any culling (round-5 trend
        # decomposition: which knob's GT cost grows with model sharpness)
        "lerp_half": dataclasses.replace(
            strict_cfg, fused_feature_map=True, fused_map_half=True,
            gather_lerp=True,
        ),
        # halving FORCED below fused_map_half_min_side (the pre-round-5
        # behavior): at --size <= 256 these two rows quantify exactly what
        # the min_side guard saves on a sharp model
        "fused_half_forced": dataclasses.replace(
            strict_cfg, fused_feature_map=True, fused_map_half=True,
            fused_map_half_min_side=0,
        ),
        "preset_fine075_forcehalf": dataclasses.replace(
            strict_cfg, fused_feature_map=True, reuse_coarse_eval=True,
            gather_lerp=True, fused_map_half=True, fused_map_half_min_side=0,
            cull_empty_rays_ratio=0.25, fine_topk_ratio=0.75,
        ),
        "fast_all_lerp_half": dataclasses.replace(
            strict_cfg, fused_feature_map=True, reuse_coarse_eval=True,
            fine_topk_ratio=0.5, coarse_topk_ratio=0.5, gather_lerp=True,
            fused_map_half=True,
        ),
        # exact empty-ray cull (render/empty_cull.py): bit-exact alone;
        # composed with topk it regroups the per-chunk topk budgets —
        # these rows quantify that regrouping against GT
        "empty_cull_0.25": dataclasses.replace(
            strict_cfg, cull_empty_rays_ratio=0.25,
        ),
        "fast_all_lerp_half_cull": dataclasses.replace(
            strict_cfg, fused_feature_map=True, reuse_coarse_eval=True,
            fine_topk_ratio=0.5, coarse_topk_ratio=0.5, gather_lerp=True,
            fused_map_half=True, cull_empty_rays_ratio=0.25,
        ),
        # cull REPLACES topk (the composition above drops real rays once
        # chunks are all-subject: -2.0 dB measured) — the round-4 preset
        "fast_lerp_half_cull_notopk": dataclasses.replace(
            strict_cfg, fused_feature_map=True, reuse_coarse_eval=True,
            gather_lerp=True, fused_map_half=True,
            cull_empty_rays_ratio=0.25,
        ),
        # mild fine cut within the culled set (+11% speed; effective fine
        # fraction 0.1875 ~ the lerp-tight hull max 0.191 — borderline)
        "fast_lerp_half_cull_fine075": dataclasses.replace(
            strict_cfg, fused_feature_map=True, reuse_coarse_eval=True,
            gather_lerp=True, fused_map_half=True,
            cull_empty_rays_ratio=0.25, fine_topk_ratio=0.75,
        ),
    }
    if args.only:
        keep = set(args.only.split(","))
        unknown = keep - set(variants)
        assert not unknown, f"unknown variants: {sorted(unknown)}"
        variants = {k: v for k, v in variants.items() if k in keep}

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    rows = []
    for scene in range(args.scenes):
        sample = make_sample(
            SyntheticConfig(image_size=args.size, n_views=4), seed=scene
        )
        with jax.default_device(cpu):
            vb_cpu = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
            strict_model = KeypointNeRF(strict_cfg)
            if args.ckpt:
                if trained is None:
                    from keypointnerf_tpu.training import OptimConfig, create_train_state
                    from keypointnerf_tpu.utils import CheckpointManager

                    # the run's own optimizer config — the opt_state tree
                    # structure (e.g. schedule state) must match the ckpt
                    state = create_train_state(
                        strict_model, vb_cpu,
                        _build(OptimConfig, run_cfg.get("optim", {})),
                    )
                    mgr = CheckpointManager(os.path.join(args.ckpt, "ckpts"))
                    state, step = mgr.restore(state)
                    assert state is not None, f"no ckpt in {args.ckpt}"
                    print(f"# trained params from step {step}", flush=True)
                    trained = state.params
                params = trained
            else:
                params = jax.jit(strict_model.init, static_argnums=2)(
                    {"params": jax.random.key(7), "render": jax.random.key(8)},
                    vb_cpu, True,
                )
        params = jax.device_put(params, dev)
        vb = jax.device_put(vb_cpu, dev)

        overflow = {}

        def render(cfg, name=None):
            model = KeypointNeRF(cfg)
            out = render_image(
                model, params, vb, height=args.size, width=args.size,
                chunk=args.chunk,
            )
            if name is not None and "cull_overflow" in out:
                # runtime exactness guard of the empty-ray cull: nonzero
                # means the budget missed hull rays on this scene/camera
                overflow[(scene, name)] = float(
                    np.asarray(out["cull_overflow"]).max()
                )
            return np.clip(
                np.asarray(out["rgb_fine"], np.float32), 0.0, 1.0
            )

        ref_img = render(strict_cfg)
        gt = np.asarray(vb_cpu.tar_image, np.float32)
        base_psnr = float(psnr(ref_img, gt))
        for name, cfg in variants.items():
            img = render(cfg, name)
            row = {
                "scene": scene, "variant": name,
                "psnr_vs_strict": round(float(psnr(img, ref_img)), 2),
                "ssim_vs_strict": round(float(structural_similarity(img, ref_img, multichannel=True)), 4),
                "psnr_vs_gt": round(float(psnr(img, gt)), 2),
                "strict_psnr_vs_gt": round(base_psnr, 2),
            }
            if (scene, name) in overflow:
                row["cull_overflow"] = overflow[(scene, name)]
            rows.append(row)
            print(json.dumps(row), flush=True)

    # markdown summary averaged over scenes
    print("\n| variant | PSNR vs strict | SSIM vs strict | ΔPSNR vs GT |")
    print("|---|---|---|---|")
    for name in variants:
        rs = [r for r in rows if r["variant"] == name]
        p = np.mean([r["psnr_vs_strict"] for r in rs])
        s = np.mean([r["ssim_vs_strict"] for r in rs])
        dg = np.mean([r["psnr_vs_gt"] - r["strict_psnr_vs_gt"] for r in rs])
        print(f"| {name} | {p:.2f} dB | {s:.4f} | {dg:+.2f} dB |")


if __name__ == "__main__":
    main()
