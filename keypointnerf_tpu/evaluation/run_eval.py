"""Test-set evaluation driver: full-image renders + metric aggregation.

Mirrors the reference's test path (src/model.py:528-551 test_step +
model.py:89-100 test_epoch_end): render each test sample at full
resolution, score PSNR/SSIM via the Evaluator (saving pred/gt/input PNG
trees), and dump mean metrics to a YAML file.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.keypoint_nerf import KeypointNeRF, ViewBatch
from ..render import render_image
from .evaluator import Evaluator


def run_eval(
    cfg,
    model: KeypointNeRF,
    state,
    dataset,
    result_dir: Optional[str] = None,
    max_samples: Optional[int] = None,
    stride: int = 1,
    sharded: bool = False,
    auto_cull_budget: int = 0,
) -> Dict[str, float]:
    """`sharded=True` partitions each image's rays across all local devices
    (parallel.make_sharded_render) — the multi-chip replacement for the
    reference's serial full-image loop. stride must be 1 in that mode.

    `auto_cull_budget=N` (with a culling model config) probes the first N
    loadable samples with `render.suggest_cull_budget` and RAISES the
    cull budget to cover them — the serve presets' budgets are sized for
    their bench scenes, and a dataset with closer framing (larger visual
    hull) would otherwise trip the `cull_overflow` guard. Overflow is
    also checked per rendered sample either way."""
    out_dir = os.path.join(cfg.out_dir, cfg.name)
    result_dir = result_dir or os.path.join(out_dir, "images_v3")
    evaluator = Evaluator(result_dir=result_dir)

    if auto_cull_budget and model.cfg.cull_empty_rays_ratio < 1.0:
        import dataclasses

        from ..render import suggest_cull_budget

        worst_budget, worst_hull, probed = 0.0, 0.0, 0
        for i in range(len(dataset)):
            if probed >= auto_cull_budget:
                break
            sample = dataset[i]
            if sample is None:
                continue
            sample = {k: v for k, v in sample.items() if k != "meta"}
            vb = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
            H, W = np.asarray(vb.tar_image).shape[:2]
            feats = None
            if model.cfg.fused_feature_map:
                feats = model.apply(state.params, vb.src_images,
                                    vb.src_masks, method=KeypointNeRF.encode)
            b, h = suggest_cull_budget(
                model.cfg, vb, [(vb.tar_K, vb.tar_R, vb.tar_t)], H, W,
                feats=feats,
            )
            worst_budget, worst_hull = max(worst_budget, b), max(worst_hull, h)
            probed += 1
        if worst_budget > model.cfg.cull_empty_rays_ratio:
            print(f"auto_cull_budget: raising cull budget "
                  f"{model.cfg.cull_empty_rays_ratio} -> {worst_budget} "
                  f"(probed {probed} samples, worst hull {worst_hull:.3f})")
            model = KeypointNeRF(dataclasses.replace(
                model.cfg, cull_empty_rays_ratio=worst_budget))

    sharded_render = None
    if sharded and len(jax.devices()) > 1:
        from ..parallel import make_mesh, make_sharded_render

        assert stride == 1, "sharded eval renders at full resolution"
        sharded_render = make_sharded_render(model, make_mesh())

    scores = []
    n = len(dataset) if max_samples is None else min(len(dataset), max_samples)
    for i in range(n):
        sample = dataset[i]
        if sample is None:
            continue
        meta = sample.pop("meta", {})
        vb = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
        H, W = np.asarray(vb.tar_image).shape[:2]
        if sharded_render is not None:
            out = sharded_render(state.params, vb, height=H, width=W)
        else:
            out = render_image(
                model, state.params, vb, height=H, width=W, stride=stride
            )
        if "cull_overflow" in out:
            ov = float(np.asarray(out["cull_overflow"]).max())
            if ov > 0:
                print(f"WARNING: sample {i}: empty-ray cull budget "
                      f"exceeded by {ov:.0f} rays — this image is NOT "
                      "exact; raise cull_empty_rays_ratio or use "
                      "auto_cull_budget")
        pred = np.clip(np.asarray(out["rgb_fine"]), 0.0, 1.0)
        gt = np.asarray(vb.tar_image)[::stride, ::stride]
        mab = np.asarray(meta.get("mask_at_box", np.ones((H, W))))[::stride, ::stride]
        score = evaluator.compute_score(
            pred,
            gt,
            mab,
            input_imgs=np.asarray(vb.src_images),
            human_idx=str(meta.get("human", "h")),
            frame_index=int(meta.get("frame_index", i)),
            view_index=int(meta.get("tar_cam_id", 0)),
        )
        scores.append(score)
        print(f"[{i + 1}/{n}] psnr={score['psnr']:.2f} ssim={score['ssim']:.4f}")

    mean = {k: float(np.mean([s[k] for s in scores])) for k in scores[0]} if scores else {}
    # YAML dump (reference model.py:89-100 test_v3_{epoch}_{step}.yml)
    step = int(getattr(state, "step", 0))
    yml_path = os.path.join(out_dir, f"test_v3_{step}.yml")
    os.makedirs(out_dir, exist_ok=True)
    with open(yml_path, "w") as f:
        for k, v in mean.items():
            f.write(f"{k}: {v}\n")
    print("mean:", mean, "->", yml_path)
    return mean
