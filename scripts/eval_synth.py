#!/usr/bin/env python
"""Full-render PSNR/SSIM of trained runs on the synthetic rig.

Renders SEEN scenes (training seeds 0..N-1) and UNSEEN scenes (seeds
100..100+N-1: new camera rigs, keypoints and shading never trained on)
from each run's final checkpoint and reports per-run means — the
generalizable-NeRF measurement the reference reports on unseen ZJU
subjects (/root/reference/README.md:96-102), transplanted to the CI rig.

All runs are rendered with the SAME eval protocol (f32 compute, strict
sampling of the run's own coarse/fine counts) so the comparison isolates
the *training* recipe (e.g. f32 vs bf16+fused-map) rather than render
flags.

Usage:
  python scripts/eval_synth.py RUN_DIR [RUN_DIR ...] [--scenes 4]
                               [--size 128] [--chunk 8192]
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
    ap.add_argument("runs", nargs="+", help="run dirs with config.json + ckpts/")
    ap.add_argument("--scenes", type=int, default=4, help="scenes per split")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--unseen_base", type=int, default=100,
                    help="first seed of the unseen split (train uses 0..63)")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.evaluation.metrics import psnr, structural_similarity
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
    from keypointnerf_tpu.render import render_image
    from keypointnerf_tpu.training import OptimConfig, create_train_state
    from keypointnerf_tpu.utils import CheckpointManager
    from keypointnerf_tpu.utils.config import _build

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    splits = {
        "seen": range(args.scenes),
        "unseen": range(args.unseen_base, args.unseen_base + args.scenes),
    }
    summary = []
    for run in args.runs:
        run_cfg = json.load(open(os.path.join(run, "config.json")))
        md = dict(run_cfg["model"])
        md["compute_dtype"] = "f32"  # shared eval protocol
        cfg = _build(KeypointNeRFConfig, md)
        cfg = dataclasses.replace(
            cfg, fused_feature_map=False, gather_lerp=False,
            fine_topk_ratio=1.0, coarse_topk_ratio=1.0,
            nl_relu_approx=False, use_dma_gather=False,
            use_pallas_geo_mlp=False, use_pallas_composite=False,
        )
        model = KeypointNeRF(cfg)
        probe = make_sample(SyntheticConfig(image_size=args.size, n_views=4), seed=0)
        with jax.default_device(cpu):
            vb0 = ViewBatch(**{k: jnp.asarray(v) for k, v in probe.items()})
            state = create_train_state(
                model, vb0, _build(OptimConfig, run_cfg.get("optim", {})))
            state, step = CheckpointManager(os.path.join(run, "ckpts")).restore(state)
            assert state is not None, f"no checkpoint under {run}"
        params = jax.device_put(state.params, dev)
        # key rows by the full normalized path: two run dirs sharing a
        # basename (out_f32/run1 vs out_bf16/run1) must not collide
        name = os.path.normpath(run)
        for split, seeds in splits.items():
            ps, ss = [], []
            for seed in seeds:
                sample = make_sample(
                    SyntheticConfig(image_size=args.size, n_views=4), seed=seed)
                with jax.default_device(cpu):
                    vb = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
                gt = np.asarray(vb.tar_image, np.float32)
                out = render_image(
                    model, params, jax.device_put(vb, dev),
                    height=args.size, width=args.size, chunk=args.chunk)
                img = np.clip(np.asarray(out["rgb_fine"], np.float32), 0.0, 1.0)
                ps.append(float(psnr(img, gt)))
                ss.append(float(structural_similarity(img, gt, multichannel=True)))
            row = {"run": name, "step": int(step), "split": split,
                   "psnr": round(float(np.mean(ps)), 2),
                   "ssim": round(float(np.mean(ss)), 4)}
            summary.append(row)
            print(json.dumps(row), flush=True)

    print("\n| run | step | seen PSNR/SSIM | unseen PSNR/SSIM |")
    print("|---|---|---|---|")
    for run in args.runs:
        name = os.path.normpath(run)
        rs = {r["split"]: r for r in summary if r["run"] == name}
        print(f"| {name} | {rs['seen']['step']} "
              f"| {rs['seen']['psnr']:.2f} / {rs['seen']['ssim']:.4f} "
              f"| {rs['unseen']['psnr']:.2f} / {rs['unseen']['ssim']:.4f} |")


if __name__ == "__main__":
    main()
