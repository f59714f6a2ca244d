#!/usr/bin/env python
"""Dynamic orbit-video rendering CLI.

Counterpart of the reference render_dynamic.py:13-37: loads a checkpoint,
and for each test frame renders the matching camera of a 90-frame 360°
orbit derived from the SMPL root pose, then assembles mp4s with ffmpeg.
"""
from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--out_dir", type=str, default=None)
    parser.add_argument("--model_ckpt", type=str, required=True, help="checkpoint dir")
    parser.add_argument("--n_frames", type=int, default=90)
    parser.add_argument("--stride", type=int, default=1)
    parser.add_argument(
        "--auto_cull_budget", type=int, default=0, metavar="N",
        help="probe N cameras spread over each orbit and RAISE the exact "
             "empty-ray cull budget to cover them before rendering "
             "(render.suggest_cull_budget); 0 = use the config budget",
    )
    args = parser.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from keypointnerf_tpu.data import ZJUTestDataset
    from keypointnerf_tpu.models import KeypointNeRF, ViewBatch
    from keypointnerf_tpu.render.video import render_orbit, write_video
    from keypointnerf_tpu.training import OptimConfig, create_train_state
    from keypointnerf_tpu.utils import CheckpointManager, load_config

    overrides = {}
    if args.data_root:
        overrides["data.data_root"] = args.data_root
    if args.out_dir:
        overrides["out_dir"] = args.out_dir
    cfg = load_config(args.config, overrides)

    # test_visualize: 1 sample per frame (reference config.py + zju_dataset.py:149-151)
    dataset = ZJUTestDataset(
        cfg.data.data_root, "test", sample_frame=1, sample_camera=6,
        image_ratio=cfg.data.image_ratio,
    )

    model = KeypointNeRF(cfg.model)
    first = next(s for s in (dataset[i] for i in range(len(dataset))) if s is not None)
    meta = first.pop("meta")
    vb0 = ViewBatch(**{k: jnp.asarray(v) for k, v in first.items()})
    state = create_train_state(model, vb0, OptimConfig())
    ckpt = CheckpointManager(args.model_ckpt)
    state, step = ckpt.restore(state)
    assert state is not None, f"no checkpoint found in {args.model_ckpt}"
    print(f"loaded checkpoint step {step}")

    dst = os.path.join(cfg.out_dir, cfg.name, "video")
    frame_dirs = set()
    for i in range(len(dataset)):
        sample = dataset[i]
        if sample is None:
            continue
        meta = sample.pop("meta")
        vb = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
        sub_dir = os.path.join(dst, "zju", meta["human"])
        frame_dirs.add(sub_dir)
        render_orbit(
            model, state.params, vb, np.asarray(meta["headpose"]), sub_dir,
            n_frames=args.n_frames, stride=args.stride,
            frame_indices=[meta["frame_index"] % args.n_frames],
            make_video=False,
            auto_cull_budget=args.auto_cull_budget,
        )
    for sub_dir in frame_dirs:
        write_video(sub_dir, f"{sub_dir}_nvs.mp4")


if __name__ == "__main__":
    main()
