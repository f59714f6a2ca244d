#!/usr/bin/env python
"""Benchmark: rendering throughput (rays/sec/chip) on the flagship model.

Run by the driver on real TPU hardware at the end of every round. Prints
ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured path is the full coarse+fine inference ray-march (64 + 64
samples, union -> 128 composited) of the zju-config model at 256x256,
including multi-view feature sampling, spatial encoding, geometry MLP
fusion and the IBR color head — the reference's `render_pifu_nerf` hot
loop (reference src/model.py:897-1108). `vs_baseline` is measured against
BASELINE_RAYS_PER_SEC, the throughput of this repo's first working jnp/XLA
implementation on one chip (the reference publishes no speed numbers —
SURVEY.md §6 — so round 1 sets the bar and later rounds must beat it).
"""
import json
import time

import jax
import jax.numpy as jnp

# Round-1 XLA baseline on a single chip (rays/sec), set from the first
# measurement on real TPU hardware. Update only upward.
BASELINE_RAYS_PER_SEC = 100_000.0

HEIGHT = WIDTH = 256
CHUNK = 8192


def main():
    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
    from keypointnerf_tpu.render import render_image

    cfg = KeypointNeRFConfig()  # zju defaults: 64 coarse + 64 fine
    model = KeypointNeRF(cfg)
    sample = make_sample(SyntheticConfig(image_size=512, n_views=4), seed=0)
    vb = ViewBatch(**jax.tree.map(jnp.asarray, sample))
    params = model.init(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )

    def run():
        out = render_image(
            model, params, vb, height=HEIGHT, width=WIDTH, stride=1, chunk=CHUNK
        )
        jax.block_until_ready(out)
        return out

    run()  # compile
    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        run()
    dt = (time.perf_counter() - t0) / n_iters

    rays = HEIGHT * WIDTH
    rays_per_sec = rays / dt
    print(
        json.dumps(
            {
                "metric": "render_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
