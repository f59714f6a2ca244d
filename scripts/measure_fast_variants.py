#!/usr/bin/env python
"""Measure fast-path render variants on real TPU (bench fast_cfg A-Bs).

Current rows: the shipped fast path vs fused_map_half (the half-res fused
map drops into the <=256^2-area 15.2 ns/patch gather regime; docs/PERF.md)
at 256^2 and 512^2 render resolutions.
"""
import argparse
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8192)
    args = ap.parse_args()

    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.data.synthetic import look_at
    from keypointnerf_tpu.geometry.cameras import camera_rays, pixel_grid
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
    from keypointnerf_tpu.render.renderer import render_rays_chunked

    fast = KeypointNeRFConfig(
        compute_dtype=jnp.bfloat16, fused_feature_map=True,
        fine_topk_ratio=0.5, coarse_topk_ratio=0.5, gather_lerp=True,
    )
    sample = make_sample(SyntheticConfig(image_size=512, n_views=4), seed=0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vb_cpu = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
        init_model = KeypointNeRF(fast)
        params = jax.jit(init_model.init, static_argnums=2)(
            {"params": jax.random.key(0), "render": jax.random.key(1)}, vb_cpu, True
        )
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    vb = jax.device_put(vb_cpu, dev)

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jax.device_put(jnp.zeros(8), dev)
    float(trivial(zeros))

    def measure(cfg, size, label):
        model = KeypointNeRF(cfg)
        pix = pixel_grid(size, size).astype(jnp.float32)

        @jax.jit
        def render(params, vb, R, t, seed):
            feats = model.apply(
                params, vb.src_images, vb.src_masks, method=KeypointNeRF.encode
            )
            origin, dirs, near, far = camera_rays(
                pix, vb.tar_K, R, t, cfg.znear, cfg.zfar
            )
            out = render_rays_chunked(
                model, params, feats, vb, origin, dirs, near, far,
                chunk=args.chunk,
            )
            return jnp.sum(out["rgb_fine"].astype(jnp.float32)) + 0.0 * seed

        def one(seed):
            R, t = look_at(3.5 * np.array([np.cos(seed), 0.05, np.sin(seed)]),
                           np.zeros(3))
            return float(render(params, vb, jnp.asarray(R), jnp.asarray(t),
                                jnp.asarray(seed, jnp.float32)))

        one(0.0)
        t0 = time.perf_counter(); float(trivial(zeros))
        rt = time.perf_counter() - t0
        t0 = time.perf_counter(); one(1.234)
        dt = max(time.perf_counter() - t0 - rt, 1e-9)
        print(f"{label:36s} {dt:7.4f} s  {size*size/dt:9.0f} rays/s",
              flush=True)

    half = dataclasses.replace(fast, fused_map_half=True)
    if os.environ.get("FAST_CULL_ONLY"):
        # round-4 exact empty-ray cull composed onto the shipped fast path.
        # Bench-scene hull fractions under the fast (lerp-sound) bound:
        # max 0.3644 across the orbit cameras; the windowed bound is
        # tighter (scripts/cull_hull_fraction.py). Perf depends only on
        # the ratio (budget), so sweep ratios; legality of a ratio is the
        # runtime cull_overflow == 0 check.
        for ratio in (0.4375, 0.375, 0.3125, 0.25, 0.1875):
            measure(
                dataclasses.replace(half, cull_empty_rays_ratio=ratio),
                256, f"fast_half + empty-cull {ratio} 256^2",
            )
        measure(dataclasses.replace(half, cull_empty_rays_ratio=0.4375),
                512, "fast_half + empty-cull 0.4375 512^2")
        measure(dataclasses.replace(half, cull_empty_rays_ratio=0.25),
                512, "fast_half + empty-cull 0.25 512^2")
        return
    if os.environ.get("FAST_CULL_NOTOPK"):
        # cull + topk COMPOSITION is a quality trap (culling_error r4:
        # post-cull chunks are ~all-subject, so fine_topk 0.5 drops REAL
        # rays — -2.0 dB GT on the trained fixture vs -0.55 for the
        # round-3 preset). The cull already removes exactly the rays topk
        # approximated away, so the candidate preset is cull + topk 1.0.
        nt = dataclasses.replace(
            half, fine_topk_ratio=1.0, coarse_topk_ratio=1.0,
        )
        for ratio in (0.25, 0.21875):
            measure(
                dataclasses.replace(nt, cull_empty_rays_ratio=ratio),
                256, f"fast_half cull {ratio} topk 1.0 256^2",
            )
        measure(
            dataclasses.replace(nt, cull_empty_rays_ratio=0.25,
                                fine_topk_ratio=0.75),
            256, "fast_half cull 0.25 fine 0.75 256^2",
        )
        measure(dataclasses.replace(nt, cull_empty_rays_ratio=0.25),
                512, "fast_half cull 0.25 topk 1.0 512^2")
        return
    for size in (256, 512):
        measure(fast, size, f"fast (shipped) {size}^2")
        measure(half, size, f"fast + fused_map_half {size}^2")


if __name__ == "__main__":
    main()
