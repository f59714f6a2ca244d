#!/usr/bin/env python
"""Marginal-cost bisect of the STRICT render path on real TPU.

Measures the full strict render (bench.py strict_cfg semantics), then
re-measures with individual per-map bilinear gathers replaced by a
shape/dtype-preserving stub (a broadcast of the map mean — profile-only,
output is garbage). The timing difference is the marginal cost of that
gather, which decides where strict-path optimization effort goes
(VERDICT r2 item 2).

Usage: python scripts/bisect_strict.py [--size 256] [--chunk 8192]
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
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=8192)
    args = ap.parse_args()

    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.data.synthetic import look_at
    from keypointnerf_tpu.geometry.cameras import camera_rays, pixel_grid
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
    from keypointnerf_tpu.models import keypoint_nerf as knmod
    from keypointnerf_tpu.render.renderer import render_rays_chunked

    cfg = KeypointNeRFConfig(
        compute_dtype=jnp.bfloat16, fused_feature_map=False,
        fine_topk_ratio=1.0, coarse_topk_ratio=1.0,
    )
    sample = make_sample(SyntheticConfig(image_size=512, n_views=4), seed=0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vb_cpu = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
        model = KeypointNeRF(cfg)
        params = jax.jit(model.init, static_argnums=2)(
            {"params": jax.random.key(0), "render": jax.random.key(1)}, vb_cpu, True
        )
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    vb = jax.device_put(vb_cpu, dev)
    pix = pixel_grid(args.size, args.size).astype(jnp.float32)

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jax.device_put(jnp.zeros(8), dev)
    float(trivial(zeros))

    real_mvbs = knmod.multiview_bilinear_sample

    def stubbed(stub_channels):
        """mvbs wrapper replacing the gather with a broadcast mean for maps
        whose channel count is in `stub_channels` (profile-only)."""
        def f(feats, xy):
            if feats.shape[-1] in stub_channels:
                m = jnp.mean(feats, axis=(1, 2))  # (V, C)
                return jnp.broadcast_to(m[:, None, :], xy.shape[:2] + (feats.shape[-1],))
            return real_mvbs(feats, xy)
        return f

    def measure(stub_channels, label):
        knmod.multiview_bilinear_sample = stubbed(stub_channels)
        try:
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
                return jnp.sum(out["rgb_fine"]) + seed

            def one(seed):
                R, t = look_at(3.5 * np.array([np.cos(seed), 0.05, np.sin(seed)]),
                               np.zeros(3))
                return float(render(params, vb, jnp.asarray(R), jnp.asarray(t),
                                    jnp.asarray(seed, jnp.float32)))

            one(0.0)  # compile + warm
            t0 = time.perf_counter(); float(trivial(zeros))
            rt = time.perf_counter() - t0
            t0 = time.perf_counter(); one(1.234)
            dt = max(time.perf_counter() - t0 - rt, 1e-9)
            rays = args.size * args.size / dt
            print(f"{label:36s} {dt:7.4f} s  {rays:10.0f} rays/s", flush=True)
            return dt
        finally:
            knmod.multiview_bilinear_sample = real_mvbs

    base = measure(set(), "strict baseline")
    no_full = measure({12}, "  - full map gather (12ch@512)")
    no_coarse = measure({64}, "  - coarse gather (64ch@128)")
    no_tex = measure({8}, "  - tex gather (8ch@256)")
    no_all = measure({12, 64, 8}, "  - ALL map gathers")
    print(f"marginal: full={base-no_full:.4f}s coarse={base-no_coarse:.4f}s "
          f"tex={base-no_tex:.4f}s all={base-no_all:.4f}s residual={no_all:.4f}s")


if __name__ == "__main__":
    main()
