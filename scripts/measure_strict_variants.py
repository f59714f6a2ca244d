#!/usr/bin/env python
"""Measure strict-render variants on real TPU: flag/chunk A-Bs.

Variants: baseline strict (bench.py strict_cfg), tex one-hot MXU sampler,
chunk sizes. One jitted render per variant, scalar output, round-trip
subtracted, fresh camera per timed call.
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
    args = ap.parse_args()

    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.data.synthetic import look_at
    from keypointnerf_tpu.geometry.cameras import camera_rays, pixel_grid
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
    from keypointnerf_tpu.render.renderer import render_rays_chunked

    base = KeypointNeRFConfig(
        compute_dtype=jnp.bfloat16, fused_feature_map=False,
        fine_topk_ratio=1.0, coarse_topk_ratio=1.0,
    )
    sample = make_sample(SyntheticConfig(image_size=512, n_views=4), seed=0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vb_cpu = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
        init_model = KeypointNeRF(base)
        params = jax.jit(init_model.init, static_argnums=2)(
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

    ref_sum = {}

    def measure(cfg, chunk, label):
        model = KeypointNeRF(cfg)

        @jax.jit
        def render(params, vb, R, t, seed):
            feats = model.apply(
                params, vb.src_images, vb.src_masks, method=KeypointNeRF.encode
            )
            origin, dirs, near, far = camera_rays(
                pix, vb.tar_K, R, t, cfg.znear, cfg.zfar
            )
            out = render_rays_chunked(
                model, params, feats, vb, origin, dirs, near, far, chunk=chunk
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
        t0 = time.perf_counter(); s = one(1.234)
        dt = max(time.perf_counter() - t0 - rt, 1e-9)
        # cross-variant value check (bf16 tolerance)
        ref = ref_sum.setdefault("v", s)
        rel = abs(s - ref) / max(abs(ref), 1e-9)
        print(f"{label:42s} {dt:7.4f} s  {args.size**2/dt:9.0f} rays/s  "
              f"sum_rel_delta={rel:.2e}", flush=True)

    if os.environ.get("STRICT_CULL_ONLY"):
        # round-3 exact empty-ray cull sweep (render/empty_cull.py):
        # bit-identical outputs, only provably-zero rays skipped. Bench
        # scene hull fraction is 12-15.5% across the orbit (measured on
        # CPU), so 0.25 carries ~2x margin and 0.1875 ~1.3x.
        toh = dataclasses.replace(base, tex_onehot_sample=True)
        measure(toh, 4096, "strict + tex_onehot chunk=4096 (shipped)")
        for ratio in (0.25, 0.1875):
            for chunk in (4096, 2048):
                measure(
                    dataclasses.replace(toh, cull_empty_rays_ratio=ratio),
                    chunk, f"strict + empty-cull {ratio} chunk={chunk}",
                )
        return

    measure(base, 8192, "strict chunk=8192 (baseline)")
    measure(base, 16384, "strict chunk=16384")
    measure(base, 4096, "strict chunk=4096")
    measure(dataclasses.replace(base, tex_onehot_sample=True), 8192,
            "strict + tex_onehot_sample")
    measure(dataclasses.replace(base, tex_onehot_sample=True), 16384,
            "strict + tex_onehot chunk=16384")
    measure(dataclasses.replace(base, tex_onehot_sample=True), 4096,
            "strict + tex_onehot chunk=4096")
    # sp-fused Pallas geometry MLP (compiles at SP_TILE_N<=256 on HW;
    # the round-2 HTTP 500 was a VMEM overflow at tile 512)
    measure(dataclasses.replace(base, use_pallas_geo_mlp=True), 8192,
            "strict + sp-fused pallas geo MLP")
    measure(dataclasses.replace(base, use_pallas_geo_mlp=True,
                                tex_onehot_sample=True), 8192,
            "strict + sp-fused + tex_onehot")


if __name__ == "__main__":
    main()
