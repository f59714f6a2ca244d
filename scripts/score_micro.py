#!/usr/bin/env python
"""Micro-benchmark: what does `empty_ray_scores` itself cost per camera?

The round-4 cull made the march cheap; the scoring pass (every ray x 128
samples x V views of one-hot cell lookups) is a fixed per-camera cost
that now matters. Measures the jitted score pass alone at bench shapes,
for the strict (full-res masks) and fast (half-res fused map) bounds,
across cell sizes and score chunk sizes.
"""
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.data.synthetic import look_at
    from keypointnerf_tpu.geometry.cameras import camera_rays, pixel_grid
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
    from keypointnerf_tpu.render.empty_cull import empty_ray_scores

    strict_cfg = KeypointNeRFConfig(compute_dtype=jnp.bfloat16)
    fast_cfg = dataclasses.replace(
        strict_cfg, fused_feature_map=True, fused_map_half=True,
        gather_lerp=True,
    )
    sample = make_sample(SyntheticConfig(image_size=512, n_views=4), seed=0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vb_cpu = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
        model = KeypointNeRF(fast_cfg)
        params = jax.jit(model.init, static_argnums=2)(
            {"params": jax.random.key(0), "render": jax.random.key(1)}, vb_cpu, True
        )
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    vb = jax.device_put(vb_cpu, dev)
    feats = jax.jit(
        lambda p, v: model.apply(p, v.src_images, v.src_masks,
                                 method=KeypointNeRF.encode)
    )(params, vb)

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jax.device_put(jnp.zeros(8), dev)
    float(trivial(zeros))

    for size in (256, 512):
        pix = pixel_grid(size, size).astype(jnp.float32)

        def run(cfg, use_feats, cell, score_chunk, label):
            @jax.jit
            def score(vb, feats, R, t, seed):
                origin, dirs, near, far = camera_rays(
                    pix, vb.tar_K, R, t, cfg.znear, cfg.zfar
                )
                s = empty_ray_scores(
                    cfg, vb, origin, dirs + 0.0 * seed, near, far,
                    cell=cell, score_chunk=score_chunk,
                    feats=feats if use_feats else None,
                )
                return jnp.sum(s)

            def one(seed):
                R, t = look_at(
                    3.5 * np.array([np.cos(seed), 0.05, np.sin(seed)]),
                    np.zeros(3),
                )
                return float(score(vb, feats, jnp.asarray(R), jnp.asarray(t),
                                   jnp.asarray(seed, jnp.float32)))

            one(0.0)
            t0 = time.perf_counter(); float(trivial(zeros))
            rt = time.perf_counter() - t0
            t0 = time.perf_counter(); one(1.234)
            dt = max(time.perf_counter() - t0 - rt, 1e-9)
            print(f"{size}^2 {label:40s} {dt * 1e3:8.2f} ms", flush=True)

        run(strict_cfg, False, 8, 2048, "strict cell=8 chunk=2048 (shipped)")
        run(strict_cfg, False, 16, 2048, "strict cell=16")
        run(fast_cfg, True, 8, 2048, "fast/half cell=8 chunk=2048 (shipped)")
        run(fast_cfg, True, 8, 512, "fast/half cell=8 chunk=512")
        run(fast_cfg, True, 8, 8192, "fast/half cell=8 chunk=8192")
        run(fast_cfg, True, 16, 2048, "fast/half cell=16")


if __name__ == "__main__":
    main()
