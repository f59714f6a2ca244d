#!/usr/bin/env python
"""Hull-fraction audit for the exact empty-ray cull on the bench scene.

Prints, for every bench.py orbit camera at 256^2 and 512^2, the fraction
of rays whose conservative score exceeds EMPTY_SCORE_THRESHOLD under
  * strict scoring (per-sample all-view bound, full-res masks), and
  * fast scoring (min-over-views of max-over-samples on the half-res
    fused mask map — the sound bound under gather_lerp/fused_map_half).

The cull budget (cull_empty_rays_ratio) must exceed these fractions for
the runtime `cull_overflow` guard to stay zero; bench.py's presets are
chosen from this table.
"""
import dataclasses
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", type=int, default=8,
                    help="dilated max-pool cell size in map pixels: "
                         "smaller = tighter bound (lower hull fraction, "
                         "smaller legal budget) at higher scoring cost")
    args = ap.parse_args()
    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.data.synthetic import look_at
    from keypointnerf_tpu.geometry.cameras import camera_rays, pixel_grid
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
    from keypointnerf_tpu.render.empty_cull import (
        EMPTY_SCORE_THRESHOLD,
        empty_ray_scores,
    )

    strict_cfg = KeypointNeRFConfig(compute_dtype=jnp.bfloat16)
    fast_cfg = dataclasses.replace(
        strict_cfg, fused_feature_map=True, fused_map_half=True, gather_lerp=True
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
    def fractions(vb, feats, R, t, pix):
        origin, dirs, near, far = camera_rays(
            pix, vb.tar_K, R, t, strict_cfg.znear, strict_cfg.zfar
        )
        hull = lambda s: jnp.mean((s > EMPTY_SCORE_THRESHOLD).astype(jnp.float32))
        return (
            hull(empty_ray_scores(strict_cfg, vb, origin, dirs, near, far,
                                  cell=args.cell)),
            hull(empty_ray_scores(fast_cfg, vb, origin, dirs, near, far,
                                  cell=args.cell, feats=feats)),
        )

    # both orbits bench.py times (seed 0.0 warms, seed 1.234 measures)
    for size, n_cams in ((256, 4), (512, 2)):
        pix = pixel_grid(size, size).astype(jnp.float32)
        for seed in (0.0, 1.234):
            for i in range(n_cams):
                ang = seed + 0.7 * i
                eye = 3.5 * np.array([np.cos(ang), 0.05, np.sin(ang)])
                R, t = look_at(eye, np.zeros(3))
                fs, ff = fractions(vb, feats, jnp.asarray(R), jnp.asarray(t), pix)
                print(f"cell={args.cell} size={size} seed={seed} cam={i}: "
                      f"strict_hull={float(fs):.4f} fast_hull={float(ff):.4f}",
                      flush=True)


if __name__ == "__main__":
    main()
