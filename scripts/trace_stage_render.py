#!/usr/bin/env python
"""Stage-split decomposition of the shipped (post-cull) render paths.

The round-4 profiler's op attribution is degraded on the current relay
stack, and PERF.md's "Where the time goes" table still describes the
pre-cull 0.545 s render (VERDICT r4 weak 4). This script re-derives the
component table for the SHIPPED presets by timing the pipeline stages as
separate jitted scalar-output programs, back-to-back in one process
(relay rules: scalar fetches, fresh inputs per timed call, round-trip
floor subtracted):

  encode — source-view CNN encoders + fused-map assembly (per subject,
           amortized over all cameras of an orbit)
  score  — the conservative empty-ray scoring pass alone
           (render/empty_cull.py; per camera)
  render — the full per-camera render_rays_chunked on precomputed feats
           (= score + culled march + packed write-back)

march = render − score falls out by subtraction. Presets come from
models/presets.py (the benched definitions).

Usage:
  python scripts/trace_stage_render.py [--sizes 256,512] [--presets fast,strict]
"""
import argparse
import json
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
    ap.add_argument("--sizes", default="256,512")
    ap.add_argument("--presets", default="fast,strict")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.data.synthetic import look_at
    from keypointnerf_tpu.geometry.cameras import camera_rays, pixel_grid
    from keypointnerf_tpu.models import (
        KeypointNeRF, ViewBatch, fast_preset, strict_preset,
    )
    from keypointnerf_tpu.render.empty_cull import empty_ray_scores
    from keypointnerf_tpu.render.renderer import render_rays_chunked

    sample = make_sample(SyntheticConfig(image_size=512, n_views=4), seed=0)
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jax.device_put(jnp.zeros(8), dev)
    float(trivial(zeros))

    def rt_floor():
        t0 = time.perf_counter()
        float(trivial(zeros))
        return time.perf_counter() - t0

    def cam(seed):
        R, t = look_at(
            3.5 * np.array([np.cos(seed), 0.05, np.sin(seed)]), np.zeros(3))
        return jnp.asarray(R), jnp.asarray(t)

    rows = []
    for preset in args.presets.split(","):
        cfg = {"fast": fast_preset, "strict": strict_preset}[preset]()
        chunk = 8192 if preset == "fast" else 2048  # bench.py choices
        model = KeypointNeRF(cfg)
        with jax.default_device(cpu):
            vb_cpu = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
            params = jax.jit(model.init, static_argnums=2)(
                {"params": jax.random.key(0), "render": jax.random.key(1)},
                vb_cpu, True,
            )
        params = jax.device_put(params, dev)
        vb = jax.device_put(vb_cpu, dev)

        # -- encode (per subject) --
        @jax.jit
        def encode_fn(params, imgs, masks):
            feats = model.apply(params, imgs, masks,
                                method=KeypointNeRF.encode)
            return sum(jnp.sum(f.astype(jnp.float32)) * 1e-6
                       for f in jax.tree_util.tree_leaves(feats))

        float(encode_fn(params, vb.src_images, vb.src_masks))
        rt = rt_floor()
        t0 = time.perf_counter()
        float(encode_fn(params, vb.src_images + 1e-7, vb.src_masks))
        t_encode = max(time.perf_counter() - t0 - rt, 0.0)

        feats = jax.jit(
            lambda p, v: model.apply(p, v.src_images, v.src_masks,
                                     method=KeypointNeRF.encode)
        )(params, vb)
        feats = jax.device_put(feats, dev)

        for size in (int(s) for s in args.sizes.split(",")):
            pix = pixel_grid(size, size).astype(jnp.float32)

            # -- score (per camera) --
            @jax.jit
            def score_fn(vb, feats, R, t):
                origin, dirs, near, far = camera_rays(
                    pix, vb.tar_K, R, t, cfg.znear, cfg.zfar)
                s = empty_ray_scores(cfg, vb, origin, dirs, near, far,
                                     feats=feats)
                return jnp.sum(s)

            # -- full render on precomputed feats (per camera) --
            @jax.jit
            def render_fn(params, feats, vb, R, t):
                origin, dirs, near, far = camera_rays(
                    pix, vb.tar_K, R, t, cfg.znear, cfg.zfar)
                out = render_rays_chunked(
                    model, params, feats, vb, origin, dirs, near, far,
                    chunk=chunk)
                ov = jnp.max(out.get("cull_overflow", jnp.zeros(1)))
                return jnp.sum(out["rgb_fine"]) + 1e-30 * ov, ov

            R0, t0_ = cam(0.0)
            R1, t1_ = cam(1.234)
            float(score_fn(vb, feats, R0, t0_))
            rt = rt_floor()
            t0 = time.perf_counter()
            float(score_fn(vb, feats, R1, t1_))
            t_score = max(time.perf_counter() - t0 - rt, 0.0)

            warm = render_fn(params, feats, vb, R0, t0_)
            float(warm[0])
            rt = rt_floor()
            t0 = time.perf_counter()
            res = render_fn(params, feats, vb, R1, t1_)
            float(res[0])
            t_render = max(time.perf_counter() - t0 - rt, 0.0)
            assert float(warm[1]) == 0.0 and float(res[1]) == 0.0, (
                "cull overflow nonzero — stage numbers would be invalid")

            row = {
                "preset": preset, "size": size, "chunk": chunk,
                "encode_s_per_subject": round(t_encode, 4),
                "score_s_per_cam": round(t_score, 4),
                "render_s_per_cam": round(t_render, 4),
                "march_s_per_cam": round(t_render - t_score, 4),
                "rays_per_sec_ex_encode": round(size * size / t_render, 1),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    print(json.dumps({"metric": "render_stage_split", "rows": rows}))


if __name__ == "__main__":
    main()
