#!/usr/bin/env python
"""Microbench the encode stage: CNN encoders vs fused-map assembly.

Round-5 stage split (scripts/trace_stage_render.py): fast-preset encode
costs 572 ms per subject vs 37 ms for the strict per-map encode — the
~535 ms difference is the fused-map ASSEMBLY (upsample gathers + concat
+ half-grid resample), which on paper is ~200k regular-grid patch
gathers ≈ a few ms. This script splits encode to find where the time
goes:

  cnns      — geo_encoder + tex_encoder alone (shared by both presets)
  fast_enc  — full encode under the fast preset (fused half map)
  strict_enc— full encode under the strict preset (per-map)

Usage: python scripts/encode_micro.py
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.models import (
        KeypointNeRF, ViewBatch, fast_preset, strict_preset,
    )

    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    sample = make_sample(SyntheticConfig(image_size=512, n_views=4), seed=0)
    with jax.default_device(cpu):
        vb = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jax.device_put(jnp.zeros(8), dev)
    float(trivial(zeros))

    def rt():
        t0 = time.perf_counter()
        float(trivial(zeros))
        return time.perf_counter() - t0

    results = {}
    for name, cfg in (("fast", fast_preset()), ("strict", strict_preset())):
        model = KeypointNeRF(cfg)
        with jax.default_device(cpu):
            params = jax.jit(model.init, static_argnums=2)(
                {"params": jax.random.key(0), "render": jax.random.key(1)},
                vb, True,
            )
        params = jax.device_put(params, dev)
        imgs = jax.device_put(vb.src_images, dev)
        masks = jax.device_put(vb.src_masks, dev)

        @jax.jit
        def enc(params, imgs, masks, model=model):
            feats = model.apply(params, imgs, masks,
                                method=KeypointNeRF.encode)
            return sum(jnp.sum(f.astype(jnp.float32)) * 1e-6
                       for f in jax.tree_util.tree_leaves(feats))

        @jax.jit
        def cnns(params, imgs, model=model):
            # the conv stacks alone (encode minus assembly): geo + tex
            from keypointnerf_tpu.models.cnn import avg_pool2
            x = (2.0 * imgs - 1.0).astype(model.cfg.compute_dtype)
            def run(p):
                xg = x
                for _ in range(model.cfg.ds_geo):
                    xg = avg_pool2(xg)
                xt = x
                for _ in range(model.cfg.ds_tex):
                    xt = avg_pool2(xt)
                geo = model.apply(p, xg, method=lambda m, a: m.geo_encoder(a))
                tex = model.apply(p, xt, method=lambda m, a: m.tex_encoder(a))
                return geo, tex
            g, t = run(params)
            return sum(jnp.sum(f.astype(jnp.float32)) * 1e-6
                       for f in jax.tree_util.tree_leaves((g, t)))

        for vname, fn, args in (
            (f"{name}_enc", enc, (params, imgs, masks)),
            (f"{name}_cnns", cnns, (params, imgs)),
        ):
            t0 = time.time()
            float(fn(*args))
            print(f"# {vname}: compile+first {time.time()-t0:.1f}s",
                  file=sys.stderr, flush=True)
            floor = rt()
            ts = []
            for i in range(2):
                a2 = (args[0], args[1] + jnp.float32(1e-7 * (i + 1))) + args[2:]
                t0 = time.perf_counter()
                float(fn(*a2))
                ts.append(time.perf_counter() - t0 - floor)
            results[vname] = round(min(ts), 4)
            print(json.dumps({vname: results[vname]}), flush=True)

    print(json.dumps({"metric": "encode_micro_s", "results": results}))


if __name__ == "__main__":
    main()
