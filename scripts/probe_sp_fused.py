#!/usr/bin/env python
"""Probe: does the sp-fused Pallas kernel compile on the real TPU?

Round 2 recorded an opaque HTTP 500 from the remote Mosaic compiler for
the combined spatial-encoding + geometry-MLP kernel (docs/PERF.md kernel
table). VERDICT r2 item 7: try smaller tiles / simplified layouts and
record the outcome either way.

Runs sp_geo_mlp_apply at the render's real shapes with a few tile
configurations, reports compile success + parity vs the XLA twin + time.
"""
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from keypointnerf_tpu.models.mlp import GeoFusionMLP
    from keypointnerf_tpu.ops.pallas import fused_geo_mlp as fgm

    V, N, K = 3, 8192, 24
    rng = np.random.default_rng(0)
    dims1 = (168, 128, 128, 120, 64)
    dims2 = (128, 64, 64, 2)
    mlp = GeoFusionMLP(dims1=dims1, dims2=dims2, skip_dims=(64, 8),
                       skip_layers=(0, 2), nl_layer="softplus",
                       pool_types=("mean", "var"), pool_mode="")
    sp = jnp.asarray(rng.normal(0, 1, (V, N, 168)), jnp.float32)
    f0 = jnp.asarray(rng.normal(0, 1, (V, N, 64)), jnp.float32)
    f1 = jnp.asarray(rng.normal(0, 1, (V, N, 8)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (V, N, 1)) > 0.3, jnp.float32)
    w = mask / (jnp.sum(mask, 0, keepdims=True) + 1e-6)
    params = mlp.init(jax.random.key(0), sp, [f0, f1], mask, w)["params"]

    pts_cam = jnp.asarray(rng.normal(0, 1, (V, N, 3)), jnp.float32)
    kpt_cam = jnp.asarray(rng.normal(0, 1, (V, K, 3)), jnp.float32)

    # XLA twin for parity
    from keypointnerf_tpu.ops.pallas.fused_geo_mlp import (
        _sp_mlp_stack, fold_weight_norm,
    )
    ws = fold_weight_norm(params)
    ref_out, ref_valid, _, _ = jax.jit(
        lambda: _sp_mlp_stack(pts_cam, kpt_cam.reshape(-1, 3), f0, f1, mask,
                              w, ws, 3, 0.1, 1.0, jnp.float32)
    )()
    ref_out = np.asarray(ref_out)

    for tile in (256, 128, 64, 512):
        fgm.SP_TILE_N = tile
        t0 = time.time()
        try:
            out, valid, lv, lf = jax.jit(
                lambda: fgm.sp_geo_mlp_apply(
                    params, pts_cam, kpt_cam, f0, f1, mask, w,
                    sp_level=3, sp_sigma=0.1, sp_scale=1.0,
                )
            )()
            out = np.asarray(out)
            err = float(np.max(np.abs(out - ref_out)))
            print(f"SP_TILE_N={tile}: COMPILED in {time.time()-t0:.0f}s, "
                  f"max|err|={err:.2e}", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:200]
            print(f"SP_TILE_N={tile}: FAILED after {time.time()-t0:.0f}s: "
                  f"{type(e).__name__}: {msg}", flush=True)
            if tile == 256:
                traceback.print_exc(limit=3)


if __name__ == "__main__":
    main()
