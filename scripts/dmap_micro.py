#!/usr/bin/env python
"""Microbench the bilinear dmap (map-gradient) formulations at the ZJU
train step's exact shapes.

Round-5 stage split (scripts/bisect_train_stage.py): the mm-VJP dmap
contractions cost ~0.21 s of the 0.61 s train step (query_dfeats −
query) — the largest attackable term — while their dense-MTTKRP FLOPs
(N·H·W·C over the three per-map gathers, V=3) are only ~6.6 TFLOP bf16
≈ 33 ms at peak: the shipped kernel runs at ~16% utilization, bounded
by per-grid-step overhead and the VPU-side one-hot expansion, not MXU
math. This sweep times, per map shape:

  scan           — the XLA lax.scan formulation (ops/feat_sample.py)
  k128           — shipped kernel (TILE_N=128, iota//C expansion)
  k128_bx        — broadcast-built expansion (fewer VPU passes)
  k{256,512}_bx  — larger point tiles (VMEM budget permitting)

All variants are exact (same round-once product); parity is asserted
against the scan to bf16-reassociation level before timing.

Usage: python scripts/dmap_micro.py [--n 524288]
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
    ap.add_argument("--n", type=int, default=524288)
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--k", type=int, default=4, help="repeats per timed call")
    ap.add_argument("--sweep-bx", action="store_true",
                    help="include the broadcast-xwe / large-tile kernel "
                         "variants (Mosaic rejected the reshape on the "
                         "current toolchain — kept for re-testing)")
    ap.add_argument("--two-pass", action="store_true",
                    help="also time the winners at the step's real "
                         "two-pass (coarse+fine, N/2 each) granularity")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from keypointnerf_tpu.ops.feat_sample import _mm_bwd_impl
    from keypointnerf_tpu.ops.pallas.onehot_dmap import bilinear_dmap_onehot

    dev = jax.devices()[0]
    V, N, K = args.views, args.n, args.k

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jax.device_put(jnp.zeros(8), dev)
    float(trivial(zeros))

    def rt():
        t0 = time.perf_counter()
        float(trivial(zeros))
        return time.perf_counter() - t0

    # the three training-path map gradients (per-map recipe, bf16 maps)
    shapes = [
        ("coarse", 128, 128, 64),
        ("hd", 256, 256, 8),
        ("tex", 256, 256, 8),
    ]
    rng = np.random.default_rng(0)
    results = {}
    for name, H, W, C in shapes:
        xy = jnp.asarray(rng.uniform(-1, 1, (V, N, 2)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((V, N, C)) * 0.01, jnp.float32)
        feat = jnp.zeros((H, W, C), jnp.bfloat16)  # dtype carrier only
        xy, g = jax.device_put(xy, dev), jax.device_put(g, dev)

        def scan_dmap(xy1, g1):
            dmap, _ = _mm_bwd_impl((feat, xy1), g1.astype(jnp.bfloat16), None,
                                   False)
            return dmap

        variants = {"scan": jax.jit(
            lambda xy, g: jnp.sum(jax.vmap(scan_dmap)(xy, g)
                                  .astype(jnp.float32)))}

        def make_kernel(tile_n, bx):
            def f(xy1, g1):
                return bilinear_dmap_onehot(
                    xy1, g1, H, W, map_dtype=jnp.bfloat16,
                    tile_n=tile_n, broadcast_xwe=bx,
                )
            return jax.jit(lambda xy, g: jnp.sum(jax.vmap(f)(xy, g)
                                                 .astype(jnp.float32)))

        variants["k128"] = make_kernel(128, False)
        if args.sweep_bx:
            variants["k128_bx"] = make_kernel(128, True)
            # VMEM: the f32 (P, W*C) intermediates cap the tile; try
            # larger tiles and let Mosaic reject what does not fit
            for tn in (256, 512, 1024):
                if tn * W * C * 4 * 2.5 < 15e6:  # rough budget incl. casts
                    variants[f"k{tn}_bx"] = make_kernel(tn, True)

        if args.two_pass:
            # the real step gathers in TWO passes (coarse + fine, N/2
            # each): time the winning formulations at that granularity
            half = N // 2

            def two(fn1):
                return jax.jit(lambda xy, g: fn1(xy[:, :half], g[:, :half])
                               + fn1(xy[:, half:], g[:, half:]))

            variants["scan_2pass"] = two(
                lambda xy, g: jnp.sum(jax.vmap(scan_dmap)(xy, g)
                                      .astype(jnp.float32)))
            k = make_kernel(128, False)
            variants["k128_2pass"] = two(lambda xy, g: k(xy, g))

        row = {}
        ref_val = None
        for vname, fn in variants.items():
            try:
                t0 = time.time()
                val = float(fn(xy, g))
                print(f"# {name}/{vname}: compile+first {time.time()-t0:.1f}s",
                      file=sys.stderr, flush=True)
                if ref_val is None:
                    ref_val = val
                else:
                    rel = abs(val - ref_val) / (abs(ref_val) + 1e-12)
                    assert rel < 1e-3, (name, vname, val, ref_val)
                floor = rt()
                # fresh input per timed call (relay pipelines repeats)
                ts = []
                for i in range(2):
                    xy2 = xy + jnp.float32(1e-7 * (i + 1))
                    t0 = time.perf_counter()
                    float(fn(xy2, g))
                    ts.append(time.perf_counter() - t0 - floor)
                row[vname] = round(max(min(ts), 1e-9), 4)
            except Exception as e:  # VMEM overflow etc.
                row[vname] = f"FAIL: {type(e).__name__}"
                print(f"# {name}/{vname}: {e}", file=sys.stderr)
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    print(json.dumps({"metric": "dmap_micro_s", "n": N, "views": V,
                      "results": results}))


if __name__ == "__main__":
    main()
