#!/usr/bin/env python
"""Microbenchmark: per-map bilinear patch-gather cost at the strict render's
exact shapes and index patterns (VERDICT r2 item 2 groundwork).

For each map shape used by the strict path — full 12ch@512², coarse
64ch@128², tex 8ch@256² — times `multiview_bilinear_sample` at N points per
view with three index patterns:
  * march: ray-march-like coherent indices (consecutive depth samples
    project ~1-2 px apart along epipolar segments)
  * const: all points hit one pixel (perfect locality — isolates the pure
    index-issue rate from HBM row locality)
  * random: uniform random (worst locality)

Each timing is ONE jitted program (lax.scan over K repeats with varying
phase so the relay can't memoize), scalar output, round-trip subtracted.
"""
import argparse
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
    ap.add_argument("--n", type=int, default=524288)  # 8192 rays x 64 samples
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    from keypointnerf_tpu.ops.feat_sample import multiview_bilinear_sample

    dev = jax.devices()[0]
    V, N, K = args.views, args.n, args.k
    rng = np.random.default_rng(0)

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jax.device_put(jnp.zeros(8), dev)
    float(trivial(zeros))

    # march-like xy: R rays x S samples; each ray starts at a random pixel
    # and drifts a random sub-2px step per sample (epipolar segments)
    S = 64
    R = N // S
    starts = rng.uniform(-0.9, 0.9, (V, R, 1, 2))
    steps = rng.uniform(-2.0, 2.0, (V, R, 1, 2)) * (2.0 / 512.0)
    t = np.arange(S).reshape(1, 1, S, 1)
    xy_march = np.clip(starts + steps * t, -1.0, 1.0).reshape(V, N, 2)
    xy_const = np.zeros((V, N, 2))
    xy_rand = rng.uniform(-1.0, 1.0, (V, N, 2))

    for label, (H, W, C) in (("full 12ch@512", (512, 512, 12)),
                             ("coarse 64ch@128", (128, 128, 64)),
                             ("tex 8ch@256", (256, 256, 8))):
        fmap = jax.device_put(
            jnp.asarray(rng.normal(0, 1, (V, H, W, C)), jnp.bfloat16), dev
        )
        for pat, xy in (("march", xy_march), ("const", xy_const),
                        ("random", xy_rand)):
            xyd = jax.device_put(jnp.asarray(xy, jnp.float32), dev)

            @jax.jit
            def run(fmap, xy, seed):
                def body(acc, k):
                    # vary the coords slightly per repeat: defeats CSE and
                    # relay memoization without changing the access pattern
                    x = xy + (seed + k).astype(jnp.float32) * 1e-6
                    out = multiview_bilinear_sample(fmap, x)
                    return acc + jnp.sum(out.astype(jnp.float32)), None

                acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
                return acc

            float(run(fmap, xyd, jnp.asarray(0)))  # compile+warm
            t0 = time.perf_counter(); float(trivial(zeros))
            rt = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(run(fmap, xyd, jnp.asarray(97)))
            dt = max(time.perf_counter() - t0 - rt, 1e-9) / K
            ns = dt / (V * N) * 1e9
            print(f"{label:18s} {pat:7s} {dt*1e3:8.2f} ms/pass  "
                  f"{ns:6.2f} ns/patch", flush=True)


if __name__ == "__main__":
    main()
