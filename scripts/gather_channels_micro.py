#!/usr/bin/env python
"""Microbenchmark: patch-gather rate vs channel count at 512^2.

gather_micro.py found the 12-ch full map gathers at ~23.6 ns/patch while
8-ch and 64-ch maps run at ~15.2 — the per-index cost depends on the
channel layout. This sweep finds the cheap widths so the strict path can
pad its packed map to one (exact: extra channels are sliced off).
"""
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
    from keypointnerf_tpu.ops.feat_sample import multiview_bilinear_sample

    dev = jax.devices()[0]
    V, N, K = 3, 524288, 8
    rng = np.random.default_rng(0)
    xy = jax.device_put(
        jnp.asarray(rng.uniform(-1, 1, (V, N, 2)), jnp.float32), dev
    )

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jax.device_put(jnp.zeros(8), dev)
    float(trivial(zeros))

    for C in (4, 8, 12, 14, 16, 24, 32, 48, 64, 84, 96, 128):
        fmap = jax.device_put(
            jnp.asarray(rng.normal(0, 1, (V, 512, 512, C)), jnp.bfloat16), dev
        )

        @jax.jit
        def run(fmap, xy, seed):
            def body(acc, k):
                x = xy + (seed + k).astype(jnp.float32) * 1e-6
                out = multiview_bilinear_sample(fmap, x)
                return acc + jnp.sum(out.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
            return acc

        float(run(fmap, xy, jnp.asarray(0)))
        t0 = time.perf_counter(); float(trivial(zeros))
        rt = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(fmap, xy, jnp.asarray(97)))
        dt = max(time.perf_counter() - t0 - rt, 1e-9) / K
        print(f"C={C:4d}  {dt*1e3:8.2f} ms/pass  {dt/(V*N)*1e9:6.2f} ns/patch",
              flush=True)


if __name__ == "__main__":
    main()
