#!/usr/bin/env python
"""Microbenchmark: which map dimension drives the gather-rate step.

gather_size_micro.py: maps with H=W<=256 gather at 15.2 ns/patch, >=384 at
23.6. This probes rectangles and the exact threshold to see whether H, W,
or area gates the fast rate — if only one axis matters, a 512^2 map can be
reshaped into a (256, 1024)-style layout and gathered at the fast rate
with plain 2D indices (halo-free if folding is along the slow axis).
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

V, N, K = 3, 524288, 8


def main():
    rng = np.random.default_rng(0)

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jnp.zeros(8)
    float(trivial(zeros))

    def bench_shape(H, W, C=12):
        fmap = jnp.asarray(rng.normal(0, 1, (V, H, W, C)), jnp.bfloat16)
        y0 = jnp.asarray(rng.integers(0, H - 1, (V, N)), jnp.int32)
        x0 = jnp.asarray(rng.integers(0, W - 1, (V, N)), jnp.int32)
        starts = jnp.stack([y0, x0], axis=-1)

        def gather_one(fm, st):
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1),
            )
            return jax.lax.gather(
                fm, st, dn, slice_sizes=(2, 2, C),
                mode=jax.lax.GatherScatterMode.CLIP,
            )

        @jax.jit
        def run(fmap, starts, seed):
            def body(acc, k):
                st = jnp.minimum(starts + (seed + k) % 2, jnp.asarray([H - 2, W - 2]))
                out = jax.vmap(gather_one)(fmap, st)
                return acc + jnp.sum(out.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
            return acc

        float(run(fmap, starts, jnp.asarray(0)))
        t0 = time.perf_counter(); float(trivial(zeros))
        rt = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(fmap, starts, jnp.asarray(97)))
        dt = max(time.perf_counter() - t0 - rt, 1e-9) / K
        print(f"({H:5d},{W:5d}) C={C:3d}: {dt*1e3:8.2f} ms/pass "
              f"{dt/(V*N)*1e9:6.2f} ns/patch", flush=True)

    for H, W in ((256, 256), (256, 512), (512, 256), (256, 1024),
                 (1024, 256), (288, 288), (320, 320), (272, 272),
                 (264, 264), (260, 260)):
        bench_shape(H, W)


if __name__ == "__main__":
    main()
