#!/usr/bin/env python
"""Benchmark: rendering throughput (rays/sec/chip) on the flagship model.

Run by the driver on real TPU hardware at the end of every round. Prints
ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured path is the full coarse+fine inference ray-march (64 + 64
samples, union -> 128 composited) of the zju-config model at 256x256,
including multi-view feature sampling, spatial encoding, geometry MLP
fusion and the IBR color head — the reference's `render_pifu_nerf` hot
loop (reference src/model.py:897-1108). `vs_baseline` is measured against
BASELINE_RAYS_PER_SEC, the throughput of this repo's first working jnp/XLA
implementation on one chip (the reference publishes no speed numbers —
SURVEY.md §6 — so round 1 sets the bar and later rounds must beat it).
"""
import json
import os
import time

# persistent compile cache: the render program is compiled once per machine
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp

# Round-1 XLA baseline on a single chip (rays/sec), set from the first
# measurement on real TPU hardware. Update only upward.
BASELINE_RAYS_PER_SEC = 100_000.0

HEIGHT = WIDTH = 256
CHUNK = 8192


def main():
    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
    from keypointnerf_tpu.render import render_image

    cfg = KeypointNeRFConfig()  # zju defaults: 64 coarse + 64 fine
    model = KeypointNeRF(cfg)
    sample = make_sample(SyntheticConfig(image_size=512, n_views=4), seed=0)

    # init on CPU (avoids compiling the training graph on the accelerator —
    # only the render program below should occupy the TPU compiler)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vb_cpu = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
        params = jax.jit(model.init, static_argnums=2)(
            {"params": jax.random.key(0), "render": jax.random.key(1)}, vb_cpu, True
        )
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    vb = jax.device_put(vb_cpu, dev)

    # distinct target cameras per iteration — defeats any result memoization
    # between identical executions (the axon relay caches repeat calls)
    def vb_with_angle(i):
        import numpy as np

        from keypointnerf_tpu.data.synthetic import look_at

        ang = 0.3 + 0.11 * i
        eye = 3.5 * np.array([np.cos(ang), 0.05, np.sin(ang)])
        R, t = look_at(eye, np.zeros(3))
        return vb.replace(tar_R=jnp.asarray(R), tar_t=jnp.asarray(t))

    def dispatch(i):
        out = render_image(
            model, params, vb_with_angle(i), height=HEIGHT, width=WIDTH,
            stride=1, chunk=CHUNK,
        )
        return jnp.sum(out["rgb_fine"])

    # A scalar host fetch is the only reliable execution barrier on the
    # axon relay (block_until_ready returns before remote execution), but
    # each fetch pays a large tunnel round trip. So: dispatch n_iters
    # renders asynchronously, fetch ONE scalar depending on all of them,
    # and subtract the measured round-trip floor.
    float(dispatch(0))  # compile + warm

    t0 = time.perf_counter()
    float(jnp.sum(jnp.zeros(8)))  # round-trip floor on a trivial program
    t_rt = time.perf_counter() - t0

    n_iters = 8
    t0 = time.perf_counter()
    acc = []
    for i in range(n_iters):
        acc.append(dispatch(i + 1))
    float(sum(acc))
    total = time.perf_counter() - t0
    dt = max(total - t_rt, 1e-9) / n_iters

    rays = HEIGHT * WIDTH
    rays_per_sec = rays / dt
    print(
        json.dumps(
            {
                "metric": "render_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
