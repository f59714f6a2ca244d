#!/usr/bin/env python
"""Benchmark: rendering throughput (rays/sec/chip) on the flagship model.

Run by the driver on real TPU hardware at the end of every round. Prints
ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Three measurements (VERDICT r1 items 4 & 10):
  * value                — fast path at 256x256 (bf16, fused feature map,
                           coarse/fine ray culling, coarse-value reuse,
                           stride-2 epipolar gather-lerp, exact
                           empty-ray cull at budget 0.25).
                           Headline; comparable to the round-1 baseline.
  * strict_rays_per_sec  — strict reference semantics at 256x256: the
                           full 128-depth union composited, no fused map
                           approximation (reference src/model.py:942-1108),
                           outputs BIT-IDENTICAL to marching every ray.
                           Two exact implementation optimizations are on:
                           the coarse-value-reuse merge and the round-4
                           empty-ray cull (see strict_cfg comment; both
                           HW-verified identical, and the cull's runtime
                           overflow guard is asserted zero per camera).
  * rays_per_sec_512     — fast path at the reference's eval resolution
                           512x512 (src/model.py:897-940).

The measured path is the full coarse+fine inference ray-march (64 + 64
samples) of the zju-config model, including multi-view feature sampling,
spatial encoding, geometry MLP fusion and the IBR color head.

Relay-awareness: on the axon TPU relay, eager ops and host fetches each
pay a large tunnel round trip and block_until_ready does not block. So
each measurement is ONE jitted program — a lax.scan over orbit cameras,
each a full-image render reduced to a scalar — timed between two
single-scalar fetches with the round-trip floor subtracted.

`vs_baseline` is measured against BASELINE_RAYS_PER_SEC, the throughput of
this repo's first working jnp/XLA implementation on one chip at 256x256
(the reference publishes no speed numbers — SURVEY.md §6 — so round 1 set
the bar and later rounds must beat it).
"""
import dataclasses
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _wait_for_axon_relay():
    """Poll the local axon relay before initializing jax.

    The relay (this container's only path to the TPU) occasionally goes
    hard down — every port refuses and ``jax.devices()`` hangs for
    minutes before erroring. When the environment says the axon backend
    will be used, probe its loopback ports and wait (bounded, default
    30 min, override via BENCH_RELAY_WAIT_SECS) for one to accept a
    connection, so a transient relay outage at measurement time doesn't
    turn into a lost benchmark.
    """
    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return
    import socket
    import sys

    def up():
        for port in (8082, 8093, 8081):
            try:
                with socket.create_connection(("127.0.0.1", port), timeout=3):
                    return True
            except OSError:
                pass
        return False

    deadline = time.time() + float(os.environ.get("BENCH_RELAY_WAIT_SECS", "1800"))
    waited = False
    while not up():
        if time.time() > deadline:
            print("bench: axon relay still unreachable; proceeding "
                  "(jax init will fail loudly)", file=sys.stderr)
            return
        waited = True
        print("bench: axon relay down, retrying in 60s...", file=sys.stderr)
        time.sleep(60)
    if waited:
        print("bench: axon relay is back", file=sys.stderr)


_wait_for_axon_relay()

import jax
import jax.numpy as jnp
import numpy as np

# Round-1 XLA baseline on a single chip (rays/sec): the first honest
# measurement of the naive jnp/XLA implementation on TPU v5e (f32, row
# gathers, (R,S,V,C) layout) at 256x256. vs_baseline = current / this.
BASELINE_RAYS_PER_SEC = 9_187.0

CHUNK = 8192


def main():
    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.data.synthetic import look_at
    from keypointnerf_tpu.geometry.cameras import camera_rays, pixel_grid
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
    from keypointnerf_tpu.render.renderer import render_rays_chunked

    # Both presets come from the ONE definition site,
    # keypointnerf_tpu/models/presets.py (see its docstring for the full
    # measured rationale of every flag — fused half-res map, stride-2
    # gather-lerp, exact empty-ray cull with the runtime overflow guard,
    # mild fine-0.75 cut inside the culled set, and why aggressive topk
    # composed with the cull is the rejected −2.0 dB trap). The strict
    # preset is BIT-IDENTICAL to marching every ray of the full 128-depth
    # union with exact per-map lookups (HW-verified sum_rel_delta=0,
    # scripts/measure_strict_variants.py); budget 0.1875 covers this
    # scene's measured hull max 0.1546 and the cull_overflow guard is
    # asserted zero for every camera below.
    from keypointnerf_tpu.models import fast_preset, strict_preset

    fast_cfg = fast_preset()
    strict_cfg = strict_preset()
    sample = make_sample(SyntheticConfig(image_size=512, n_views=4), seed=0)

    # init on CPU (avoids compiling the training graph on the accelerator)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vb_cpu = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
        init_model = KeypointNeRF(fast_cfg)
        params = jax.jit(init_model.init, static_argnums=2)(
            {"params": jax.random.key(0), "render": jax.random.key(1)}, vb_cpu, True
        )
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    vb = jax.device_put(vb_cpu, dev)

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jax.device_put(jnp.zeros(8), dev)
    float(trivial(zeros))  # compile trivial

    def orbit(seed, n_cameras):
        Rs, ts = [], []
        for i in range(n_cameras):
            ang = seed + 0.7 * i
            eye = 3.5 * np.array([np.cos(ang), 0.05, np.sin(ang)])
            R, t = look_at(eye, np.zeros(3))
            Rs.append(R)
            ts.append(t)
        return jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(ts))

    def measure(cfg, size, n_cameras, chunk=CHUNK):
        model = KeypointNeRF(cfg)
        pix = pixel_grid(size, size).astype(jnp.float32)

        @jax.jit
        def render_many(params, vb, Rs, ts):
            feats = model.apply(
                params, vb.src_images, vb.src_masks, method=KeypointNeRF.encode
            )

            def one(acc, Rt):
                R, t = Rt
                origin, dirs, near, far = camera_rays(
                    pix, vb.tar_K, R, t, cfg.znear, cfg.zfar
                )
                out = render_rays_chunked(
                    model, params, feats, vb, origin, dirs, near, far, chunk=chunk
                )
                # empty-cull runtime exactness guard, reduced across the
                # orbit (must stay 0.0 — asserted after the timed fetch)
                ov = jnp.max(out.get("cull_overflow", jnp.zeros(1)))
                return (acc[0] + jnp.sum(out["rgb_fine"]),
                        jnp.maximum(acc[1], ov)), None

            (total, ov), _ = jax.lax.scan(
                one, (jnp.asarray(0.0), jnp.asarray(0.0)), (Rs, ts)
            )
            return total, ov

        Rs0, ts0 = orbit(0.0, n_cameras)
        warm = render_many(params, vb, Rs0, ts0)  # compile + warm
        float(warm[0])

        t0 = time.perf_counter()
        float(trivial(zeros))
        t_rt = time.perf_counter() - t0  # round-trip floor

        Rs1, ts1 = orbit(1.234, n_cameras)
        t0 = time.perf_counter()
        res = render_many(params, vb, Rs1, ts1)
        float(res[0])
        total = time.perf_counter() - t0
        # exactness guard AFTER the timed fetch: a nonzero overflow means
        # the cull budget missed hull rays and the numbers would be invalid
        assert float(warm[1]) == 0.0 and float(res[1]) == 0.0, (
            "empty-ray cull budget exceeded on the bench scene: "
            f"warm={float(warm[1])}, measured={float(res[1])}"
        )
        dt = max(total - t_rt, 1e-9) / n_cameras
        return size * size / dt

    def measure_train():
        """Full-optimizer-step throughput at the shipped ZJU recipe and the
        reference's REAL training geometry: 64x64-ray patch, 64+64 samples,
        bf16 + per-map gathers + matmul gather-VJP (shape-aware dmap:
        Pallas VMEM kernel for the wide coarse map, XLA scan for the 8-ch
        maps — scripts/dmap_micro.py), NO remat, full loss incl. 0.5*VGG
        on random frozen features (reference configs/zju.json:18-23,
        36-37, 106-111). Round 5 flipped the recipe off remat: the
        no-remat step now FITS the v5e's 16 GB (round-2's 15.99 G OOM
        predated the partial-channel dmap's memory cuts) and skips the
        backward recompute — 0.5242 (remat) -> 0.4917 s/step measured
        (scripts/bench_train.py A/B). cfg.remat stays one flag away for
        tighter-HBM configurations. One jitted lax.scan of K complete
        steps with scalar-only outputs (relay rule: docs/PERF.md)."""
        from keypointnerf_tpu.models.vgg import init_vgg_params
        from keypointnerf_tpu.training import OptimConfig, create_train_state
        from keypointnerf_tpu.training.losses import LossConfig, compute_losses

        import optax

        train_cfg = KeypointNeRFConfig(
            compute_dtype=jnp.bfloat16, patch_h=64, patch_w=64,
            remat=False, train_matmul_gather_vjp=True,
            remat_save_gathers=False,
            # round-4/5: VMEM-accumulator dmap kernel where it wins
            # (C >= 32; ops/feat_sample.py shape-aware routing)
            train_pallas_dmap=True,
        )
        t_model = KeypointNeRF(train_cfg)
        loss_cfg = LossConfig()
        with jax.default_device(cpu):
            state = create_train_state(
                t_model, vb_cpu, OptimConfig(), vgg_params=init_vgg_params()
            )
        state = jax.device_put(state, dev)
        K = 2

        @jax.jit
        def run_k(state, vb, seed):
            def body(s, k):
                rng = jax.random.fold_in(jax.random.key(0), k + seed)

                def loss_fn(p):
                    out = t_model.apply(p, vb, True, rngs={"render": rng})
                    return compute_losses(out, loss_cfg, s.vgg_params)

                (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(s.params)
                gn = optax.global_norm(grads)
                return s.apply_gradients(grads=grads), total + 1e-30 * gn

            fin, losses = jax.lax.scan(body, state, jnp.arange(K))
            chk = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(fin.params))
            return losses[-1], chk

        l, _ = run_k(state, vb, jnp.asarray(0))
        float(l)  # compile + warm
        vb2 = dataclasses.replace(vb, src_images=vb.src_images + jnp.float32(1e-7))
        t0 = time.perf_counter()
        float(trivial(zeros))
        t_rt = time.perf_counter() - t0
        t0 = time.perf_counter()
        l, _ = run_k(state, vb2, jnp.asarray(1000))
        float(l)
        dt = max(time.perf_counter() - t0 - t_rt, 1e-9) / K
        return 64 * 64 / dt, dt

    fast_256 = measure(fast_cfg, 256, 4)
    fast_512 = measure(fast_cfg, 512, 2)
    # chunk 2048 measured fastest for the culled strict path (+3% over
    # 4096; scripts/measure_strict_variants.py STRICT_CULL_ONLY) — a
    # scheduling effect, not a semantics change
    strict_256 = measure(strict_cfg, 256, 2, chunk=2048)
    strict_512 = measure(strict_cfg, 512, 1, chunk=2048)
    train_rps, train_spstep = measure_train()

    print(
        json.dumps(
            {
                "metric": "render_rays_per_sec_per_chip",
                "value": round(fast_256, 1),
                "unit": "rays/s",
                "vs_baseline": round(fast_256 / BASELINE_RAYS_PER_SEC, 3),
                "rays_per_sec_512": round(fast_512, 1),
                "strict_rays_per_sec": round(strict_256, 1),
                "strict_vs_baseline": round(strict_256 / BASELINE_RAYS_PER_SEC, 3),
                "strict_rays_per_sec_512": round(strict_512, 1),
                "train_rays_per_sec": round(train_rps, 1),
                "train_s_per_step": round(train_spstep, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
