#!/usr/bin/env python
"""Per-chip batch sweep of the train step at the reference geometry.

VERDICT r2 item 4: does batch>1/chip pay on a 16 GB v5e? The CNN encoders
amortize across samples, but activations scale with batch; remat already
trades FLOPs for memory. Measures s/step and rays/s for
batch_per_device in {1, 2, 4} with the shipped recipe (bf16 + per-map +
remat + mm-VJP + VGG term), OOM reported as such.

Usage: python scripts/bench_train_batch.py [--rays 4096] [--samples 64]
"""
import argparse
import dataclasses
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--k", type=int, default=2)
    args = ap.parse_args()

    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
    from keypointnerf_tpu.models.vgg import init_vgg_params
    from keypointnerf_tpu.training import OptimConfig, create_train_state
    from keypointnerf_tpu.training.losses import LossConfig, compute_losses

    import optax

    side = int(args.rays ** 0.5)
    cfg = KeypointNeRFConfig(
        patch_h=side, patch_w=side, n_coarse=args.samples, n_fine=args.samples,
        compute_dtype=jnp.bfloat16, train_matmul_gather_vjp=True, remat=True,
    )
    model = KeypointNeRF(cfg)
    loss_cfg = LossConfig()
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    with jax.default_device(cpu):
        vb1 = ViewBatch(**{
            k: jnp.asarray(v)
            for k, v in make_sample(SyntheticConfig(image_size=512, n_views=4),
                                    seed=0).items()
        })
        state0 = create_train_state(model, vb1, OptimConfig(),
                                    vgg_params=init_vgg_params())

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jax.device_put(jnp.zeros(8), dev)
    float(trivial(zeros))
    K = args.k

    for B in args.batches:
        with jax.default_device(cpu):
            batch = jax.tree.map(
                lambda x: jnp.stack([x + 1e-6 * i for i in range(B)]), vb1
            )
        try:
            state = jax.device_put(state0, dev)
            vbB = jax.device_put(batch, dev)

            @jax.jit
            def run_k(state, vbB, seed):
                def body(s, k):
                    rng = jax.random.fold_in(jax.random.key(0), k + seed)

                    def loss_fn(p):
                        def per_sample(vb, r):
                            out = model.apply(p, vb, True, rngs={"render": r})
                            return compute_losses(out, loss_cfg, s.vgg_params)[0]

                        rngs = jax.random.split(rng, B)
                        return jnp.mean(jax.vmap(per_sample)(vbB, rngs))

                    total, grads = jax.value_and_grad(loss_fn)(s.params)
                    gn = optax.global_norm(grads)
                    return s.apply_gradients(grads=grads), total + 1e-30 * gn

                fin, losses = jax.lax.scan(body, state, jnp.arange(K))
                chk = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(fin.params))
                return losses[-1], chk

            l, _ = run_k(state, vbB, jnp.asarray(0))
            float(l)
            vb2 = jax.tree.map(lambda x: x + jnp.float32(1e-7), vbB)
            t0 = time.perf_counter(); float(trivial(zeros))
            rt = time.perf_counter() - t0
            t0 = time.perf_counter()
            l, _ = run_k(state, vb2, jnp.asarray(1000))
            float(l)
            dt = max(time.perf_counter() - t0 - rt, 1e-9) / K
            print(json.dumps({
                "batch_per_device": B, "s_per_step": round(dt, 4),
                "rays_per_sec": round(B * args.rays / dt, 1),
                "rays": args.rays, "samples": args.samples,
            }), flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(json.dumps({"batch_per_device": B, "error": msg}), flush=True)


if __name__ == "__main__":
    main()
