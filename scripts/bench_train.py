#!/usr/bin/env python
"""Train-step throughput benchmark (rays/s) on the current backend.

Measures the COMPLETE optimizer step — forward, full loss incl. the
0.5*VGG perceptual term (random frozen VGG features, as train.py without
configured weights), backward, `global_norm` metric, Adam update — as one
jitted lax.scan of K steps, matching the program
`training/train.py:train_step_fn` runs, at a configurable ray/sample
shape. `--no_vgg` drops the VGG term for the bare-model figure.

Relay-awareness (docs/PERF.md, memory/axon-relay-quirks): on the axon
TPU relay every program OUTPUT buffer is fetched to the host
individually, so a program returning the updated TrainState measures
transfer, not compute (~18-40 s/call for ~300 leaves vs 0.195 s device
time at the probe shape). This benchmark therefore reduces all outputs
to scalars (final loss + a parameter checksum that keeps the update
live), varies the inputs every timed call (identical repeats are
pipelined/memoized by the relay), and subtracts the scalar round-trip
floor.

Reference hot path being measured: /root/reference/src/model.py:416-424
(training_step) over batch_render_pifu_nerf (942-1108).

Usage:
  python scripts/bench_train.py [--rays 1024] [--samples 32] [--k 4]
                                [--dtype bf16] [--no_mm_vjp]
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
    ap.add_argument("--rays", type=int, default=1024, help="rays per step (patch = sqrt(rays)^2)")
    ap.add_argument("--samples", type=int, default=32, help="coarse = fine sample count")
    ap.add_argument("--k", type=int, default=4, help="steps per timed scan")
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--no_mm_vjp", action="store_true",
                    help="use XLA's scatter-add gather backward instead of the matmul VJP")
    ap.add_argument("--fused", action="store_true",
                    help="train with the single fused feature map (a render-time "
                         "win; 3.1x SLOWER than the shipped per-map+remat train "
                         "recipe — see docs/PERF.md recipe matrix)")
    ap.add_argument("--no_vgg", action="store_true",
                    help="drop the VGG perceptual term (lambda_vgg=0) instead of "
                         "the shipped objective's 0.5*VGG (random frozen VGG "
                         "features when no weights are configured, as train.py)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the point query in the backward pass")
    ap.add_argument("--save_gathers", action="store_true",
                    help="with --remat: save the gathered per-point features "
                         "instead of re-gathering them in backward "
                         "(cfg.remat_save_gathers)")
    ap.add_argument("--pallas_dmap", action="store_true",
                    help="compute the gather backward's dmap contraction "
                         "with the VMEM-accumulator Pallas kernel "
                         "(cfg.train_pallas_dmap)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin overrides "
                         "JAX_PLATFORMS; this re-applies it after import)")
    ap.add_argument("--image_size", type=int, default=512,
                    help="source-view resolution (512 = the ZJU geometry; "
                         "lower it for CPU smoke runs — the conv encoders "
                         "dominate off-TPU)")
    ap.add_argument("--views", type=int, default=4,
                    help="views per sample (1 target + N-1 sources)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
    from keypointnerf_tpu.training import OptimConfig, create_train_state
    from keypointnerf_tpu.training.losses import LossConfig, compute_losses

    side = int(args.rays ** 0.5)
    assert side * side == args.rays, "--rays must be a square (patch geometry)"
    cfg = KeypointNeRFConfig(
        patch_h=side, patch_w=side, n_coarse=args.samples, n_fine=args.samples,
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        train_matmul_gather_vjp=not args.no_mm_vjp,
        fused_feature_map=args.fused,
        remat=args.remat,
        remat_save_gathers=args.save_gathers,
        train_pallas_dmap=args.pallas_dmap,
    )
    sample = make_sample(
        SyntheticConfig(image_size=args.image_size, n_views=args.views), seed=0
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vb = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
        model = KeypointNeRF(cfg)
        vgg_params = None
        if not args.no_vgg:
            # the shipped objective includes 0.5*VGG (reference
            # configs/zju.json:111); train.py falls back to random frozen
            # VGG features when no weights are configured — same cost
            from keypointnerf_tpu.models.vgg import init_vgg_params

            vgg_params = init_vgg_params()
        state = create_train_state(model, vb, OptimConfig(), vgg_params=vgg_params)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    vb = jax.device_put(vb, dev)
    loss_cfg = LossConfig() if not args.no_vgg else LossConfig(lambda_vgg=0.0)

    K = args.k

    @jax.jit
    def run_k(state, vb, seed):
        def body(s, k):
            rng = jax.random.fold_in(jax.random.key(0), k + seed)

            def loss_fn(p):
                out = model.apply(p, vb, True, rngs={"render": rng})
                return compute_losses(out, loss_cfg, s.vgg_params)

            (total, _err), grads = jax.value_and_grad(loss_fn, has_aux=True)(s.params)
            import optax

            gn = optax.global_norm(grads)  # train_step_fn logs this too
            # 1e-30 (not 0.0) so XLA can't constant-fold the norm away
            return s.apply_gradients(grads=grads), total + 1e-30 * gn
        fin, losses = jax.lax.scan(body, state, jnp.arange(K))
        # checksum keeps the parameter update live under DCE while the
        # program still returns only two scalars (relay-safe)
        chk = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(fin.params))
        return losses[-1], chk

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jax.device_put(jnp.zeros(8), dev)
    float(trivial(zeros))

    t0 = time.time()
    l, _ = run_k(state, vb, jnp.asarray(0))
    l = float(l)
    compile_s = time.time() - t0
    print(f"# compile+first {compile_s:.1f}s loss={l:.4f}", file=sys.stderr)

    # timed call: fresh inputs, round-trip floor subtracted
    vb2 = dataclasses.replace(vb, src_images=vb.src_images + jnp.float32(1e-7))
    float(trivial(zeros))
    t0 = time.time()
    float(trivial(zeros))
    rt = time.time() - t0
    t0 = time.time()
    l, _ = run_k(state, vb2, jnp.asarray(1000))
    l = float(l)
    dt = max(time.time() - t0 - rt, 1e-9) / K
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(args.rays / dt, 1),
        "unit": "rays/s",
        "s_per_step": round(dt, 4),
        "rays": args.rays,
        "samples": args.samples,
        "image_size": args.image_size,
        "views": args.views,
        "dtype": args.dtype,
        "matmul_gather_vjp": not args.no_mm_vjp,
        "fused_feature_map": args.fused,
        "remat": args.remat,
        "remat_save_gathers": args.save_gathers,
        "train_pallas_dmap": args.pallas_dmap,
        "vgg_term": not args.no_vgg,
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
