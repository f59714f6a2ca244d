#!/usr/bin/env python
"""Stage-split decomposition of the full ZJU train step (VERDICT r4 task 2).

The round-4 profiler's op attribution through scan/remat bodies is
degraded on the current relay stack (~88% of device time undecomposed;
docs/PERF.md "re-trace status"), so this script names the 0.6 s train
step's dominant term WITHOUT the profiler: it times the step's three
structural stages as separate jitted scalar-output programs at the real
training geometry (64x64-ray patch, 64+64 samples, 512^2 inputs, 4
views, the shipped recipe flags) and lets the dominant term fall out by
subtraction — the same scalar-output A/B methodology that located the
0.35 s dmap scans in round 3 (scripts/bench_train.py protocol; relay
rules in docs/PERF.md: scalar outputs only, fresh inputs per timed
call, round-trip floor subtracted, all stages back-to-back in ONE
script).

Stages (each is forward + backward through its own parameters):
  full    — the complete optimizer step (bench.py measure_train program)
  encode  — HGFilterV2 + ResBlkEncoder fwd+bwd alone (the conv stack;
            reference src/utils.py:216-474)
  query   — the point-query fwd+bwd alone: render_rays on precomputed
            feats held constant (spatial encoding + gathers + geometry
            MLP + IBR head + compositing; reference src/model.py:690-843,
            942-1108)
  vgg     — the lambda_vgg=0.5 perceptual term fwd+bwd wrt the rendered
            patch (reference src/utils.py:750-805)
  adam    — the optimizer update + global-norm metric alone on the
            step's gradient pytree shapes

The stages overlap only in negligible glue (patch GT gather, loss
arithmetic), so full ≈ encode + query + vgg + adam; a large residual
means the decomposition itself missed something and is reported as
such.

Usage:
  python scripts/bisect_train_stage.py [--rays 4096] [--samples 64]
                                       [--image_size 512] [--k 2]
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
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--k", type=int, default=2, help="steps per timed scan")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--stages", default="full,encode,query,vgg,adam",
                    help="comma list to run (compile time is the cost)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.geometry.cameras import camera_rays, pixel_grid
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
    from keypointnerf_tpu.models.vgg import init_vgg_params, vgg_loss
    from keypointnerf_tpu.training import OptimConfig, create_train_state
    from keypointnerf_tpu.training.losses import LossConfig, compute_losses

    side = int(args.rays ** 0.5)
    assert side * side == args.rays
    # the shipped ZJU train recipe (bench.py measure_train / configs/zju.json)
    cfg = KeypointNeRFConfig(
        compute_dtype=jnp.bfloat16, patch_h=side, patch_w=side,
        n_coarse=args.samples, n_fine=args.samples,
        remat=False, train_matmul_gather_vjp=True,
        remat_save_gathers=False, train_pallas_dmap=True,
    )
    model = KeypointNeRF(cfg)
    loss_cfg = LossConfig()
    sample = make_sample(
        SyntheticConfig(image_size=args.image_size, n_views=args.views), seed=0
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vb = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
        state = create_train_state(model, vb, OptimConfig(),
                                   vgg_params=init_vgg_params())
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    vb = jax.device_put(vb, dev)
    K = args.k

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jax.device_put(jnp.zeros(8), dev)
    float(trivial(zeros))

    def timed(name, fn, *fresh_args):
        """compile+warm on args0, then time on perturbed args."""
        t0 = time.time()
        float(fn(*fresh_args[0]))
        print(f"# {name}: compile+first {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        float(trivial(zeros))
        t0 = time.time()
        float(trivial(zeros))
        rt = time.time() - t0
        t0 = time.time()
        float(fn(*fresh_args[1]))
        dt = max(time.time() - t0 - rt, 1e-9) / K
        return dt

    results = {}
    stages = args.stages.split(",")

    # ---------- full step ----------
    if "full" in stages:
        @jax.jit
        def run_full(state, vb, seed):
            def body(s, k):
                rng = jax.random.fold_in(jax.random.key(0), k + seed)

                def loss_fn(p):
                    out = model.apply(p, vb, True, rngs={"render": rng})
                    return compute_losses(out, loss_cfg, s.vgg_params)

                (total, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(s.params)
                gn = optax.global_norm(grads)
                return s.apply_gradients(grads=grads), total + 1e-30 * gn

            fin, losses = jax.lax.scan(body, state, jnp.arange(K))
            chk = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(fin.params))
            return losses[-1] + 1e-30 * chk

        vb2 = dataclasses.replace(
            vb, src_images=vb.src_images + jnp.float32(1e-7))
        results["full"] = timed(
            "full", run_full,
            (state, vb, jnp.asarray(0)), (state, vb2, jnp.asarray(1000)),
        )

    # ---------- encoder alone ----------
    if "encode" in stages:
        @jax.jit
        def run_encode(params, vb, seed):
            def body(c, k):
                imgs = vb.src_images + 1e-9 * k.astype(jnp.float32)

                def loss_fn(p):
                    feats = model.apply(p, imgs, vb.src_masks, True,
                                        method=KeypointNeRF.encode)
                    return sum(
                        jnp.sum(f.astype(jnp.float32)) * 1e-6
                        for f in jax.tree_util.tree_leaves(feats)
                    )

                l, g = jax.value_and_grad(loss_fn)(params)
                return c + l + 1e-30 * optax.global_norm(g), None

            acc, _ = jax.lax.scan(body, jnp.asarray(0.0) + seed * 0.0,
                                  jnp.arange(K))
            return acc

        vb2 = dataclasses.replace(
            vb, src_images=vb.src_images + jnp.float32(1e-7))
        results["encode"] = timed(
            "encode", run_encode,
            (state.params, vb, jnp.asarray(0.0)),
            (state.params, vb2, jnp.asarray(1.0)),
        )

    # ---------- point query forward only (no grad) ----------
    if "query_fwd" in stages:
        feats_f = jax.jit(
            lambda p, vb: model.apply(p, vb.src_images, vb.src_masks, True,
                                      method=KeypointNeRF.encode)
        )(state.params, vb)
        feats_f = jax.device_put(jax.lax.stop_gradient(feats_f), dev)
        off = (args.image_size - side) // 2
        pixf = (pixel_grid(side, side) + off).astype(jnp.float32)

        @jax.jit
        def run_query_fwd(params, feats, vb, seed):
            origin, dirs, near, far = camera_rays(
                pixf, vb.tar_K, vb.tar_R, vb.tar_t, cfg.znear, cfg.zfar
            )

            def body(c, k):
                rng = jax.random.fold_in(jax.random.key(1), k)
                out = model.apply(
                    params, feats, vb, origin, dirs, near, far, rng, True,
                    True, method=KeypointNeRF.render_rays,
                )
                return c + sum(jnp.mean(jnp.abs(v.astype(jnp.float32)))
                               for v in out.values()), None

            acc, _ = jax.lax.scan(body, seed * 0.0, jnp.arange(K))
            return acc

        results["query_fwd"] = timed(
            "query_fwd", run_query_fwd,
            (state.params, feats_f, vb, jnp.asarray(0.0)),
            (state.params, feats_f, vb, jnp.asarray(1e-7)),
        )

    # ---------- point query alone (feats constant) ----------
    if "query" in stages:
        feats = jax.jit(
            lambda p, vb: model.apply(p, vb.src_images, vb.src_masks, True,
                                      method=KeypointNeRF.encode)
        )(state.params, vb)
        feats = jax.device_put(jax.lax.stop_gradient(feats), dev)
        # a fixed centered patch (same ray/sample geometry as the real
        # step; the real step's fg-centered draw is host-free but its
        # cost sits in `full`, not here — it is part of the residual)
        off = (args.image_size - side) // 2
        pix = (pixel_grid(side, side) + off).astype(jnp.float32)

        @jax.jit
        def run_query(params, feats, vb, seed):
            origin, dirs, near, far = camera_rays(
                pix, vb.tar_K, vb.tar_R, vb.tar_t, cfg.znear, cfg.zfar
            )

            def body(c, k):
                rng = jax.random.fold_in(jax.random.key(1), k)

                def loss_fn(p):
                    out = model.apply(
                        p, feats, vb, origin, dirs, near, far, rng, True, True,
                        method=KeypointNeRF.render_rays,
                    )
                    # L1-vs-zero keeps every output live at ~loss cost
                    return sum(jnp.mean(jnp.abs(v.astype(jnp.float32)))
                               for v in out.values())

                l, g = jax.value_and_grad(loss_fn)(params)
                return c + l + 1e-30 * optax.global_norm(g), None

            acc, _ = jax.lax.scan(body, seed * 0.0, jnp.arange(K))
            return acc

        results["query"] = timed(
            "query", run_query,
            (state.params, feats, vb, jnp.asarray(0.0)),
            (state.params, feats, vb, jnp.asarray(1e-7)),
        )

    # ---------- point query, also differentiating wrt the feature maps ----
    # The `query` stage treats feats as constants, so the mm-VJP dmap
    # contractions (the map gradients that continue into the encoder
    # backward) run ONLY in `full` — they are the structural candidate
    # for the residual. query_dfeats - query isolates their cost.
    # query_dfeats_scan re-measures with train_pallas_dmap off (pure XLA
    # scan dmaps); query_dfeats_nodmap zeroes the dmap entirely via
    # stop_gradient on the gathered features' map inputs — it bounds the
    # non-dmap share of the feats-gradient chain.
    df_variants = [s for s in stages if s.startswith("query_dfeats")]
    for df_name in df_variants:
        qcfg = cfg
        if df_name == "query_dfeats_scan":
            qcfg = dataclasses.replace(cfg, train_pallas_dmap=False)
        qmodel = KeypointNeRF(qcfg)
        off = (args.image_size - side) // 2
        pix = (pixel_grid(side, side) + off).astype(jnp.float32)

        @jax.jit
        def run_query_df(params, feats, vb, seed, qmodel=qmodel):
            origin, dirs, near, far = camera_rays(
                pix, vb.tar_K, vb.tar_R, vb.tar_t, cfg.znear, cfg.zfar
            )

            def body(c, k):
                rng = jax.random.fold_in(jax.random.key(1), k)

                def loss_fn(args):
                    p, f = args
                    out = qmodel.apply(
                        p, f, vb, origin, dirs, near, far, rng, True, True,
                        method=KeypointNeRF.render_rays,
                    )
                    return sum(jnp.mean(jnp.abs(v.astype(jnp.float32)))
                               for v in out.values())

                l, g = jax.value_and_grad(loss_fn)((params, feats))
                return c + l + 1e-30 * optax.global_norm(g), None

            acc, _ = jax.lax.scan(body, seed * 0.0, jnp.arange(K))
            return acc

        results[df_name] = timed(
            df_name, run_query_df,
            (state.params, feats, vb, jnp.asarray(0.0)),
            (state.params, feats, vb, jnp.asarray(1e-7)),
        )

    # ---------- VGG term alone ----------
    if "vgg" in stages:
        key = jax.random.key(2)
        pred0 = jax.device_put(
            jax.random.uniform(key, (side, side, 3), jnp.float32), dev)
        tar = jax.device_put(
            jax.random.uniform(jax.random.key(3), (side, side, 3),
                               jnp.float32), dev)

        @jax.jit
        def run_vgg(vgg_params, pred, tar):
            def body(c, k):
                def loss_fn(x):
                    return loss_cfg.lambda_vgg * vgg_loss(
                        vgg_params, x + 1e-9 * k.astype(jnp.float32), tar)

                l, g = jax.value_and_grad(loss_fn)(pred)
                return c + l + 1e-30 * jnp.sum(g * g), None

            acc, _ = jax.lax.scan(body, jnp.asarray(0.0), jnp.arange(K))
            return acc

        results["vgg"] = timed(
            "vgg", run_vgg,
            (state.vgg_params, pred0, tar),
            (state.vgg_params, pred0 + 1e-7, tar),
        )

    # ---------- optimizer update alone ----------
    if "adam" in stages:
        @jax.jit
        def run_adam(state, seed):
            def body(s, k):
                grads = jax.tree.map(
                    lambda x: (x * 1e-12 + seed * 1e-12).astype(x.dtype),
                    s.params)
                gn = optax.global_norm(grads)
                return s.apply_gradients(grads=grads), gn

            fin, gns = jax.lax.scan(body, state, jnp.arange(K))
            chk = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(fin.params))
            return gns[-1] + 1e-30 * chk

        results["adam"] = timed(
            "adam", run_adam, (state, jnp.asarray(0.0)),
            (state, jnp.asarray(1.0)),
        )

    staged = sum(v for k, v in results.items() if k != "full")
    out = {
        "metric": "train_step_stage_split",
        "geometry": {"rays": args.rays, "samples": args.samples,
                     "image_size": args.image_size, "views": args.views},
        "s_per_step": {k: round(v, 4) for k, v in results.items()},
    }
    if "full" in results and staged:
        out["staged_sum_s"] = round(staged, 4)
        out["residual_s"] = round(results["full"] - staged, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
