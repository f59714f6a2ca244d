#!/usr/bin/env python
"""Capture a device trace of ONE train step (fwd+bwd+Adam) and print the
op-level time breakdown — the train-path twin of trace_render.py.

Motivation: the first on-TPU train-step measurement came in at ~15 s for
a 1024-ray step while the forward-only render does 65k rays in ~0.5 s;
the breakdown attributes the gap (expected: the bilinear-gather backward
is a scatter-add, the classic XLA:TPU weak spot).

Usage: python scripts/trace_train.py [--patch 32] [--samples 32]
"""
import argparse
import collections
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--patch", type=int, default=32)
    ap.add_argument("--samples", type=int, default=32)
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--fused", action="store_true",
                    help="train with the fused feature map")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize the point query in backward")
    ap.add_argument("--no_mm_vjp", action="store_true",
                    help="XLA scatter-add gather backward instead of matmul VJP")
    ap.add_argument("--save_gathers", action="store_true",
                    help="cfg.remat_save_gathers (the shipped recipe)")
    ap.add_argument("--pallas_dmap", action="store_true",
                    help="cfg.train_pallas_dmap (VMEM-accumulator dmap kernel)")
    ap.add_argument("--logdir", default="/tmp/jaxtrace_train")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from trace_render import parse_trace, GROUPS  # noqa: E402
    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
    from keypointnerf_tpu.training import OptimConfig, create_train_state
    from keypointnerf_tpu.training.losses import LossConfig
    from keypointnerf_tpu.utils.profiling import trace as trace_cm

    cfg = KeypointNeRFConfig(
        patch_h=args.patch, patch_w=args.patch,
        n_coarse=args.samples, n_fine=args.samples,
        compute_dtype=jnp.bfloat16, fused_feature_map=args.fused,
        remat=args.remat, train_matmul_gather_vjp=not args.no_mm_vjp,
        remat_save_gathers=args.save_gathers,
        train_pallas_dmap=args.pallas_dmap,
    )
    sample = make_sample(
        SyntheticConfig(image_size=args.image_size, n_views=4), seed=0
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vb = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
        model = KeypointNeRF(cfg)
        state = create_train_state(model, vb, OptimConfig())
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    vb = jax.device_put(vb, dev)

    # scalar outputs only: through the axon relay a program returning the
    # TrainState pays per-buffer host fetches (~300 leaves) AND compiles
    # far slower — the full-output variant never finished in 40 min while
    # this one compiles in minutes (docs/PERF.md relay rules)
    from keypointnerf_tpu.training.train import train_step_fn

    @jax.jit
    def step_scalar(state, vb, rng):
        new_state, m = train_step_fn(model, LossConfig(), state, vb, rng)
        chk = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(new_state.params))
        return m["e_all"], chk

    loss0, _ = step_scalar(state, vb, jax.random.key(0))  # compile + warm
    print(f"warm loss={float(loss0):.4f}", flush=True)

    with trace_cm(args.logdir):
        loss1, _ = step_scalar(state, vb, jax.random.key(1))
        float(loss1)  # sync inside the trace window

    per_op, total = parse_trace(args.logdir)
    print(f"# device op total: {total:.4f} s "
          f"(patch {args.patch}^2, {args.samples}+{args.samples} samples, "
          f"fused={args.fused})")
    grouped = collections.Counter()
    for name, dur in per_op.items():
        low = name.lower()
        for g, keys in GROUPS:
            if any(k in low for k in keys):
                grouped[g] += dur
                break
        else:
            grouped["other"] += dur
    for g, dur in grouped.most_common():
        print(json.dumps({"group": g, "time_s": round(dur, 4),
                          "pct": round(100 * dur / max(total, 1e-9), 1)}))
    print("# top ops:")
    for name, dur in per_op.most_common(args.top):
        print(json.dumps({"op": name[:110], "time_s": round(dur, 4)}))


if __name__ == "__main__":
    main()
