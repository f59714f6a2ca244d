#!/usr/bin/env python
"""Hardware validation of the Pallas kernels on the real TPU.

For each kernel: compile on the attached TPU (NOT interpret mode), check
numeric parity against the XLA reference implementation, and time both.

Relay-awareness: identical repeat executions through the axon relay are
memoized, so each timing is ONE jitted lax.scan over REPS iterations whose
inputs are varied per step, reduced to a scalar, timed between scalar
fetches with the round-trip floor subtracted.

Usage: python scripts/validate_pallas_hw.py [--only geo|sp|gather] [--n N]
"""
import argparse
import json
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    choices=[None, "geo", "sp", "gather", "composite", "dmap"])
    ap.add_argument("--n", type=int, default=65536, help="points per call")
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev), "platform": dev.platform}), flush=True)
    cdt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jax.device_put(jnp.zeros(8), dev)

    def measure(name, scan_body, divisor):
        """scan_body(i) -> scalar; folded into one jitted scan over REPS
        varying iterations."""

        @jax.jit
        def run():
            def step(acc, i):
                return acc + scan_body(i), None

            total, _ = jax.lax.scan(
                step, jnp.asarray(0.0, jnp.float32), jnp.arange(REPS)
            )
            return total

        float(run())  # compile + warm
        float(trivial(zeros))
        t0 = time.perf_counter()
        float(trivial(zeros))
        t_rt = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run())
        dt = max(time.perf_counter() - t0 - t_rt, 1e-9) / REPS
        print(json.dumps({"component": name, "time_s": round(dt, 6),
                          "per_unit_ns": round(dt / divisor * 1e9, 3)}),
              flush=True)
        return dt

    from keypointnerf_tpu.models.mlp import GeoFusionMLP
    from keypointnerf_tpu.ops.pallas import geo_mlp_apply, sp_geo_mlp_apply
    from keypointnerf_tpu.ops.pallas.fused_geo_mlp import fused_geo_mlp_reference

    V, N, K, DSP = 3, args.n, 24, 168
    gfm = GeoFusionMLP((DSP, 128, 128, 120, 64), (128, 64, 64, 2), (64, 8), (0, 2))
    ks = jax.random.split(jax.random.key(0), 8)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sp = jax.random.normal(ks[0], (V, N, DSP))
        f0 = jax.random.normal(ks[1], (V, N, 64))
        f1 = jax.random.normal(ks[2], (V, N, 8))
        mask = (jax.random.uniform(ks[3], (V, N, 1)) > 0.2).astype(jnp.float32)
        w = mask / (jnp.sum(mask, 0, keepdims=True) + 1e-6)
        mp = gfm.init(ks[4], sp, [f0, f1], mask, w)["params"]
    sp, f0, f1, mask, w, mp = jax.device_put((sp, f0, f1, mask, w, mp), dev)

    if args.only in (None, "geo"):
        try:
            pal = lambda s: geo_mlp_apply(mp, s, f0, f1, mask, w,
                                          compute_dtype=cdt)[0]
            ref = lambda s: fused_geo_mlp_reference(mp, s, f0, f1, mask, w,
                                                    compute_dtype=cdt)[0]
            o_pal = np.asarray(jax.jit(pal)(sp))
            o_ref = np.asarray(jax.jit(ref)(sp))
            err = float(np.max(np.abs(o_pal - o_ref)))
            scale = float(np.max(np.abs(o_ref)) + 1e-9)
            print(json.dumps({"check": "geo_mlp_parity_hw", "max_abs_err": err,
                              "ref_scale": scale, "ok": err / scale < 2e-2}),
                  flush=True)
            vary = lambda i: sp * (1.0 + 0.001 * i)
            t_ref = measure(f"geo_mlp_xla_{N}",
                            lambda i: jnp.sum(ref(vary(i))), N)
            t_pal = measure(f"geo_mlp_pallas_{N}",
                            lambda i: jnp.sum(pal(vary(i))), N)
            print(json.dumps({"check": "geo_mlp_speedup", "xla_s": round(t_ref, 6),
                              "pallas_s": round(t_pal, 6),
                              "speedup": round(t_ref / t_pal, 3)}), flush=True)
        except Exception:
            print(json.dumps({"check": "geo_mlp_hw", "error":
                              traceback.format_exc()[-600:]}), flush=True)

    if args.only in (None, "sp"):
        try:
            with jax.default_device(cpu):
                pts_cam = jax.random.normal(ks[5], (V, N, 3))
                kpt_cam = jax.random.normal(ks[6], (V, K, 3))
            pts_cam, kpt_cam = jax.device_put((pts_cam, kpt_cam), dev)
            spf = lambda p: sp_geo_mlp_apply(mp, p, kpt_cam, f0, f1, mask, w,
                                             compute_dtype=cdt)[0]
            o = np.asarray(jax.jit(spf)(pts_cam))
            # XLA reference: spatial_encode(rel_z_decay) -> fused stack
            from keypointnerf_tpu.models.spatial_encoding import (
                SpatialEncodingConfig, spatial_encode)

            sc = SpatialEncodingConfig()

            def sp_ref(p):
                enc = spatial_encode(sc, None, p, None, kpt_cam)
                return fused_geo_mlp_reference(mp, enc, f0, f1, mask, w,
                                               compute_dtype=cdt)[0]

            o_ref = np.asarray(jax.jit(sp_ref)(pts_cam))
            err = float(np.max(np.abs(o - o_ref)))
            scale = float(np.max(np.abs(o_ref)) + 1e-9)
            print(json.dumps({"check": "sp_geo_mlp_parity_hw", "max_abs_err": err,
                              "ref_scale": scale, "ok": err / scale < 2e-2}),
                  flush=True)
            vary = lambda i: pts_cam + 0.001 * i
            t_ref = measure(f"sp_geo_mlp_xla_{N}",
                            lambda i: jnp.sum(sp_ref(vary(i))), N)
            t_pal = measure(f"sp_geo_mlp_pallas_{N}",
                            lambda i: jnp.sum(spf(vary(i))), N)
            print(json.dumps({"check": "sp_geo_mlp_speedup",
                              "xla_s": round(t_ref, 6),
                              "pallas_s": round(t_pal, 6),
                              "speedup": round(t_ref / t_pal, 3)}), flush=True)
        except Exception:
            print(json.dumps({"check": "sp_geo_mlp_hw", "error":
                              traceback.format_exc()[-600:]}), flush=True)

    if args.only in (None, "gather"):
        from keypointnerf_tpu.ops.feat_sample import bilinear_sample
        from keypointnerf_tpu.ops.pallas.dma_gather import dma_bilinear_sample

        H = W = 512
        for C in (84, 128):
            with jax.default_device(cpu):
                fmap = jax.random.normal(ks[7], (H, W, C))
                xy = jax.random.uniform(ks[0], (N, 2), minval=-1.0, maxval=1.0)
            fmap, xy = jax.device_put((fmap, xy), dev)
            try:
                o_dma = np.asarray(jax.jit(dma_bilinear_sample)(fmap, xy))
                o_ref = np.asarray(jax.jit(bilinear_sample)(fmap, xy))
                err = float(np.max(np.abs(o_dma - o_ref)))
                print(json.dumps({"check": f"dma_gather_parity_hw_c{C}",
                                  "max_abs_err": err, "ok": err < 1e-4}),
                      flush=True)
                vary = lambda i: jnp.clip(
                    xy + 0.0003 * i, -1.0, 1.0
                )
                t_ref = measure(f"gather_xla_{N}x{C}",
                                lambda i: jnp.sum(bilinear_sample(fmap, vary(i))), N)
                t_dma = measure(f"gather_dma_{N}x{C}",
                                lambda i: jnp.sum(dma_bilinear_sample(fmap, vary(i))), N)
                print(json.dumps({"check": f"dma_gather_speedup_c{C}",
                                  "xla_s": round(t_ref, 6),
                                  "dma_s": round(t_dma, 6),
                                  "speedup": round(t_ref / t_dma, 3)}), flush=True)
            except Exception:
                print(json.dumps({"check": f"dma_gather_hw_c{C}", "error":
                                  traceback.format_exc()[-600:]}), flush=True)


    if args.only in (None, "dmap"):
        # gather-backward dmap: VMEM-accumulator kernel vs the XLA chunked
        # scan, at the ZJU train-step map shapes (docs/PERF.md round-3)
        from keypointnerf_tpu.ops.feat_sample import (
            bilinear_sample_mm,
            bilinear_sample_mm_partial,
        )

        for (H, W, C) in ((512, 512, 8), (128, 128, 64), (256, 256, 8)):
            with jax.default_device(cpu):
                fmap = jax.random.normal(ks[1], (H, W, C), cdt)
                xy = jax.random.uniform(ks[2], (N, 2), minval=-1.0, maxval=1.0)
                g = jax.random.normal(ks[3], (N, C))
            fmap, xy, g = jax.device_put((fmap, xy, g), dev)
            try:
                d_xla = jax.jit(jax.grad(
                    lambda f: jnp.sum(bilinear_sample_mm(f, xy) * g)))
                d_pal = jax.jit(jax.grad(
                    lambda f: jnp.sum(
                        bilinear_sample_mm_partial(f, xy, None, True) * g)))
                o_x = np.asarray(d_xla(fmap), np.float32)
                o_p = np.asarray(d_pal(fmap), np.float32)
                err = float(np.max(np.abs(o_x - o_p)))
                scale = float(np.max(np.abs(o_x)) + 1e-9)
                print(json.dumps({"check": f"dmap_parity_hw_{H}x{C}",
                                  "max_abs_err": err, "ref_scale": scale,
                                  "ok": err / scale < 2e-2}), flush=True)
                vary = lambda i: jnp.clip(xy + 0.0003 * i, -1.0, 1.0)
                t_x = measure(
                    f"dmap_xla_{H}x{C}",
                    lambda i: jnp.sum(jax.grad(
                        lambda f: jnp.sum(bilinear_sample_mm(f, vary(i)) * g)
                    )(fmap).astype(jnp.float32)), N)
                t_p = measure(
                    f"dmap_pallas_{H}x{C}",
                    lambda i: jnp.sum(jax.grad(
                        lambda f: jnp.sum(
                            bilinear_sample_mm_partial(f, vary(i), None, True) * g)
                    )(fmap).astype(jnp.float32)), N)
                print(json.dumps({"check": f"dmap_speedup_{H}x{C}",
                                  "xla_s": round(t_x, 6),
                                  "pallas_s": round(t_p, 6),
                                  "speedup": round(t_x / t_p, 3)}), flush=True)
            except Exception:
                print(json.dumps({"check": f"dmap_hw_{H}x{C}", "error":
                                  traceback.format_exc()[-600:]}), flush=True)

    if args.only in (None, "composite"):
        from keypointnerf_tpu.geometry.compositing import composite
        from keypointnerf_tpu.geometry.sampling import importance_z
        from keypointnerf_tpu.ops.pallas import composite_importance_pallas

        R, S, F = 8192, 64, 64
        with jax.default_device(cpu):
            kz = jax.random.split(jax.random.key(2), 4)
            z = jnp.sort(jax.random.uniform(kz[0], (R, S), minval=2.0, maxval=5.0), -1)
            al = jax.nn.relu(jax.random.normal(kz[1], (R, S)))
            sd_ = jax.random.normal(kz[2], (R, S))
            rgb = jax.random.uniform(kz[3], (R, S, 3))
            u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, F), (R, F))
        z, al, sd_, rgb, u = jax.device_put((z, al, sd_, rgb, u), dev)

        def xla_ref(z, al, sd_, rgb):
            out = composite(al, sd_, rgb, z)
            z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
            zf = importance_z(None, out.contrib[..., 1:-1], z_mid, F, uniform=True)
            return jnp.sum(out.color) + jnp.sum(zf)

        def pal(z, al, sd_, rgb):
            color, depth, acc, sdfo, contrib, zf = composite_importance_pallas(
                z, al, sd_, rgb, u)
            return jnp.sum(color) + jnp.sum(zf)

        try:
            o_ref = np.asarray(jax.jit(xla_ref)(z, al, sd_, rgb))
            o_pal = np.asarray(jax.jit(pal)(z, al, sd_, rgb))
            rel = abs(float(o_pal - o_ref)) / (abs(float(o_ref)) + 1e-9)
            print(json.dumps({"check": "composite_parity_hw(sum)", "rel_err": rel,
                              "ok": rel < 1e-3}), flush=True)
            vary = lambda i: al * (1.0 + 0.001 * i)
            t_ref = measure(f"composite_xla_{R}x{S}",
                            lambda i: xla_ref(z, vary(i), sd_, rgb), R)
            t_pal = measure(f"composite_pallas_{R}x{S}",
                            lambda i: pal(z, vary(i), sd_, rgb), R)
            print(json.dumps({"check": "composite_speedup", "xla_s": round(t_ref, 6),
                              "pallas_s": round(t_pal, 6),
                              "speedup": round(t_ref / t_pal, 3)}), flush=True)
        except Exception:
            print(json.dumps({"check": "composite_hw", "error":
                              traceback.format_exc()[-600:]}), flush=True)


if __name__ == "__main__":
    main()
