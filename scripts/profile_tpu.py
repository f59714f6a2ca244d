#!/usr/bin/env python
"""Component-level TPU timing for the render hot path.

Each measurement is ONE jitted program (relay-friendly: a single scalar
fetch synchronizes; round-trip floor subtracted). Prints a JSON line per
component so regressions are attributable.

Usage: python scripts/profile_tpu.py [--dtype bf16] [--pallas]
"""
import argparse
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

HEIGHT = WIDTH = 256
CHUNK = 8192
REPS = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.data.synthetic import look_at
    from keypointnerf_tpu.geometry.cameras import camera_rays, pixel_grid
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
    from keypointnerf_tpu.render.renderer import render_rays_chunked

    cfg = KeypointNeRFConfig(
        compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        use_pallas_geo_mlp=args.pallas,
    )
    model = KeypointNeRF(cfg)
    sample = make_sample(SyntheticConfig(image_size=512, n_views=4), seed=0)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vb_cpu = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
        base = KeypointNeRF(KeypointNeRFConfig())
        params = jax.jit(base.init, static_argnums=2)(
            {"params": jax.random.key(0), "render": jax.random.key(1)}, vb_cpu, True
        )
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    vb = jax.device_put(vb_cpu, dev)

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jax.device_put(jnp.zeros(8), dev)

    def measure(name, fn, *fn_args, divisor=1.0, unit="s"):
        f = jax.jit(fn)
        float(f(*fn_args))  # compile + warm
        float(trivial(zeros))
        t0 = time.perf_counter()
        float(trivial(zeros))
        t_rt = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f(*fn_args))
        dt = max(time.perf_counter() - t0 - t_rt, 1e-9)
        print(json.dumps({"component": name, "time_s": round(dt, 4),
                          "per_unit": round(dt / divisor, 6), "unit": unit}))
        return dt

    # ---- encode only, x REPS
    def encode_many(params, vb):
        def one(acc, _):
            f = model.apply(params, vb.src_images, vb.src_masks, method=KeypointNeRF.encode)
            return acc + jnp.sum(f["geo"][0]) + jnp.sum(f["tex"]), None
        total, _ = jax.lax.scan(one, jnp.asarray(0.0, jnp.float32), jnp.arange(REPS))
        return total

    measure("encode_x%d" % REPS, encode_many, params, vb, divisor=REPS)

    # shared rays
    pix = pixel_grid(HEIGHT, WIDTH).astype(jnp.float32)
    R, t = look_at(3.5 * np.array([0.4, 0.05, 0.9]), np.zeros(3))
    R, t = jnp.asarray(R), jnp.asarray(t)

    def render_full(params, vb, R, t, fine):
        feats = model.apply(params, vb.src_images, vb.src_masks, method=KeypointNeRF.encode)
        origin, dirs, near, far = camera_rays(pix, vb.tar_K, R, t, cfg.znear, cfg.zfar)
        out = render_rays_chunked(
            model, params, feats, vb, origin, dirs, near, far, chunk=CHUNK,
            fine=fine,
        )
        key = "rgb_fine" if fine else "rgb_coarse"
        return jnp.sum(out[key])

    n_rays = HEIGHT * WIDTH
    dt_c = measure("render_coarse", lambda p, v: render_full(p, v, R, t, False),
                   params, vb, divisor=n_rays, unit="s/ray")
    dt_f = measure("render_full", lambda p, v: render_full(p, v, R, t, True),
                   params, vb, divisor=n_rays, unit="s/ray")
    print(json.dumps({"component": "rays_per_sec_full", "value": round(n_rays / dt_f, 1)}))

    # ---- isolated geometry MLP on synthetic points (the kernel target)
    N = CHUNK * 64  # points per call
    V = 3
    k = jax.random.split(jax.random.key(1), 5)
    sp = jax.random.normal(k[0], (V, N, cfg.sp_dim))
    f0 = jax.random.normal(k[1], (V, N, cfg.geo_out_ch))
    f1 = jax.random.normal(k[2], (V, N, cfg.geo_out_ch_hd))
    mask = (jax.random.uniform(k[3], (V, N, 1)) > 0.2).astype(jnp.float32)
    w = mask / (jnp.sum(mask, 0, keepdims=True) + 1e-6)
    sp, f0, f1, mask, w = jax.device_put((sp, f0, f1, mask, w), dev)
    mlp_params = params["params"]["mlp_geo"]

    from keypointnerf_tpu.models.mlp import GeoFusionMLP

    gfm = GeoFusionMLP(
        (cfg.sp_dim,) + tuple(cfg.mlp_dims1[1:]), tuple(cfg.mlp_dims2),
        (cfg.geo_out_ch, cfg.geo_out_ch_hd), tuple(cfg.mlp_skip_layers),
        dtype=None if args.dtype == "f32" else jnp.bfloat16,
    )

    def mlp_flax(mp, sp, f0, f1, mask, w):
        out, valid, lv, lf = gfm.apply({"params": mp}, sp, [f0, f1], mask, w)
        return jnp.sum(out) + jnp.sum(lf)

    measure("geo_mlp_flax_%dpts" % N, mlp_flax, mlp_params, sp, f0, f1, mask, w,
            divisor=N, unit="s/pt")

    from keypointnerf_tpu.ops.pallas import geo_mlp_apply

    def mlp_pallas(mp, sp, f0, f1, mask, w):
        out, valid, lv, lf = geo_mlp_apply(
            mp, sp, f0, f1, mask, w,
            compute_dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
        )
        return jnp.sum(out) + jnp.sum(lf)

    measure("geo_mlp_pallas_%dpts" % N, mlp_pallas, mlp_params, sp, f0, f1, mask, w,
            divisor=N, unit="s/pt")

    # ---- isolated multi-view bilinear gather
    from keypointnerf_tpu.ops.feat_sample import multiview_bilinear_sample

    xy = jax.random.uniform(k[4], (V, N, 2), minval=-1.0, maxval=1.0)
    xy = jax.device_put(xy, dev)
    fmap = jax.device_put(jnp.zeros((V, 128, 128, 64)), dev)

    def gather(fmap, xy):
        return jnp.sum(multiview_bilinear_sample(fmap, xy))

    measure("bilinear_gather_64ch_%dpts" % N, gather, fmap, xy, divisor=N, unit="s/pt")


if __name__ == "__main__" and not os.environ.get("PROFILE_SUB"):
    main()

# Finer sub-component measurements (run with PROFILE_SUB=1)
def profile_subcomponents(args=None):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--pallas", action="store_true")
    args = ap.parse_args()

    from keypointnerf_tpu.models.spatial_encoding import (
        SpatialEncodingConfig, spatial_encode)
    from keypointnerf_tpu.geometry.sampling import importance_z, union_sorted_z
    from keypointnerf_tpu.geometry.compositing import composite
    from keypointnerf_tpu.models.ibr_head import IBRRenderingHead

    dev = jax.devices()[0]
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jax.device_put(jnp.zeros(8), dev)

    def measure(name, fn, *fn_args, divisor=1.0):
        f = jax.jit(fn)
        float(f(*fn_args))
        float(trivial(zeros))
        t0 = time.perf_counter()
        float(trivial(zeros))
        t_rt = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f(*fn_args))
        d = max(time.perf_counter() - t0 - t_rt, 1e-9)
        print(json.dumps({"component": name, "time_s": round(d, 4)}))
        return d

    V, N, K = 3, CHUNK * 64, 24
    ks = jax.random.split(jax.random.key(2), 8)
    pts = jax.device_put(jax.random.normal(ks[0], (N, 3), dt), dev)
    pts_cam = jax.device_put(jax.random.normal(ks[1], (V, N, 3), dt), dev)
    kpt = jax.device_put(jax.random.normal(ks[2], (K, 3), dt), dev)
    kpt_cam = jax.device_put(jax.random.normal(ks[3], (V, K, 3), dt), dev)
    sc = SpatialEncodingConfig()

    def sp_fn(pts, pts_cam, kpt, kpt_cam):
        return jnp.sum(spatial_encode(sc, pts, pts_cam, kpt, kpt_cam))

    measure(f"spatial_encode_{N}pts_{args.dtype}", sp_fn, pts, pts_cam, kpt, kpt_cam)

    # IBR head on view-major (V, N, C)
    Rr, S = CHUNK, 64
    head = IBRRenderingHead(dtype=None if args.dtype == "f32" else jnp.bfloat16)
    rgbf = jax.random.normal(ks[4], (V, Rr * S, 35), dt)
    rdiff = jax.random.normal(ks[5], (V, Rr * S, 4), dt)
    pmask = (jax.random.uniform(ks[6], (V, Rr * S, 1)) > 0.2).astype(dt)
    hp = head.init(ks[7], rgbf, rdiff, pmask)
    rgbf, rdiff, pmask = jax.device_put((rgbf, rdiff, pmask), dev)
    hp = jax.device_put(hp, dev)

    def ibr_fn(hp, a, b, c):
        return jnp.sum(head.apply(hp, a, b, c))

    measure(f"ibr_head_{Rr*S}pts_{args.dtype}", ibr_fn, hp, rgbf, rdiff, pmask)

    # sort + compositing on (R, 192)
    z = jax.random.uniform(ks[0], (Rr * 8, 192), dt)
    zc = jnp.sort(z[..., :64], -1)
    zf = z[..., 64:128]
    alpha = jax.nn.relu(jax.random.normal(ks[1], (Rr * 8, 192), dt))
    rgb = jax.random.uniform(ks[2], (Rr * 8, 192, 3), dt)
    zc, zf, alpha, rgb = jax.device_put((zc, zf, alpha, rgb), dev)

    def sort_fn(zc, zf):
        return jnp.sum(union_sorted_z(zc, zf))

    measure(f"union_sort_{Rr*8}x128_{args.dtype}", sort_fn, zc, zf)

    def comp_fn(alpha, rgb, z):
        out = composite(alpha, alpha, rgb, jnp.sort(z, -1))
        return jnp.sum(out.color)

    measure(f"composite_{Rr*8}x192_{args.dtype}", comp_fn, alpha, rgb, z)

    # importance sampling
    contrib = jax.random.uniform(ks[3], (Rr * 8, 62), dt)
    zmid = jnp.sort(jax.random.uniform(ks[4], (Rr * 8, 63), dt), -1)
    contrib, zmid = jax.device_put((contrib, zmid), dev)

    def imp_fn(c, zm):
        return jnp.sum(importance_z(jax.random.key(0), c, zm, 64))

    measure(f"importance_{Rr*8}rays_{args.dtype}", imp_fn, contrib, zmid)


if __name__ == "__main__" and os.environ.get("PROFILE_SUB"):
    profile_subcomponents()
