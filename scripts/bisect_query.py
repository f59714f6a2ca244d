#!/usr/bin/env python
"""Bisect query_points cost: cumulative stage timings on TPU.

Rebuilds the point-query pipeline stage by stage (same math as
KeypointNeRF.query_points) and times each prefix — the diffs attribute
per-stage cost. Relay-safe single-fetch measurement.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N = 8192 * 64
DTYPE = jnp.bfloat16


def main():
    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.geometry.cameras import (
        camera_center, compose_krt, ndc_xy, ndc_z, project_points, world_to_cam)
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
    from keypointnerf_tpu.models.spatial_encoding import spatial_encode
    from keypointnerf_tpu.ops.feat_sample import multiview_bilinear_sample

    cfg = KeypointNeRFConfig(compute_dtype=DTYPE)
    model = KeypointNeRF(cfg)
    sample = make_sample(SyntheticConfig(image_size=512, n_views=4), seed=0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vb_cpu = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
        base = KeypointNeRF(KeypointNeRFConfig())
        params = jax.jit(base.init, static_argnums=2)(
            {"params": jax.random.key(0), "render": jax.random.key(1)}, vb_cpu, True)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    vb = jax.device_put(vb_cpu, dev)

    k = jax.random.split(jax.random.key(0), 2)
    pts = jax.device_put(jax.random.normal(k[0], (N, 3)) * 0.4, dev)
    dirs = jax.device_put(jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (N, 1)), dev)

    feats_fn = jax.jit(lambda p, vb: model.apply(
        p, vb.src_images, vb.src_masks, method=KeypointNeRF.encode))
    feats = jax.block_until_ready(feats_fn(params, vb))
    feats = jax.device_put(jax.tree.map(np.asarray, feats), dev)

    H, W = 512, 512
    c = cfg

    def stage(upto):
        def fn(params, feats, vb, pts, dirs):
            V = vb.src_images.shape[0]
            krt = compose_krt(vb.src_K, vb.src_R, vb.src_t)
            xy_pix, z = project_points(pts[None], krt)
            xy = ndc_xy(xy_pix, W, H)
            zn = ndc_z(z, c.znear, c.zfar)
            eps = 1e-2
            in_xy = jnp.all((xy >= -1 - eps) & (xy <= 1 + eps), -1, keepdims=True)
            mask = (in_xy & (zn >= -1.0)).astype(jnp.float32)
            acc = jnp.sum(mask) + jnp.sum(xy) + jnp.sum(zn)
            if upto == "project":
                return acc

            full_xy = multiview_bilinear_sample(feats["full"], xy)
            feat_hd = full_xy[..., :8]
            img_xy = full_xy[..., 8:11]
            fg = full_xy[..., 11:12]
            all_valid = jnp.all(mask > 0, 0) & jnp.all(fg > 0.1, 0)
            mask2 = mask * all_valid[None].astype(mask.dtype)
            feat_coarse = multiview_bilinear_sample(feats["geo"][0], xy)
            feat_xy = multiview_bilinear_sample(feats["tex"], xy)
            acc = acc + jnp.sum(feat_hd) + jnp.sum(feat_coarse) + jnp.sum(feat_xy) + jnp.sum(mask2) + jnp.sum(img_xy)
            if upto == "gathers":
                return acc

            xyz01 = 0.5 * jnp.concatenate([xy, zn], -1) + 0.5
            dist_b = jnp.minimum(xyz01, 1.0 - xyz01)
            pw = jax.nn.sigmoid(5.0 * (dist_b / 0.1 - 1.0))
            pw = pw[..., 0:1] * pw[..., 1:2] * pw[..., 2:3]
            pw = pw * mask2
            pw = pw / (jnp.sum(pw, 0, keepdims=True) + 1e-6)
            pts_cam = world_to_cam(pts[None], vb.src_R, vb.src_t)
            kpt_cam = world_to_cam(vb.kpt3d[None], vb.src_R, vb.src_t)
            sp = spatial_encode(c.sp_config, pts, pts_cam, vb.kpt3d, kpt_cam,
                                z_ndc=zn, xy_ndc=xy)
            acc = acc + jnp.sum(sp) + jnp.sum(pw)
            if upto == "spatial":
                return acc

            out, valid, _, lf = model.apply(
                params, sp.astype(DTYPE),
                [feat_coarse.astype(DTYPE), feat_hd.astype(DTYPE)],
                mask2.astype(DTYPE), pw.astype(DTYPE),
                method=lambda m, a, b, cc, d: m.mlp_geo(a, b, cc, d))
            acc = acc + jnp.sum(out) + jnp.sum(lf)
            if upto == "geomlp":
                return acc

            lat24 = model.apply(params, lf, method=lambda m, x: m.gcompress(x))
            lat24 = jnp.broadcast_to(lat24[None], (V, N, 24))
            rgb_feat = jnp.concatenate(
                [img_xy.astype(DTYPE), feat_xy.astype(DTYPE), lat24], -1)
            cam_pos = camera_center(vb.src_R, vb.src_t)
            cam_rays = pts[None] - cam_pos[:, None, :]
            cam_rays = cam_rays / (jnp.linalg.norm(cam_rays, axis=-1, keepdims=True) + 1e-9)
            rd = dirs[None] - cam_rays
            rd_dir = rd / jnp.maximum(jnp.linalg.norm(rd, axis=-1, keepdims=True), 1e-6)
            rd_dot = jnp.sum(cam_rays * dirs[None], -1, keepdims=True)
            ray_diff = jnp.concatenate([rd_dir, rd_dot], -1)
            acc = acc + jnp.sum(rgb_feat) + jnp.sum(ray_diff)
            if upto == "colorprep":
                return acc

            rgb = model.apply(
                params, rgb_feat, ray_diff.astype(DTYPE), mask2.astype(DTYPE),
                method=lambda m, a, b, cc: m.ibr_head(a, b, cc))
            return acc + jnp.sum(rgb)

        return fn

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    z8 = jax.device_put(jnp.zeros(8), dev)

    prev = 0.0
    for name in ("project", "gathers", "spatial", "geomlp", "colorprep", "full"):
        f = jax.jit(stage(name))
        float(f(params, feats, vb, pts, dirs))
        float(trivial(z8))
        t0 = time.perf_counter()
        float(trivial(z8))
        rt = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f(params, feats, vb, pts, dirs))
        d = max(time.perf_counter() - t0 - rt, 0.0)
        print(json.dumps({"stage": name, "cum_s": round(d, 4),
                          "delta_s": round(d - prev, 4)}))
        prev = d


if __name__ == "__main__":
    main()
