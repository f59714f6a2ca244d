#!/usr/bin/env python
"""Microbenchmark: patch-gather rate vs MAP SIZE + the quadrant-split trick.

gather_channels_micro.py showed the per-index cost is channel-independent
at 512^2 (~23.5 ns), while 128^2/256^2 maps gather at ~15.2 ns — the cost
follows the map's spatial size. If true, a 512^2 map can be gathered at
the small-map rate by splitting it into 4 overlapping 258^2 quadrants
(1-px halo so (2,2) patches never straddle a seam) and gathering with a
(quadrant, y, x) index — same index count, exact results.

Measures: plain maps at several sizes, then the quadrant layout at C=12
(strict full map) and C=84 (fast-path fused map).
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


def bench(run, *args):
    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jnp.zeros(8)
    float(trivial(zeros))
    float(run(*args, jnp.asarray(0)))
    t0 = time.perf_counter(); float(trivial(zeros))
    rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(*args, jnp.asarray(97)))
    dt = max(time.perf_counter() - t0 - rt, 1e-9) / K
    return dt


def scan_sum(f, fmap, xy, seed):
    def body(acc, k):
        out = f(fmap, xy + (seed + k).astype(jnp.float32) * 1e-6)
        return acc + jnp.sum(out.astype(jnp.float32)), None

    acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
    return acc


def quad_split(fmap):
    """(V, S, S, C) -> (V, 4, h, h, C) overlapping quadrants, h = S/2 + 2.

    Quadrant q of point (y, x): qy = y0 >= S/2, qx = x0 >= S/2 using the
    PATCH BASE y0/x0 (so base S/2-1 stays in the low quadrant and its
    patch reads the halo row). Quadrant layout: base-relative coords
    y0 - qy*S/2 in [0, S/2-1], patch spans +1 -> h = S/2 + 1; +1 pad for
    alignment slack.
    """
    Vv, S, _, C = fmap.shape
    h = S // 2 + 2
    quads = []
    for qy in (0, 1):
        for qx in (0, 1):
            tile = fmap[:, qy * (S // 2):, qx * (S // 2):, :][:, :h, :h, :]
            pad_y = h - tile.shape[1]
            pad_x = h - tile.shape[2]
            tile = jnp.pad(tile, ((0, 0), (0, pad_y), (0, pad_x), (0, 0)),
                           mode="edge")
            quads.append(tile)
    return jnp.stack(quads, axis=1)  # (V, 4, h, h, C)


def quad_sample(quads, xy_ndc, S):
    """Exact bilinear sample from the quadrant layout (border semantics of
    ops/feat_sample.bilinear_sample)."""
    def one_view(qmap, xy):
        W = H = S
        x = jnp.clip((xy[..., 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1.0)
        y = jnp.clip((xy[..., 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1.0)
        x0 = jnp.minimum(jnp.floor(x), W - 2).astype(jnp.int32)
        y0 = jnp.minimum(jnp.floor(y), H - 2).astype(jnp.int32)
        wx = (x - x0)[..., None]
        wy = (y - y0)[..., None]
        qx = (x0 >= S // 2).astype(jnp.int32)
        qy = (y0 >= S // 2).astype(jnp.int32)
        q = qy * 2 + qx
        ly = y0 - qy * (S // 2)
        lx = x0 - qx * (S // 2)
        starts = jnp.stack([q, ly, lx], axis=-1)  # (N, 3)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2),
        )
        C = qmap.shape[-1]
        patches = jax.lax.gather(
            qmap, starts, dn, slice_sizes=(1, 2, 2, C),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (N, 2, 2, C)
        wxc = jnp.concatenate([1.0 - wx, wx], axis=-1)
        wyc = jnp.concatenate([1.0 - wy, wy], axis=-1)
        w = (wyc[:, :, None] * wxc[:, None, :]).astype(qmap.dtype)
        return jnp.sum(patches * w[..., None], axis=(1, 2))

    return jax.vmap(one_view)(quads, xy_ndc)


def main():
    from keypointnerf_tpu.ops.feat_sample import multiview_bilinear_sample

    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.uniform(-1, 1, (V, N, 2)), jnp.float32)

    for S, C in ((128, 12), (256, 12), (384, 12), (512, 12), (768, 12),
                 (512, 84)):
        fmap = jnp.asarray(rng.normal(0, 1, (V, S, S, C)), jnp.bfloat16)
        run = jax.jit(functools.partial(scan_sum, multiview_bilinear_sample))
        dt = bench(run, fmap, xy)
        print(f"plain {S:4d}^2 C={C:3d}: {dt*1e3:8.2f} ms/pass "
              f"{dt/(V*N)*1e9:6.2f} ns/patch", flush=True)

    for S, C in ((512, 12), (512, 84)):
        fmap = jnp.asarray(rng.normal(0, 1, (V, S, S, C)), jnp.bfloat16)
        quads = jax.jit(quad_split)(fmap)
        f = functools.partial(quad_sample, S=S)
        run = jax.jit(functools.partial(scan_sum, f))
        dt = bench(run, quads, xy)
        # parity check
        ref = multiview_bilinear_sample(fmap, xy[:, :4096])
        got = quad_sample(quads, xy[:, :4096], S)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                    got.astype(jnp.float32))))
        print(f"quad  {S:4d}^2 C={C:3d}: {dt*1e3:8.2f} ms/pass "
              f"{dt/(V*N)*1e9:6.2f} ns/patch  max|err|={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
