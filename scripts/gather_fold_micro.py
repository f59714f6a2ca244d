#!/usr/bin/env python
"""Microbenchmark: EXACT folded-layout bilinear sampling of a 512^2 map.

With float-derived (clip/floor) indices, maps with H=W<=256 gather at
~15.2 ns/patch vs ~23.6 at >=384 (gather_size_micro.py; the raw-int-index
gather is flat ~22.5, so the fast path depends on the float->index chain
too). This tests whether a 512^2 map folded into shorter-H layouts (y
blocks moved into the column axis, 1-row halo, exact) hits the fast rate:

  * fold-y2: (257 or 264, 1024, C)   rows 0..256 | 255..511
  * fold-y4: (136, 2048, C)
  * plain 256^2 / 512^2 with the identical code (controls)

All variants are numerically EXACT vs multiview_bilinear_sample (asserted).
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


def fold_y(fmap, blocks, pad_h=0):
    """(V, S, S, C) -> (V, S//blocks + 1 + pad_h, blocks*S, C), exact with
    1-row halo per block."""
    Vv, S, _, C = fmap.shape
    hb = S // blocks
    tiles = []
    for b in range(blocks):
        t = fmap[:, b * hb : b * hb + hb + 1]  # hb+1 rows (halo)
        if t.shape[1] < hb + 1:                 # last block: pad 1 row
            t = jnp.pad(t, ((0, 0), (0, hb + 1 - t.shape[1]), (0, 0), (0, 0)),
                        mode="edge")
        tiles.append(t)
    out = jnp.concatenate(tiles, axis=2)        # (V, hb+1, blocks*S, C)
    if pad_h:
        out = jnp.pad(out, ((0, 0), (0, pad_h), (0, 0), (0, 0)), mode="edge")
    return out


def fold_sample(folded, xy_ndc, S, blocks):
    """Exact bilinear sample of the original (S, S) map from its folded
    layout; identical index math to ops/feat_sample.bilinear_sample."""
    hb = S // blocks

    def one_view(fm, xy):
        C = fm.shape[-1]
        x = jnp.clip((xy[..., 0] + 1.0) * 0.5 * (S - 1), 0.0, S - 1.0)
        y = jnp.clip((xy[..., 1] + 1.0) * 0.5 * (S - 1), 0.0, S - 1.0)
        x0 = jnp.minimum(jnp.floor(x), S - 2).astype(jnp.int32)
        y0 = jnp.minimum(jnp.floor(y), S - 2).astype(jnp.int32)
        wx = (x - x0)[..., None]
        wy = (y - y0)[..., None]
        q = y0 // hb                             # block id
        row = y0 - q * hb                        # [0, hb-1]; patch row+1 <= hb
        col = x0 + q * S
        starts = jnp.stack([row, col], axis=-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )
        patches = jax.lax.gather(
            fm, starts, dn, slice_sizes=(2, 2, C),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
        wxc = jnp.concatenate([1.0 - wx, wx], axis=-1)
        wyc = jnp.concatenate([1.0 - wy, wy], axis=-1)
        w = (wyc[:, :, None] * wxc[:, None, :]).astype(fm.dtype)
        return jnp.sum(patches * w[..., None], axis=(1, 2))

    return jax.vmap(one_view)(folded, xy_ndc)


def main():
    from keypointnerf_tpu.ops.feat_sample import multiview_bilinear_sample

    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.uniform(-1, 1, (V, N, 2)), jnp.float32)

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jnp.zeros(8)
    float(trivial(zeros))

    def bench(f, fmap, label, check_against=None, S=None, sampler=None):
        @jax.jit
        def run(fmap, xy, seed):
            def body(acc, k):
                out = f(fmap, xy + (seed + k).astype(jnp.float32) * 1e-6)
                return acc + jnp.sum(out.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(K))
            return acc

        float(run(fmap, xy, jnp.asarray(0)))
        t0 = time.perf_counter(); float(trivial(zeros))
        rt = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(fmap, xy, jnp.asarray(97)))
        dt = max(time.perf_counter() - t0 - rt, 1e-9) / K
        extra = ""
        if check_against is not None:
            ref = multiview_bilinear_sample(check_against, xy[:, :4096])
            got = f(fmap, xy[:, :4096])
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                        got.astype(jnp.float32))))
            extra = f"  max|err|={err:.2e}"
        print(f"{label:28s} {dt*1e3:8.2f} ms/pass "
              f"{dt/(V*N)*1e9:6.2f} ns/patch{extra}", flush=True)

    for C in (12, 84):
        base = jnp.asarray(rng.normal(0, 1, (V, 512, 512, C)), jnp.bfloat16)
        small = jnp.asarray(rng.normal(0, 1, (V, 256, 256, C)), jnp.bfloat16)
        bench(multiview_bilinear_sample, small, f"plain 256^2 C={C}")
        bench(multiview_bilinear_sample, base, f"plain 512^2 C={C}")
        for blocks, pad_h in ((2, 0), (2, 7), (4, 0)):
            folded = jax.jit(functools.partial(fold_y, blocks=blocks,
                                               pad_h=pad_h))(base)
            f = functools.partial(fold_sample, S=512, blocks=blocks)
            bench(f, folded,
                  f"fold-y{blocks}+{pad_h} {tuple(folded.shape[1:3])} C={C}",
                  check_against=base)


if __name__ == "__main__":
    main()
