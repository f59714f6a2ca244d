#!/usr/bin/env python
"""Microbenchmark: 4D-operand block-gather rate vs block AREA.

gather_size_micro.py: quadrant layout (4, 258, 258, C) gathered at 25.4
ns/patch — but 258^2 = 66.6K pixels sits just ABOVE the ~65.5K (=256^2)
area threshold where plain-map gathers drop from 23.6 to 15.2 ns. This
isolates the question: does a 4D-operand gather with blocks of EXACTLY
<= 256^2 area hit the fast rate?

  * (4, 256, 256, C): no-halo control (inexact at seams, rate-only probe)
  * (9, 256, 256, C): stride-254 overlapping blocks, EXACT bilinear
    (every (2,2) patch fits inside the block chosen by y0//254, x0//254)

If the 9-block exact variant runs at ~15 ns/patch, both the strict full
map AND the fast-path fused map gain ~35% on their dominant gather.
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
STRIDE = 254


def block_split(fmap, bs=256, stride=STRIDE):
    """(V, S, S, C) -> (V, nb*nb, bs, bs, C), overlapping stride-`stride`
    blocks; block (by, bx) covers rows [by*stride, by*stride+bs)."""
    Vv, S, _, C = fmap.shape
    nb = -(-(S - bs) // stride) + 1 if S > bs else 1
    tiles = []
    for by in range(nb):
        for bx in range(nb):
            t = fmap[:, by * stride : by * stride + bs,
                     bx * stride : bx * stride + bs, :]
            py, px = bs - t.shape[1], bs - t.shape[2]
            if py or px:
                t = jnp.pad(t, ((0, 0), (0, py), (0, px), (0, 0)), mode="edge")
            tiles.append(t)
    return jnp.stack(tiles, axis=1), nb


def block_sample(blocks, xy_ndc, S, nb, bs=256, stride=STRIDE):
    """Exact bilinear sample from the overlapping-block layout."""
    def one_view(bm, xy):
        C = bm.shape[-1]
        x = jnp.clip((xy[..., 0] + 1.0) * 0.5 * (S - 1), 0.0, S - 1.0)
        y = jnp.clip((xy[..., 1] + 1.0) * 0.5 * (S - 1), 0.0, S - 1.0)
        x0 = jnp.minimum(jnp.floor(x), S - 2).astype(jnp.int32)
        y0 = jnp.minimum(jnp.floor(y), S - 2).astype(jnp.int32)
        wx = (x - x0)[..., None]
        wy = (y - y0)[..., None]
        by = jnp.minimum(y0 // stride, nb - 1)
        bx = jnp.minimum(x0 // stride, nb - 1)
        b = by * nb + bx
        starts = jnp.stack([b, y0 - by * stride, x0 - bx * stride], axis=-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2),
        )
        patches = jax.lax.gather(
            bm, starts, dn, slice_sizes=(1, 2, 2, C),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
        wxc = jnp.concatenate([1.0 - wx, wx], axis=-1)
        wyc = jnp.concatenate([1.0 - wy, wy], axis=-1)
        w = (wyc[:, :, None] * wxc[:, None, :]).astype(bm.dtype)
        return jnp.sum(patches * w[..., None], axis=(1, 2))

    return jax.vmap(one_view)(blocks, xy_ndc)


def main():
    from keypointnerf_tpu.ops.feat_sample import multiview_bilinear_sample

    rng = np.random.default_rng(0)
    xy = jnp.asarray(rng.uniform(-1, 1, (V, N, 2)), jnp.float32)

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    zeros = jnp.zeros(8)
    float(trivial(zeros))

    def bench(f, fmap, label, check=None):
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
        if check is not None:
            ref = multiview_bilinear_sample(check, xy[:, :4096])
            got = f(fmap, xy[:, :4096])
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                        got.astype(jnp.float32))))
            extra = f"  max|err|={err:.2e}"
        print(f"{label:34s} {dt*1e3:8.2f} ms/pass "
              f"{dt/(V*N)*1e9:6.2f} ns/patch{extra}", flush=True)

    for C in (12, 84):
        base = jnp.asarray(rng.normal(0, 1, (V, 512, 512, C)), jnp.bfloat16)
        bench(multiview_bilinear_sample, base, f"plain 512^2 C={C}")

        # no-halo rate probe (INEXACT at seams; rate only)
        nohalo, _ = jax.jit(functools.partial(block_split, bs=256, stride=256))(base)
        f_probe = functools.partial(block_sample, S=512, nb=2, bs=256, stride=256)
        bench(f_probe, nohalo, f"4x(256,256) no-halo probe C={C}")

        # exact overlapping 9-block layout
        blocks, nb = jax.jit(functools.partial(block_split))(base)
        f_exact = functools.partial(block_sample, S=512, nb=nb)
        bench(f_exact, blocks, f"{nb*nb}x(256,256) stride-254 C={C}",
              check=base)


if __name__ == "__main__":
    main()
