"""Pallas TPU kernel: the bilinear-gather map-gradient as MXU contractions
with a VMEM-resident accumulator.

The training-path matmul VJP (ops/feat_sample.py:_mm_bwd_impl) computes

    dmap[h, w, c] = sum_n Yw[n, h] * Xw[n, w] * g[n, c]

as a lax.scan of chunked dense dots. That XLA formulation must
materialize G2[n, w*C+c] = Xw[n, w] * g[n, c] in HBM every chunk —
N*W*C*2 bytes written and re-read, ~58 GB per optimizer step at the ZJU
train geometry's packed 512^2 map (docs/PERF.md) — so it runs at ~1/3
MXU utilization, HBM-strangled.

This kernel keeps the whole pipeline in VMEM: per point-tile it builds
the expanded column weights DIRECTLY at (P, W*C) width from an int iota
(no (P, W) -> (P, W*C) expansion matmul), tiles the cotangent with
pltpu.repeat, and accumulates

    acc(H, W*C) += Yw^T @ (XwE * tile(g, W))

across sequential grid steps with `acc` living in the output VMEM block
(same block every step). HBM traffic drops to reading xy/g once and
writing dmap once. The (H, W*C) layout is x-major with C innermost, so
the wrapper's final reshape to (H, W, C) is free.

Weight/clamp semantics are identical to feat_sample._bilinear_coords
(align_corners, border clamp, base clamped to S-2): the kernel is an
EXACT drop-in for the dmap term of the matmul VJP. Coordinate gradients
(dxy) are not computed here — the caller keeps the XLA path for them
(dead/DCE'd in training, where sample positions carry no parameter
dependence).

Reference counterpart: the backward of grid_sample in
/root/reference/src/utils.py:74-89 (cuDNN scatter on GPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# points per grid step. VMEM tenants at the coarse-map shape
# (H=W=128, C=64): acc (128, 8192) f32 = 4.2 MB, the f32 weight*cotangent
# product (128, 8192) = 4.2 MB + its bf16 cast 2.1 MB — under budget (the
# sp-fused kernel's HTTP 500 was VMEM overflow at 512-wide tiles of a
# much larger working set). 128 (not 256) buys headroom for the f32
# product the exact-rounding formulation needs.
TILE_N = 128


def _kernel(xy_ref, g_ref, out_ref, *, H, W, C, dtype, broadcast_xwe):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    xy = xy_ref[:]                                   # (P, 2) f32
    P = xy.shape[0]
    x = jnp.clip((xy[:, 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1.0)
    y = jnp.clip((xy[:, 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1.0)
    x0 = jnp.minimum(jnp.floor(x), W - 2)
    y0 = jnp.minimum(jnp.floor(y), H - 2)
    wx = (x - x0)[:, None]                           # (P, 1) f32
    wy = (y - y0)[:, None]
    x0i = x0.astype(jnp.int32)[:, None]
    y0i = y0.astype(jnp.int32)[:, None]

    zero = jnp.float32(0.0)
    # row one-hot weights (P, H)
    rows = jax.lax.broadcasted_iota(jnp.int32, (P, H), 1)
    yw = (
        jnp.where(rows == y0i, 1.0 - wy, zero)
        + jnp.where(rows == y0i + 1, wy, zero)
    ).astype(dtype)
    if broadcast_xwe:
        # build the compact (P, W) one-hot on the VPU, then expand to
        # (P, W*C) with a broadcast-reshape (C innermost) — ~5 fewer
        # full-width VPU passes than the iota//C construction below
        colsw = jax.lax.broadcasted_iota(jnp.int32, (P, W), 1)
        xw = (
            jnp.where(colsw == x0i, 1.0 - wx, zero)
            + jnp.where(colsw == x0i + 1, wx, zero)
        )                                            # (P, W) f32
        xwe = jnp.broadcast_to(xw[:, :, None], (P, W, C)).reshape(P, W * C)
    else:
        # expanded column weights built directly at (P, W*C): column k
        # holds x index k // C (x-major, C innermost)
        colsx = jax.lax.broadcasted_iota(jnp.int32, (P, W * C), 1) // C
        xwe = (
            jnp.where(colsx == x0i, 1.0 - wx, zero)
            + jnp.where(colsx == x0i + 1, wx, zero)
        )                                            # (P, W*C) f32
    # cotangent tiled over x blocks: position w*C + c holds g[n, c]
    gt = pltpu.repeat(g_ref[:], W, axis=1)           # (P, W*C) f32
    # the weight*cotangent product is formed in f32 and rounded ONCE to
    # the contraction dtype — exactly the XLA scan's G2 = (Xh*g).astype
    # (ops/feat_sample.py). Rounding each factor separately (the previous
    # formulation) double-rounds and diverged from the scan by ~2e-3.
    out_ref[:] += jax.lax.dot_general(
        yw, (xwe * gt).astype(dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # (H, W*C) f32


def bilinear_dmap_onehot(xy_ndc, g, H, W, map_dtype=jnp.bfloat16,
                         interpret=False, tile_n=None, broadcast_xwe=False):
    """Map gradient of `bilinear_sample(feat, xy_ndc)` wrt `feat`.

    Args:
      xy_ndc: (N, 2) f32 sample locations in [-1, 1].
      g:      (N, C) cotangent of the sampled output.
      H, W:   map spatial shape.
      map_dtype: contraction dtype (matches the XLA VJP's choice: bf16
        maps contract in bf16 with f32 accumulation, f32 maps in f32).
      tile_n: points per grid step (default TILE_N; larger tiles amortize
        per-step overhead but grow the (tile_n, W*C) VMEM intermediates —
        budget ~16 MB/core).
      broadcast_xwe: build the expanded column weights via a compact
        (P, W) one-hot + broadcast-reshape instead of full-width iota
        compares (fewer VPU passes; bit-identical output).
    Returns:
      (H, W, C) f32 dmap (caller casts to the map dtype).
    """
    N, C = g.shape
    P = TILE_N if tile_n is None else tile_n
    dtype = jnp.bfloat16 if map_dtype == jnp.bfloat16 else jnp.float32
    n_pad = (-N) % P
    # padded rows get zero cotangent -> contribute nothing
    xy = jnp.pad(xy_ndc.astype(jnp.float32), ((0, n_pad), (0, 0)))
    gp = jnp.pad(g, ((0, n_pad), (0, 0)))
    n_tiles = (N + n_pad) // P

    kernel = functools.partial(_kernel, H=H, W=W, C=C, dtype=dtype,
                               broadcast_xwe=broadcast_xwe)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((P, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        # same output block every grid step: a VMEM-resident accumulator
        out_specs=pl.BlockSpec((H, W * C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W * C), jnp.float32),
        interpret=interpret,
    )(xy, gp)
    return out.reshape(H, W, C)
