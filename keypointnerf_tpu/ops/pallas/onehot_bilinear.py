"""Pallas TPU kernel: bilinear map sampling as one-hot MXU contractions.

The per-point feature gather is index-rate-bound on TPU (~15-24 ns/patch
regardless of payload or locality; scripts/gather_micro.py,
docs/PERF.md "the gather floor"). For SMALL maps the same exact bilinear
lookup can instead be computed on the MXU:

    out[n, c] = sum_y sum_x Yw[n, y] * Xw[n, x] * M[y, x, c]

with Yw/Xw the 2-nonzero row/column one-hot interpolation weights. Staged
as (all in VMEM, nothing index-dependent):

    T   = Yw @ M'                         # MXU  (P, C*W), M'[y, c*W+x] = M[y,x,c]
    G   = tile(Xw, C) * T                 # VPU  (P, C*W)  (pltpu.repeat tiles)
    out = G @ S                           # MXU  (P, C), S[c*W+x, c'] = [c==c']

FLOP cost is N*H*W*C*2 — worth it only when H*W*C is small relative to the
~15 ns/index gather floor. For the texture map (256^2 x 8ch,
reference src/utils.py:216-259 output) the arithmetic is ~1.7x cheaper
than the measured gather; for the 64-ch coarse map it is ~2.4x MORE
expensive (stage-2 scales with W*C*C), so this kernel is wired for the
tex lookup only (cfg.tex_onehot_sample).

Exactness: identical clamp/floor/border semantics to
ops/feat_sample.bilinear_sample. In f32 the result matches the gather
path to float rounding; in bf16 both paths round comparably (weights
quantized to bf16 vs bf16 patch blend).

Forward-only (inference); training keeps the XLA gather + matmul VJP.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# points per grid step: T = (TILE_N, W*C) is the big VMEM tenant
# (256^2x8ch map -> 2048 lanes; bf16 TILE 1024 -> 4 MB)
TILE_N = 1024


def _kernel(xy_ref, m_ref, s_ref, out_ref, *, H, W, C, dtype):
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

    # int iota + where: Mosaic rejects float iota
    rows = jax.lax.broadcasted_iota(jnp.int32, (P, H), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (P, W), 1)
    zero = jnp.float32(0.0)
    yw = (
        jnp.where(rows == y0i, 1.0 - wy, zero)
        + jnp.where(rows == y0i + 1, wy, zero)
    ).astype(dtype)                                  # (P, H)
    xw = (
        jnp.where(cols == x0i, 1.0 - wx, zero)
        + jnp.where(cols == x0i + 1, wx, zero)
    ).astype(dtype)                                  # (P, W)

    t = jax.lax.dot_general(
        yw, m_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)                                  # (P, C*W)
    # pltpu.repeat TILES the array ([x0..xW]*C), matching the (H, C*W)
    # channel-major map layout built by the wrapper
    g = pltpu.repeat(xw, C, axis=1) * t              # (P, C*W)
    out_ref[:] = jax.lax.dot_general(
        g, s_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)                          # (P, C)


def onehot_bilinear_sample(feat, xy_ndc, interpret=False):
    """Exact bilinear sample of ONE map via MXU one-hot contractions.

    Args:
      feat:   (H, W, C) feature map (bf16 or f32).
      xy_ndc: (N, 2) sample locations in [-1, 1] (align_corners, border
              clamp — the feat_sample conventions).
    Returns:
      (N, C) in feat.dtype.
    """
    H, W, C = feat.shape
    N = xy_ndc.shape[0]
    dtype = feat.dtype
    n_pad = (-N) % TILE_N
    xy = jnp.pad(xy_ndc.astype(jnp.float32), ((0, n_pad), (0, 0)))
    n_tiles = (N + n_pad) // TILE_N

    # channel-major layout M'[y, c*W + x] = M[y, x, c]: the in-kernel
    # column-weight expansion is a TILE (pltpu.repeat), so channels must be
    # the outer factor. One transpose per render, amortized over all points.
    m2 = jnp.transpose(feat, (0, 2, 1)).reshape(H, C * W)
    # channel-sum selector S[c*W + x, c'] = [c == c']
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (C * W, C), 0) // W
        == jax.lax.broadcasted_iota(jnp.int32, (C * W, C), 1)
    ).astype(dtype)

    kernel = functools.partial(_kernel, H=H, W=W, C=C, dtype=dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_N, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_N, C), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N + n_pad, C), dtype),
        interpret=interpret,
    )(xy, m2, sel)
    return out[:N]


def multiview_onehot_bilinear_sample(feats, xy_ndc, interpret=False):
    """(V, H, W, C) x (V, N, 2) -> (V, N, C); one kernel launch per view."""
    outs = [
        onehot_bilinear_sample(feats[v], xy_ndc[v], interpret=interpret)
        for v in range(feats.shape[0])
    ]
    return jnp.stack(outs, axis=0)
