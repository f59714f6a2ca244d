"""Pallas TPU kernel: fused alpha-compositing + inverse-CDF importance
sampling (SURVEY §2.8 item 3; reference src/model.py:1110-1176).

After the coarse ray-march, the reference composites per-sample radiance
and importance-resamples fine depths from the contribution CDF. The XLA
version round-trips the (R, S) contribution weights and several cumulative
intermediates through HBM between ops; this kernel keeps a ray tile's
z / alpha / contrib / cdf resident in VMEM from compositing through the
fine-depth interpolation.

TPU mapping choices:
  * cumulative products/sums along the sample (lane) axis are expressed as
    matmuls with constant triangular matrices — (T, S) @ (S, S) lands on
    the MXU; Mosaic has no native lane-wise scan. The cumprod runs in
    clamped log space.
  * `searchsorted` is replaced by masked min/max reductions: for ascending
    cdf, the interval enclosing u is (max{cdf_j <= u}, min{cdf_j > u}) —
    no gathers, no 3D one-hot tensors (Mosaic-unfriendly).
  * the n_fine loop is unrolled with 2-D (T, S-1) ops per fine sample.

Forward-only (inference path): training keeps the XLA composite, whose
gradients XLA already fuses well.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rays per grid step: the unrolled n_fine importance loop keeps several
# (T, S-1) intermediates live at once; 64 rays fits the 16 MB scoped-VMEM
# limit (256 measured 28.76M on v5e)
TILE_R = 64
_BIG = 1e30
_LOG_FLOOR = -80.0  # exp(-80) ~ 1.8e-35: an effective zero transmittance


def _body(z, alpha, sdf, r, g, b, u, lt_full, lt_cdf):
    """Shared math (arrays in, arrays out) for the kernel body and the
    interpret/VJP-free XLA twin. Shapes: (T, S) inputs, u (T, F).

    lt_full: (S, S) strictly-lower-triangular ones (cumsum-exclusive).
    lt_cdf:  (S-2, S-1) lower-triangular ones (inclusive cumsum with a
             leading zero row -> cdf edges).
    """
    S = z.shape[-1]
    dist = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full_like(z[:, :1], 1e10)], axis=-1
    )
    a = 1.0 - jnp.exp(-alpha * dist)
    # exclusive cumprod of (1 - a) in clamped log space via MXU matmul
    la = jnp.maximum(jnp.log1p(-a), _LOG_FLOOR)           # (T, S)
    csum = jnp.dot(la, lt_full, preferred_element_type=jnp.float32)
    trans = jnp.exp(csum)
    contrib = a * trans                                    # (T, S)

    acc = jnp.sum(contrib, axis=-1, keepdims=True)         # (T, 1)
    color = jnp.concatenate(
        [
            jnp.sum(r * contrib, axis=-1, keepdims=True),
            jnp.sum(g * contrib, axis=-1, keepdims=True),
            jnp.sum(b * contrib, axis=-1, keepdims=True),
        ],
        axis=-1,
    )                                                      # (T, 3)
    depth = jnp.sum(z * contrib, axis=-1, keepdims=True) / (acc + 1e-8)
    sdf_out = jnp.sum(sdf * contrib, axis=-1, keepdims=True) / (acc + 1e-8)

    # ---- importance sampling over interior bins (reference model.py:1110-1148)
    z_mid = 0.5 * (z[:, 1:] + z[:, :-1])                   # (T, S-1) edges
    cint = contrib[:, 1:-1] + 1e-5                         # (T, S-2) bins
    pdf = cint / jnp.sum(cint, axis=-1, keepdims=True)
    # cdf edges: leading 0 then inclusive cumsum -> (T, S-1)
    cdf = jnp.concatenate(
        [
            jnp.zeros_like(pdf[:, :1]),
            jnp.dot(pdf, lt_cdf, preferred_element_type=jnp.float32),
        ],
        axis=-1,
    )

    cols = []
    F = u.shape[-1]
    last_cdf = cdf[:, -1:]
    last_z = z_mid[:, -1:]
    for k in range(F):
        uk = u[:, k : k + 1]                               # (T, 1)
        cmp = cdf <= uk                                    # (T, S-1)
        cdf_prev = jnp.max(jnp.where(cmp, cdf, -_BIG), axis=-1, keepdims=True)
        z_prev = jnp.max(jnp.where(cmp, z_mid, -_BIG), axis=-1, keepdims=True)
        cdf_next = jnp.min(jnp.where(cmp, _BIG, cdf), axis=-1, keepdims=True)
        z_next = jnp.min(jnp.where(cmp, _BIG, z_mid), axis=-1, keepdims=True)
        # u beyond the last edge (e.g. uniform u = 1): clamp to the top bin
        over = cdf_next >= 0.5 * _BIG
        cdf_next = jnp.where(over, last_cdf, cdf_next)
        z_next = jnp.where(over, last_z, z_next)
        den = cdf_next - cdf_prev
        den = jnp.where(den < 1e-5, jnp.ones_like(den), den)
        cols.append(z_prev + (uk - cdf_prev) / den * (z_next - z_prev))
    z_fine = jnp.concatenate(cols, axis=-1)                # (T, F)
    return color, depth, acc, sdf_out, contrib, z_fine


def _kernel(z_ref, a_ref, s_ref, r_ref, g_ref, b_ref, u_ref, ltf_ref, ltc_ref,
            color_ref, depth_ref, acc_ref, sdf_ref, contrib_ref, zf_ref):
    color, depth, acc, sdf_out, contrib, z_fine = _body(
        z_ref[:], a_ref[:], s_ref[:], r_ref[:], g_ref[:], b_ref[:], u_ref[:],
        ltf_ref[:], ltc_ref[:],
    )
    color_ref[:] = color
    depth_ref[:] = depth
    acc_ref[:] = acc
    sdf_ref[:] = sdf_out
    contrib_ref[:] = contrib
    zf_ref[:] = z_fine


def _tri_full(S: int) -> np.ndarray:
    """(S, S) with [j, i] = 1 iff j < i: x @ M = exclusive lane cumsum."""
    return np.triu(np.ones((S, S), np.float32), k=1)


def _tri_cdf(S: int) -> np.ndarray:
    """(S-2, S-2) with [j, i] = 1 iff j <= i: pdf @ M = inclusive cumsum
    (the cdf edges after their leading zero)."""
    return np.triu(np.ones((S - 2, S - 2), np.float32), k=0)


def composite_importance_pallas(z, alpha, sdf, rgb, u, interpret=False):
    """Fused composite + importance resample for the coarse eval pass.

    Args:
      z:     (R, S) sorted coarse depths.
      alpha: (R, S) density-like values.
      sdf:   (R, S) sdf-proxy channel.
      rgb:   (R, S, 3) per-sample colors.
      u:     (R, F) CDF sample positions in [0, 1] (linspace for eval).
    Returns:
      (color (R,3), depth (R,), acc (R,), sdf (R,), contrib (R,S),
       z_fine (R,F)) — matching geometry.compositing.composite +
      geometry.sampling.importance_z(contrib[:,1:-1], z_mid, F).
    """
    R, S = z.shape
    F = u.shape[-1]
    r_pad = (-R) % TILE_R

    def pad(x):
        return jnp.pad(x, ((0, r_pad),) + ((0, 0),) * (x.ndim - 1)) if r_pad else x

    zp, ap, sp_, up = pad(z), pad(alpha), pad(sdf), pad(u)
    rp, gp, bp = pad(rgb[..., 0]), pad(rgb[..., 1]), pad(rgb[..., 2])
    # pad z with a strictly increasing tail so sorted-depth invariants hold
    if r_pad:
        tail = jnp.broadcast_to(jnp.arange(1, S + 1, dtype=z.dtype), (r_pad, S))
        zp = zp.at[R:].set(tail)

    lt_full = jnp.asarray(_tri_full(S))
    lt_cdf = jnp.asarray(_tri_cdf(S))

    n_tiles = (R + r_pad) // TILE_R

    def rs(c):
        return pl.BlockSpec((TILE_R, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[rs(S), rs(S), rs(S), rs(S), rs(S), rs(S), rs(F), full, full],
        out_specs=(
            rs(3), rs(1), rs(1), rs(1), rs(S), rs(F),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R + r_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((R + r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((R + r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((R + r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((R + r_pad, S), jnp.float32),
            jax.ShapeDtypeStruct((R + r_pad, F), jnp.float32),
        ),
        interpret=interpret,
    )(zp.astype(jnp.float32), ap.astype(jnp.float32), sp_.astype(jnp.float32),
      rp.astype(jnp.float32), gp.astype(jnp.float32), bp.astype(jnp.float32),
      up.astype(jnp.float32), lt_full, lt_cdf)
    color, depth, acc, sdf_out, contrib, z_fine = outs
    return (color[:R], depth[:R, 0], acc[:R, 0], sdf_out[:R, 0],
            contrib[:R], z_fine[:R])
