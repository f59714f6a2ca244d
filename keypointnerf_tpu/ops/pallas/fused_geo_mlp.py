"""Pallas TPU kernel: fused geometry MLP stack.

Fuses the entire per-point geometry pipeline of the reference —
MLPUNet (skip-injected per-view MLP, src/utils.py:649-720) → masked
mean/var pooling (utils.py:589-647) → fusion MLP (utils.py:555-587) —
into ONE kernel. The XLA version materializes every intermediate
activation (V*N x 128 each, 5+ tensors) in HBM between ops; here a tile
of points stays resident in VMEM through all 7 matmuls, so HBM traffic
drops to inputs + outputs only. The MLP widths (128/120/64) sit right at
the MXU tile size, which XLA pads per-op; fusing amortizes that padding
across the whole stack.

Layout: inputs are (V, N, C); the grid tiles N. Within a tile the V axis
is folded into rows, (V*TN, C), so every matmul is a single MXU
contraction. Weight-norm is folded into plain weights by the caller
(`fold_weight_norm`).

Differentiation: the kernel defines a custom VJP whose backward pass
recomputes activations with XLA ops (rematerialization — cheaper in HBM
than saving 5 activation tensors, and the backward matmuls dominate
anyway).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile of points per grid step; V*TILE_N rows of activations stay in VMEM
TILE_N = 512
# the sp-fused variant additionally keeps the (V, T, 168) encoding and its
# sin/cos intermediates in VMEM: at T=512 that overflows the 16 MB scoped
# VMEM limit (measured 18.87M on v5e), so it tiles half as wide
SP_TILE_N = 256


# shared with the Flax path so forward values AND custom-VJP gradients
# agree to rounding error, not just mathematically (plain jnp: traces fine
# inside Pallas kernels)
from ...models.mlp import softplus100


def fold_weight_norm(params) -> Tuple[jnp.ndarray, ...]:
    """Flatten the GeoFusionMLP Flax params into effective dense weights.

    Weight-norm w = v * g / ||v||_col (models/mlp.py WNDense) is folded
    here, outside the kernel — it is O(C^2), negligible next to the
    per-point work.

    Returns (W0, b0, W1, b1, W2, b2, W3, b3, F0, fb0, F1, fb1, F2, fb2).
    """

    def eff(p):
        v = p["kernel"]
        if "gain" in p:
            g = p["gain"]
            v = v * (g[None, :] / (jnp.linalg.norm(v, axis=0, keepdims=True) + 1e-12))
        return v, p["bias"]

    mlp1 = params["MLPUNet_0"]
    mlp2 = params["MLP_0"]
    ws = []
    for i in range(4):
        w, b = eff(mlp1[f"WNDense_{i}"])
        ws += [w, b]
    for i in range(3):
        w, b = eff(mlp2[f"WNDense_{i}"])
        ws += [w, b]
    return tuple(ws)


def _mlp_stack(sp, f0, f1, mask, weight, ws, compute_dtype):
    """The math of the fused kernel, shared by the in-kernel body and the
    XLA recompute in the VJP. All args are arrays (not refs).

    sp: (V, T, Dsp), f0: (V, T, C0), f1: (V, T, C1),
    mask/weight: (V, T, 1). Returns (out, valid, latent_view, latent_fused).
    """
    W0, b0, W1, b1, W2, b2, W3, b3, F0, fb0, F1, fb1, F2, fb2 = ws
    V, T = sp.shape[0], sp.shape[1]
    dt = compute_dtype

    def dot(a, w):
        return jnp.dot(a.astype(dt), w.astype(dt), preferred_element_type=jnp.float32)

    # fold views into rows: every matmul is one (V*T, Cin) x (Cin, Cout)
    # MXU contraction
    x = jnp.concatenate([sp, f0], axis=-1).reshape(V * T, -1)
    x = softplus100(dot(x, W0) + b0)
    x = softplus100(dot(x, W1) + b1)
    x = jnp.concatenate([x, f1.reshape(V * T, -1)], axis=-1)
    x = softplus100(dot(x, W2) + b2)
    lv = (dot(x, W3) + b3).reshape(V, T, -1)  # (V, T, 64) latent_view

    a_sum = jnp.sum(mask, axis=0)             # (T, 1)
    mean = jnp.sum(weight * lv, axis=0)       # (T, 64)
    var = jnp.sum(weight * (lv - mean[None]) ** 2, axis=0)
    lf = jnp.concatenate([mean, var], axis=-1)  # (T, 128) latent_fused

    y = softplus100(dot(lf, F0) + fb0)
    y = softplus100(dot(y, F1) + fb1)
    out = dot(y, F2) + fb2                    # (T, 2)
    valid = (a_sum > 0.0).astype(out.dtype)
    return out, valid, lv, lf


def _kernel(sp_ref, f0_ref, f1_ref, mask_ref, w_ref, *rest, compute_dtype):
    *w_refs, out_ref, valid_ref, lv_ref, lf_ref = rest
    ws = tuple(r[:] for r in w_refs)
    out, valid, lv, lf = _mlp_stack(
        sp_ref[:], f0_ref[:], f1_ref[:], mask_ref[:], w_ref[:], ws, compute_dtype
    )
    out_ref[:] = out
    valid_ref[:] = valid
    lv_ref[:] = lv
    lf_ref[:] = lf


def _fused_call(sp, f0, f1, mask, weight, ws, interpret, compute_dtype=jnp.float32):
    """pallas_call wrapper. sp: (V, N, Dsp) etc. N must be a multiple of
    TILE_N (caller pads)."""
    V, N, Dsp = sp.shape
    C0, C1 = f0.shape[-1], f1.shape[-1]
    n_tiles = N // TILE_N

    def in_spec(c):
        return pl.BlockSpec(
            (V, TILE_N, c), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ws]

    d_out, d_lv, d_lf = ws[-2].shape[-1], ws[6].shape[-1], ws[8].shape[0]

    out_specs = (
        pl.BlockSpec((TILE_N, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((V, TILE_N, d_lv), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_N, d_lf), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((N, d_out), jnp.float32),
        jax.ShapeDtypeStruct((N, 1), jnp.float32),
        jax.ShapeDtypeStruct((V, N, d_lv), jnp.float32),
        jax.ShapeDtypeStruct((N, d_lf), jnp.float32),
    )

    kernel = functools.partial(_kernel, compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[in_spec(Dsp), in_spec(C0), in_spec(C1), in_spec(1), in_spec(1)]
        + w_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(sp, f0, f1, mask, weight, *ws)


def geo_mlp_apply(params, sp, f0, f1, mask, weight, interpret=False,
                  compute_dtype=jnp.float32):
    """Differentiable fused geometry MLP.

    Args match GeoFusionMLP.__call__ (models/mlp.py): sp (V, N, Dsp),
    im_feats [f0 (V, N, C0), f1 (V, N, C1)], mask/weight (V, N, 1).
    Returns (out (N,2), valid (N,1), latent_view (V,N,64), latent_fused (N,128)).

    Pads N up to a TILE_N multiple internally.
    """
    ws = fold_weight_norm(params)
    V, N = sp.shape[:2]
    n_pad = (-N) % TILE_N

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n_pad), (0, 0))) if n_pad else x

    out, valid, lv, lf = _fused_pallas(
        pad(sp), pad(f0), pad(f1), pad(mask), pad(weight), ws, interpret,
        compute_dtype,
    )
    if n_pad:
        out, valid, lv, lf = out[:N], valid[:N], lv[:, :N], lf[:N]
    return out, valid, lv, lf


# ---------------------------------------------------------------- custom VJP
@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_pallas(sp, f0, f1, mask, weight, ws, interpret, compute_dtype):
    return _fused_call(sp, f0, f1, mask, weight, ws, interpret, compute_dtype)


def _fwd(sp, f0, f1, mask, weight, ws, interpret, compute_dtype):
    outs = _fused_call(sp, f0, f1, mask, weight, ws, interpret, compute_dtype)
    return outs, (sp, f0, f1, mask, weight, ws)


def _bwd(interpret, compute_dtype, res, g):
    """Rematerializing backward: rerun the (cheap, fused) forward as plain
    XLA ops and let AD differentiate that graph."""
    sp, f0, f1, mask, weight, ws = res

    def forward(sp, f0, f1, mask, weight, ws):
        return _mlp_stack(sp, f0, f1, mask, weight, ws, compute_dtype)

    _, vjp = jax.vjp(forward, sp, f0, f1, mask, weight, ws)
    return vjp(g)


_fused_pallas.defvjp(_fwd, _bwd)


def fused_geo_mlp_reference(params, sp, f0, f1, mask, weight,
                            compute_dtype=jnp.float32):
    """Pure-XLA twin of geo_mlp_apply (same folded weights, same math) —
    used by tests and as a fallback on non-TPU backends."""
    ws = fold_weight_norm(params)
    return _mlp_stack(sp, f0, f1, mask, weight, ws, compute_dtype)


# ------------------------------------------------------------------------
# Variant 2: spatial encoding fused IN-KERNEL.
#
# HW status (round 3, scripts/probe_sp_fused.py): COMPILES and matches the
# XLA twin on the real chip at SP_TILE_N <= 256 — the round-2 "opaque
# HTTP 500" was the remote compiler subprocess dying on VMEM overflow at
# tile 512 (reproduced: 512 still 500s, 64/128/256 compile in ~10 s).
# End-to-end it remains flag-gated off: like the base kernel, XLA wins
# this matmul stack (see docs/PERF.md kernel table for the measured
# strict-render delta).
#
# The rel_z_decay encoding (models/spatial_encoding.py, reference
# src/spatial.py:105-118) produces a (V, N, 168) f32 tensor — the single
# largest HBM intermediate of the whole point pipeline (~670 B per
# view-point, written once and read once per pass). This variant takes the
# camera-frame points (V, N, 3) + keypoints (V, K, 3) instead and computes
# the encoding inside the kernel, so that tensor never exists in HBM.


def _sp_mlp_stack(pts_cam, kpt_flat, f0, f1, mask, weight, ws, sp_level,
                  sp_sigma, sp_scale, compute_dtype):
    """sp-fused math: identical to spatial_encode(rel_z_decay) -> _mlp_stack.

    pts_cam: (V, T, 3); kpt_flat: (V*K, 3) — 2D so the gridded pallas_call
    accepts it as a full-array VMEM input.
    """
    V, T = pts_cam.shape[0], pts_cam.shape[1]
    K = kpt_flat.shape[0] // V
    kpt_cam = kpt_flat.reshape(V, K, 3)
    L = sp_level

    # slice (not integer-index) the z channel: int indexing lowers to a 3D
    # gather, which Mosaic does not support
    pz = pts_cam[..., 2:3]                              # (V, T, 1)
    kz = kpt_cam[..., 2:3].reshape(V, 1, K)             # (V, 1, K)
    dz = sp_scale * (pz - kz)                           # (V, T, K)
    # Gaussian 3D-distance decay, built from per-axis diffs to stay 3D
    # (4D intermediates trip the Mosaic remote compiler)
    d2 = jnp.zeros_like(dz)
    for ax in range(3):
        pa = pts_cam[..., ax : ax + 1]                  # (V, T, 1)
        ka = kpt_cam[..., ax : ax + 1].reshape(V, 1, K)  # (V, 1, K)
        da = pa - ka
        d2 = d2 + da * da
    w_decay = jnp.exp(-d2 / (2.0 * sp_sigma**2))        # (V, T, K)

    # per-level (sin_l, cos_l) blocks along the LAST axis — identical to
    # positional_encoding's (1+2L, K) group layout after the decay weight
    # (models/spatial_encoding.py:45-63). The level loop is unrolled with
    # python-scalar frequencies: array constants can't be captured by a
    # pallas kernel, and f32 iota is unsupported.
    import math

    parts = [dz * w_decay]
    for lvl in range(L):
        f = float(math.pi * (2.0**lvl))
        yl = dz * f
        parts.append(jnp.sin(yl) * w_decay)
        parts.append(jnp.cos(yl) * w_decay)
    sp = jnp.concatenate(parts, axis=-1)                # (V, T, (1+2L)K)

    return _mlp_stack(sp, f0, f1, mask, weight, ws, compute_dtype)


def _sp_kernel(pts_ref, kpt_ref, f0_ref, f1_ref, mask_ref, w_ref, *rest,
               sp_level, sp_sigma, sp_scale, compute_dtype):
    *w_refs, out_ref, valid_ref, lv_ref, lf_ref = rest
    ws = tuple(r[:] for r in w_refs)
    out, valid, lv, lf = _sp_mlp_stack(
        pts_ref[:], kpt_ref[:], f0_ref[:], f1_ref[:], mask_ref[:], w_ref[:],
        ws, sp_level, sp_sigma, sp_scale, compute_dtype,
    )
    out_ref[:] = out
    valid_ref[:] = valid
    lv_ref[:] = lv
    lf_ref[:] = lf


def _sp_fused_call(pts_cam, kpt_cam, f0, f1, mask, weight, ws, sp_args,
                   interpret, compute_dtype):
    sp_level, sp_sigma, sp_scale = sp_args
    V, N = pts_cam.shape[:2]
    C0, C1 = f0.shape[-1], f1.shape[-1]
    n_tiles = N // SP_TILE_N

    def in_spec(c):
        return pl.BlockSpec(
            (V, SP_TILE_N, c), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    kpt_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ws]
    d_out, d_lv, d_lf = ws[-2].shape[-1], ws[6].shape[-1], ws[8].shape[0]

    out_specs = (
        pl.BlockSpec((SP_TILE_N, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((SP_TILE_N, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((V, SP_TILE_N, d_lv), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((SP_TILE_N, d_lf), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((N, d_out), jnp.float32),
        jax.ShapeDtypeStruct((N, 1), jnp.float32),
        jax.ShapeDtypeStruct((V, N, d_lv), jnp.float32),
        jax.ShapeDtypeStruct((N, d_lf), jnp.float32),
    )
    kernel = functools.partial(
        _sp_kernel, sp_level=sp_level, sp_sigma=sp_sigma, sp_scale=sp_scale,
        compute_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[in_spec(3), kpt_spec, in_spec(C0), in_spec(C1), in_spec(1),
                  in_spec(1)] + w_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(pts_cam, kpt_cam, f0, f1, mask, weight, *ws)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _sp_fused_pallas(pts_cam, kpt_cam, f0, f1, mask, weight, ws, sp_args,
                     interpret, compute_dtype):
    return _sp_fused_call(pts_cam, kpt_cam, f0, f1, mask, weight, ws, sp_args,
                          interpret, compute_dtype)


def _sp_fwd(pts_cam, kpt_cam, f0, f1, mask, weight, ws, sp_args, interpret,
            compute_dtype):
    outs = _sp_fused_call(pts_cam, kpt_cam, f0, f1, mask, weight, ws, sp_args,
                          interpret, compute_dtype)
    return outs, (pts_cam, kpt_cam, f0, f1, mask, weight, ws)


def _sp_bwd(sp_args, interpret, compute_dtype, res, g):
    pts_cam, kpt_cam, f0, f1, mask, weight, ws = res
    sp_level, sp_sigma, sp_scale = sp_args

    def forward(pts_cam, kpt_cam, f0, f1, mask, weight, ws):
        return _sp_mlp_stack(pts_cam, kpt_cam, f0, f1, mask, weight, ws,
                             sp_level, sp_sigma, sp_scale, compute_dtype)

    _, vjp = jax.vjp(forward, pts_cam, kpt_cam, f0, f1, mask, weight, ws)
    return vjp(g)


_sp_fused_pallas.defvjp(_sp_fwd, _sp_bwd)


def sp_geo_mlp_apply(params, pts_cam, kpt_cam, f0, f1, mask, weight,
                     sp_level=3, sp_sigma=0.1, sp_scale=1.0,
                     interpret=False, compute_dtype=jnp.float32):
    """Differentiable fused spatial-encoding + geometry MLP (rel_z_decay).

    pts_cam: (V, N, 3) camera-frame query points; kpt_cam: (V, K, 3)
    camera-frame keypoints; rest as geo_mlp_apply. The (V, N, 168) spatial
    encoding never touches HBM.
    """
    ws = fold_weight_norm(params)
    V, N = pts_cam.shape[:2]
    n_pad = (-N) % SP_TILE_N

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n_pad), (0, 0))) if n_pad else x

    # keypoints travel 2D (V*K, 3): a 3D full-array input in a gridded
    # pallas_call trips the Mosaic remote compiler
    out, valid, lv, lf = _sp_fused_pallas(
        pad(pts_cam), kpt_cam.reshape(-1, 3), pad(f0), pad(f1), pad(mask),
        pad(weight), ws, (sp_level, sp_sigma, sp_scale), interpret,
        compute_dtype,
    )
    if n_pad:
        out, valid, lv, lf = out[:N], valid[:N], lv[:, :N], lf[:N]
    return out, valid, lv, lf
