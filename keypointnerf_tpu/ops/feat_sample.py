"""Bilinear feature sampling at continuous image locations.

This is the single most-called primitive of the whole engine (the reference
calls its torch `grid_sample` wrapper `feat_sample`, src/utils.py:74-89, for
geometry features, texture features, source RGB and foreground masks — per
point per view). Semantics match torch `grid_sample` with mode='bilinear',
padding_mode='border', align_corners=True:

  * NDC [-1, 1] maps to pixel centers [0, S-1] (align_corners).
  * Coordinates are clamped to the border BEFORE the corner/weight split
    (border padding).

TPU implementation: profiling shows gathers are index-overhead-bound, so
the 2x2 interpolation patch is fetched with ONE `lax.gather` of
slice_sizes (2, 2, C) per point instead of four row gathers — 4x fewer
indices, ~25% faster on the big feature maps. Border correctness with the
patch fetch: the patch base is clamped to S-2 and the fractional weight
re-derived against the clamped base, which reproduces border-padding
exactly (at x = S-1 the weight becomes 1.0 on the second column).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(feat, xy_ndc):
    """Sample one feature map at N continuous locations.

    Args:
      feat:   (H, W, C) feature map.
      xy_ndc: (N, 2) sample locations in [-1, 1] NDC (x, y).
    Returns:
      (N, C) bilinearly interpolated features.
    """
    H, W, C = feat.shape
    x = (xy_ndc[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (xy_ndc[..., 1] + 1.0) * 0.5 * (H - 1)
    # border padding: clamp before splitting into corners
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)

    # patch base clamped one short of the border; weights re-derived vs the
    # clamped base (x = S-1 -> base S-2, w = 1: exact border replication)
    x0 = jnp.minimum(jnp.floor(x), W - 2).astype(jnp.int32)
    y0 = jnp.minimum(jnp.floor(y), H - 2).astype(jnp.int32)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    starts = jnp.stack([y0, x0], axis=-1)  # (N, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    patches = jax.lax.gather(
        feat, starts, dn, slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (N, 2, 2, C)

    # corner weights as one (N, 2, 2) outer product and a single weighted
    # reduction over the patch dims. The blend runs in the MAP's dtype:
    # coordinates and the weight outer product are computed in f32, then
    # cast once — for a bf16 map the whole patch tensor stays bf16 through
    # the reduction (measured: an f32 upcast of the (N, 2, 2, C) patches
    # does NOT fuse into the reduce on TPU and costs a full extra HBM
    # round-trip). The reduce formulation (vs slicing the four corners)
    # lets XLA consume the gather's native channel-minor layout directly
    # instead of relayout-copying the full patch tensor.
    wxc = jnp.concatenate([1.0 - wx, wx], axis=-1)  # (N, 2)
    wyc = jnp.concatenate([1.0 - wy, wy], axis=-1)  # (N, 2)
    w = (wyc[:, :, None] * wxc[:, None, :]).astype(feat.dtype)  # (N, 2, 2)
    return jnp.sum(patches * w[..., None], axis=(1, 2))


def multiview_bilinear_sample(feats, xy_ndc):
    """Sample V feature maps at per-view locations.

    Args:
      feats:  (V, H, W, C) per-view feature maps.
      xy_ndc: (V, N, 2) per-view NDC sample locations.
    Returns:
      (V, N, C).
    """
    return jax.vmap(bilinear_sample)(feats, xy_ndc)


def _bilinear_coords(xy_ndc, H, W):
    """Shared coordinate/weight computation of `bilinear_sample`:
    returns (x0, y0, wx, wy, in_x, in_y) with border-clamp semantics."""
    x = (xy_ndc[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (xy_ndc[..., 1] + 1.0) * 0.5 * (H - 1)
    in_x = (x >= 0.0) & (x <= W - 1.0)   # clamp kills the coord gradient
    in_y = (y >= 0.0) & (y <= H - 1.0)
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.minimum(jnp.floor(x), W - 2).astype(jnp.int32)
    y0 = jnp.minimum(jnp.floor(y), H - 2).astype(jnp.int32)
    return x0, y0, x - x0, y - y0, in_x, in_y


@jax.custom_vjp
def bilinear_sample_mm(feat, xy_ndc):
    """`bilinear_sample` with a matmul-based backward for the map gradient.

    XLA:TPU lowers the gather backward to a scatter-add that runs at
    ~4.6 us/index on v5e — 22x slower than the forward gather (measured;
    docs/PERF.md). This variant keeps the identical forward but computes
    dL/dmap as two dense one-hot contractions on the MXU instead: the
    bilinear corner weights factor into row/column one-hots
    Y (N, H) and X (N, W), so

        dmap[y, x, c] = sum_n Y[n, y] * X[n, x] * g[n, c]
                      = Y^T @ (X[:, :, None] * g[:, None, :])

    — N*H*W*C MACs of dense batched work in place of 4N serialized
    scatter indices. Exact (same clamp semantics as the forward,
    f32 accumulation). Coordinate gradients are exact too, with the
    border clamp zeroing them outside [-1, 1] like torch grid_sample.
    """
    return bilinear_sample(feat, xy_ndc)


def _bilinear_mm_fwd(feat, xy_ndc):
    return bilinear_sample(feat, xy_ndc), (feat, xy_ndc)


def _bilinear_mm_bwd(res, g):
    return _mm_bwd_impl(res, g, None, False)


def _mm_bwd_impl(res, g, grad_channels, pallas_dmap):
    """Shared matmul-VJP backward.

    `grad_channels=K` restricts the dmap one-hot contraction to the first
    K channels (zeros elsewhere) — the N*H*W*C term scales with C, so a
    caller whose trailing channels are non-parameter data (e.g. the packed
    [hd | src RGB | fg mask] training map, where RGB/mask gradients die at
    the input leaves) skips their dense contraction entirely. The
    coordinate gradient stays full-channel (it is DCE'd when unused)."""
    feat, xy_ndc = res
    H, W, C = feat.shape
    x0, y0, wx, wy, in_x, in_y = _bilinear_coords(xy_ndc, H, W)

    # --- coordinate gradient (needs the corner patches: one re-gather) ---
    starts = jnp.stack([y0, x0], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    P = jax.lax.gather(
        feat, starts, dn, slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).astype(jnp.float32)                                   # (N, 2, 2, C)
    gf = g.astype(jnp.float32)
    wxc = jnp.stack([1.0 - wx, wx], axis=-1)                # (N, 2)
    wyc = jnp.stack([1.0 - wy, wy], axis=-1)                # (N, 2)
    # d out / d x = sum_i wy_i (P[i,1] - P[i,0]); chain to NDC and clamp
    dPx = jnp.einsum("ni,nic->nc", wyc, P[:, :, 1] - P[:, :, 0])
    dPy = jnp.einsum("nj,njc->nc", wxc, P[:, 1] - P[:, 0])
    dx = jnp.sum(gf * dPx, -1) * (0.5 * (W - 1)) * in_x
    dy = jnp.sum(gf * dPy, -1) * (0.5 * (H - 1)) * in_y
    dxy = jnp.stack([dx, dy], axis=-1).astype(xy_ndc.dtype)

    # --- map gradient: chunked one-hot matmuls, f32 accumulator ---
    Cg = C if grad_channels is None else min(grad_channels, C)
    # Shape-aware kernel choice (scripts/dmap_micro.py, v5e, N=524k, V=3):
    # the VMEM-accumulator kernel wins 8.7x on the wide coarse map
    # (128^2 x 64: 83 -> 9.6 ms) but LOSES ~2x to the XLA scan on the
    # narrow 8-ch maps (256^2 x 8: ~8 -> 19-21 ms), where the scan's
    # (4096, W*C) G2 blocks feed near-peak MXU dots while the kernel's
    # 128-point steps underutilize it. pallas_dmap therefore routes only
    # wide-channel maps to the kernel. KPN_DMAP_MIN_C overrides the
    # threshold (a measurement affordance: 0 = round-4 all-kernel
    # routing, 9999 = all-scan; both used by the quality-gate causality
    # runs recorded in scripts/quality_gate.json).
    import os as _os

    if pallas_dmap and Cg >= int(_os.environ.get("KPN_DMAP_MIN_C", "32")):
        # VMEM-accumulator Pallas kernel: same contraction, no HBM G2
        # round-trip (ops/pallas/onehot_dmap.py). The static flag value
        # "interpret" runs the kernel in interpret mode (CPU tests).
        from .pallas.onehot_dmap import bilinear_dmap_onehot

        dmap = bilinear_dmap_onehot(
            xy_ndc, gf[:, :Cg], H, W, map_dtype=feat.dtype,
            interpret=(pallas_dmap == "interpret"),
        )
        if Cg < C:
            dmap = jnp.concatenate(
                [dmap, jnp.zeros((H, W, C - Cg), dmap.dtype)], axis=-1
            )
        return dmap.astype(feat.dtype), dxy
    N = xy_ndc.shape[0]
    chunk = min(N, max(256, 2 ** 20 // max(W, 1)))  # ~1-4k rows typical
    n_pad = (-N) % chunk
    pad = lambda a: jnp.concatenate(
        [a, jnp.zeros((n_pad,) + a.shape[1:], a.dtype)]
    ) if n_pad else a
    # padded rows get zero cotangent -> contribute nothing
    gp = pad(gf[:, :Cg]).reshape(-1, chunk, Cg)
    x0p = pad(x0).reshape(-1, chunk)
    y0p = pad(y0).reshape(-1, chunk)
    wxp = pad(wx).reshape(-1, chunk)
    wyp = pad(wy).reshape(-1, chunk)
    cols = jnp.arange(W, dtype=jnp.int32)
    rows = jnp.arange(H, dtype=jnp.int32)

    def body(acc, args):
        gc, x0c, y0c, wxc_, wyc_ = args
        Xh = (cols[None] == x0c[:, None]) * (1.0 - wxc_[:, None]) + (
            cols[None] == (x0c + 1)[:, None]
        ) * wxc_[:, None]                                   # (Nc, W) f32
        Yh = (rows[None] == y0c[:, None]) * (1.0 - wyc_[:, None]) + (
            rows[None] == (y0c + 1)[:, None]
        ) * wyc_[:, None]                                   # (Nc, H) f32
        dt = feat.dtype if feat.dtype == jnp.bfloat16 else jnp.float32
        G2 = (Xh[:, :, None] * gc[:, None, :]).astype(dt)   # (Nc, W, Cg)
        acc = acc + jax.lax.dot_general(
            Yh.astype(dt).T, G2.reshape(chunk, W * Cg),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(H, W, Cg)
        return acc, None

    dmap, _ = jax.lax.scan(
        body, jnp.zeros((H, W, Cg), jnp.float32), (gp, x0p, y0p, wxp, wyp)
    )
    if Cg < C:
        dmap = jnp.concatenate(
            [dmap, jnp.zeros((H, W, C - Cg), dmap.dtype)], axis=-1
        )
    return dmap.astype(feat.dtype), dxy


bilinear_sample_mm.defvjp(_bilinear_mm_fwd, _bilinear_mm_bwd)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bilinear_sample_mm_partial(feat, xy_ndc, grad_channels, pallas_dmap=False):
    """`bilinear_sample_mm` whose map gradient covers only the first
    `grad_channels` channels (zeros elsewhere).

    Exact whenever the trailing channels' map gradient is dead — e.g. the
    packed training map [geo_hd | src RGB | fg mask] (keypoint_nerf.py
    encode()), where the RGB/mask slices flow back to non-parameter input
    leaves. Skipping them drops the dmap contraction's N*H*W*C term by
    (C-K)/C — the dominant backward cost on the 512^2 12-channel map.

    `pallas_dmap` computes the dmap contraction with the VMEM-accumulator
    kernel (ops/pallas/onehot_dmap.py) instead of the chunked XLA scan."""
    return bilinear_sample(feat, xy_ndc)


def _bilinear_mm_partial_fwd(feat, xy_ndc, grad_channels, pallas_dmap=False):
    return bilinear_sample(feat, xy_ndc), (feat, xy_ndc)


def _bilinear_mm_partial_bwd(grad_channels, pallas_dmap, res, g):
    return _mm_bwd_impl(res, g, grad_channels, pallas_dmap)


bilinear_sample_mm_partial.defvjp(_bilinear_mm_partial_fwd, _bilinear_mm_partial_bwd)


def multiview_bilinear_sample_mm(feats, xy_ndc, grad_channels=None,
                                 pallas_dmap=False):
    """`multiview_bilinear_sample` with the matmul backward (see
    `bilinear_sample_mm`) — the training-path gather when
    `cfg.train_matmul_gather_vjp` is on. `grad_channels` restricts the map
    gradient to a channel prefix; `pallas_dmap` swaps the dmap scan for
    the VMEM-accumulator kernel (see `bilinear_sample_mm_partial`)."""
    if grad_channels is None and not pallas_dmap:
        return jax.vmap(bilinear_sample_mm)(feats, xy_ndc)
    return jax.vmap(
        lambda f, x: bilinear_sample_mm_partial(f, x, grad_channels, pallas_dmap)
    )(feats, xy_ndc)


def multiview_bilinear_sample_dma(feats, xy_ndc, interpret=False):
    """DMA-pipelined Pallas variant of multiview_bilinear_sample.

    24-27x faster than the XLA gather on TPU v5e at 512^2 maps (exact
    parity; scripts/validate_pallas_hw.py): XLA lowers each lookup to a
    generic dynamic-gather (~1.4 us/pt), the kernel streams the (2, 2, C)
    patches from HBM with a ring of async copies (~55 ns/pt).

    The V axis is a small unrolled loop — each view is one pallas_call.
    Forward-only (no VJP): use for inference; training falls back to the
    XLA gather.
    """
    from .pallas.dma_gather import dma_bilinear_sample

    outs = [
        dma_bilinear_sample(feats[v], xy_ndc[v], interpret=interpret)
        for v in range(feats.shape[0])
    ]
    return jnp.stack(outs, axis=0)
