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
