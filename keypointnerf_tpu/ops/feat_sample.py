"""Bilinear feature sampling at continuous image locations.

This is the single most-called primitive of the whole engine (the reference
calls its torch `grid_sample` wrapper `feat_sample`, src/utils.py:74-89, for
geometry features x2 maps, texture features, source RGB and foreground masks
— per point per view). Semantics match torch `grid_sample` with
mode='bilinear', padding_mode='border', align_corners=True:

  * NDC [-1, 1] maps to pixel centers [0, S-1] (align_corners).
  * Coordinates are clamped to the border BEFORE the corner/weight split
    (border padding).

Layout is NHWC (TPU-native), gathered via a flat take() that XLA lowers to an
efficient dynamic-gather; a Pallas VMEM-resident kernel for the multi-view
case lives in ops/pallas/gather_bilinear.py.
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

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)

    flat = feat.reshape(H * W, C)
    f00 = jnp.take(flat, y0i * W + x0i, axis=0)
    f01 = jnp.take(flat, y0i * W + x1i, axis=0)
    f10 = jnp.take(flat, y1i * W + x0i, axis=0)
    f11 = jnp.take(flat, y1i * W + x1i, axis=0)

    top = f00 + wx * (f01 - f00)
    bot = f10 + wx * (f11 - f10)
    return top + wy * (bot - top)


def multiview_bilinear_sample(feats, xy_ndc):
    """Sample V feature maps at per-view locations.

    Args:
      feats:  (V, H, W, C) per-view feature maps.
      xy_ndc: (V, N, 2) per-view NDC sample locations.
    Returns:
      (V, N, C).
    """
    return jax.vmap(bilinear_sample)(feats, xy_ndc)
