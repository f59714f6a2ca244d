"""Alpha compositing of per-sample radiance along rays.

Semantics of reference src/model.py:1150-1176 (`rgba2out`): contribution
weights are (1 - exp(-alpha * dist)) * transmittance, with a 1e10 tail
interval. Expressed in jnp; XLA fuses the whole thing into one pass, and the
Pallas variant in ops/pallas fuses it with the ray-march.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CompositeOut(NamedTuple):
    color: jnp.ndarray    # (..., 3) composited color
    depth: jnp.ndarray    # (...,) expected depth
    acc: jnp.ndarray      # (...,) accumulated opacity
    contrib: jnp.ndarray  # (..., D) per-sample contribution weights
    sdf: jnp.ndarray      # (...,) expected sdf-proxy value


def composite(alpha, sdf, rgb, z) -> CompositeOut:
    """Composite per-sample values into per-ray outputs.

    Args:
      alpha: (..., D) non-negative density-like values (mask * relu(rad)).
      sdf:   (..., D) sdf-proxy channel.
      rgb:   (..., D, 3) per-sample colors.
      z:     (..., D) sorted sample depths.
    """
    dist = jnp.concatenate(
        [z[..., 1:] - z[..., :-1], jnp.full_like(z[..., :1], 1e10)], axis=-1
    )
    a = 1.0 - jnp.exp(-alpha * dist)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(a[..., :1]), 1.0 - a[..., :-1]], axis=-1),
        axis=-1,
    )
    contrib = a * trans  # (..., D)

    color = jnp.sum(rgb * contrib[..., None], axis=-2)
    acc = jnp.sum(contrib, axis=-1)
    sdf_out = jnp.sum(sdf * contrib, axis=-1) / (acc + 1e-8)
    depth = jnp.sum(z * contrib, axis=-1) / (acc + 1e-8)
    return CompositeOut(color, depth, acc, contrib, sdf_out)
