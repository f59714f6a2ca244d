"""Per-ray depth sampling: stratified coarse + inverse-CDF importance.

TPU-first redesign of the reference's sampling (src/model.py:1045-1056,
1110-1148): everything is fixed-shape, and `searchsorted` is replaced by a
comparison-count formulation that lowers to dense vectorized ops on the VPU
instead of a gather-heavy binary search.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z(key, near, far, n_samples, jitter=True):
    """Stratified depths along each ray.

    Matches reference src/model.py:1045-1056: n linspace bins in [0,1];
    when jittering, each sample is drawn uniformly inside its bin (bins
    delimited by midpoints, with the first/last samples pinned to the ends
    of their half-bins).

    Args:
      key: PRNG key (unused if jitter=False; may be None then).
      near, far: (..., 1) per-ray metric bounds.
      n_samples: static int.
      jitter: train-time bin jitter.
    Returns:
      z: (..., n_samples) sorted sample depths.
    """
    dtype = near.dtype
    z = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
    z = jnp.broadcast_to(z, near.shape[:-1] + (n_samples,))
    if jitter:
        mid = 0.5 * (z[..., 1:] + z[..., :-1])
        lower = jnp.concatenate([z[..., :1], mid], axis=-1)
        upper = jnp.concatenate([mid, z[..., -1:]], axis=-1)
        u = jax.random.uniform(key, z.shape, dtype=dtype)
        z = lower + u * (upper - lower)
    return near + (far - near) * z


def importance_z(key, contrib, z_bins, n_samples, uniform=False):
    """Inverse-CDF importance resampling of ray depths.

    Semantics of reference src/model.py:1110-1148 (`importance_sample`), with
    `searchsorted(right=True)` expressed as a comparison count: for each
    sample u, idx = #{cdf_j <= u}. The (M+1, n) comparison matrix is tiny per
    ray and vectorizes perfectly; the subsequent bin gathers use
    take_along_axis.

    Args:
      key: PRNG key (unused when uniform=True; may be None then).
      contrib: (..., M) per-bin weights (coarse compositing contribs).
      z_bins: (..., M + 1) bin-edge depths (the coarse z midpoints).
      n_samples: static int number of fine samples.
      uniform: evenly spaced CDF samples instead of random (eval mode).
    Returns:
      (..., n_samples) importance-sampled depths (not sorted).
    """
    dtype = z_bins.dtype
    contrib = contrib.astype(dtype) + 1e-5
    pdf = contrib / jnp.sum(contrib, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., M+1)

    shape = cdf.shape[:-1] + (n_samples,)
    if uniform:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_samples, dtype=dtype), shape)
    else:
        u = jax.random.uniform(key, shape, dtype=dtype)

    # Dense gather-free bin select (TPU: gathers are slow, dense compare +
    # contraction is VPU/MXU-friendly). searchsorted(right) semantics:
    # idx = #{cdf_j <= u}; the selected interval is [idx-1, idx]. With
    # cdf_0 = 0 <= u and cdf_M = 1 > u (u < 1), idx is in [1, M], so the
    # one-hot of idx-1 over edges j is cmp_j & ~cmp_{j+1}.
    cmp = cdf[..., :, None] <= u[..., None, :]          # (..., M+1, n)
    nxt = jnp.concatenate(
        [cmp[..., 1:, :], jnp.zeros_like(cmp[..., :1, :])], axis=-2
    )
    onehot = (cmp & ~nxt).astype(dtype)                 # one-hot of idx_prev

    def sel(vals):
        """Contract the one-hot against per-edge values -> (..., n)."""
        return jnp.einsum("...mn,...m->...n", onehot, vals)

    pad_cdf = jnp.concatenate([cdf, cdf[..., -1:]], axis=-1)
    pad_z = jnp.concatenate([z_bins, z_bins[..., -1:]], axis=-1)
    cdf_prev = sel(cdf)
    cdf_next = sel(pad_cdf[..., 1:])
    z_prev = sel(z_bins)
    z_next = sel(pad_z[..., 1:])

    # top-edge clamp: u exactly >= cdf_M (e.g. uniform sampling's u = 1)
    # leaves an all-false one-hot; fall back to the last bin
    hit = jnp.sum(onehot, axis=-2)
    last_cdf = cdf[..., -1:]
    last_z = z_bins[..., -1:]
    cdf_prev = jnp.where(hit > 0, cdf_prev, last_cdf)
    cdf_next = jnp.where(hit > 0, cdf_next, last_cdf)
    z_prev = jnp.where(hit > 0, z_prev, last_z)
    z_next = jnp.where(hit > 0, z_next, last_z)

    den = cdf_next - cdf_prev
    den = jnp.where(den < 1e-5, jnp.ones_like(den), den)
    return z_prev + (u - cdf_prev) / den * (z_next - z_prev)


def union_sorted_z(z_coarse, z_fine):
    """Sorted union of coarse and fine depths per ray
    (reference src/model.py:1076)."""
    return jnp.sort(jnp.concatenate([z_coarse, z_fine], axis=-1), axis=-1)


def merge_sorted_payloads(z_a, z_b, v_a, v_b):
    """Stable merge of two per-ray SORTED depth arrays with payload channels.

    Bitwise-equivalent to
    ``jax.lax.sort((concat([z_a, z_b]), *payloads), num_keys=1)`` when both
    inputs are already sorted along the last axis — which the eval renderer
    guarantees: coarse depths are monotone stratified bins and eval fine
    depths come from inverse-CDF interpolation of increasing uniform u.
    A TPU bitonic payload sort runs O(S log^2 S) compare-exchange stages over
    every payload column; merging instead computes each element's final
    position with one dense comparison count (VPU) and applies the resulting
    permutation as a single one-hot contraction (MXU):

      pos_a[i] = i + #{ z_b < z_a[i] }   (strict: ties keep a-before-b,
      pos_b[j] = j + #{ z_a <= z_b[j] }   matching stable-sort concat order)

    The cross counts can never collide, so `pos` is a permutation; a 0/1
    one-hot matmul moves each payload row exactly in ANY dtype — products
    are 1.0*x or 0.0 and each output sums one nonzero term, so the result
    is bitwise the input value even in bf16. Payloads therefore keep their
    native dtype (upcasting bf16 to f32 would double the dominant HBM
    traffic of the contraction); z is merged at its own precision.

    Args:
      z_a: (..., Sa) sorted depths.
      z_b: (..., Sb) sorted depths.
      v_a: (..., Sa, C) payload channels for z_a.
      v_b: (..., Sb, C) payload channels for z_b.
    Returns:
      (z (..., Sa+Sb), v (..., Sa+Sb, C)) merged in ascending z.
    """
    Sa, Sb = z_a.shape[-1], z_b.shape[-1]
    S = Sa + Sb
    pos_a = jnp.arange(Sa, dtype=jnp.int32) + jnp.sum(
        (z_b[..., None, :] < z_a[..., :, None]).astype(jnp.int32), axis=-1
    )
    pos_b = jnp.arange(Sb, dtype=jnp.int32) + jnp.sum(
        (z_a[..., None, :] <= z_b[..., :, None]).astype(jnp.int32), axis=-1
    )
    pos = jnp.concatenate([pos_a, pos_b], axis=-1)              # (..., S)
    z = jnp.concatenate([z_a, z_b], axis=-1)
    v = jnp.concatenate([v_a, v_b], axis=-2)                    # (..., S, C)
    onehot = pos[..., :, None] == jnp.arange(S)
    if v.dtype == z.dtype:
        vz = jnp.concatenate([z[..., None], v], -1)
        out = jnp.einsum("...is,...ic->...sc", onehot.astype(vz.dtype), vz)
        return out[..., 0], out[..., 1:]
    z_m = jnp.einsum(
        "...is,...i->...s", onehot.astype(z.dtype), z
    )
    v_m = jnp.einsum("...is,...ic->...sc", onehot.astype(v.dtype), v)
    return z_m, v_m
