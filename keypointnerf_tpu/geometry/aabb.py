"""Ray / axis-aligned-bounding-box intersection.

Reimplements the reference's six-plane "exactly two hits" test
(src/model.py:1178-1237 and its numpy twin src/zju_dataset.py:389-422) as a
single vectorized jnp function shared by the data pipeline and the renderer.
The reference's torch version assumes batch == 1 and builds dynamic-shaped
index selects; here everything is fixed-shape and masked, which is what XLA
wants.
"""
from __future__ import annotations

import jax.numpy as jnp


def ray_aabb_intersection(bounds, origins, dirs, boffset=(-0.01, 0.01), eps=1e-6):
    """Intersect rays with an AABB using the reference's 6-plane test.

    A ray "hits" iff exactly two of its six plane intersections lie on the
    box (matching reference src/model.py:1217). Near/far are |t| of the two
    crossings — the reference's ||p - o|| / ||dir|| reduces to exactly this —
    i.e. non-negative distances in units of the direction vector's length
    (callers pass unit directions, making them metric).

    Args:
      bounds:  (..., 2, 3) [min_xyz, max_xyz].
      origins: (..., 3) or (..., N, 3) ray origins.
      dirs:    (..., N, 3) ray directions (need not be unit length).
      boffset: (lo, hi) padding added to min/max bounds (reference ±0.01).
    Returns:
      near: (..., N, 1) near distance (1.0 where no hit, as in the reference).
      far:  (..., N, 1) far distance  (1.0 where no hit).
      hit:  (..., N, 1) bool hit mask.
    """
    bounds = bounds + jnp.asarray(boffset, bounds.dtype)[..., :, None]
    if origins.ndim < dirs.ndim:
        origins = origins[..., None, :]
    d = jnp.where(jnp.abs(dirs) < 1e-5, 1e-5, dirs)

    # t parameter of the 6 axis-plane crossings: (..., N, 2, 3) -> (..., N, 6)
    tt = (bounds[..., None, :, :] - origins[..., :, None, :]) / d[..., :, None, :]
    t6 = tt.reshape(*tt.shape[:-2], 6)

    # intersection points on each plane: (..., N, 6, 3)
    p = origins[..., :, None, :] + t6[..., :, None] * d[..., :, None, :]
    lo = bounds[..., None, 0:1, :] - eps
    hi = bounds[..., None, 1:2, :] + eps
    on_box = jnp.all((p >= lo) & (p <= hi), axis=-1)  # (..., N, 6)

    hit = jnp.sum(on_box.astype(jnp.int32), axis=-1) == 2  # (..., N)

    # distance along the unit direction = |t| * ||d|| / ||d|| = |t| when the
    # reference divides the point distance by ||dir||.
    dist = jnp.abs(t6)
    inf = jnp.asarray(jnp.inf, dist.dtype)
    near = jnp.min(jnp.where(on_box, dist, inf), axis=-1)
    far = jnp.max(jnp.where(on_box, dist, -inf), axis=-1)

    one = jnp.ones_like(near)
    near = jnp.where(hit, near, one)
    far = jnp.where(hit, far, one)
    return near[..., None], far[..., None], hit[..., None]


def rays_at_box_mask(bounds, K, R, t, height, width):
    """Per-pixel bool mask of rays that hit the AABB (reference
    src/zju_dataset.py:364-371 `get_mask_at_box`), evaluated in one shot.

    Returns an (H, W) bool array.
    """
    from .cameras import camera_rays, pixel_grid

    pix = pixel_grid(height, width).astype(jnp.float32)
    origins, dirs, _, _ = camera_rays(pix, K, R, t, 0.0, 1.0)
    _, _, hit = ray_aabb_intersection(bounds, origins, dirs)
    return hit[..., 0].reshape(height, width)
