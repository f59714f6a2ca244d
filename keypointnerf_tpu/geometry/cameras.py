"""Pinhole camera math (pure jnp, batch-agnostic via broadcasting).

Conventions (matching the reference semantics, reference src/model.py:713-723,
1030-1036 and src/zju_dataset.py:373-387, but batched/vectorized):

  * world -> camera:  x_c = R @ x_w + t          (R: (...,3,3), t: (...,3))
  * projection:       u_h = K @ x_c,  xy = u_h[:2] / u_h[2],  depth = u_h[2]
  * NDC xy in [-1, 1] with align_corners pixel convention:
        x_ndc = 2 * x_pix / (W - 1) - 1
  * NDC z in [-1, 1]:  z_ndc = 2 (z - znear) / (zfar - znear) - 1

All functions are shape-polymorphic over leading batch dims and safe to use
inside jit / shard_map. No Python control flow on traced values.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Camera math is tiny-K (3x3/4x4) and numerically sensitive: force true f32
# matmuls instead of the TPU's default bf16 MXU passes. These ops are a
# negligible fraction of step FLOPs; the MLP/conv stack keeps the fast default.
_F32 = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_F32)


def compose_krt(K, R, t):
    """Return the 4x4 composed projection matrix KRT = K4 @ [R|t; 0 0 0 1].

    Args:
      K: (..., 3, 3) intrinsics.
      R: (..., 3, 3) world->cam rotation.
      t: (..., 3)    world->cam translation.
    Returns:
      (..., 4, 4) homogeneous projection matrix.
    """
    batch = jnp.broadcast_shapes(K.shape[:-2], R.shape[:-2], t.shape[:-1])
    eye = jnp.broadcast_to(jnp.eye(4, dtype=K.dtype), batch + (4, 4))
    intrin = eye.at[..., :3, :3].set(K)
    extrin = eye.at[..., :3, :3].set(R)
    extrin = extrin.at[..., :3, 3].set(t)
    return _mm(intrin, extrin)


def world_to_cam(pts, R, t):
    """(..., N, 3) world points -> camera frame."""
    return _mm(pts, jnp.swapaxes(R, -1, -2)) + t[..., None, :]


def cam_to_world(pts, R, t):
    """(..., N, 3) camera-frame points -> world frame."""
    return _mm(pts - t[..., None, :], R)


def camera_center(R, t):
    """World-space camera origin: -R^T t. R: (...,3,3), t: (...,3)."""
    return -jnp.einsum("...ji,...j->...i", R, t, precision=_F32)


def project_points(pts, krt):
    """Project world points with a composed KRT matrix.

    Matches the reference's query() projection (src/model.py:713-715).

    Args:
      pts: (..., N, 3) world points.
      krt: (..., 4, 4) composed matrix from :func:`compose_krt`.
    Returns:
      xy:  (..., N, 2) pixel coordinates.
      z:   (..., N, 1) camera-space depth (the homogeneous w).
    """
    A = krt[..., :3, :3]
    b = krt[..., :3, 3]
    vh = _mm(pts, jnp.swapaxes(A, -1, -2)) + b[..., None, :]
    z = vh[..., 2:3]
    xy = vh[..., :2] / z
    return xy, z


def ndc_xy(xy, width, height):
    """Pixel coords -> [-1, 1] NDC with align_corners convention."""
    sx = 2.0 / (width - 1.0)
    sy = 2.0 / (height - 1.0)
    return jnp.stack([xy[..., 0] * sx - 1.0, xy[..., 1] * sy - 1.0], axis=-1)


def ndc_z(z, znear, zfar):
    """Depth -> [-1, 1] relative to the [znear, zfar] slab."""
    return 2.0 * (z - znear) / (zfar - znear) - 1.0


def pixel_grid(height, width, y_stride=1, x_stride=1, offset=None):
    """Integer (x, y) pixel grid, optionally strided / offset.

    Mirrors the eval-time grid of the reference renderer
    (src/model.py:1019-1022) where a full image is decomposed into
    stride^2 interleaved subgrids.

    Returns:
      (h*w, 2) int32 array of (x, y) pixel coordinates, row-major in y.
    """
    ys = jnp.arange(0, height, y_stride, dtype=jnp.int32)
    xs = jnp.arange(0, width, x_stride, dtype=jnp.int32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([xx, yy], axis=-1).reshape(-1, 2)
    if offset is not None:
        grid = grid + jnp.asarray(offset, dtype=jnp.int32)
    return grid


def camera_rays(pixels, K, R, t, znear, zfar):
    """World-space rays through pixel centers of a target camera.

    Matches the reference ray construction (src/model.py:1026-1036): rays are
    built in camera space from homogeneous pixel coords, rotated into world
    space, and near/far are scaled by the per-pixel ray norm so that the
    sampling interval measures distance along the (normalized) ray.

    Args:
      pixels: (..., N, 2) float pixel coordinates (x, y).
      K: (3, 3) or (..., 3, 3) intrinsics.
      R: (3, 3) or (..., 3, 3) world->cam rotation.
      t: (3,) or (..., 3) world->cam translation.
      znear, zfar: scalars (or broadcastable) slab depths.
    Returns:
      origins:   (..., 3) camera center in world space.
      dirs:      (..., N, 3) unit ray directions in world space.
      near, far: (..., N, 1) per-ray metric near/far distances.
    """
    ones = jnp.ones_like(pixels[..., :1])
    pix_h = jnp.concatenate([pixels, ones], axis=-1)  # (..., N, 3)
    inv_K = jnp.linalg.inv(K[..., :3, :3])
    dirs_cam = _mm(pix_h, jnp.swapaxes(inv_K, -1, -2))  # (..., N, 3)
    scale = jnp.linalg.norm(dirs_cam, axis=-1, keepdims=True)  # (..., N, 1)
    dirs_world = _mm(dirs_cam, R)  # row-vector form of R^T @ d
    dirs_world = dirs_world / jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
    origins = camera_center(R, t)
    near = jnp.asarray(znear, dirs_cam.dtype) * scale
    far = jnp.asarray(zfar, dirs_cam.dtype) * scale
    return origins, dirs_world, near, far
