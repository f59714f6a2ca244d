"""Parity of the bilinear gather against torch.nn.functional.grid_sample
(border padding, align_corners=True) — the reference's hot primitive
(reference src/utils.py:74-89). torch here is only the CPU oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from keypointnerf_tpu.ops import bilinear_sample, multiview_bilinear_sample


def torch_oracle(feat_hwc, xy):
    """(H,W,C), (N,2) -> (N,C) via torch grid_sample."""
    f = torch.from_numpy(np.asarray(feat_hwc)).permute(2, 0, 1)[None]  # 1,C,H,W
    g = torch.from_numpy(np.asarray(xy))[None, :, None]  # 1,N,1,2
    out = F.grid_sample(f, g, mode="bilinear", padding_mode="border", align_corners=True)
    return out[0, :, :, 0].T.numpy()  # N,C


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_torch_interior(rng, seed):
    r = np.random.default_rng(seed)
    feat = r.standard_normal((17, 23, 5)).astype(np.float32)
    xy = (r.uniform(-0.95, 0.95, size=(200, 2))).astype(np.float32)
    ours = np.asarray(bilinear_sample(jnp.asarray(feat), jnp.asarray(xy)))
    ref = torch_oracle(feat, xy)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_matches_torch_border_and_outside(rng):
    r = np.random.default_rng(2)
    feat = r.standard_normal((9, 11, 3)).astype(np.float32)
    xy = r.uniform(-1.8, 1.8, size=(300, 2)).astype(np.float32)
    ours = np.asarray(bilinear_sample(jnp.asarray(feat), jnp.asarray(xy)))
    ref = torch_oracle(feat, xy)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_exact_pixel_centers():
    feat = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
    # ndc of pixel (x=2, y=1) in a 4x3 image, align_corners
    xy = jnp.array([[2 / 3 * 2 - 1, 1.0 / 2 * 2 - 1]], jnp.float32)
    out = bilinear_sample(jnp.asarray(feat), xy)
    np.testing.assert_allclose(out[0, 0], feat[1, 2, 0], atol=1e-5)


def test_multiview_shapes(rng):
    r = np.random.default_rng(3)
    feats = r.standard_normal((3, 8, 8, 4)).astype(np.float32)
    xy = r.uniform(-1, 1, size=(3, 50, 2)).astype(np.float32)
    out = multiview_bilinear_sample(jnp.asarray(feats), jnp.asarray(xy))
    assert out.shape == (3, 50, 4)
    for v in range(3):
        np.testing.assert_allclose(np.asarray(out[v]), torch_oracle(feats[v], xy[v]), atol=1e-5)


def test_matmul_vjp_matches_autodiff_gradients():
    """bilinear_sample_mm's one-hot-matmul backward must produce the same
    dL/dmap and dL/dxy as autodiff through the gather forward."""
    from keypointnerf_tpu.ops.feat_sample import (
        bilinear_sample,
        bilinear_sample_mm,
    )

    rng = np.random.default_rng(7)
    H, W, C, N = 13, 17, 5, 233
    feat = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    # include out-of-range coords to exercise the border-clamp grad zeroing
    xy = jnp.asarray(rng.uniform(-1.3, 1.3, (N, 2)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((N, C)), jnp.float32)

    def loss_ref(f, x):
        return jnp.sum(bilinear_sample(f, x) * cot)

    def loss_mm(f, x):
        return jnp.sum(bilinear_sample_mm(f, x) * cot)

    gf_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(feat, xy)
    gf_mm, gx_mm = jax.grad(loss_mm, argnums=(0, 1))(feat, xy)
    np.testing.assert_allclose(np.asarray(gf_mm), np.asarray(gf_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_mm), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)


def test_matmul_vjp_multiview_and_bf16():
    """vmapped variant + bf16 map: forward identical, gradients close."""
    from keypointnerf_tpu.ops.feat_sample import (
        multiview_bilinear_sample,
        multiview_bilinear_sample_mm,
    )

    rng = np.random.default_rng(3)
    V, H, W, C, N = 2, 9, 11, 3, 150
    feat = jnp.asarray(rng.standard_normal((V, H, W, C)), jnp.bfloat16)
    xy = jnp.asarray(rng.uniform(-1.1, 1.1, (V, N, 2)), jnp.float32)
    out_ref = multiview_bilinear_sample(feat, xy)
    out_mm = multiview_bilinear_sample_mm(feat, xy)
    np.testing.assert_array_equal(np.asarray(out_ref, np.float32),
                                  np.asarray(out_mm, np.float32))

    cot = jnp.asarray(rng.standard_normal((V, N, C)), jnp.float32)

    def loss(fn, f):
        return jnp.sum(fn(f, xy).astype(jnp.float32) * cot)

    g_ref = jax.grad(lambda f: loss(multiview_bilinear_sample, f))(feat)
    g_mm = jax.grad(lambda f: loss(multiview_bilinear_sample_mm, f))(feat)
    np.testing.assert_allclose(np.asarray(g_mm, np.float32),
                               np.asarray(g_ref, np.float32),
                               rtol=0.05, atol=0.05)
