"""Spatial-encoding semantics vs a small torch oracle reproducing the math of
reference src/spatial.py (rel_z_decay path) independently, plus dimension
checks for all sp_type variants."""
import jax.numpy as jnp
import numpy as np
import pytest

from keypointnerf_tpu.models import (
    SpatialEncodingConfig,
    positional_encoding,
    spatial_encode,
    spatial_encoding_dim,
)


def test_pe_layout_and_values():
    x = jnp.array([[0.5, -0.25]])
    out = np.asarray(positional_encoding(x, 2))
    assert out.shape == (1, 2 * (1 + 4))
    # layout: [x(2), sin(pi x)(2), cos(pi x)(2), sin(2pi x)(2), cos(2pi x)(2)]
    np.testing.assert_allclose(out[0, :2], [0.5, -0.25])
    np.testing.assert_allclose(out[0, 2:4], np.sin(np.pi * np.array([0.5, -0.25])), atol=1e-6)
    np.testing.assert_allclose(out[0, 4:6], np.cos(np.pi * np.array([0.5, -0.25])), atol=1e-6)
    np.testing.assert_allclose(out[0, 6:8], np.sin(2 * np.pi * np.array([0.5, -0.25])), atol=1e-6)
    np.testing.assert_allclose(out[0, 8:10], np.cos(2 * np.pi * np.array([0.5, -0.25])), atol=1e-6)


def test_pe_level_zero_identity():
    x = jnp.array([[1.0, 2.0]])
    np.testing.assert_allclose(positional_encoding(x, 0), x)


@pytest.mark.parametrize(
    "sp_type,expected",
    [
        ("z", 7),
        ("rel_z", 168),
        ("rel_z_decay", 168),
        ("ixyz", 21),
        ("cxyz", 21),
        ("wxyz", 21),
        ("mxyz", 21),
        ("rel_cxyz", 504),
        ("rel_wxyz", 504),
        ("rel_mxyz", 504),
    ],
)
def test_dims_match_reference_formula(sp_type, expected):
    cfg = SpatialEncodingConfig(sp_level=3, sp_type=sp_type, n_kpt=24)
    assert spatial_encoding_dim(cfg) == expected


@pytest.mark.parametrize("sp_type", ["z", "ixyz", "cxyz", "wxyz", "rel_z", "rel_z_decay", "rel_cxyz", "rel_wxyz"])
def test_encode_output_shapes(rng, sp_type):
    cfg = SpatialEncodingConfig(sp_level=3, sp_type=sp_type, n_kpt=24)
    V, N, K = 3, 17, 24
    r = np.random.default_rng(0)
    pts_world = jnp.asarray(r.standard_normal((N, 3)), jnp.float32)
    pts_cam = jnp.asarray(r.standard_normal((V, N, 3)), jnp.float32)
    kpt_world = jnp.asarray(r.standard_normal((K, 3)), jnp.float32)
    kpt_cam = jnp.asarray(r.standard_normal((V, K, 3)), jnp.float32)
    z_ndc = jnp.asarray(r.standard_normal((V, N, 1)), jnp.float32)
    xy_ndc = jnp.asarray(r.standard_normal((V, N, 2)), jnp.float32)
    out = spatial_encode(cfg, pts_world, pts_cam, kpt_world, kpt_cam, z_ndc=z_ndc, xy_ndc=xy_ndc)
    assert out.shape == (V, N, spatial_encoding_dim(cfg))


def test_rel_z_decay_against_manual_math(rng):
    """Independent numpy recomputation of the rel_z_decay formula."""
    cfg = SpatialEncodingConfig(sp_level=3, sp_type="rel_z_decay", scale=1.0, sigma=0.1, n_kpt=4)
    V, N, K, L = 2, 5, 4, 3
    r = np.random.default_rng(1)
    pts_cam = r.standard_normal((V, N, 3)).astype(np.float32) * 0.3
    kpt_cam = r.standard_normal((V, K, 3)).astype(np.float32) * 0.3

    out = np.asarray(
        spatial_encode(cfg, None, jnp.asarray(pts_cam), None, jnp.asarray(kpt_cam))
    )
    assert out.shape == (V, N, (1 + 2 * L) * K)

    for v in range(V):
        for n in range(N):
            dz = pts_cam[v, n, 2] - kpt_cam[v, :, 2]  # (K,)
            groups = [dz]
            for l in range(L):
                groups.append(np.sin(np.pi * 2**l * dz))
                groups.append(np.cos(np.pi * 2**l * dz))
            pe = np.stack(groups, 0)  # (1+2L, K)
            d2 = np.sum((pts_cam[v, n] - kpt_cam[v]) ** 2, -1)
            w = np.exp(-d2 / (2 * 0.1**2))  # (K,)
            expected = (pe * w[None, :]).reshape(-1)
            np.testing.assert_allclose(out[v, n], expected, atol=1e-5)


def test_attention_pool_modes():
    import jax
    import jax.numpy as jnp

    from keypointnerf_tpu.models.mlp import AttentionPool, masked_pool

    V, N, C = 3, 64, 16
    k = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(k[0], (V, N, C))
    mask = (jax.random.uniform(k[1], (V, N, 1)) > 0.3).astype(jnp.float32)

    for mode in ("attention_v0", "attention_v1"):
        m = AttentionPool(pool_mode=mode, n_heads=1)
        params = m.init(k[2], x, mask)
        pooled, valid = m.apply(params, x, mask)
        assert pooled.shape == (N, 2 * C)
        assert valid.shape == (N, 1)
        assert bool(jnp.all(jnp.isfinite(pooled)))

    # attention modes must differ from plain weighted pooling
    plain, _ = masked_pool(x, mask)
    m0 = AttentionPool(pool_mode="attention_v0")
    p0 = m0.init(k[2], x, mask)
    out0, _ = m0.apply(p0, x, mask)
    assert not np.allclose(np.asarray(out0), np.asarray(plain))
