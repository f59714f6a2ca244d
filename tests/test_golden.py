"""Golden-value regression tests (SURVEY.md §4): fixed-seed inputs through
the encoders and heads must keep producing the same numbers — catches
silent numerical regressions from refactors.

Goldens recorded on CPU f32 (jax 0.9); CNN goldens re-recorded in
round 2 after the torch-parity padding/upsample change (import_torch); loose tolerances
absorb platform FMA differences while still catching real changes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keypointnerf_tpu.models.cnn import HGFilter, ResBlkEncoder
from keypointnerf_tpu.models.ibr_head import IBRRenderingHead
from keypointnerf_tpu.models.mlp import GeoFusionMLP


def _stat(x):
    x = np.asarray(x, np.float64)
    return float(np.mean(x)), float(np.std(x))


@pytest.fixture(scope="module")
def key():
    return jax.random.key(1234)


def test_hgfilter_golden(key):
    model = HGFilter(n_downsample=2)
    x = jax.random.uniform(key, (1, 32, 32, 3)) * 2 - 1
    params = model.init(jax.random.key(7), x)
    coarse, hd = model.apply(params, x)
    assert coarse.shape == (1, 8, 8, 64)
    assert hd.shape == (1, 32, 32, 8)
    m1, s1 = _stat(coarse)
    m2, s2 = _stat(hd)
    np.testing.assert_allclose([m1, s1], [0.05228392, 0.93679180], rtol=1e-3)
    np.testing.assert_allclose([m2, s2], [0.04832635, 1.05056440], rtol=1e-3)


def test_resblk_encoder_golden(key):
    model = ResBlkEncoder(ngf=16, n_blocks=2)
    x = jax.random.uniform(key, (1, 32, 32, 3)) * 2 - 1
    params = model.init(jax.random.key(7), x)
    out = model.apply(params, x)
    assert out.shape == (1, 16, 16, 8)
    m, s = _stat(out)
    np.testing.assert_allclose([m, s], [0.13354549, 1.09814831], rtol=1e-3)


def test_geo_fusion_golden(key):
    model = GeoFusionMLP((168, 128, 128, 120, 64), (128, 64, 64, 2), (64, 8), (0, 2))
    ks = jax.random.split(key, 5)
    sp = jax.random.normal(ks[0], (3, 64, 168))
    f0 = jax.random.normal(ks[1], (3, 64, 64))
    f1 = jax.random.normal(ks[2], (3, 64, 8))
    mask = (jax.random.uniform(ks[3], (3, 64, 1)) > 0.3).astype(jnp.float32)
    w = mask / (jnp.sum(mask, 0, keepdims=True) + 1e-6)
    params = model.init(ks[4], sp, [f0, f1], mask, w)
    out, valid, lv, lf = model.apply(params, sp, [f0, f1], mask, w)
    m, s = _stat(out)
    np.testing.assert_allclose([m, s], [0.94213833, 2.17497098], rtol=1e-3)


def test_ibr_head_golden(key):
    model = IBRRenderingHead()
    ks = jax.random.split(key, 4)
    rgbf = jax.random.uniform(ks[0], (3, 128, 35))
    rdiff = jax.random.normal(ks[1], (3, 128, 4)) * 0.1
    pmask = (jax.random.uniform(ks[2], (3, 128, 1)) > 0.2).astype(jnp.float32)
    params = model.init(ks[3], rgbf, rdiff, pmask)
    rgb = model.apply(params, rgbf, rdiff, pmask)
    assert rgb.shape == (128, 3)
    m, s = _stat(rgb)
    np.testing.assert_allclose([m, s], [0.50417828, 0.19977039], rtol=1e-3)


if __name__ == "__main__":
    # regenerate goldens
    import sys

    key = jax.random.key(1234)
    for name, fn in list(globals().items()):
        if name.startswith("test_") and "golden" in name:
            try:
                fn(key)
                print(name, "OK")
            except AssertionError as e:
                print(name, "MISMATCH:", str(e).splitlines()[-3:])
