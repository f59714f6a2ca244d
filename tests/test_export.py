"""Serving export: jax.export round-trip of the render program.

The reference ships no deployment artifact (ckpt + Python class only,
src/model.py:113-117); keypointnerf_tpu.export serializes the full
render as StableHLO. These tests prove the artifact is self-contained:
serialize, deserialize, call, and match the live function exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keypointnerf_tpu.data import SyntheticConfig, make_sample
from keypointnerf_tpu.export import export_render, load_render, make_serving_fn
from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch

H = W = 16


@pytest.fixture(scope="module")
def setup():
    cfg = KeypointNeRFConfig(
        n_coarse=4, n_fine=4, patch_h=4, patch_w=4, geo_n_downsample=2
    )
    model = KeypointNeRF(cfg)
    sample = make_sample(SyntheticConfig(image_size=64), seed=0)
    vb = ViewBatch(**jax.tree.map(jnp.asarray, sample))
    params = jax.jit(model.init, static_argnums=2)(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )
    flat_args = (
        vb.src_images, vb.src_masks, vb.src_K, vb.src_R, vb.src_t,
        vb.kpt3d, vb.bounds, vb.tar_K, vb.tar_R, vb.tar_t,
    )
    return model, params, flat_args


def test_export_round_trip_matches_live(setup):
    model, params, flat_args = setup
    live = jax.jit(make_serving_fn(model, H, W, chunk=64))
    img_live = np.asarray(live(params, *flat_args))
    assert img_live.shape == (H, W, 3)
    assert np.all(np.isfinite(img_live))

    blob = export_render(
        model, params, flat_args, height=H, width=W, chunk=64, platforms=("cpu",)
    )
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    restored = load_render(bytes(blob))
    img_restored = np.asarray(restored(params, *flat_args))
    np.testing.assert_array_equal(img_live, img_restored)


def test_exported_artifact_checks_shapes(setup):
    model, params, flat_args = setup
    blob = export_render(
        model, params, flat_args, height=H, width=W, chunk=64, platforms=("cpu",)
    )
    restored = load_render(bytes(blob))
    bad = (jnp.zeros((2, 8, 8, 3), flat_args[0].dtype),) + flat_args[1:]
    with pytest.raises(Exception):
        restored(params, *bad)
