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


def test_multicam_export_round_trip(setup):
    """The F-camera serving artifact (encode-once + lax.scan over cameras)
    must round-trip and match the single-camera artifact frame-by-frame."""
    from keypointnerf_tpu.export import make_multicam_serving_fn

    model, params, flat_args = setup
    *views, tar_K, tar_R, tar_t = flat_args
    F = 2
    stack = lambda x: jnp.broadcast_to(x, (F,) + x.shape)
    mc_args = tuple(views) + (stack(tar_K), stack(tar_R), stack(tar_t))

    live = jax.jit(make_multicam_serving_fn(model, H, W, chunk=64))
    frames = np.asarray(live(params, *mc_args))
    assert frames.shape == (F, H, W, 3)

    blob = export_render(
        model, params, mc_args, height=H, width=W, chunk=64,
        platforms=("cpu",), multicam=True,
    )
    restored = load_render(bytes(blob))
    np.testing.assert_array_equal(frames, np.asarray(restored(params, *mc_args)))

    single = jax.jit(make_serving_fn(model, H, W, chunk=64))(params, *flat_args)
    np.testing.assert_allclose(frames[0], np.asarray(single), atol=2e-5)
