"""Mixed-precision (bf16 compute, f32 params) tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keypointnerf_tpu.data import SyntheticConfig, make_sample
from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch

BASE = dict(n_coarse=8, n_fine=8, patch_h=8, patch_w=8, geo_n_downsample=2)


def tiny_batch():
    sample = make_sample(SyntheticConfig(image_size=64), seed=0)
    return ViewBatch(**jax.tree.map(jnp.asarray, sample))


@pytest.mark.slow
def test_bf16_forward_close_to_f32_and_params_shared():
    vb = tiny_batch()
    m32 = KeypointNeRF(KeypointNeRFConfig(**BASE))
    m16 = KeypointNeRF(KeypointNeRFConfig(**BASE, compute_dtype=jnp.bfloat16))
    params = m32.init(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )
    # identical param tree: bf16 is a compute-dtype change only
    p16 = m16.init({"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True)
    assert jax.tree.structure(params) == jax.tree.structure(p16)
    assert all(
        a.dtype == jnp.float32 for a in jax.tree.leaves(p16)
    ), "params must stay f32 under mixed precision"

    rngs = {"render": jax.random.key(2)}
    out32 = m32.apply(params, vb, True, rngs=rngs)
    out16 = m16.apply(params, vb, True, rngs=rngs)
    d = np.abs(np.asarray(out32["rgb_fine"]) - np.asarray(out16["rgb_fine"]))
    assert np.all(np.isfinite(np.asarray(out16["rgb_fine"])))
    # bf16 has ~3 decimal digits; composited colors should agree loosely
    assert float(np.mean(d)) < 0.05, float(np.mean(d))


@pytest.mark.slow
def test_bf16_gradients_finite():
    vb = tiny_batch()
    m16 = KeypointNeRF(KeypointNeRFConfig(**BASE, compute_dtype=jnp.bfloat16))
    params = m16.init(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )

    def loss(p):
        out = m16.apply(p, vb, True, rngs={"render": jax.random.key(3)})
        return jnp.mean(jnp.abs(out["rgb_fine"] - out["target_rgb"]))

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(x)) for x in leaves)
    assert all(x.dtype == jnp.float32 for x in leaves)
