"""Mesh / sharding tests on the 8-device virtual CPU mesh (conftest.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keypointnerf_tpu.data import SyntheticConfig, make_sample
from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
from keypointnerf_tpu.parallel import (
    make_mesh,
    make_sharded_render,
    make_sharded_train_step,
    stack_batch,
)
from keypointnerf_tpu.training import LossConfig, OptimConfig, create_train_state

TINY = KeypointNeRFConfig(n_coarse=4, n_fine=4, patch_h=4, patch_w=4, geo_n_downsample=2)


def tiny_batch(seed=0, size=32):
    sample = make_sample(SyntheticConfig(image_size=size, focal=40.0), seed=seed)
    return ViewBatch(**jax.tree.map(jnp.asarray, sample))


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    """DP gradient parity: the 8-way sharded step must produce the same
    updated params and metrics as the identical batched step jitted on ONE
    device (the psum emitted from shardings must be a pure mean, nothing
    more)."""
    from keypointnerf_tpu.parallel import make_batch_step_fn

    mesh = make_mesh()
    model = KeypointNeRF(TINY)
    loss_cfg = LossConfig(lambda_vgg=0.0)
    vb0 = tiny_batch(0)
    batch = stack_batch([tiny_batch(i) for i in range(8)])
    rng = jax.random.key(0)

    # single-device reference first (the sharded step donates its state)
    state_a = create_train_state(model, vb0, OptimConfig())
    single = jax.jit(make_batch_step_fn(model, loss_cfg))
    ref_state, ref_err = single(state_a, batch, rng)

    state_b = create_train_state(model, vb0, OptimConfig())
    sharded = make_sharded_train_step(model, loss_cfg, mesh)
    sh_state, sh_err = sharded(state_b, batch, rng)

    assert int(sh_state.step) == 1
    np.testing.assert_allclose(
        float(sh_err["e_all"]), float(ref_err["e_all"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(sh_err["grad_norm"]), float(ref_err["grad_norm"]), rtol=1e-4
    )

    # gradient parity, leaf by leaf (post-Adam params are NOT compared:
    # at step 1 Adam is sign-like — m/sqrt(v) = +-1 — so f32 reduction-order
    # noise on near-zero grads flips whole +-lr updates)
    from keypointnerf_tpu.training.losses import compute_losses
    from keypointnerf_tpu.parallel import data_sharding, replicated

    def grads_fn(params, batch, rng):
        def loss_fn(p):
            def per_sample(vb, r):
                out = model.apply(p, vb, True, rngs={"render": r})
                total, _ = compute_losses(out, loss_cfg, None)
                return total

            n = jax.tree.leaves(batch)[0].shape[0]
            totals = jax.vmap(per_sample)(batch, jax.random.split(rng, n))
            return jnp.mean(totals)

        return jax.grad(loss_fn)(params)

    step_rng = jax.random.fold_in(rng, 0)
    ref_grads = jax.jit(grads_fn)(state_a.params, batch, step_rng)
    repl = replicated(mesh)
    sh_grads = jax.jit(
        grads_fn, in_shardings=(repl, data_sharding(mesh), repl)
    )(state_a.params, batch, step_rng)
    for (path, ref_leaf), sh_leaf in zip(
        jax.tree_util.tree_leaves_with_path(ref_grads), jax.tree.leaves(sh_grads)
    ):
        np.testing.assert_allclose(
            np.asarray(sh_leaf), np.asarray(ref_leaf), atol=1e-5,
            err_msg=str(path),
        )
    # and the step actually changed the params
    diffs = [
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree.leaves(state_a.params), jax.tree.leaves(ref_state.params)
        )
    ]
    assert max(diffs) > 0.0


@pytest.mark.slow
def test_sharded_render_matches_single_device():
    mesh = make_mesh()
    model = KeypointNeRF(TINY)
    vb = tiny_batch(0)
    state = create_train_state(model, vb, OptimConfig())

    render = make_sharded_render(model, mesh, chunk=64)
    out = render(state.params, vb, height=32, width=32)
    assert out["rgb_fine"].shape == (32, 32, 3)
    assert np.all(np.isfinite(out["rgb_fine"]))

    from keypointnerf_tpu.render import render_image

    ref = render_image(model, state.params, vb, height=32, width=32, chunk=64)
    np.testing.assert_allclose(
        np.asarray(out["rgb_fine"]), np.asarray(ref["rgb_fine"]), atol=2e-5
    )


@pytest.mark.slow
def test_sharded_render_with_empty_cull():
    """The exact empty-ray cull under the tile-sharded renderer: the
    interleaved shard assignment makes each shard a uniform ray subsample
    (hull fraction ~= global), so a global budget stays sound per shard —
    outputs match the unsharded culled render and no shard overflows."""
    import dataclasses

    from keypointnerf_tpu.render import render_image

    mesh = make_mesh()
    cfg = dataclasses.replace(TINY, cull_empty_rays_ratio=0.6)
    model = KeypointNeRF(cfg)
    vb = tiny_batch(0)
    state = create_train_state(model, vb, OptimConfig())

    render = make_sharded_render(model, mesh, chunk=64)
    out = render(state.params, vb, height=32, width=32)
    assert float(np.asarray(out["cull_overflow"]).max()) == 0.0
    ref = render_image(model, state.params, vb, height=32, width=32, chunk=64)
    np.testing.assert_allclose(
        np.asarray(out["rgb_fine"]), np.asarray(ref["rgb_fine"]), atol=2e-5
    )


@pytest.mark.slow
def test_run_eval_sharded(tmp_path):
    """run_eval with rays sharded across the 8-device mesh."""
    from keypointnerf_tpu.data import SyntheticConfig, SyntheticDataset
    from keypointnerf_tpu.evaluation.run_eval import run_eval
    from keypointnerf_tpu.training import OptimConfig, create_train_state
    from keypointnerf_tpu.utils import load_config

    cfg = load_config(None, overrides={
        "out_dir": str(tmp_path), "name": "shard_eval",
        "model.n_coarse": 4, "model.n_fine": 4, "model.patch_h": 4,
        "model.patch_w": 4, "model.geo_n_downsample": 2,
        "data.image_size": 32,
    })
    from keypointnerf_tpu.models import KeypointNeRF

    model = KeypointNeRF(cfg.model)
    data = SyntheticDataset(SyntheticConfig(image_size=32, focal=40.0), length=2)
    vb0 = tiny_batch(0, size=32)
    state = create_train_state(model, vb0, OptimConfig())
    scores = run_eval(cfg, model, state, data, max_samples=1, sharded=True)
    assert "psnr" in scores and np.isfinite(scores["psnr"])


@pytest.mark.slow
def test_sharded_train_step_2device_mesh():
    """Sharding must work for mesh sizes other than the full 8 devices."""
    mesh = make_mesh(n_data=2)
    assert mesh.devices.size == 2
    model = KeypointNeRF(TINY)
    vb0 = tiny_batch(0)
    state = create_train_state(model, vb0, OptimConfig())
    step = make_sharded_train_step(model, LossConfig(lambda_vgg=0.0), mesh)
    batch = stack_batch([tiny_batch(i) for i in range(2)])
    state2, err = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(err["e_all"]))
    assert int(state2.step) == 1
