"""Train-step tests: loss stack, one SGD step, overfit sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keypointnerf_tpu.data import SyntheticConfig, make_sample
from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
from keypointnerf_tpu.training import (
    LossConfig,
    OptimConfig,
    compute_losses,
    create_train_state,
    jit_train_step,
    pix_loss,
)

TINY = KeypointNeRFConfig(n_coarse=8, n_fine=8, patch_h=8, patch_w=8, geo_n_downsample=2)


def tiny_batch(seed=0):
    sample = make_sample(SyntheticConfig(image_size=64), seed=seed)
    return ViewBatch(**jax.tree.map(jnp.asarray, sample))


def test_pix_loss_kinds():
    a = jnp.ones((4, 4, 3)) * 0.5
    b = jnp.zeros((4, 4, 3))
    assert np.isclose(float(pix_loss(a, b, "l1")), 0.5)
    assert np.isclose(float(pix_loss(a, b, "l2")), 0.25)
    topk = float(pix_loss(a, b, "l1", top_percent=25.0))
    assert np.isclose(topk, 1.5)  # channel-summed |diff| = 1.5 everywhere


def test_compute_losses_terms():
    out = {
        "rgb_coarse": jnp.zeros((8, 8, 3)),
        "rgb_fine": jnp.zeros((8, 8, 3)),
        "acc_coarse": jnp.ones((8, 8)),
        "acc_fine": jnp.ones((8, 8)),
        "target_rgb": jnp.ones((8, 8, 3)) * 0.5,
        "target_alpha": jnp.ones((8, 8, 1)),
    }
    cfg = LossConfig(lambda_mloss=0.1)
    total, err = compute_losses(out, cfg, vgg_params=None)
    # e_pix_c = 1.0*0.5, e_pix_l1 = 10*0.5, mask losses = 0
    assert np.isclose(float(err["e_pix_c"]), 0.5)
    assert np.isclose(float(err["e_pix_l1"]), 5.0)
    assert np.isclose(float(err["mask_loss_f"]), 0.0, atol=1e-6)
    assert np.isclose(float(total), float(err["e_all"]))


@pytest.mark.slow
def test_train_step_decreases_loss():
    model = KeypointNeRF(TINY)
    vb = tiny_batch()
    state = create_train_state(model, vb, OptimConfig(learning_rate=2e-3))
    step = jit_train_step(model, LossConfig(lambda_vgg=0.0))
    rng = jax.random.key(0)
    first = None
    losses = []
    for i in range(30):
        state, err = step(state, vb, rng)
        losses.append(float(err["e_all"]))
        if first is None:
            first = losses[-1]
        assert np.isfinite(losses[-1])
    # overfit sanity on a single sample: loss should drop substantially
    assert np.mean(losses[-5:]) < 0.7 * first, losses


def test_grad_accumulation_state():
    model = KeypointNeRF(TINY)
    vb = tiny_batch()
    state = create_train_state(model, vb, OptimConfig(accumulate_steps=2))
    step = jit_train_step(model, LossConfig(lambda_vgg=0.0))
    p0 = jax.tree.leaves(state.params)[0]
    state, _ = step(state, vb, jax.random.key(0))
    # first microstep: params unchanged (accumulating)
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(state.params)[0]), np.asarray(p0))
    state, _ = step(state, vb, jax.random.key(0))
    assert not np.array_equal(np.asarray(jax.tree.leaves(state.params)[0]), np.asarray(p0))


def test_lr_schedules():
    from keypointnerf_tpu.training.train import make_lr

    # constant no-warmup stays a plain float
    assert make_lr(OptimConfig()) == 5e-4
    sched = make_lr(OptimConfig(lr_schedule="cosine", decay_steps=100,
                                warmup_steps=10, learning_rate=1e-3))
    assert float(sched(0)) == 0.0
    assert np.isclose(float(sched(10)), 1e-3, rtol=1e-5)
    assert float(sched(110)) < 1e-4  # decayed near the floor
    exp = make_lr(OptimConfig(lr_schedule="exponential", decay_steps=100,
                              learning_rate=1e-3, lr_final_scale=0.1))
    assert np.isclose(float(exp(100)), 1e-4, rtol=1e-4)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_lr(OptimConfig(lr_schedule="nope", warmup_steps=1))


def test_matmul_gather_vjp_train_grads_match():
    """cfg.train_matmul_gather_vjp swaps the gather backward for one-hot
    matmuls; full train-step gradients must match the scatter path."""
    import dataclasses

    from keypointnerf_tpu.training.losses import compute_losses as cl

    vb = tiny_batch()
    rngs = {"params": jax.random.key(0), "render": jax.random.key(1)}
    m_ref = KeypointNeRF(TINY)
    m_mm = KeypointNeRF(dataclasses.replace(TINY, train_matmul_gather_vjp=True))
    params = m_ref.init(rngs, vb, True)

    def loss(model, p):
        out = model.apply(p, vb, True, rngs={"render": jax.random.key(2)})
        return cl(out, LossConfig(), None)[0]

    g_ref = jax.grad(lambda p: loss(m_ref, p))(params)
    g_mm = jax.grad(lambda p: loss(m_mm, p))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_mm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_matmul_gather_vjp_train_grads_match_fused():
    """Same, with the fused feature map on (exercises the encode-time
    upsample backward too)."""
    import dataclasses

    from keypointnerf_tpu.training.losses import compute_losses as cl

    vb = tiny_batch()
    rngs = {"params": jax.random.key(0), "render": jax.random.key(1)}
    base = dataclasses.replace(TINY, fused_feature_map=True)
    m_ref = KeypointNeRF(base)
    m_mm = KeypointNeRF(dataclasses.replace(base, train_matmul_gather_vjp=True))
    params = m_ref.init(rngs, vb, True)

    def loss(model, p):
        out = model.apply(p, vb, True, rngs={"render": jax.random.key(2)})
        return cl(out, LossConfig(), None)[0]

    g_ref = jax.grad(lambda p: loss(m_ref, p))(params)
    g_mm = jax.grad(lambda p: loss(m_mm, p))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_mm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_shipped_recipe_remat_mm_vjp_grads_match():
    """The zju.json training recipe (remat + matmul gather VJP together)
    must produce the same gradients as the plain path — remat recomputes,
    the mm VJP re-derives, neither may change values."""
    import dataclasses

    from keypointnerf_tpu.training.losses import compute_losses as cl

    vb = tiny_batch()
    rngs = {"params": jax.random.key(0), "render": jax.random.key(1)}
    m_ref = KeypointNeRF(TINY)
    m_rcp = KeypointNeRF(dataclasses.replace(
        TINY, remat=True, train_matmul_gather_vjp=True))
    params = m_ref.init(rngs, vb, True)

    def loss(model, p):
        out = model.apply(p, vb, True, rngs={"render": jax.random.key(2)})
        return cl(out, LossConfig(), None)[0]

    g_ref = jax.grad(lambda p: loss(m_ref, p))(params)
    g_rcp = jax.grad(lambda p: loss(m_rcp, p))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_rcp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_remat_save_gathers_grads_match():
    """cfg.remat_save_gathers keeps the gathered per-point features for
    backward (jax.checkpoint policy `save_only_these_names`) instead of
    re-gathering — a scheduling change only; gradients must be identical
    to the plain path. Also covers the partial-channel matmul VJP
    (grad_channels=hd on the packed [hd|rgb|mask] map): the RGB/mask map
    gradients die at input leaves, so skipping their dmap contraction
    must not change any parameter gradient."""
    import dataclasses

    from keypointnerf_tpu.training.losses import compute_losses as cl

    vb = tiny_batch()
    rngs = {"params": jax.random.key(0), "render": jax.random.key(1)}
    m_ref = KeypointNeRF(TINY)
    m_sg = KeypointNeRF(dataclasses.replace(
        TINY, remat=True, train_matmul_gather_vjp=True,
        remat_save_gathers=True))
    params = m_ref.init(rngs, vb, True)

    def loss(model, p):
        out = model.apply(p, vb, True, rngs={"render": jax.random.key(2)})
        return cl(out, LossConfig(), None)[0]

    g_ref = jax.grad(lambda p: loss(m_ref, p))(params)
    g_sg = jax.grad(lambda p: loss(m_sg, p))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_partial_grad_channels_matches_full():
    """bilinear_sample_mm_partial(grad_channels=K): dmap's first K
    channels equal the full VJP's, the rest are zeros; dxy is unchanged
    (full-channel)."""
    from keypointnerf_tpu.ops.feat_sample import (
        bilinear_sample_mm,
        bilinear_sample_mm_partial,
    )

    rng = np.random.default_rng(3)
    feat = jnp.asarray(rng.normal(size=(9, 7, 6)).astype(np.float32))
    xy = jnp.asarray(rng.uniform(-1.1, 1.1, size=(33, 2)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(33, 6)).astype(np.float32))

    def full(f, x):
        return jnp.sum(bilinear_sample_mm(f, x) * g)

    def part(f, x):
        return jnp.sum(bilinear_sample_mm_partial(f, x, 4) * g)

    dmap_f, dxy_f = jax.grad(full, argnums=(0, 1))(feat, xy)
    dmap_p, dxy_p = jax.grad(part, argnums=(0, 1))(feat, xy)
    np.testing.assert_allclose(np.asarray(dmap_p[..., :4]),
                               np.asarray(dmap_f[..., :4]), rtol=1e-5, atol=1e-6)
    assert float(jnp.max(jnp.abs(dmap_p[..., 4:]))) == 0.0
    np.testing.assert_allclose(np.asarray(dxy_p), np.asarray(dxy_f),
                               rtol=1e-5, atol=1e-6)


def test_create_train_state_leaves_are_device_arrays():
    """Init params must be materialized device arrays (ArrayImpl), never
    jax literals (TypedNdArray) — orbax refuses to serialize literals if a
    checkpoint is written before the first jitted step rebuilds the state."""
    vb = tiny_batch()
    state = create_train_state(KeypointNeRF(TINY), vb, OptimConfig())
    for leaf in jax.tree.leaves(state.params):
        assert type(leaf).__name__ == "ArrayImpl", type(leaf)


def test_fit_resumes_epoch_schedule(tmp_path):
    """A restarted run that already consumed its epoch budget must not
    train further: resume restores the EPOCH schedule, not just the
    optimizer step (reference Lightning resume, train.py:44-50)."""
    from keypointnerf_tpu.data import SyntheticConfig, SyntheticDataset
    from keypointnerf_tpu.models import KeypointNeRF
    from keypointnerf_tpu.training.loop import Trainer
    from keypointnerf_tpu.utils import load_config

    ds = SyntheticDataset(SyntheticConfig(image_size=32), length=8)
    overrides = {
        "out_dir": str(tmp_path), "max_epochs": 1, "val_every_steps": 10**9,
        "ckpt_every_steps": 10**9, "log_every_steps": 10**9,
        "model.n_coarse": 4, "model.n_fine": 4, "model.patch_h": 4,
        "model.patch_w": 4, "model.geo_n_downsample": 2,
        "loss.lambda_vgg": 0.0, "data.num_workers": 0,
    }
    cfg = load_config(None, overrides)
    model = KeypointNeRF(cfg.model)
    n_dev = Trainer(cfg, model, ds, val_data=None).n_dev
    if len(ds) < n_dev:
        import pytest

        pytest.skip("dataset smaller than device count")
    state = Trainer(cfg, model, ds, val_data=None).fit()
    steps_done = int(state.step)
    assert steps_done == len(ds) // n_dev  # one full epoch

    # reconstruct: auto-resume restores the checkpoint; fit() must be a
    # no-op because the epoch budget is already consumed
    trainer2 = Trainer(cfg, model, ds, val_data=None)
    assert int(trainer2.state.step) == steps_done
    state2 = trainer2.fit()
    assert int(state2.step) == steps_done
