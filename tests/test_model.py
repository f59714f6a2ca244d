"""End-to-end tests of the full KeypointNeRF model on the synthetic rig."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keypointnerf_tpu.data import SyntheticConfig, make_sample
from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
from keypointnerf_tpu.render import render_image

TINY = KeypointNeRFConfig(
    n_coarse=8,
    n_fine=8,
    patch_h=8,
    patch_w=8,
    geo_n_downsample=2,
)


def tiny_batch(seed=0, size=64):
    sample = make_sample(SyntheticConfig(image_size=size), seed=seed)
    return ViewBatch(**jax.tree.map(jnp.asarray, sample))


@pytest.fixture(scope="module")
def model_and_params():
    model = KeypointNeRF(TINY)
    vb = tiny_batch()
    params = model.init(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )
    return model, params, vb


def test_train_forward_shapes(model_and_params):
    model, params, vb = model_and_params
    out = model.apply(params, vb, True, rngs={"render": jax.random.key(2)})
    assert out["rgb_coarse"].shape == (8, 8, 3)
    assert out["rgb_fine"].shape == (8, 8, 3)
    assert out["target_rgb"].shape == (8, 8, 3)
    assert out["target_alpha"].shape == (8, 8, 1)
    assert out["acc_fine"].shape == (8, 8)
    for k, v in out.items():
        assert np.all(np.isfinite(v)), f"non-finite values in {k}"


def test_param_count_reasonable(model_and_params):
    model, params, _ = model_and_params
    n = sum(x.size for x in jax.tree.leaves(params))
    # reference model is a few-million-param CNN+MLP stack
    assert 1e5 < n < 5e7


def test_gradients_flow(model_and_params):
    model, params, vb = model_and_params

    def loss_fn(p):
        out = model.apply(p, vb, True, rngs={"render": jax.random.key(3)})
        return jnp.mean(jnp.abs(out["rgb_fine"] - out["target_rgb"]))

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(x)) for x in leaves)
    # most parameters should receive nonzero gradient
    nonzero = sum(float(jnp.any(x != 0)) for x in leaves)
    assert nonzero / len(leaves) > 0.7


def test_render_image_eval(model_and_params):
    model, params, vb = model_and_params
    out = render_image(model, params, vb, height=64, width=64, stride=4, chunk=128)
    assert out["rgb_fine"].shape == (16, 16, 3)
    assert out["depth_fine"].shape == (16, 16)
    assert np.all(np.isfinite(out["rgb_fine"]))
    # opacity should be high inside the sphere silhouette region and the
    # image should not be constant
    assert float(jnp.std(out["rgb_fine"])) >= 0.0


def test_eval_deterministic(model_and_params):
    model, params, vb = model_and_params
    a = render_image(model, params, vb, height=64, width=64, stride=8, chunk=64)
    b = render_image(model, params, vb, height=64, width=64, stride=8, chunk=64)
    np.testing.assert_array_equal(np.asarray(a["rgb_fine"]), np.asarray(b["rgb_fine"]))


def test_spatial_dim_wired(model_and_params):
    assert TINY.sp_dim == (1 + 2 * 3) * 24  # 168 (reference model.py:569-570)


@pytest.mark.slow
def test_remat_matches_non_remat():
    """cfg.remat must not change forward values (only backward memory)."""
    import dataclasses

    model = KeypointNeRF(TINY)
    model_r = KeypointNeRF(dataclasses.replace(TINY, remat=True))
    vb = tiny_batch()
    params = model.init(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )
    rngs = {"render": jax.random.key(5)}
    out = model.apply(params, vb, True, rngs=rngs)
    out_r = model_r.apply(params, vb, True, rngs=rngs)
    np.testing.assert_allclose(
        np.asarray(out["rgb_fine"]), np.asarray(out_r["rgb_fine"]), atol=1e-6
    )

    def loss(m, p):
        o = m.apply(p, vb, True, rngs=rngs)
        return jnp.mean(jnp.abs(o["rgb_fine"] - o["target_rgb"]))

    g = jax.grad(lambda p: loss(model, p))(params)
    g_r = jax.grad(lambda p: loss(model_r, p))(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_separate_cf_config():
    """separate_cf adds a fine radiance channel (reference model.py:987-993)."""
    import dataclasses

    model = KeypointNeRF(dataclasses.replace(TINY, separate_cf=True))
    vb = tiny_batch()
    params = model.init(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )
    # fusion head output widened to 3
    k = params["params"]["mlp_geo"]["MLP_0"]["WNDense_2"]["kernel"]
    assert k.shape[-1] == 3
    out = model.apply(params, vb, True, rngs={"render": jax.random.key(2)})
    assert out["rgb_fine"].shape == (8, 8, 3)
    assert np.all(np.isfinite(out["rgb_fine"]))


@pytest.mark.slow
def test_fused_feature_map_close_to_default():
    """The single-gather fused-map path approximates the default path:
    piecewise-linear re-interpolation, align_corners preserved."""
    import dataclasses

    model = KeypointNeRF(TINY)
    model_f = KeypointNeRF(dataclasses.replace(TINY, fused_feature_map=True))
    vb = tiny_batch()
    params = model.init(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )
    rngs = {"render": jax.random.key(7)}
    out = model.apply(params, vb, True, rngs=rngs)
    out_f = model_f.apply(params, vb, True, rngs=rngs)
    d = np.abs(np.asarray(out["rgb_fine"]) - np.asarray(out_f["rgb_fine"]))
    assert np.all(np.isfinite(out_f["rgb_fine"]))
    # close but not identical (re-interpolation of upsampled coarse/tex maps)
    assert float(d.mean()) < 0.05, float(d.mean())


@pytest.mark.slow
def test_fused_map_half_close_to_fused():
    """The half-resolution fused map (gather-regime lever, docs/PERF.md)
    approximates the full-res fused map; channel layout contract intact."""
    import dataclasses

    model_f = KeypointNeRF(dataclasses.replace(TINY, fused_feature_map=True))
    model_h = KeypointNeRF(dataclasses.replace(
        TINY, fused_feature_map=True, fused_map_half=True,
        fused_map_half_min_side=0))  # toy inputs: force the halving math
    vb = tiny_batch()
    params = model_f.init(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )
    # encode builds the half-size map
    feats = model_h.apply(params, vb.src_images, vb.src_masks,
                          method=KeypointNeRF.encode)
    H, W = vb.src_images.shape[1:3]
    assert feats["fused"].shape[1:3] == (H // 2, W // 2)
    # eval render, deterministic. At this toy scale the half map is 32^2,
    # so the approximation is coarse — this asserts sanity (finite, same
    # scene, bounded error); the real quality claim is the 512^2
    # culling_error row on trained params (README table).
    out_f = model_f.apply(params, vb, False)
    out_h = model_h.apply(params, vb, False)
    d = np.abs(np.asarray(out_f["rgb_fine"]) - np.asarray(out_h["rgb_fine"]))
    assert np.all(np.isfinite(out_h["rgb_fine"]))
    assert float(d.mean()) < 0.1, float(d.mean())


@pytest.mark.slow
def test_fine_topk_culling_close_to_full(model_and_params):
    """Culled fine pass matches the full render where it matters (rays the
    coarse pass found opaque) and keeps coarse results elsewhere."""
    import dataclasses

    model, params, vb = model_and_params
    model_c = KeypointNeRF(dataclasses.replace(TINY, fine_topk_ratio=0.5))
    full = render_image(model, params, vb, height=64, width=64, stride=4, chunk=128)
    culled_out = render_image(
        model_c, params, vb, height=64, width=64, stride=4, chunk=128
    )
    f = np.asarray(full["rgb_fine"])
    cu = np.asarray(culled_out["rgb_fine"])
    acc = np.asarray(full["acc_fine"])
    # opaque rays should match the full render closely
    opaque = acc > 0.5
    if opaque.sum() > 0:
        assert np.abs(f[opaque] - cu[opaque]).mean() < 0.05
    # overall difference is small (non-marched rays contribute ~nothing)
    assert np.abs(f - cu).mean() < 0.03


def test_cull_empty_rays_exact(model_and_params):
    """The global empty-ray cull is EXACT: outputs are bit-identical to the
    uncull render (render/empty_cull.py — rays outside the conservative
    visual-hull budget are provably all-invalid and composite to zero), and
    the conservative scores really do cover every nonzero ray."""
    import dataclasses

    from keypointnerf_tpu.geometry.cameras import camera_rays, pixel_grid
    from keypointnerf_tpu.render.empty_cull import (
        EMPTY_SCORE_THRESHOLD,
        empty_ray_scores,
    )

    model, params, vb = model_and_params
    model_c = KeypointNeRF(dataclasses.replace(TINY, cull_empty_rays_ratio=0.6))
    full = render_image(model, params, vb, height=64, width=64, chunk=512)
    culled = render_image(model_c, params, vb, height=64, width=64, chunk=512)
    # the runtime exactness guard must report a covered budget
    assert float(np.asarray(culled.pop("cull_overflow")).max()) == 0.0
    for k in full:
        np.testing.assert_array_equal(
            np.asarray(full[k], np.float32),
            np.asarray(culled[k], np.float32),
            err_msg=k,
        )

    # conservativeness: every ray the full render found nonzero must score
    # above the cull threshold
    pix = pixel_grid(64, 64).astype(jnp.float32)
    origin, dirs, near, far = camera_rays(
        pix, vb.tar_K, vb.tar_R, vb.tar_t, TINY.znear, TINY.zfar
    )
    scores = np.asarray(empty_ray_scores(TINY, vb, origin, dirs, near, far))
    hull = scores > EMPTY_SCORE_THRESHOLD
    nonzero = np.asarray(full["acc_fine"]).reshape(-1) != 0
    assert not (nonzero & ~hull).any()
    # the budget must cover the hull for the exactness guarantee to hold
    assert hull.mean() <= 0.6
    # and the cull is not vacuous on this scene
    assert hull.mean() < 0.95


@pytest.mark.slow
def test_cull_empty_rays_exact_fused_half(model_and_params):
    """The cull must stay exact when the model samples fg from the
    HALF-RES fused map's mask channel (ADVICE r3 high finding: a bound
    built from the full-res src_masks does not cover the resampled
    support; the fixed bound is built from the actual fused mask map)."""
    import dataclasses

    model, params, vb = model_and_params
    base = dataclasses.replace(TINY, fused_feature_map=True,
                               fused_map_half=True, fused_map_half_min_side=0)
    m_full = KeypointNeRF(base)
    m_cull = KeypointNeRF(dataclasses.replace(base, cull_empty_rays_ratio=0.6))
    a = render_image(m_full, params, vb, height=64, width=64, chunk=512)
    b = render_image(m_cull, params, vb, height=64, width=64, chunk=512)
    assert float(np.asarray(b.pop("cull_overflow")).max()) == 0.0
    for k in a:
        np.testing.assert_array_equal(
            np.asarray(a[k], np.float32), np.asarray(b[k], np.float32), err_msg=k
        )


@pytest.mark.slow
def test_cull_empty_rays_exact_gather_lerp(model_and_params):
    """The cull must stay exact under gather_lerp (ADVICE r3 high finding:
    lerped fg escapes the per-sample bound; the fixed score swaps the
    reduction to min-over-views of max-over-samples)."""
    import dataclasses

    model, params, vb = model_and_params
    base = dataclasses.replace(TINY, fused_feature_map=True, gather_lerp=True)
    m_full = KeypointNeRF(base)
    m_cull = KeypointNeRF(dataclasses.replace(base, cull_empty_rays_ratio=0.7))
    a = render_image(m_full, params, vb, height=64, width=64, chunk=512)
    b = render_image(m_cull, params, vb, height=64, width=64, chunk=512)
    assert float(np.asarray(b.pop("cull_overflow")).max()) == 0.0
    for k in a:
        np.testing.assert_array_equal(
            np.asarray(a[k], np.float32), np.asarray(b[k], np.float32), err_msg=k
        )


def test_cull_empty_rays_overflow_reported(model_and_params):
    """An under-budget ratio must be DETECTABLE: cull_overflow counts the
    above-threshold rays beyond the marched budget (ADVICE r3 medium:
    previously a too-small ratio silently zeroed valid rays)."""
    import dataclasses

    model, params, vb = model_and_params
    m = KeypointNeRF(dataclasses.replace(TINY, cull_empty_rays_ratio=0.01))
    out = render_image(m, params, vb, height=64, width=64, chunk=512)
    ov = np.asarray(out["cull_overflow"])
    assert (ov == ov.reshape(-1)[0]).all()  # scalar broadcast
    assert float(ov.max()) > 0.0


def test_suggest_cull_budget(model_and_params):
    """Auto-sized cull budgets must cover the scene (overflow 0 when
    rendering with the suggestion) and not be vacuous."""
    import dataclasses

    from keypointnerf_tpu.render.empty_cull import suggest_cull_budget

    model, params, vb = model_and_params
    budget, hull = suggest_cull_budget(
        TINY, vb, [(vb.tar_K, vb.tar_R, vb.tar_t)], 64, 64
    )
    assert 0.0 < hull < 1.0
    assert hull < budget <= 1.0
    m = KeypointNeRF(dataclasses.replace(TINY, cull_empty_rays_ratio=budget))
    out = render_image(m, params, vb, height=64, width=64, chunk=512)
    assert float(np.asarray(out["cull_overflow"]).max()) == 0.0

    # fused-map config: the suggestion must demand feats (sound bound)
    fused_cfg = dataclasses.replace(TINY, fused_feature_map=True)
    with pytest.raises(ValueError, match="feats"):
        suggest_cull_budget(
            fused_cfg, vb, [(vb.tar_K, vb.tar_R, vb.tar_t)], 64, 64
        )


def test_cull_empty_rays_rejects_disable_fg_mask(model_and_params):
    """With disable_fg_mask the validity test is frustum-only, so the
    fg-based cull is unsound — the combination must be rejected."""
    import dataclasses

    model, params, vb = model_and_params
    bad = KeypointNeRF(
        dataclasses.replace(TINY, cull_empty_rays_ratio=0.5, disable_fg_mask=True)
    )
    with pytest.raises(ValueError, match="disable_fg_mask"):
        render_image(bad, params, vb, height=16, width=16, chunk=64)


def test_empty_ray_scores_requires_feats_for_fused(model_and_params):
    """Scoring a fused-map config without the fused map is unsound and
    must be rejected (the bound must come from the sampled mask map)."""
    import dataclasses

    from keypointnerf_tpu.geometry.cameras import camera_rays, pixel_grid
    from keypointnerf_tpu.render.empty_cull import empty_ray_scores

    model, params, vb = model_and_params
    cfg = dataclasses.replace(TINY, fused_feature_map=True)
    pix = pixel_grid(8, 8).astype(jnp.float32)
    origin, dirs, near, far = camera_rays(
        pix, vb.tar_K, vb.tar_R, vb.tar_t, cfg.znear, cfg.zfar
    )
    with pytest.raises(ValueError, match="feats"):
        empty_ray_scores(cfg, vb, origin, dirs, near, far)


def test_cull_empty_rays_rejects_pallas_composite(model_and_params):
    import dataclasses

    model, params, vb = model_and_params
    bad = KeypointNeRF(
        dataclasses.replace(
            TINY, cull_empty_rays_ratio=0.5, use_pallas_composite=True,
            pallas_interpret=True,
        )
    )
    with pytest.raises(ValueError, match="cull_empty_rays_ratio"):
        render_image(bad, params, vb, height=16, width=16, chunk=64)


@pytest.mark.slow
def test_reuse_coarse_eval_exact(model_and_params):
    """Eval-time coarse-value reuse must match full union re-evaluation."""
    import dataclasses

    model, params, vb = model_and_params  # TINY has reuse_coarse_eval=True
    model_full = KeypointNeRF(dataclasses.replace(TINY, reuse_coarse_eval=False))
    a = render_image(model, params, vb, height=64, width=64, stride=4, chunk=128)
    b = render_image(model_full, params, vb, height=64, width=64, stride=4, chunk=128)
    np.testing.assert_allclose(
        np.asarray(a["rgb_fine"]), np.asarray(b["rgb_fine"]), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(a["acc_fine"]), np.asarray(b["acc_fine"]), atol=3e-5
    )


@pytest.mark.slow
def test_fast_path_combination_close_to_default(model_and_params):
    """The bench configuration (fused map + culling + reuse, bf16 off here
    for comparability) must stay close to the strict-reference path."""
    import dataclasses

    model, params, vb = model_and_params
    fast = KeypointNeRF(dataclasses.replace(
        TINY, fused_feature_map=True, fine_topk_ratio=0.5, reuse_coarse_eval=True
    ))
    a = render_image(model, params, vb, height=64, width=64, stride=4, chunk=128)
    b = render_image(fast, params, vb, height=64, width=64, stride=4, chunk=128)
    d = np.abs(np.asarray(a["rgb_fine"]) - np.asarray(b["rgb_fine"]))
    assert np.all(np.isfinite(b["rgb_fine"]))
    assert float(d.mean()) < 0.05, float(d.mean())


@pytest.mark.slow
def test_nl_relu_approx_close_to_softplus(model_and_params):
    """The relu fast-path activation must track softplus100 closely: the
    two differ by at most log(2)/100 per pre-activation (reference
    src/utils.py:524 beta=100)."""
    import dataclasses

    model, params, vb = model_and_params
    relu_m = KeypointNeRF(dataclasses.replace(TINY, nl_relu_approx=True))
    a = render_image(model, params, vb, height=64, width=64, stride=4, chunk=128)
    b = render_image(relu_m, params, vb, height=64, width=64, stride=4, chunk=128)
    assert np.all(np.isfinite(b["rgb_fine"]))
    d = np.abs(np.asarray(a["rgb_fine"]) - np.asarray(b["rgb_fine"]))
    assert float(d.mean()) < 0.02, float(d.mean())


@pytest.mark.slow
def test_coarse_cull_close_to_full(model_and_params):
    """Coarse AABB-hit culling: box rays match the full render; miss rays
    composite to empty space."""
    import dataclasses

    model, params, vb = model_and_params
    culled = KeypointNeRF(dataclasses.replace(TINY, coarse_topk_ratio=0.5))
    a = render_image(model, params, vb, height=64, width=64, stride=4, chunk=128)
    b = render_image(culled, params, vb, height=64, width=64, stride=4, chunk=128)
    assert np.all(np.isfinite(b["rgb_fine"]))
    d = np.abs(np.asarray(a["rgb_fine"]) - np.asarray(b["rgb_fine"]))
    assert float(d.mean()) < 0.03, float(d.mean())


def test_eval_render_has_no_payload_scatters(model_and_params):
    """Culling write-backs must never scatter float payloads — XLA:TPU
    scatter serializes per index (docs/PERF.md), so the formulation is one
    tiny int32 inverse-index scatter + packed row gathers. Guard the
    compiled HLO of the benched eval path against regressions."""
    import dataclasses
    import re

    model, params, vb = model_and_params
    fast = KeypointNeRF(dataclasses.replace(
        TINY, fused_feature_map=True, fine_topk_ratio=0.5,
        coarse_topk_ratio=0.5, reuse_coarse_eval=True,
    ))
    R = 128
    dirs = jax.random.normal(jax.random.key(0), (R, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origin = jnp.asarray([0.0, 0.0, -3.0])
    near = jnp.full((R, 1), 2.0)
    far = jnp.full((R, 1), 5.0)
    feats = fast.apply(
        params, vb.src_images, vb.src_masks, method=KeypointNeRF.encode
    )

    def run(params, feats, dirs, near, far):
        return fast.apply(
            params, feats, vb, origin, dirs, near, far, None, False,
            method=KeypointNeRF.render_rays,
        )

    txt = jax.jit(run).lower(params, feats, dirs, near, far).compile().as_text()
    # every scatter instruction's result must be a small integer array
    # (the inverse-index writes), never a float payload tensor
    scatters = re.findall(r"= ([a-z0-9]+)\[([\d,]*)\][^=]* scatter\(", txt)
    for dtype, dims in scatters:
        n_elems = int(np.prod([int(d) for d in dims.split(",") if d] or [1]))
        assert dtype.startswith(("s", "u")), (dtype, dims)
        assert n_elems <= 4 * R, (dtype, dims)


def test_patch_clamp_per_axis(model_and_params):
    """Patch pixel coords must clamp x to [0, W-1] and y to [0, H-1]
    independently — a shared min(W,H) bound is wrong for non-square images."""
    import types

    model, params, _ = model_and_params
    H, W = 16, 32
    mask = np.zeros((H, W, 1), np.float32)
    mask[H - 1, W - 1, 0] = 1.0  # only fg pixel: patch centers bottom-right
    vb = types.SimpleNamespace(tar_mask=jnp.asarray(mask))
    pix = model.apply(
        params, vb, jax.random.key(0), method=KeypointNeRF.sample_patch_pixels
    )
    x, y = np.asarray(pix[:, 0]), np.asarray(pix[:, 1])
    assert x.min() >= 0 and y.min() >= 0
    assert x.max() == W - 1  # would be min(W-1, H-1) = 15 with the old bug
    assert y.max() == H - 1
    # the window shifts inside the frame rather than clamping pixels
    # individually: all P*P patch pixels must be distinct
    assert len({(int(a), int(b)) for a, b in zip(x, y)}) == len(x)


@pytest.mark.parametrize("mode", ["attention_v0", "attention_v1"])
def test_attention_pool_selectable_from_config(mode):
    """cfg.pool_mode wires the reference PoolModule attention variants
    (src/utils.py:589-647) into the flagship geometry head."""
    cfg = KeypointNeRFConfig(
        n_coarse=4, n_fine=4, patch_h=4, patch_w=4, geo_n_downsample=2,
        pool_mode=mode,
    )
    model = KeypointNeRF(cfg)
    vb = tiny_batch(size=32)
    params = model.init(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )
    # the attention pool contributes its own params
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    assert any("AttentionPool" in str(p) for p, _ in flat)
    out = model.apply(params, vb, True, rngs={"render": jax.random.key(2)})
    assert out["rgb_fine"].shape == (4, 4, 3)
    for k, v in out.items():
        assert np.all(np.isfinite(v)), k


def test_pallas_rejects_attention_pool():
    cfg = KeypointNeRFConfig(pool_mode="attention_v0", use_pallas_geo_mlp=True)
    vb = tiny_batch(size=32)
    with pytest.raises(ValueError):
        KeypointNeRF(cfg).init(
            {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
        )


def test_render_image_feats_reuse(model_and_params):
    """Passing pre-encoded feats must reproduce the in-jit encode exactly
    (the orbit renderer encodes once per subject)."""
    model, params, vb = model_and_params
    feats = model.apply(params, vb.src_images, vb.src_masks, method=KeypointNeRF.encode)
    a = render_image(model, params, vb, height=16, width=16, chunk=64)
    b = render_image(model, params, vb, height=16, width=16, chunk=64, feats=feats)
    np.testing.assert_allclose(
        np.asarray(a["rgb_fine"]), np.asarray(b["rgb_fine"]), atol=1e-6
    )


def test_dma_gather_render_parity_interpret():
    """cfg.use_dma_gather must reproduce the XLA-gather render exactly
    (interpret mode on CPU; hardware parity in scripts/validate_pallas_hw.py)."""
    import dataclasses

    base = KeypointNeRFConfig(
        n_coarse=4, n_fine=4, patch_h=4, patch_w=4, geo_n_downsample=2,
        fused_feature_map=True,
    )
    vb = tiny_batch(size=32)
    model_a = KeypointNeRF(base)
    params = model_a.init(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )
    model_b = KeypointNeRF(
        dataclasses.replace(base, use_dma_gather=True, pallas_interpret=True)
    )
    a = render_image(model_a, params, vb, height=8, width=8, chunk=32)
    b = render_image(model_b, params, vb, height=8, width=8, chunk=32)
    np.testing.assert_allclose(
        np.asarray(b["rgb_fine"]), np.asarray(a["rgb_fine"]), atol=1e-5
    )


def test_pallas_composite_render_parity_interpret():
    """cfg.use_pallas_composite must closely reproduce the XLA
    composite+importance eval render (interpret mode on CPU; sub-bin cdf
    rounding differences only)."""
    import dataclasses

    base = KeypointNeRFConfig(
        n_coarse=8, n_fine=8, patch_h=4, patch_w=4, geo_n_downsample=2,
    )
    vb = tiny_batch(size=32)
    model_a = KeypointNeRF(base)
    params = model_a.init(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )
    model_b = KeypointNeRF(
        dataclasses.replace(base, use_pallas_composite=True, pallas_interpret=True)
    )
    a = render_image(model_a, params, vb, height=8, width=8, chunk=32)
    b = render_image(model_b, params, vb, height=8, width=8, chunk=32)
    np.testing.assert_allclose(
        np.asarray(b["rgb_coarse"]), np.asarray(a["rgb_coarse"]), atol=1e-4
    )
    d = np.abs(np.asarray(b["rgb_fine"]) - np.asarray(a["rgb_fine"]))
    assert float(d.max()) < 5e-3 and float(d.mean()) < 2e-4, (d.max(), d.mean())


def test_strided_gather_lerp_exact_on_linear_map():
    """Closed form: on a feature map that is LINEAR in (x, y), a bilinear
    lookup is linear too, so the epipolar secant reconstruction of odd
    samples is EXACT — for any sample spacing along any segment."""
    from keypointnerf_tpu.models.keypoint_nerf import _strided_gather_lerp
    from keypointnerf_tpu.ops.feat_sample import multiview_bilinear_sample

    V, H, W, C = 2, 33, 33, 4
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    chans = [xs, ys, 2.0 * xs - ys, 0.25 * xs + 3.0]
    fmap = jnp.broadcast_to(jnp.stack(chans, -1)[None], (V, H, W, C))

    R, S = 3, 8
    rng = np.random.default_rng(0)
    # rays = straight segments in NDC with monotone, uneven sample spacing
    p0 = rng.uniform(-0.8, 0.0, (V, R, 2))
    p1 = rng.uniform(0.0, 0.8, (V, R, 2))
    frac = np.sort(rng.uniform(0, 1, (V, R, S)), axis=-1)
    xy = p0[:, :, None, :] + frac[..., None] * (p1 - p0)[:, :, None, :]
    xy = jnp.asarray(xy.reshape(V, R * S, 2), jnp.float32)

    exact = multiview_bilinear_sample(fmap, xy)
    for stride in (2, 3, 4, 7):  # incl. strides that don't divide S
        approx = _strided_gather_lerp(fmap, xy, S, stride)
        np.testing.assert_allclose(np.asarray(approx), np.asarray(exact),
                                   rtol=1e-5, atol=1e-4, err_msg=f"k={stride}")


@pytest.mark.slow
def test_gather_lerp_close_to_exact_render(model_and_params):
    """cfg.gather_lerp (epipolar feature lerp at odd depth samples) must
    track the exact fused-map render closely."""
    import dataclasses

    model, params, vb = model_and_params
    fused = KeypointNeRF(dataclasses.replace(TINY, fused_feature_map=True))
    lerp = KeypointNeRF(dataclasses.replace(
        TINY, fused_feature_map=True, gather_lerp=True
    ))
    a = render_image(fused, params, vb, height=64, width=64, stride=4, chunk=128)
    b = render_image(lerp, params, vb, height=64, width=64, stride=4, chunk=128)
    assert np.all(np.isfinite(b["rgb_fine"]))
    d = np.abs(np.asarray(a["rgb_fine"]) - np.asarray(b["rgb_fine"]))
    assert float(d.mean()) < 0.03, float(d.mean())


def test_render_image_non_divisible_stride(model_and_params):
    """stride that does not divide H/W: pixel_grid emits ceil-sized grids
    and the reshape must match (floor division crashed here)."""
    model, params, vb = model_and_params
    out = render_image(model, params, vb, height=64, width=64, stride=7, chunk=128)
    assert out["rgb_fine"].shape == (10, 10, 3)  # ceil(64/7) = 10
    assert np.all(np.isfinite(out["rgb_fine"]))


def test_render_images_batched_matches_per_subject(model_and_params):
    """The batched serving renderer must reproduce per-subject renders
    (one vmapped program over B subjects vs B separate dispatches)."""
    from keypointnerf_tpu.parallel import stack_batch
    from keypointnerf_tpu.render import render_images_batched

    model, params, _ = model_and_params
    vbs = [tiny_batch(seed=0), tiny_batch(seed=11)]
    batched = render_images_batched(
        model, params, stack_batch(vbs), height=64, width=64, stride=8, chunk=64
    )
    assert batched["rgb_fine"].shape == (2, 8, 8, 3)
    for b, vb in enumerate(vbs):
        single = render_image(
            model, params, vb, height=64, width=64, stride=8, chunk=64
        )
        np.testing.assert_allclose(
            np.asarray(batched["rgb_fine"][b]),
            np.asarray(single["rgb_fine"]),
            atol=2e-5,
        )


def test_render_cameras_scanned_matches_render_image(model_and_params):
    """The grouped orbit renderer (one lax.scan program over F cameras)
    must reproduce per-camera render_image frames."""
    from keypointnerf_tpu.render import render_cameras_scanned

    model, params, vb = model_and_params
    feats = model.apply(
        params, vb.src_images, vb.src_masks,
        method=type(model).encode,
    )
    # two distinct target cameras: the sample's own and a second view's
    Ks = jnp.stack([vb.tar_K, vb.src_K[0]])
    Rs = jnp.stack([vb.tar_R, vb.src_R[0]])
    ts = jnp.stack([vb.tar_t, vb.src_t[0]])
    rgb, _ov = render_cameras_scanned(
        model, params, feats, vb, Ks, Rs, ts,
        height=64, width=64, stride=8, chunk=64,
    )
    assert rgb.shape == (2, 8, 8, 3)
    import dataclasses as _dc

    for f in range(2):
        cam_vb = _dc.replace(
            vb, tar_K=Ks[f], tar_R=Rs[f], tar_t=ts[f]
        )
        single = render_image(
            model, params, cam_vb, height=64, width=64, stride=8, chunk=64,
            feats=feats,
        )
        np.testing.assert_allclose(
            np.asarray(rgb[f]), np.asarray(single["rgb_fine"]), atol=2e-5
        )


def test_render_cameras_scanned_coarse_only(model_and_params):
    """fine=False must return coarse RGB instead of crashing on the
    missing rgb_fine key."""
    from keypointnerf_tpu.render import render_cameras_scanned

    model, params, vb = model_and_params
    feats = model.apply(
        params, vb.src_images, vb.src_masks, method=type(model).encode
    )
    rgb, _ov = render_cameras_scanned(
        model, params, feats, vb,
        vb.tar_K[None], vb.tar_R[None], vb.tar_t[None],
        height=64, width=64, stride=8, chunk=64, fine=False,
    )
    assert rgb.shape == (1, 8, 8, 3)
    assert np.all(np.isfinite(rgb))
