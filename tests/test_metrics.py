"""Metric parity tests: PSNR / SSIM / bounding rect / evaluator round trip."""
import jax.numpy as jnp
import numpy as np
import pytest

from keypointnerf_tpu.evaluation import (
    Evaluator,
    bounding_rect,
    eval_saved_images,
    psnr,
    structural_similarity,
)


def test_psnr_known_value():
    a = np.zeros((16, 16, 3), np.float32)
    b = np.full((16, 16, 3), 0.1, np.float32)
    # mse = 0.01 -> psnr = 20
    assert np.isclose(psnr(a, b), 20.0, atol=1e-6)


def test_ssim_identical_is_one():
    rng = np.random.default_rng(0)
    x = rng.random((32, 32, 3)).astype(np.float32)
    assert np.isclose(structural_similarity(x, x, multichannel=True), 1.0)


def test_ssim_constant_offset():
    """For constant images x=c1, y=c2 all variances vanish:
    SSIM = (2 c1 c2 + C1) / (c1^2 + c2^2 + C1) with C1=(0.01*2)^2."""
    c1, c2 = 0.4, 0.6
    x = np.full((32, 32), c1, np.float64)
    y = np.full((32, 32), c2, np.float64)
    C1 = (0.01 * 2.0) ** 2
    expect = (2 * c1 * c2 + C1) / (c1**2 + c2**2 + C1)
    assert np.isclose(structural_similarity(x, y), expect, atol=1e-10)


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(1)
    x = rng.random((48, 48, 3)).astype(np.float32)
    y1 = np.clip(x + rng.normal(0, 0.02, x.shape), 0, 1).astype(np.float32)
    y2 = np.clip(x + rng.normal(0, 0.2, x.shape), 0, 1).astype(np.float32)
    s1 = structural_similarity(x, y1, multichannel=True)
    s2 = structural_similarity(x, y2, multichannel=True)
    assert 1.0 > s1 > s2 > 0.0


def test_ssim_symmetry():
    rng = np.random.default_rng(2)
    x = rng.random((32, 32)).astype(np.float32)
    y = rng.random((32, 32)).astype(np.float32)
    assert np.isclose(
        structural_similarity(x, y), structural_similarity(y, x), atol=1e-12
    )


def test_bounding_rect():
    m = np.zeros((20, 30), bool)
    m[5:12, 8:25] = True
    assert bounding_rect(m) == (8, 5, 17, 7)


def test_evaluator_round_trip(tmp_path):
    rng = np.random.default_rng(3)
    gt = rng.random((40, 40, 3)).astype(np.float32)
    pred = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1).astype(np.float32)
    mask = np.zeros((40, 40))
    mask[4:36, 4:36] = 1.0

    ev = Evaluator(result_dir=str(tmp_path))
    score = ev.compute_score(pred, gt, mask, human_idx="h1", frame_index=0, view_index=3)
    assert score["psnr"] > 20.0
    assert 0.0 < score["ssim"] < 1.0

    offline = eval_saved_images(str(tmp_path))
    # offline rescoring uses 8-bit round-tripped crops; should be close
    assert abs(offline["psnr"] - score["psnr"]) < 1.5
    assert abs(offline["ssim"] - score["ssim"]) < 0.05


def test_compute_test_metric_identical_and_masked():
    from keypointnerf_tpu.evaluation.metrics import compute_test_metric

    rng = np.random.default_rng(7)
    x = rng.random((40, 40, 3)).astype(np.float32)
    r = compute_test_metric(x, x)
    assert np.isclose(r["ssim"], 1.0)
    assert r["psnr"] == float("inf")

    y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    mask = np.zeros((40, 40), bool)
    mask[10:30, 10:30] = True
    rm = compute_test_metric(x, y, mask)
    rf = compute_test_metric(x, y)
    assert 0 < rm["ssim"] < 1 and 0 < rf["ssim"] < 1
    assert rm["psnr"] > 0 and np.isfinite(rm["psnr"])


@pytest.mark.slow
def test_run_eval_auto_cull_budget(tmp_path):
    """run_eval(auto_cull_budget=N) must probe the dataset, RAISE an
    under-sized cull budget to cover its hull, and keep the runtime
    overflow guard at zero — the serve presets' budgets are sized for
    their bench scenes, not every dataset's framing."""
    import jax

    from keypointnerf_tpu.data import SyntheticConfig, SyntheticDataset
    from keypointnerf_tpu.evaluation.run_eval import run_eval
    from keypointnerf_tpu.models import KeypointNeRF, ViewBatch
    from keypointnerf_tpu.training import OptimConfig, create_train_state
    from keypointnerf_tpu.utils import load_config

    cfg = load_config(None, overrides={
        "out_dir": str(tmp_path), "name": "auto_cull",
        "model.n_coarse": 4, "model.n_fine": 4, "model.patch_h": 4,
        "model.patch_w": 4, "model.geo_n_downsample": 2,
        # deliberately under-sized budget: the probe must raise it
        "model.cull_empty_rays_ratio": 0.02,
        "data.image_size": 32,
    })
    model = KeypointNeRF(cfg.model)
    data = SyntheticDataset(SyntheticConfig(image_size=32, focal=40.0), length=2)
    s0 = data[0]
    vb0 = ViewBatch(**{k: jnp.asarray(v) for k, v in s0.items()
                       if k != "meta"})
    state = create_train_state(model, vb0, OptimConfig())
    scores = run_eval(cfg, model, state, data, max_samples=1,
                      auto_cull_budget=1)
    assert "psnr" in scores and np.isfinite(scores["psnr"])
