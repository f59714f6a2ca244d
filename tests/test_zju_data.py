"""ZJU loader tests against a generated on-disk fixture tree."""
import os

import numpy as np
import pytest

from keypointnerf_tpu.data import ZJUDataset, ZJUTestDataset, get_human_split
from keypointnerf_tpu.data.synthetic import look_at, render_sphere


@pytest.fixture(scope="module")
def zju_tree(tmp_path_factory):
    """Build a minimal fake ZJU-MoCap tree: 1 train subject with 4 cameras,
    2 frames, images+masks+annots+joints3d+vertices."""
    import imageio.v2 as imageio

    root = tmp_path_factory.mktemp("zju")
    human = "CoreView_377"
    n_cams, size = 4, 64
    f = 80.0
    K = np.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1]], np.float64)
    D = np.zeros(5)

    Ks, Ds, Rs, Ts, ims_list = [], [], [], [], []
    frames = [0, 30]
    cam_params = []
    for ci in range(n_cams):
        ang = 2 * np.pi * ci / n_cams
        eye = 3.0 * np.array([np.cos(ang), 0.1, np.sin(ang)])
        R, t = look_at(eye, np.zeros(3))
        cam_params.append((R, t))
        Ks.append(K)
        Ds.append(D)
        Rs.append(R.astype(np.float64))
        Ts.append((t.astype(np.float64) * 1000.0).reshape(3, 1))  # mm, as in ZJU

    for fi in frames:
        entry = {"ims": []}
        for ci in range(n_cams):
            R, t = cam_params[ci]
            img, msk, _ = render_sphere(K, R, t, size, 0.5, np.zeros(3))
            cam_dir = f"Camera_B{ci + 1}"
            os.makedirs(root / human / cam_dir, exist_ok=True)
            os.makedirs(root / human / "mask" / cam_dir, exist_ok=True)
            fn = f"{fi:06d}.jpg"
            imageio.imwrite(root / human / cam_dir / fn, (img * 255).astype(np.uint8))
            imageio.imwrite(
                root / human / "mask" / cam_dir / f"{fi:06d}.png",
                (msk[..., 0] * 255).astype(np.uint8),
            )
            entry["ims"].append(f"{cam_dir}/{fn}")
        ims_list.append(entry)

    # pad ims to cover begin_i..ni range sampling (train uses i_intv=30, ni=300)
    annots = {"cams": {"K": Ks, "D": Ds, "R": Rs, "T": Ts}, "ims": ims_list * 150}
    np.save(root / human / "annots.npy", annots, allow_pickle=True)

    os.makedirs(root / human / "joints3d")
    os.makedirs(root / human / "vertices")
    rng = np.random.default_rng(0)
    for fi in range(1000):
        kpt = (0.3 * rng.standard_normal((24, 3))).clip(-0.45, 0.45).astype(np.float32)
        np.save(root / human / "joints3d" / f"{fi}.npy", kpt)
        sphere_pts = rng.standard_normal((100, 3))
        sphere_pts = 0.5 * sphere_pts / np.linalg.norm(sphere_pts, axis=-1, keepdims=True)
        np.save(root / human / "vertices" / f"{fi}.npy", sphere_pts.astype(np.float32))
    return str(root), human


def _single_human_split(monkeypatch, human):
    import keypointnerf_tpu.data.zju as zju_mod

    full = get_human_split("train")
    monkeypatch.setattr(
        zju_mod, "get_human_split", lambda split: {human: full["CoreView_377"]}
    )


def test_train_sample_shapes(zju_tree, monkeypatch):
    root, human = zju_tree
    _single_human_split(monkeypatch, human)
    ds = ZJUDataset(root, "train", seed=0)
    assert len(ds) > 0
    s = ds[0]
    assert s is not None
    V = s["src_images"].shape[0]
    assert V == 3
    assert s["src_images"].shape == (3, 32, 32, 3)  # 64 * ratio 0.5
    assert s["src_masks"].shape == (3, 32, 32, 1)
    assert s["tar_image"].shape == (32, 32, 3)
    assert s["kpt3d"].shape == (24, 3)
    assert s["bounds"].shape == (2, 3)
    # intrinsics scaled by ratio
    assert np.isclose(s["tar_K"][0, 0], 40.0 * 0.5 * 2)  # f=80 * 0.5
    # target view disjoint from sources: checked via meta
    assert s["meta"]["tar_cam_id"] not in range(0)  # placeholder: meta present
    # foreground-masked images are black outside the mask
    outside = s["src_images"][0][s["src_masks"][0][..., 0] == 0]
    assert np.all(outside == 0.0)


def test_mask_at_box_covers_sphere(zju_tree, monkeypatch):
    root, human = zju_tree
    _single_human_split(monkeypatch, human)
    ds = ZJUDataset(root, "train", seed=0)
    s = ds[0]
    mab = s["meta"]["mask_at_box"]
    tm = s["tar_mask"][..., 0] > 0
    # every foreground pixel must be inside the AABB projection
    assert (mab & tm).sum() >= 0.98 * tm.sum()


def test_missing_files_return_none(zju_tree, monkeypatch):
    root, human = zju_tree
    _single_human_split(monkeypatch, human)
    ds = ZJUDataset(root, "train", seed=0)
    ds.ims[0] = os.path.join(root, human, "Camera_B1", "999999.jpg")
    assert ds[0] is None


def test_feeds_model_viewbatch(zju_tree, monkeypatch):
    import jax
    import jax.numpy as jnp

    from keypointnerf_tpu.models import ViewBatch

    root, human = zju_tree
    _single_human_split(monkeypatch, human)
    ds = ZJUDataset(root, "train", seed=0)
    s = ds[0]
    s.pop("meta")
    vb = ViewBatch(**jax.tree.map(jnp.asarray, s))
    assert vb.src_images.shape[0] == 3


def test_native_loader_path_matches_cv2(zju_tree, monkeypatch):
    """ZJU view loading via the native C++ core vs the cv2 fallback."""
    from keypointnerf_tpu.data import native_loader as nl

    if not nl.available():
        pytest.skip("native lib unavailable")
    root, human = zju_tree
    _single_human_split(monkeypatch, human)
    ds = ZJUDataset(root, "train", seed=0)
    s_native = ds[0]

    monkeypatch.setattr(nl, "available", lambda: False)
    ds2 = ZJUDataset(root, "train", seed=0)
    s_cv2 = ds2[0]

    assert s_native is not None and s_cv2 is not None
    np.testing.assert_allclose(
        s_native["src_images"], s_cv2["src_images"], atol=0.02
    )
    np.testing.assert_array_equal(s_native["src_masks"], s_cv2["src_masks"])
    np.testing.assert_allclose(s_native["tar_image"], s_cv2["tar_image"], atol=0.02)


def test_trainer_feeds_zju_samples(zju_tree, monkeypatch, tmp_path):
    """End-to-end: the train loop consumes ZJU samples (meta stripped) with
    the native prefetcher, runs one step and validates."""
    import dataclasses

    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig
    from keypointnerf_tpu.training.loop import Trainer
    from keypointnerf_tpu.utils import load_config

    root, human = zju_tree
    _single_human_split(monkeypatch, human)
    ds = ZJUDataset(root, "train", seed=0)

    cfg = load_config(None, overrides={
        "out_dir": str(tmp_path), "max_epochs": 1, "val_every_steps": 10**9,
        "ckpt_every_steps": 10**9, "log_every_steps": 1,
        "model.n_coarse": 4, "model.n_fine": 4, "model.patch_h": 4,
        "model.patch_w": 4, "model.geo_n_downsample": 2,
        "loss.lambda_vgg": 0.0, "data.num_workers": 2,
    })
    model = KeypointNeRF(cfg.model)
    trainer = Trainer(cfg, model, ds, val_data=None)
    state = trainer.fit(max_steps=1)
    assert int(state.step) == 1


def test_view_sampling_deterministic_and_epoch_varied(zju_tree, monkeypatch):
    """Train-split view selection must be a pure function of
    (seed, epoch, index) — independent of call order (the prefetcher calls
    __getitem__ from threads) — and must vary across epochs."""
    root, human = zju_tree
    _single_human_split(monkeypatch, human)
    ds_a = ZJUDataset(root, "train", seed=5)
    ds_b = ZJUDataset(root, "train", seed=5)

    # different access ORDER, same per-index results
    picks_a = [ds_a[i] for i in range(len(ds_a))]
    picks_b = [ds_b[i] for i in reversed(range(len(ds_b)))][::-1]
    for a, b in zip(picks_a, picks_b):
        if a is None or b is None:
            assert a is b
            continue
        np.testing.assert_array_equal(a["tar_K"], b["tar_K"])
        np.testing.assert_array_equal(a["src_K"], b["src_K"])
        np.testing.assert_array_equal(a["tar_R"], b["tar_R"])

    # epochs change the draw (over all indices, at least one differs)
    ds_a.set_epoch(1)
    picks_e1 = [ds_a[i] for i in range(len(ds_a))]
    assert any(
        not np.array_equal(a["tar_R"], c["tar_R"])
        for a, c in zip(picks_a, picks_e1)
        if a is not None and c is not None
    )
