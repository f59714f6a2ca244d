"""Orbit-camera path + orbit rendering tests (ffmpeg absent in CI: the
video-assembly step is exercised for its graceful-failure path only)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keypointnerf_tpu.data import SyntheticConfig, make_sample
from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
from keypointnerf_tpu.render.video import (
    _rodrigues,
    orbit_cameras,
    render_orbit,
    write_video,
    zju_orbit_schedule,
)


def test_rodrigues_matches_known_rotations():
    # pi about x: diag(1, -1, -1)
    R = _rodrigues(np.array([np.pi, 0, 0]))
    np.testing.assert_allclose(R, np.diag([1.0, -1.0, -1.0]), atol=1e-12)
    # zero vector -> identity
    np.testing.assert_allclose(_rodrigues(np.zeros(3)), np.eye(3), atol=1e-15)
    # rotation matrices are orthonormal with det 1
    R = _rodrigues(np.array([0.3, -1.2, 0.7]))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)


def test_orbit_cameras_full_circle():
    headpose = np.eye(4, dtype=np.float32)
    headpose[:3, 3] = [0.1, 0.2, 0.3]
    sched = zju_orbit_schedule(64, 64)
    cams = orbit_cameras(headpose, sched["focal"], sched["trans"], 64, 64, n_frames=8)
    assert len(cams) == 8
    centers = []
    for K, R, t in cams:
        assert K.shape == (3, 3) and R.shape == (3, 3) and t.shape == (3,)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        centers.append(-R.T @ t)
    centers = np.stack(centers)
    # all cameras equidistant from the pelvis (orbit), radius = trans
    d = np.linalg.norm(centers - headpose[:3, 3], axis=-1)
    np.testing.assert_allclose(d, sched["trans"], rtol=1e-5)
    # distinct positions around the circle
    assert np.linalg.norm(centers[0] - centers[4]) > sched["trans"]


def test_write_video_graceful_without_ffmpeg(tmp_path):
    ok = write_video(str(tmp_path), str(tmp_path / "out.mp4"))
    assert ok in (True, False)  # no crash; False when ffmpeg missing


@pytest.mark.slow
def test_render_orbit_writes_frames(tmp_path):
    cfg = KeypointNeRFConfig(n_coarse=4, n_fine=4, patch_h=4, patch_w=4, geo_n_downsample=2)
    model = KeypointNeRF(cfg)
    sample = make_sample(SyntheticConfig(image_size=32, focal=40.0), seed=0)
    vb = ViewBatch(**jax.tree.map(jnp.asarray, sample))
    params = model.init(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )
    headpose = np.eye(4, dtype=np.float32)
    out_dir = str(tmp_path / "orbit")
    written = render_orbit(
        model, params, vb, headpose, out_dir, n_frames=4, im_size=32,
        stride=2, frame_indices=[0, 2], make_video=False,
    )
    assert len(written) == 2
    for p in written:
        assert os.path.exists(p)
    import imageio.v2 as imageio

    img = imageio.imread(written[0])
    assert img.shape == (16, 16, 3)  # 32 / stride 2


def test_render_orbit_with_empty_cull(tmp_path):
    """The orbit path (render_dynamic's engine) under the empty-ray cull —
    the zju_fast serve preset now ships cull_empty_rays_ratio=0.25, so the
    scanned-camera renderer must score/cull per frame inside lax.scan."""
    cfg = KeypointNeRFConfig(
        n_coarse=4, n_fine=4, patch_h=4, patch_w=4, geo_n_downsample=2,
        cull_empty_rays_ratio=0.6,
    )
    model = KeypointNeRF(cfg)
    sample = make_sample(SyntheticConfig(image_size=32, focal=40.0), seed=0)
    vb = ViewBatch(**jax.tree.map(jnp.asarray, sample))
    params = model.init(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )
    headpose = np.eye(4, dtype=np.float32)
    written = render_orbit(
        model, params, vb, headpose, str(tmp_path / "orbit_cull"),
        n_frames=2, im_size=32, stride=2, frame_indices=[0], make_video=False,
    )
    assert len(written) == 1 and os.path.exists(written[0])


def test_render_orbit_auto_cull_budget(tmp_path, capsys):
    """auto_cull_budget probes orbit cameras and RAISES an under-sized
    cull budget before rendering (run_eval semantics; VERDICT/ROADMAP
    round-5 gap: the orbit path previously used the config budget
    verbatim). A deliberately tiny budget must be raised — and the
    rendered frame must bit-match the uncull render (the cull stays
    exact at the raised budget)."""
    import dataclasses

    cfg = KeypointNeRFConfig(
        n_coarse=4, n_fine=4, patch_h=4, patch_w=4, geo_n_downsample=2,
        cull_empty_rays_ratio=1 / 64,  # far below any subject's hull
    )
    model = KeypointNeRF(cfg)
    # 64^2: the dilated hull is a FRACTION of the frame (the 32^2 toy
    # scale saturates to 1.0, which would trivially take the march-all
    # branch) — the raised budget must exercise the real packed-cull path
    sample = make_sample(SyntheticConfig(image_size=64, focal=80.0), seed=0)
    vb = ViewBatch(**jax.tree.map(jnp.asarray, sample))
    params = model.init(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )
    headpose = np.eye(4, dtype=np.float32)
    written = render_orbit(
        model, params, vb, headpose, str(tmp_path / "auto"),
        n_frames=2, im_size=64, stride=2, frame_indices=[0],
        make_video=False, auto_cull_budget=2,
    )
    out = capsys.readouterr().out
    assert "raising cull budget" in out
    assert "cull budget exceeded" not in out  # raised budget covers hull
    raised = float(out.split("-> ")[1].split(" ")[0])
    assert raised < 1.0, f"hull saturated ({out!r}); shrink the subject"
    uncull = KeypointNeRF(dataclasses.replace(cfg, cull_empty_rays_ratio=1.0))
    ref = render_orbit(
        uncull, params, vb, headpose, str(tmp_path / "uncull"),
        n_frames=2, im_size=64, stride=2, frame_indices=[0],
        make_video=False,
    )
    import imageio.v2 as imageio

    np.testing.assert_array_equal(
        imageio.imread(written[0]), imageio.imread(ref[0])
    )


def test_arc_indices():
    from keypointnerf_tpu.render.video import arc_indices

    assert arc_indices(8, "full") == list(range(8))
    back = arc_indices(8, "back")
    assert back == [2, 3, 4, 5]
    front = arc_indices(90, "front")
    assert front == list(range(80, 90)) + list(range(10))
