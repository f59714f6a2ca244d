"""Native C++ data-core tests: parity with cv2 + prefetcher behavior."""
import numpy as np
import pytest

from keypointnerf_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.available(), reason="native lib unavailable")


def test_undistort_identity_when_no_distortion():
    rng = np.random.default_rng(0)
    img = rng.random((32, 40, 3)).astype(np.float32)
    K = np.array([[50, 0, 20], [0, 50, 16], [0, 0, 1]], np.float32)
    out = nl.undistort(img, K, np.zeros(5))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_undistort_matches_cv2():
    import cv2

    rng = np.random.default_rng(1)
    img = rng.random((64, 64, 3)).astype(np.float32)
    K = np.array([[80, 0, 32], [0, 80, 32], [0, 0, 1]], np.float32)
    dist = np.array([-0.2, 0.05, 0.001, -0.001, 0.01], np.float32)
    ours = nl.undistort(img, K, dist)
    ref = cv2.undistort(img, K, dist)
    # interior parity; cv2's remap uses 5-bit fixed-point bilinear weights,
    # so per-pixel diffs up to ~1/32 of the local gradient are expected on
    # random noise images
    diff = np.abs(ours[8:-8, 8:-8] - ref[8:-8, 8:-8])
    assert np.median(diff) < 5e-3
    assert np.mean(diff) < 1e-2


def test_resize_area_matches_cv2():
    import cv2

    rng = np.random.default_rng(2)
    img = rng.random((64, 48, 3)).astype(np.float32)
    ours = nl.resize_area(img, 32, 24)
    ref = cv2.resize(img, (24, 32), interpolation=cv2.INTER_AREA)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resize_area_fractional_matches_cv2():
    import cv2

    rng = np.random.default_rng(3)
    img = rng.random((50, 70)).astype(np.float32)
    ours = nl.resize_area(img, 21, 33)
    ref = cv2.resize(img, (33, 21), interpolation=cv2.INTER_AREA)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_resize_nearest_matches_cv2():
    import cv2

    rng = np.random.default_rng(4)
    img = (rng.random((64, 64)) > 0.5).astype(np.float32)
    ours = nl.resize_nearest(img, 32, 32)
    ref = cv2.resize(img, (32, 32), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(ours, ref)


def test_mask_apply():
    rng = np.random.default_rng(5)
    img = rng.random((16, 16, 3)).astype(np.float32)
    mask = (rng.random((16, 16)) > 0.5).astype(np.float32) * 7.0  # nonzero = fg
    out_img, out_mask = nl.mask_apply(img.copy(), mask)
    assert out_mask.shape == (16, 16, 1)
    np.testing.assert_array_equal(out_mask[..., 0] > 0, mask > 0)
    assert np.all(out_img[mask == 0] == 0.0)
    np.testing.assert_array_equal(out_img[mask > 0], img[mask > 0])


def test_prefetcher_loads_all():
    loaded = []

    def load(i):
        return i * i

    p = nl.Prefetcher(load, n_threads=3)
    p.submit(list(range(20)))
    got = {}
    for _ in range(20):
        idx, val = p.get()
        got[idx] = val
    p.close()
    assert got == {i: i * i for i in range(20)}


def test_prefetcher_propagates_exceptions():
    def load(i):
        if i == 3:
            raise ValueError("boom")
        return i

    p = nl.Prefetcher(load, n_threads=2)
    p.submit([1, 3])
    results = dict(p.get() for _ in range(2))
    p.close()
    assert isinstance(results[3], ValueError)
    assert results[1] == 1
