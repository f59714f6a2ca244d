import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keypointnerf_tpu.geometry import (
    compose_krt,
    world_to_cam,
    cam_to_world,
    camera_center,
    project_points,
    ndc_xy,
    ndc_z,
    pixel_grid,
    camera_rays,
    ray_aabb_intersection,
    rays_at_box_mask,
    stratified_z,
    importance_z,
    union_sorted_z,
    composite,
)


def random_camera(rng, width=64, height=48, focal=80.0):
    # random rotation via QR
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    R = Q.astype(np.float32)
    t = np.array([0.1, -0.2, 3.0], np.float32)
    K = np.array([[focal, 0, width / 2], [0, focal, height / 2], [0, 0, 1]], np.float32)
    return K, R, t


class TestCameras:
    def test_world_cam_roundtrip(self, rng):
        K, R, t = random_camera(rng)
        pts = rng.standard_normal((10, 3)).astype(np.float32)
        cam = world_to_cam(jnp.asarray(pts), jnp.asarray(R), jnp.asarray(t))
        back = cam_to_world(cam, jnp.asarray(R), jnp.asarray(t))
        np.testing.assert_allclose(back, pts, atol=1e-5)

    def test_project_matches_manual(self, rng):
        K, R, t = random_camera(rng)
        pts = rng.standard_normal((10, 3)).astype(np.float32) * 0.2
        krt = compose_krt(jnp.asarray(K), jnp.asarray(R), jnp.asarray(t))
        xy, z = project_points(jnp.asarray(pts), krt)
        for i in range(10):
            v = K @ (R @ pts[i] + t)
            np.testing.assert_allclose(xy[i], v[:2] / v[2], rtol=1e-4)
            np.testing.assert_allclose(z[i, 0], v[2], rtol=1e-5)

    def test_camera_center_projects_to_zero_depth(self, rng):
        K, R, t = random_camera(rng)
        c = camera_center(jnp.asarray(R), jnp.asarray(t))
        cam = world_to_cam(c[None], jnp.asarray(R), jnp.asarray(t))
        np.testing.assert_allclose(cam, np.zeros((1, 3)), atol=1e-5)

    def test_ndc_ranges(self):
        xy = jnp.array([[0.0, 0.0], [63.0, 47.0]])
        ndc = ndc_xy(xy, 64, 48)
        np.testing.assert_allclose(ndc, [[-1, -1], [1, 1]], atol=1e-6)
        z = ndc_z(jnp.array([2.0, 3.5, 5.0]), 2.0, 5.0)
        np.testing.assert_allclose(z, [-1, 0, 1], atol=1e-6)

    def test_camera_rays_through_pixels(self, rng):
        """A point placed along the ray of pixel p must project back to p."""
        K, R, t = random_camera(rng)
        pix = pixel_grid(48, 64).astype(jnp.float32)[::37]
        o, d, near, far = camera_rays(pix, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), 2.0, 5.0)
        pts = o[None] + d * 3.0
        krt = compose_krt(jnp.asarray(K), jnp.asarray(R), jnp.asarray(t))
        xy, z = project_points(pts, krt)
        np.testing.assert_allclose(np.asarray(xy), np.asarray(pix), atol=1e-2)
        assert np.all(np.asarray(z) > 0)

    def test_near_far_scaling(self, rng):
        """near/far = z{near,far} * ||K^-1 pix_h||: point at distance `near`
        along the unit ray has camera depth exactly znear."""
        K, R, t = random_camera(rng)
        pix = jnp.array([[10.0, 20.0], [32.0, 24.0]])
        o, d, near, far = camera_rays(pix, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), 2.0, 5.0)
        pts = o[None] + d * near
        cam = world_to_cam(pts, jnp.asarray(R), jnp.asarray(t))
        np.testing.assert_allclose(cam[..., 2], 2.0, rtol=1e-5)


class TestAABB:
    def test_axis_ray_hits(self):
        bounds = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
        o = jnp.array([0.0, 0.0, -5.0])
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
        near, far, hit = ray_aabb_intersection(bounds, o, d, boffset=(0.0, 0.0))
        assert bool(hit[0, 0]) and not bool(hit[1, 0])
        np.testing.assert_allclose(near[0, 0], 4.0, atol=1e-4)
        np.testing.assert_allclose(far[0, 0], 6.0, atol=1e-4)
        # miss keeps the reference's 1.0 fill
        np.testing.assert_allclose(near[1, 0], 1.0)

    def test_unnormalized_direction(self):
        """Distances are |t| in units of the input direction vector (the
        reference's norm-ratio cancels ||dir||); callers pass unit dirs."""
        bounds = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
        o = jnp.array([0.0, 0.0, -5.0])
        d = jnp.array([[0.0, 0.0, 2.0]])
        near, far, hit = ray_aabb_intersection(bounds, o, d, boffset=(0.0, 0.0))
        np.testing.assert_allclose(near[0, 0], 2.0, atol=1e-4)
        np.testing.assert_allclose(far[0, 0], 3.0, atol=1e-4)

    def test_boffset_expands_box(self):
        bounds = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
        o = jnp.array([0.0, 0.0, -5.0])
        d = jnp.array([[0.0, 0.0, 1.0]])
        near, _, _ = ray_aabb_intersection(bounds, o, d, boffset=(-0.01, 0.01))
        np.testing.assert_allclose(near[0, 0], 3.99, atol=1e-4)

    def test_mask_at_box_counts(self, rng):
        K, R, t = random_camera(rng)
        bounds = jnp.array([[-0.3, -0.3, -0.3], [0.3, 0.3, 0.3]])
        m = rays_at_box_mask(bounds, jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), 48, 64)
        assert m.shape == (48, 64)
        assert 0 < int(m.sum()) < 48 * 64


class TestSampling:
    def test_stratified_sorted_and_bounded(self):
        key = jax.random.PRNGKey(0)
        near = jnp.full((128, 1), 2.0)
        far = jnp.full((128, 1), 5.0)
        z = stratified_z(key, near, far, 64, jitter=True)
        assert z.shape == (128, 64)
        assert np.all(np.diff(np.asarray(z), axis=-1) >= 0)
        assert np.all(np.asarray(z) >= 2.0) and np.all(np.asarray(z) <= 5.0)

    def test_stratified_uniform_eval(self):
        near = jnp.full((4, 1), 1.0)
        far = jnp.full((4, 1), 2.0)
        z = stratified_z(None, near, far, 5, jitter=False)
        np.testing.assert_allclose(z[0], [1.0, 1.25, 1.5, 1.75, 2.0], atol=1e-6)

    def test_importance_concentrates_on_peak(self):
        """With all mass in one bin, every sample must land inside it."""
        key = jax.random.PRNGKey(1)
        M = 62
        contrib = jnp.zeros((256, M)).at[:, 30].set(1.0)
        z_bins = jnp.broadcast_to(jnp.linspace(2.0, 5.0, M + 1), (256, M + 1))
        z = importance_z(key, contrib, z_bins, 64, uniform=False)
        lo, hi = float(z_bins[0, 30]), float(z_bins[0, 31])
        frac_inside = np.mean((np.asarray(z) >= lo - 1e-3) & (np.asarray(z) <= hi + 1e-3))
        assert frac_inside > 0.98  # 1e-5 floor leaks a tiny bit of mass

    def test_importance_uniform_matches_cdf(self):
        contrib = jnp.ones((1, 4))
        z_bins = jnp.array([[0.0, 1.0, 2.0, 3.0, 4.0]])
        z = importance_z(None, contrib, z_bins, 5, uniform=True)
        np.testing.assert_allclose(z[0], [0.0, 1.0, 2.0, 3.0, 4.0], atol=1e-4)

    def test_union_sorted(self):
        a = jnp.array([[1.0, 3.0]])
        b = jnp.array([[2.0, 0.5]])
        np.testing.assert_allclose(union_sorted_z(a, b)[0], [0.5, 1.0, 2.0, 3.0])

    def test_merge_sorted_payloads_matches_stable_sort(self):
        """The comparison-count merge must reproduce lax.sort's stable
        payload sort bitwise, including ties across and within inputs."""
        from keypointnerf_tpu.geometry import merge_sorted_payloads

        rng = np.random.default_rng(7)
        R, Sa, Sb, C = 16, 9, 6, 5
        # quantized values force plenty of exact ties
        z_a = np.sort(rng.integers(0, 8, (R, Sa)).astype(np.float32), axis=-1)
        z_b = np.sort(rng.integers(0, 8, (R, Sb)).astype(np.float32), axis=-1)
        v_a = rng.normal(size=(R, Sa, C)).astype(np.float32)
        v_b = rng.normal(size=(R, Sb, C)).astype(np.float32)

        z, v = merge_sorted_payloads(
            jnp.asarray(z_a), jnp.asarray(z_b), jnp.asarray(v_a), jnp.asarray(v_b)
        )
        z_cat = jnp.concatenate([jnp.asarray(z_a), jnp.asarray(z_b)], -1)
        v_cat = np.concatenate([v_a, v_b], axis=1)
        ref = jax.lax.sort(
            (z_cat,) + tuple(jnp.asarray(v_cat[..., c]) for c in range(C)),
            dimension=-1,
            num_keys=1,
        )
        np.testing.assert_array_equal(np.asarray(z), np.asarray(ref[0]))
        for c in range(C):
            np.testing.assert_array_equal(
                np.asarray(v[..., c]), np.asarray(ref[1 + c])
            )

    def test_merge_sorted_payloads_preserves_bf16_bitwise(self):
        """bf16 payloads with f32 keys must merge bitwise (the one-hot
        contraction is exact in any dtype: 1.0*x plus zeros)."""
        from keypointnerf_tpu.geometry import merge_sorted_payloads

        rng = np.random.default_rng(3)
        R, Sa, Sb, C = 8, 7, 5, 4
        z_a = jnp.asarray(np.sort(rng.normal(size=(R, Sa)), -1), jnp.float32)
        z_b = jnp.asarray(np.sort(rng.normal(size=(R, Sb)), -1), jnp.float32)
        v_a = jnp.asarray(rng.normal(size=(R, Sa, C)), jnp.bfloat16)
        v_b = jnp.asarray(rng.normal(size=(R, Sb, C)), jnp.bfloat16)

        z, v = merge_sorted_payloads(z_a, z_b, v_a, v_b)
        assert z.dtype == jnp.float32 and v.dtype == jnp.bfloat16
        ref = jax.lax.sort(
            (jnp.concatenate([z_a, z_b], -1),)
            + tuple(
                jnp.concatenate([v_a[..., c], v_b[..., c]], -1) for c in range(C)
            ),
            dimension=-1,
            num_keys=1,
        )
        np.testing.assert_array_equal(np.asarray(z), np.asarray(ref[0]))
        for c in range(C):
            np.testing.assert_array_equal(
                np.asarray(v[..., c].astype(jnp.float32)),
                np.asarray(ref[1 + c].astype(jnp.float32)),
            )


class TestCompositing:
    def test_single_opaque_slab(self):
        """One fully opaque sample -> its color and depth, acc ~ 1."""
        z = jnp.array([[1.0, 2.0, 3.0]])
        alpha = jnp.array([[0.0, 1e9, 0.0]])
        rgb = jnp.zeros((1, 3, 3)).at[0, 1].set(jnp.array([0.2, 0.4, 0.6]))
        sdf = jnp.array([[0.0, 7.0, 0.0]])
        out = composite(alpha, sdf, rgb, z)
        np.testing.assert_allclose(out.color[0], [0.2, 0.4, 0.6], atol=1e-5)
        np.testing.assert_allclose(out.depth[0], 2.0, atol=1e-4)
        np.testing.assert_allclose(out.acc[0], 1.0, atol=1e-5)
        np.testing.assert_allclose(out.sdf[0], 7.0, atol=1e-4)

    def test_transmittance_closed_form(self):
        """Constant density sigma over [0, L]: acc = 1 - exp(-sigma*L)."""
        n = 512
        z = jnp.linspace(0.0, 4.0, n)[None]
        sigma = 0.7
        alpha = jnp.full((1, n), sigma)
        rgb = jnp.ones((1, n, 3))
        out = composite(alpha, jnp.zeros((1, n)), rgb, z)
        # the 1e10 tail interval makes the last sample absorb all residual light
        np.testing.assert_allclose(out.acc[0], 1.0, atol=1e-5)
        # drop the tail: transmittance after the slab
        inner = np.asarray(out.contrib[0, :-1]).sum()
        np.testing.assert_allclose(inner, 1 - np.exp(-sigma * 4.0), atol=1e-2)

    def test_empty_space(self):
        z = jnp.linspace(1.0, 2.0, 8)[None]
        out = composite(jnp.zeros((1, 8)), jnp.zeros((1, 8)), jnp.ones((1, 8, 3)), z)
        np.testing.assert_allclose(out.acc[0], 0.0, atol=1e-6)
        np.testing.assert_allclose(out.color[0], 0.0, atol=1e-6)
