"""KeypointICON single-image reconstruction tests on the synthetic sphere."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from keypointnerf_tpu.data import SyntheticConfig, make_sample
from keypointnerf_tpu.models.keypoint_icon import (
    KeypointICON,
    KeypointICONConfig,
    bce_occupancy_loss,
    chamfer_distance,
    occupancy_grid,
    point_to_surface,
    surface_points_from_grid,
)

RADIUS = 0.5
CFG = KeypointICONConfig(geo_n_downsample=2, mlp_hidden=(128, 128, 128))


def sphere_occ(pts):
    return (np.linalg.norm(pts, axis=-1) < RADIUS).astype(np.float32)


@pytest.fixture(scope="module")
def sample():
    return make_sample(SyntheticConfig(image_size=64), seed=0)


def test_forward_shapes(sample):
    model = KeypointICON(CFG)
    pts = jnp.zeros((256, 3))
    params = model.init(
        jax.random.key(0),
        jnp.asarray(sample["tar_image"]), pts,
        jnp.asarray(sample["tar_K"]), jnp.asarray(sample["tar_R"]),
        jnp.asarray(sample["tar_t"]), jnp.asarray(sample["kpt3d"]),
    )
    logits = model.apply(
        params, jnp.asarray(sample["tar_image"]), pts,
        jnp.asarray(sample["tar_K"]), jnp.asarray(sample["tar_R"]),
        jnp.asarray(sample["tar_t"]), jnp.asarray(sample["kpt3d"]),
    )
    assert logits.shape == (256, 1)
    assert np.all(np.isfinite(logits))


def test_metrics_functions():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((500, 3)).astype(np.float32)
    # self-distance: limited by float32 cancellation in the |a|^2-2ab+|b|^2
    # expansion (~1e-5 in d^2 -> ~3e-3 in d)
    assert chamfer_distance(a, a) < 1e-2
    b = a + np.array([0.1, 0.0, 0.0], np.float32)
    # every point's NN is at most 0.1 away
    assert 0.0 < chamfer_distance(a, b) <= 0.1 + 1e-2
    assert point_to_surface(a, b) <= 0.1 + 1e-2


def test_surface_extraction_sphere_analytic():
    res = 48
    axes = [np.linspace(-0.8, 0.8, res, dtype=np.float32)] * 3
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    occ = (np.sqrt(gx**2 + gy**2 + gz**2) < RADIUS).astype(np.float32)
    pts = surface_points_from_grid(occ, axes)
    assert len(pts) > 100
    r = np.linalg.norm(pts, axis=-1)
    # extracted surface should hug the sphere radius within a voxel
    voxel = 1.6 / (res - 1)
    assert np.all(np.abs(r - RADIUS) < voxel * 1.5)


@pytest.mark.slow
def test_overfit_sphere_and_reconstruct(sample):
    """Train occupancy on GT sphere labels for one image; Chamfer of the
    reconstruction should approach the grid resolution."""
    model = KeypointICON(CFG)
    image = jnp.asarray(sample["tar_image"])
    K, R, t = (jnp.asarray(sample[k]) for k in ("tar_K", "tar_R", "tar_t"))
    kpt = jnp.asarray(sample["kpt3d"])

    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.key(0), image, jnp.zeros((512, 3)), K, R, t, kpt
    )
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, pts, labels):
        def loss_fn(p):
            logits = model.apply(p, image, pts, K, R, t, kpt)
            return bce_occupancy_loss(logits[..., 0], labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(300):
        # importance-sample near the surface + uniform points
        near = (rng.standard_normal((256, 3)) * 0.6).astype(np.float32)
        near = near / np.linalg.norm(near, axis=-1, keepdims=True)
        near = near * (RADIUS + rng.normal(0, 0.08, (256, 1))).astype(np.float32)
        unif = rng.uniform(-0.8, 0.8, (256, 3)).astype(np.float32)
        pts = np.concatenate([near, unif])
        labels = sphere_occ(pts)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(pts), jnp.asarray(labels))
        losses.append(float(loss))
    assert losses[-1] < 0.25 * losses[0], losses[::50]

    occ, axes = occupancy_grid(
        model, params, image, K, R, t, kpt,
        np.array([[-0.8, -0.8, -0.8], [0.8, 0.8, 0.8]], np.float32),
        resolution=48, chunk=4096,
    )
    pred_pts = surface_points_from_grid(occ, axes)
    assert len(pred_pts) > 50

    gt = rng.standard_normal((2000, 3)).astype(np.float32)
    gt = RADIUS * gt / np.linalg.norm(gt, axis=-1, keepdims=True)
    cd = chamfer_distance(pred_pts, gt)
    # within ~2 voxels of the analytic sphere
    assert cd < 0.1, cd


def test_marching_tetrahedra_sphere():
    """Mesh of an analytic sphere: vertices on the radius, enough faces,
    OBJ export round-trips."""
    from keypointnerf_tpu.evaluation.meshing import extract_mesh, marching_tetrahedra

    res = 40
    axes = [np.linspace(-0.8, 0.8, res, dtype=np.float32)] * 3
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    # smooth occupancy so the linear edge interpolation lands on the radius
    d = np.sqrt(gx**2 + gy**2 + gz**2)
    occ = np.clip(0.5 + (RADIUS - d) * 10.0, 0.0, 1.0)

    verts, faces = marching_tetrahedra(occ, axes, iso=0.5)
    assert len(verts) > 500
    assert faces.shape[1] == 3
    r = np.linalg.norm(verts, axis=-1)
    assert np.abs(r - RADIUS).max() < 0.03
    # total surface area within 15% of the analytic sphere
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1).sum()
    assert abs(area - 4 * np.pi * RADIUS**2) / (4 * np.pi * RADIUS**2) < 0.15


def test_mesh_obj_export(tmp_path):
    from keypointnerf_tpu.evaluation.meshing import extract_mesh

    res = 24
    axes = [np.linspace(-0.8, 0.8, res, dtype=np.float32)] * 3
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    occ = (np.sqrt(gx**2 + gy**2 + gz**2) < RADIUS).astype(np.float32)
    path = str(tmp_path / "sphere.obj")
    verts, faces = extract_mesh(occ, axes, path=path)
    lines = open(path).read().splitlines()
    n_v = sum(1 for l in lines if l.startswith("v "))
    n_f = sum(1 for l in lines if l.startswith("f "))
    assert n_v == len(verts) and n_f == len(faces)
