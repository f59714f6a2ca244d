"""train_icon.py CLI smoke: blob-scene generator invariants + a tiny
end-to-end run (train -> grid -> mesh -> Chamfer/P2S -> artifacts)."""
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from train_icon import blob_occupancy, blob_surface_points, make_blob_scene


def test_blob_scene_consistency():
    sc = make_blob_scene(3, size=32)
    assert sc["image"].shape == (32, 32, 3)
    # surface samples must be occupied-boundary: tiny inward offset is
    # inside, tiny outward offset is outside (per nearest sphere)
    surf = blob_surface_points(sc["centers"], sc["radii"], n=500)
    occ = blob_occupancy(surf, sc["centers"], sc["radii"])
    # on-surface points sit at d=0; jitter inward along the nearest center
    d = np.stack([np.linalg.norm(surf - c, axis=-1) for c in sc["centers"]])
    k = d.argmin(0)
    centers = np.asarray(sc["centers"])[k]
    inward = surf + 0.05 * (centers - surf)
    assert blob_occupancy(inward, sc["centers"], sc["radii"]).mean() > 0.95
    outward = surf + 0.2 * (surf - centers)
    assert blob_occupancy(outward, sc["centers"], sc["radii"]).mean() < 0.05
    # the target mask in the image should be non-trivial
    assert 0.01 < (sc["image"].sum(-1) > 0).mean() < 0.9


def test_cli_end_to_end(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_test_cache")
    out = tmp_path / "icon"
    r = subprocess.run(
        [sys.executable, "train_icon.py", "--out_dir", str(out),
         "--steps", "5", "--n_scenes", "2", "--eval_scenes", "1",
         "--resolution", "16", "--image_size", "32"],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads((out / "icon_metrics.json").read_text())
    assert np.isfinite(metrics["mean"]["chamfer"])
    assert (out / "eval_0.obj").exists()
