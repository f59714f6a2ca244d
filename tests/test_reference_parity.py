"""CI dry-run of the turnkey reference-parity drill (VERDICT r3 missing 1).

No real ZJU-MoCap data / reference checkpoint / VGG19 weights exist in
this environment, so this test fabricates all three at tiny scale — a
3-human ZJU tree with the reference's real test-split layout (21 cameras,
input views [0,7,15], target cams [3,5,10,12,18,20]), a reference-layout
Lightning .ckpt built from the torch twin modules, and a random
torchvision-layout vgg19 .pth — and drives scripts/reference_parity.py
END TO END through them. The day the real assets appear, parity is the
one documented command, with every pipe already exercised.
"""
import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from keypointnerf_tpu.data.synthetic import look_at, render_sphere  # noqa: E402
from keypointnerf_tpu.data.zju import (  # noqa: E402
    SAMPLE_CAM_DEFAULT,
    TEST_INPUT_VIEWS,
)


@pytest.fixture(scope="module")
def parity_assets(tmp_path_factory):
    import imageio.v2 as imageio

    from tests.test_import_torch import (
        THGFilter,
        TIBRHead,
        TMLPUNet,
        TResBlkEncoder,
    )

    root = tmp_path_factory.mktemp("parity")
    zju = root / "zju_mocap"

    # ---- fabricated ZJU test tree: the real split table's humans, the
    # real 21-camera layout; images only where the drill will read them
    # (input views + target cams, frame 0) — every other index loads None
    # and run_eval's None-skip covers it, exactly as with real data gaps
    n_cams, size, f = 21, 64, 80.0
    K = np.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1]], np.float64)
    needed_cams = sorted(set(TEST_INPUT_VIEWS) | set(SAMPLE_CAM_DEFAULT))
    cam_params = []
    Ks, Ds, Rs, Ts = [], [], [], []
    for ci in range(n_cams):
        ang = 2 * np.pi * ci / n_cams
        eye = 3.0 * np.array([np.cos(ang), 0.1, np.sin(ang)])
        R, t = look_at(eye, np.zeros(3))
        cam_params.append((R, t))
        Ks.append(K)
        Ds.append(np.zeros(5))
        Rs.append(R.astype(np.float64))
        Ts.append((t.astype(np.float64) * 1000.0).reshape(3, 1))  # mm

    rng = np.random.default_rng(0)
    for human in ("CoreView_387", "CoreView_393", "CoreView_394"):
        entry = {"ims": []}
        for ci in range(n_cams):
            cam_dir = f"Camera_B{ci + 1}"
            fn = f"{0:06d}.jpg"
            entry["ims"].append(f"{cam_dir}/{fn}")
            if ci not in needed_cams or human != "CoreView_387":
                continue  # missing file -> sample loads as None
            R, t = cam_params[ci]
            img, msk, _ = render_sphere(K, R, t, size, 0.5, np.zeros(3))
            os.makedirs(zju / human / cam_dir, exist_ok=True)
            os.makedirs(zju / human / "mask" / cam_dir, exist_ok=True)
            imageio.imwrite(zju / human / cam_dir / fn,
                            (img * 255).astype(np.uint8))
            imageio.imwrite(zju / human / "mask" / cam_dir / f"{0:06d}.png",
                            (msk[..., 0] * 255).astype(np.uint8))
        annots = {"cams": {"K": Ks, "D": Ds, "R": Rs, "T": Ts},
                  "ims": [entry] * 900}  # covers ni up to 859
        os.makedirs(zju / human, exist_ok=True)
        np.save(zju / human / "annots.npy", annots, allow_pickle=True)
        os.makedirs(zju / human / "joints3d", exist_ok=True)
        os.makedirs(zju / human / "vertices", exist_ok=True)
        kpt = (0.3 * rng.standard_normal((24, 3))).clip(-0.45, 0.45)
        np.save(zju / human / "joints3d" / "0.npy", kpt.astype(np.float32))
        pts = rng.standard_normal((100, 3))
        pts = 0.5 * pts / np.linalg.norm(pts, axis=-1, keepdims=True)
        np.save(zju / human / "vertices" / "0.npy", pts.astype(np.float32))

    # ---- fabricated reference checkpoint (Lightning layout, torch twins
    # with the reference's exact state-dict keys)
    torch.manual_seed(3)
    hg = THGFilter(n_downsample=2)
    tex = TResBlkEncoder(out_ch=8, ngf=64, n_down=3, n_blocks=4, n_up=2)
    mlp1 = TMLPUNet((168, 128, 128, 120, 64), (64, 8), (0, 2))
    mlp2 = TMLPUNet((128, 64, 64, 2), (), ())
    ibr = TIBRHead()
    import torch.nn as tnn

    gc = tnn.Linear(128, 24)
    sd = {}
    for mod, name in ((hg, "geo_encoder"), (tex, "tex_encoder"),
                      (ibr, "mlp_tex")):
        for k, v in mod.state_dict().items():
            sd[f"model.{name}.{k}"] = v
    for k, v in mlp1.state_dict().items():
        sd[f"model.mlp_geo.layers1.{k}"] = v
    for k, v in mlp2.state_dict().items():
        sd[f"model.mlp_geo.layers2.{k}"] = v
    for k, v in gc.state_dict().items():
        sd[f"model.ibr_compress_gfeat.{k}"] = v
    ckpt_path = str(root / "last.ckpt")
    torch.save({"state_dict": sd, "epoch": 3, "global_step": 12345}, ckpt_path)

    # ---- fabricated torchvision-layout vgg19 .pth (random weights, real
    # shapes built by hand — load_torch_vgg19 validates the layout, not
    # the values; torchvision itself is not needed)
    widths = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    vgg_sd, i, cin = {}, 0, 3
    for w in widths:
        if w == "M":
            i += 1  # pool layer
            continue
        vgg_sd[f"features.{i}.weight"] = torch.randn(w, cin, 3, 3) * 0.01
        vgg_sd[f"features.{i}.bias"] = torch.zeros(w)
        cin = w
        i += 2  # conv + relu
    vgg_path = str(root / "vgg19.pth")
    torch.save(vgg_sd, vgg_path)

    # ---- tiny experiment config (default architecture at reduced march)
    cfg = {
        "name": "parity_dryrun",
        "model": {"n_coarse": 4, "n_fine": 4, "patch_h": 4, "patch_w": 4,
                  "geo_n_downsample": 2},
        "data": {"dataset": "zju", "data_root": str(zju),
                 "n_source_views": 3},
    }
    cfg_path = str(root / "tiny.json")
    with open(cfg_path, "w") as fh:
        json.dump(cfg, fh)
    return str(zju), ckpt_path, vgg_path, cfg_path, str(root)


@pytest.mark.slow
def test_parity_drill_end_to_end(parity_assets):
    zju, ckpt, vgg, cfg_path, root = parity_assets
    import reference_parity

    out = os.path.join(root, "out")
    result = reference_parity.main([
        "--zju", zju, "--ckpt", ckpt, "--vgg", vgg,
        "--config", cfg_path, "--out", out, "--max_samples", "2",
    ])
    # the chain produced a real score against the fabricated GT: finite,
    # recorded, comparable (a random-weights model on a sphere scene —
    # the VALUE is meaningless; the PLUMBING is what this pins)
    assert np.isfinite(result["psnr"]), result
    assert 0.0 <= result["ssim"] <= 1.0, result
    saved = json.load(open(os.path.join(out, "parity.json")))
    assert saved["reference_psnr"] == 25.86
    assert saved["n_samples"] == 2


@pytest.mark.slow
def test_parity_drill_fast_preset(parity_assets):
    """The fast preset path (the benched inference configuration) must run
    the same drill, including the empty-cull runtime guard."""
    zju, ckpt, vgg, cfg_path, root = parity_assets
    import reference_parity

    out = os.path.join(root, "out_fast")
    result = reference_parity.main([
        "--zju", zju, "--ckpt", ckpt, "--config", cfg_path,
        "--out", out, "--max_samples", "1", "--preset", "fast",
    ])
    assert np.isfinite(result["psnr"]), result
