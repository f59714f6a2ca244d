"""ZJU evaluation driver with the reference's exact protocol.

Mirrors ZJUEvaluator (reference src/zju_evaluator.py:11-69): full-image
PSNR, SSIM on the mask_at_box bounding-rect crop, and the side-effect of
dumping pred/gt/input PNG trees under `images_v3/{human}/{pred,gt,input}`
so the offline `eval_zju`-style CLI can re-score saved images.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from .metrics import bounding_rect, psnr, structural_similarity


def _write_png(path: str, img01: np.ndarray):
    import imageio.v2 as imageio

    imageio.imwrite(path, (np.clip(img01, 0.0, 1.0) * 255).astype(np.uint8))


class Evaluator:
    def __init__(self, result_dir: Optional[str] = None):
        self.result_dir = result_dir

    def compute_score(
        self,
        rgb_pred: np.ndarray,     # (H, W, 3) in [0, 1]
        rgb_gt: np.ndarray,       # (H, W, 3) in [0, 1]
        mask_at_box: np.ndarray,  # (H, W) bool/0-1
        input_imgs: Optional[np.ndarray] = None,  # (V, H, W, 3)
        human_idx: str = "",
        frame_index: int = 0,
        view_index: int = 0,
    ) -> Dict[str, float]:
        rgb_pred = np.asarray(rgb_pred, np.float32)
        rgb_gt = np.asarray(rgb_gt, np.float32)

        mse = float(np.mean((rgb_pred - rgb_gt) ** 2))
        p = psnr(rgb_pred, rgb_gt)

        x, y, w, h = bounding_rect(mask_at_box)
        # expand degenerate rects to the SSIM window (7): a subject nearly
        # out of frame would otherwise make structural_similarity raise
        # (skimage semantics) and abort the whole eval sweep. Real ZJU
        # frames always exceed this, so the published protocol is untouched.
        H_img, W_img = rgb_pred.shape[:2]
        if w < 7:
            x = max(0, min(x, W_img - 7))
            w = min(7, W_img)
        if h < 7:
            y = max(0, min(y, H_img - 7))
            h = min(7, H_img)
        crop_pred = rgb_pred[y : y + h, x : x + w]
        crop_gt = rgb_gt[y : y + h, x : x + w]
        s = structural_similarity(crop_pred, crop_gt, multichannel=True)

        if self.result_dir:
            human_dir = os.path.join(self.result_dir, str(human_idx))
            for sub in ("pred", "gt", "input"):
                os.makedirs(os.path.join(human_dir, sub), exist_ok=True)
            _write_png(
                os.path.join(human_dir, "pred", f"frame{frame_index}_view{view_index}.png"),
                crop_pred,
            )
            _write_png(
                os.path.join(human_dir, "gt", f"frame{frame_index}_view{view_index}_gt.png"),
                crop_gt,
            )
            if input_imgs is not None:
                for v in range(len(input_imgs)):
                    _write_png(
                        os.path.join(
                            human_dir, "input", f"frame{frame_index}_t_0_view_{v}.png"
                        ),
                        np.asarray(input_imgs[v]),
                    )
        return {"mse": mse, "psnr": p, "ssim": s}


def eval_saved_images(src_dir: str) -> Dict[str, float]:
    """Offline re-scoring of saved pred/gt PNG trees (reference
    eval_zju.py:20-44).

    Reference-faithful quirk: the saved PNGs are the mask_at_box CROPS
    (the reference's _compute_ssim writes the cropped images,
    zju_evaluator.py:26-37), so the offline PSNR here is computed over the
    crop while the online compute_score PSNR is full-image — exactly the
    discrepancy the reference's eval_zju.py has. Online numbers are the
    published protocol; this re-scoring matches the reference tool."""
    import glob

    import imageio.v2 as imageio

    gt_files = sorted(glob.glob(os.path.join(src_dir, "*", "gt", "*")))
    scores: Dict[str, list] = {"psnr": [], "ssim": []}
    for gt_file in gt_files:
        pred_file = gt_file.replace(f"{os.path.sep}gt{os.path.sep}", f"{os.path.sep}pred{os.path.sep}")
        pred_file = pred_file.replace("_gt.png", ".png")
        img_gt = imageio.imread(gt_file).astype(np.float32) / 255.0
        img_pred = imageio.imread(pred_file).astype(np.float32) / 255.0
        scores["psnr"].append(psnr(img_pred, img_gt))
        scores["ssim"].append(structural_similarity(img_pred, img_gt, multichannel=True))
    return {k: float(np.mean(v)) for k, v in scores.items() if v}
