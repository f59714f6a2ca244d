"""360-degree orbit-camera paths and video rendering.

Reference semantics (src/utils.py:23-72 `get_360cameras` +
src/model.py:178-235 `render_video_zju`): orbit extrinsics are built from
the SMPL root pose ("headpose"), flipped by a pi x-rotation, swept by a
y-rotation, pushed back trans=5.0 along z; the focal schedule is
fstart + 0.9 (fend - fstart) with fstart = 25 W, fend = W/8. Frames are
rendered per camera, written as PNGs, and assembled into an mp4 by
shelling out to ffmpeg.

Feature caching: the reference mutates `self.feat_geo` to reuse encoder
output across the frames of one subject (model.py:642-688). Here the
jitted renderer takes features explicitly — callers encode once and pass
the result to every orbit camera.
"""
from __future__ import annotations

import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np


def _rodrigues(r: np.ndarray) -> np.ndarray:
    """Axis-angle -> rotation matrix (cv2.Rodrigues equivalent, numpy)."""
    theta = float(np.linalg.norm(r))
    if theta < 1e-12:
        return np.eye(3, dtype=np.float64)
    k = r / theta
    K = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], dtype=np.float64
    )
    return np.eye(3) + np.sin(theta) * K + (1.0 - np.cos(theta)) * (K @ K)


def orbit_cameras(
    headpose: np.ndarray,   # (4, 4) SMPL root pose (rotation + pelvis)
    focal: float,
    trans: float,
    im_w: int,
    im_h: int,
    n_frames: int = 90,
    sc_factor: float = 1.0,
) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Return per-frame (K (3,3), R (3,3), t (3,)) world->cam cameras."""
    T_i = np.eye(4)
    T_i[:3, :3] = headpose[:3, :3].T
    T_i[:3, 3] = -T_i[:3, :3] @ headpose[:3, 3]

    dR1 = _rodrigues(np.array([np.pi, 0.0, 0.0]))
    K = np.array(
        [[focal, 0, im_w / 2], [0, focal, im_h / 2], [0, 0, 1]], dtype=np.float32
    )
    cams = []
    for idx in range(n_frames):
        theta = 2.0 * np.pi * idx / n_frames
        dR2 = _rodrigues(np.array([0.0, theta, 0.0]))
        dR = dR1 @ dR2
        ext = np.eye(4)
        ext[:3, :3] = dR
        ext[:3, 3] = np.array([0.0, 0.0, trans])
        ext = ext @ T_i
        ext[:3, 3] *= sc_factor
        cams.append((K.copy(), ext[:3, :3].astype(np.float32), ext[:3, 3].astype(np.float32)))
    return cams


def zju_orbit_schedule(im_w: int = 512, im_h: int = 512):
    """The focal/trans/near/far schedule of render_video_zju
    (reference model.py:178-187)."""
    trans = 5.0
    fstart, fend = im_w * 25.0, im_w * 0.125
    focal = fstart + 0.9 * (fend - fstart)
    return {"focal": focal, "trans": trans, "znear": trans - 3.0, "zfar": trans + 3.0,
            "im_w": im_w, "im_h": im_h}


def write_video(frame_dir: str, video_path: str, fps: int = 30) -> bool:
    """Assemble `frame_dir/%06d.png` into an mp4 via ffmpeg
    (reference model.py:231). Returns False if ffmpeg is unavailable."""
    cmd = (
        f'ffmpeg -y -framerate {fps} -i {frame_dir}/%06d.png -c:v libx264 -g 10 '
        f'-pix_fmt yuv420p -vf "pad=ceil(iw/2)*2:ceil(ih/2)*2" {video_path}'
    )
    try:
        subprocess.call(
            cmd, stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT, shell=True
        )
        return os.path.exists(video_path)
    except FileNotFoundError:
        return False


def arc_indices(n_frames: int, arc: str = "full") -> List[int]:
    """Camera subsets of the orbit (reference render_video kwargs
    back_cameras/front_cameras, src/model.py:143-147)."""
    if arc == "back":
        return list(range(n_frames // 4, n_frames - n_frames // 4))
    if arc == "front":
        q = 40 // 4
        return list(range(n_frames - q, n_frames)) + list(range(q))
    return list(range(n_frames))


def render_orbit(
    model,
    params,
    vb,
    headpose: np.ndarray,
    out_dir: str,
    n_frames: int = 90,
    im_size: int = 512,
    stride: int = 1,
    frame_indices: Optional[List[int]] = None,
    make_video: bool = True,
    arc: str = "full",
    frame_group: int = 10,
    auto_cull_budget: int = 0,
):
    """Render an orbit around the subject of `vb` and write PNG frames
    (+ mp4). Returns the list of written frame paths.

    Frames are rendered `frame_group` at a time inside ONE compiled
    program (render_cameras_scanned) — per-dispatch latency is paid per
    group, not per frame.

    `auto_cull_budget=N` (with a culling model config) probes N cameras
    spread over the orbit with `render.suggest_cull_budget` and RAISES
    the cull budget to cover them before any frame renders — same
    semantics as `run_eval`: serve presets' budgets are sized for their
    bench scenes, and an orbit around a closer-framed subject would
    otherwise trip the per-group `cull_overflow` warning below."""
    import dataclasses

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from ..models.keypoint_nerf import KeypointNeRF
    from ..render import render_cameras_scanned

    sched = zju_orbit_schedule(im_size, im_size)
    # orbit cameras sit at trans=5.0 with a +-3.0 slab — rebuild the module
    # with the video znear/zfar (params are unchanged; only cfg constants)
    model = type(model)(
        dataclasses.replace(model.cfg, znear=sched["znear"], zfar=sched["zfar"])
    )
    cams = orbit_cameras(
        headpose, sched["focal"], sched["trans"], sched["im_w"], sched["im_h"], n_frames
    )
    os.makedirs(out_dir, exist_ok=True)
    written = []
    indices = (
        frame_indices if frame_indices is not None else arc_indices(n_frames, arc)
    )
    # encode the source views ONCE for the whole orbit (the reference's
    # attach_im_feat caching across ~90 frames, src/model.py:642-688)
    feats = jax.jit(
        lambda p, im, mk: model.apply(p, im, mk, method=KeypointNeRF.encode)
    )(params, vb.src_images, vb.src_masks)
    if auto_cull_budget and model.cfg.cull_empty_rays_ratio < 1.0:
        from .empty_cull import suggest_cull_budget

        step = max(1, len(indices) // auto_cull_budget)
        probe = [cams[i % n_frames] for i in indices[::step][:auto_cull_budget]]
        budget, hull = suggest_cull_budget(
            model.cfg, vb, probe, im_size, im_size,
            feats=feats if model.cfg.fused_feature_map else None,
        )
        if budget > model.cfg.cull_empty_rays_ratio:
            print(f"auto_cull_budget: raising cull budget "
                  f"{model.cfg.cull_empty_rays_ratio} -> {budget} "
                  f"(probed {len(probe)} orbit cameras, worst hull "
                  f"{hull:.3f})")
            model = type(model)(dataclasses.replace(
                model.cfg, cull_empty_rays_ratio=budget))
    # pad the last group to the fixed group size so every group hits the
    # same compiled program (duplicate frames render and are dropped)
    g = max(1, min(frame_group, len(indices)))
    for start in range(0, len(indices), g):
        group = indices[start : start + g]
        padded = group + [group[-1]] * (g - len(group))
        K, R, t = (
            jnp.asarray(np.stack([cams[i % n_frames][j] for i in padded]))
            for j in range(3)
        )
        rgb, overflow = render_cameras_scanned(
            model, params, feats, vb, K, R, t,
            height=im_size, width=im_size, stride=stride,
        )
        if float(overflow) > 0:
            print(f"WARNING: frames {group}: empty-ray cull budget "
                  f"exceeded by up to {float(overflow):.0f} rays — these "
                  "frames are NOT exact; raise cull_empty_rays_ratio "
                  "(size it with render.suggest_cull_budget)")
        imgs = np.clip(np.asarray(rgb[: len(group)]), 0.0, 1.0)
        for idx, img in zip(group, imgs):
            path = os.path.join(out_dir, f"{idx:06d}.png")
            imageio.imwrite(path, (img * 255).astype(np.uint8))
            written.append(path)
    if make_video:
        write_video(out_dir, f"{out_dir}_nvs.mp4")
    return written
