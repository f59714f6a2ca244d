"""Full-image inference rendering.

The reference renders full images with a serial loop over stride^2 = 256
interleaved sub-images (src/model.py:897-940 `render_pifu_nerf`). The
TPU-native replacement flattens all H*W rays, pads to a multiple of a fixed
chunk size and `lax.map`s the jit-compiled ray-march over the chunks — one
compiled program, static shapes, and a layout that shards trivially across
devices (rays are embarrassingly parallel; see parallel/).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..geometry.cameras import camera_rays, pixel_grid
from ..models.keypoint_nerf import KeypointNeRF, ViewBatch


def render_rays_chunked(
    model: KeypointNeRF,
    params,
    feats,
    vb: ViewBatch,
    origin,
    dirs,        # (N, 3)
    near,
    far,
    chunk: int = 4096,
    fine: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Ray-march N rays in fixed-size chunks via lax.map (eval mode)."""
    n = dirs.shape[0]

    def march(d, nr, fr):
        m = d.shape[0]
        n_pad = (-m) % chunk
        if n_pad:
            # pad the last chunk with COPIES of real rays (wrap-around),
            # never zeros: an all-zero "ray" evaluates the density at the
            # camera origin and can composite to acc ~ 1 through the 1e10
            # tail, which would steal fine_topk_ratio culling slots from
            # real rays in the last chunk
            idx = jnp.arange(m + n_pad, dtype=jnp.int32) % m
            pad = lambda x: jnp.take(x, idx, axis=0)
        else:
            pad = lambda x: x
        d_p, nr_p, fr_p = pad(d), pad(nr), pad(fr)
        n_chunks = (m + n_pad) // chunk
        reshape = lambda x: x.reshape((n_chunks, chunk) + x.shape[1:])

        def body(args):
            dd, nn, ff = args
            return model.apply(
                params, feats, vb, origin, dd, nn, ff, None, False, fine,
                method=KeypointNeRF.render_rays,
            )

        out = jax.lax.map(body, (reshape(d_p), reshape(nr_p), reshape(fr_p)))
        return {k: v.reshape((m + n_pad,) + v.shape[2:])[:m] for k, v in out.items()}

    ratio = model.cfg.cull_empty_rays_ratio
    if ratio >= 1.0:
        return march(dirs, near, far)

    # Exact empty-ray cull (render/empty_cull.py): rays whose conservative
    # all-view foreground bound never crosses the 0.1 validity threshold
    # composite to EXACTLY zero, so only the top `ratio * n` rays by that
    # bound are marched and the rest take exact zero defaults. Culling is
    # global (across chunks): a per-chunk budget would starve subject-dense
    # chunks. Exactness requires #(score > threshold) <= budget; that is
    # checked AT RUNTIME and surfaced as the `cull_overflow` output (zero
    # everywhere iff the guarantee held — bench.py asserts it, and the
    # bit-parity check is tests/test_model.py::test_cull_empty_rays_exact).
    # Bit-parity additionally requires coarse/fine_topk_ratio == 1.0: with
    # topk < 1 the cull regroups the chunks the per-chunk topk budgets
    # select from (an approximation change, quantify via
    # scripts/culling_error.py), while the culled rays themselves are
    # still exactly zero.
    if model.cfg.use_pallas_composite and fine:
        raise ValueError(
            "cull_empty_rays_ratio requires the XLA importance path: the "
            "Pallas composite kernel's fine-depth placement for zero rays "
            "is not replicated by empty_ray_scores"
        )
    if model.cfg.disable_fg_mask:
        raise ValueError(
            "cull_empty_rays_ratio requires the foreground validity test: "
            "with disable_fg_mask point validity is frustum-only, so rays "
            "the cull proves mask-empty can still composite nonzero"
        )
    from .empty_cull import EMPTY_SCORE_THRESHOLD, empty_ray_scores

    scores = empty_ray_scores(model.cfg, vb, origin, dirs, near, far, feats=feats)
    k = max(1, min(n, -int(-n * ratio // 1)))
    # runtime exactness guard: rays above the threshold beyond the budget
    # would be wrongly zeroed; report the count (one reduce, jit-safe)
    overflow = jnp.maximum(
        jnp.sum(scores > EMPTY_SCORE_THRESHOLD) - k, 0
    ).astype(jnp.float32)
    sel = jax.lax.top_k(scores, k)[1]
    out_m = march(
        jnp.take(dirs, sel, axis=0),
        jnp.take(near, sel, axis=0),
        jnp.take(far, sel, axis=0),
    )
    # write-back: ONE packed row-gather instead of one gather per output
    # (same inverse-index trick as the in-model culls; culled rays take the
    # zero row — their exact composited value)
    inv = jnp.full((n,), k, jnp.int32).at[sel].set(
        jnp.arange(k, dtype=jnp.int32)
    )
    keys = sorted(out_m)
    cols = [out_m[kk].reshape(k, -1) for kk in keys]
    widths = [c.shape[1] for c in cols]
    packed = jnp.concatenate([c.astype(jnp.float32) for c in cols], axis=-1)
    packed = jnp.concatenate(
        [packed, jnp.zeros((1, packed.shape[1]), packed.dtype)], axis=0
    )
    taken = jnp.take(packed, inv, axis=0)  # (n, sum_widths)
    out, off = {}, 0
    for kk, w in zip(keys, widths):
        v = taken[:, off : off + w].astype(out_m[kk].dtype)
        out[kk] = v.reshape((n,) + out_m[kk].shape[1:])
        off += w
    # per-ray broadcast of the scalar guard so it survives the callers'
    # (h, w)-image reshape; nonzero anywhere => raise cull_empty_rays_ratio
    out["cull_overflow"] = jnp.broadcast_to(overflow, (n,))
    return out


@functools.partial(
    jax.jit, static_argnums=(0,), static_argnames=("height", "width", "stride", "chunk", "fine")
)
def render_image(
    model: KeypointNeRF,
    params,
    vb: ViewBatch,
    *,
    height: int,
    width: int,
    stride: int = 1,
    chunk: int = 4096,
    fine: bool = True,
    feats=None,
) -> Dict[str, jnp.ndarray]:
    """Render the target camera of `vb` at (height/stride, width/stride).

    stride > 1 renders every stride-th pixel — the fast-val analog of the
    reference's `nerf_level` sub-resolution rendering (src/model.py:484).

    `feats` (the dict from `KeypointNeRF.encode`) can be passed to reuse
    encoder output across many target cameras of the same subject — the
    reference's attach_im_feat caching (src/model.py:642-688); when None
    the source views are encoded in-jit.

    Returns dict of (H', W', C) images: rgb_coarse, rgb_fine, depth_*, acc_*.
    """
    cfg = model.cfg
    if feats is None:
        feats = model.apply(
            params, vb.src_images, vb.src_masks, method=KeypointNeRF.encode
        )
    pix = pixel_grid(height, width, y_stride=stride, x_stride=stride)
    origin, dirs, near, far = camera_rays(
        pix.astype(jnp.float32), vb.tar_K, vb.tar_R, vb.tar_t, cfg.znear, cfg.zfar
    )
    out = render_rays_chunked(
        model, params, feats, vb, origin, dirs, near, far, chunk=chunk, fine=fine
    )
    # pixel_grid emits ceil(H/stride) x ceil(W/stride) rays (arange with a
    # step), so ceil here too or non-divisible sizes crash the reshape
    h, w = -(-height // stride), -(-width // stride)
    return {k: v.reshape((h, w) + v.shape[1:]) for k, v in out.items()}


@functools.partial(
    jax.jit, static_argnums=(0,), static_argnames=("height", "width", "stride", "chunk", "fine")
)
def render_cameras_scanned(
    model: KeypointNeRF,
    params,
    feats,
    vb: ViewBatch,
    Ks,          # (F, 3, 3)
    Rs,          # (F, 3, 3)
    ts,          # (F, 3)
    *,
    height: int,
    width: int,
    stride: int = 1,
    chunk: int = 4096,
    fine: bool = True,
) -> jnp.ndarray:
    """Render F target cameras of ONE subject in one compiled program.

    lax.scan over the camera stack: one dispatch for the whole group
    instead of one per frame — the orbit-video path (reference
    render_novel_views loops ~90 cameras, src/model.py:476-507) pays
    per-dispatch latency once per group. Encoder features are taken as an
    argument (encode once per subject). Returns ((F, H', W', 3) fine RGB,
    scalar max cull_overflow across the group) — video frames need
    nothing else, small outputs keep the host transfer cheap, and the
    overflow scalar keeps the empty-ray cull's exactness guard visible
    when a serve preset renders cameras its budget wasn't sized for
    (0.0 when culling is off).
    """
    cfg = model.cfg
    pix = pixel_grid(height, width, y_stride=stride, x_stride=stride)

    def one(worst, cam):
        K, R, t = cam
        origin, dirs, near, far = camera_rays(
            pix.astype(jnp.float32), K, R, t, cfg.znear, cfg.zfar
        )
        out = render_rays_chunked(
            model, params, feats, vb, origin, dirs, near, far,
            chunk=chunk, fine=fine,
        )
        ov = jnp.max(out.get("cull_overflow", jnp.zeros(1)))
        return jnp.maximum(worst, ov), out["rgb_fine" if fine else "rgb_coarse"]

    overflow, rgb = jax.lax.scan(one, jnp.asarray(0.0), (Ks, Rs, ts))
    h, w = -(-height // stride), -(-width // stride)
    return rgb.reshape((rgb.shape[0], h, w, 3)), overflow


@functools.partial(
    jax.jit, static_argnums=(0,), static_argnames=("height", "width", "stride", "chunk", "fine")
)
def render_images_batched(
    model: KeypointNeRF,
    params,
    vbs: ViewBatch,
    *,
    height: int,
    width: int,
    stride: int = 1,
    chunk: int = 4096,
    fine: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Render B subjects' target cameras in ONE compiled program.

    `vbs` is a ViewBatch whose every leaf carries a leading batch axis B
    (build it with `parallel.stack_batch`). The reference renderer is
    strictly batch-1 (it squeezes the batch dim, src/model.py:1191), so
    serving several subjects there means serial re-dispatch per subject;
    here a single vmapped program encodes and marches all B subjects
    together — per-dispatch overhead amortizes and small per-chunk ops
    batch up to better MXU/VPU occupancy at serving time.

    Returns dict of (B, H', W', C) images.
    """
    cfg = model.cfg

    def one(vb):
        feats = model.apply(
            params, vb.src_images, vb.src_masks, method=KeypointNeRF.encode
        )
        pix = pixel_grid(height, width, y_stride=stride, x_stride=stride)
        origin, dirs, near, far = camera_rays(
            pix.astype(jnp.float32), vb.tar_K, vb.tar_R, vb.tar_t,
            cfg.znear, cfg.zfar,
        )
        return render_rays_chunked(
            model, params, feats, vb, origin, dirs, near, far,
            chunk=chunk, fine=fine,
        )

    out = jax.vmap(one)(vbs)
    h, w = -(-height // stride), -(-width // stride)
    return {k: v.reshape((v.shape[0], h, w) + v.shape[2:]) for k, v in out.items()}
