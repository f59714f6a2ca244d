"""Exact empty-ray culling for full-image inference.

In the reference, rays whose every sample point fails the all-view
foreground test composite to EXACTLY zero: `query()` zeroes the validity
mask of any point that does not land on the foreground (fg > 0.1) of all
source views (src/model.py:732-739), `eval_func` multiplies the radiance
by that mask (src/model.py:978-997, alpha = mask * relu(rad)), and
`rgba2out` then yields contrib = 0 -> color/acc/depth/sdf = 0
(src/model.py:1150-1176). Marching such a ray is pure waste — on TPU it
wastes the *binding* resource, the gather-index rate (docs/PERF.md).

This module predicts, per ray, a CONSERVATIVE upper bound on the
foreground value any of its sample points can see in its worst view. Rays
whose bound stays below the 0.1 validity threshold are provably
all-invalid; the renderer marches only the rest and writes exact zeros
for the culled ones. Unlike `coarse_topk_ratio`/`fine_topk_ratio` (which
trade bounded error for speed), this cull is EXACT — outputs are
bit-identical to the uncull render
(tests/test_model.py::test_cull_empty_rays_exact) — PROVIDED the topk
ratios are 1.0: with topk < 1 the cull changes the chunk groupings the
per-chunk topk budgets select from, so outputs match the uncull render
only up to the topk approximation (quantify with
scripts/culling_error.py).

Conservativeness argument (each step only widens the kept set):

1. Sample placement is replicated bit-exactly: the same f32
   `stratified_z` / `importance_z` / projection expressions the renderer
   itself evaluates, including the deterministic fine depths an all-zero
   ray gets from the +1e-5 importance floor (geometry/sampling.py). A
   culled ray's predicted points ARE its real points.
2. The per-view foreground bound is a dilated max OVER THE MASK MAP THE
   MODEL ACTUALLY SAMPLES: pass `feats` and the bound is built from the
   fused map's mask channel on its own (possibly half-res, possibly
   fractional-valued) grid, so `fused_map_half`'s resampled support is
   covered exactly. The map is max-pooled into (cell+1)-wide windows
   strided by `cell` in MAP pixels, so the cell containing a (clamped)
   map coordinate covers all 4 bilinear corner pixels of that
   coordinate. bilinear(p) <= max(corners) <= cellmax.
3. With `gather_lerp`, the fg a non-anchor sample sees is a per-view
   CONVEX COMBINATION of the two gathered anchor values of its segment
   (keypoint_nerf.py `_strided_gather_lerp`: t is clipped to [0, 1]),
   so the plain per-sample bound is unsound across views (two anchors
   can each fail the all-view test while their mixtures pass it in
   every view). Two sound variants:
   - TIGHT (the default eval decomposition, `reuse_coarse_eval` and not
     `separate_cf`): the model evaluates two per-ray sample groups, the
     ascending coarse depths and the ascending fine depths, each
     gathering ONLY its anchor positions (every stride-th index + the
     last; `_strided_gather_lerp`). The bound therefore scores ONLY the
     anchors — the positions whose map values can enter any sample's
     mixture. A sample in segment j mixes anchor-array entries {j, j+1},
     so per view a windowed max of half-width 1 over the ANCHOR axis
     centered at j covers the pair; score = max over both groups of
     (max over anchors of (min over views of the window-3 anchor
     bound)). This is simultaneously TIGHTER than a bound that also
     scores non-anchor positions (the model never reads those) and
     ~stride x cheaper (1.94x fewer score lookups at stride 2 — the
     scoring pass cost, docs/PERF.md, nearly halves; round-5
     measurement).
   - LOOSE (any other lerp decomposition): swap the reduction order —
     score = min over views of (max over the ray's samples). Any convex
     mixture of per-view values along the ray is <= that view's max,
     and anchors are a subset of the ray's samples. All samples are
     scored here (the anchor set of an unknown decomposition is
     unknown). (Keeps silhouette-cone-intersecting rays; the runtime
     budget guard below still applies.)
4. The bf16 map values enter the cell max exactly (f32 max of bf16
   values); the model's bf16 convex blend of values <= cellmax can
   round at most ~0.4% above cellmax — absorbed by the 0.01 margin
   between the 0.09 score threshold and the 0.1 validity threshold.
5. The frustum component of the validity mask is ignored — it can only
   make more points invalid, never fewer.

Runtime guard: exactness additionally requires the marched budget to
cover the hull, #(score > threshold) <= k. The renderer surfaces the
violation count as the `cull_overflow` output (zero everywhere when the
guarantee holds); bench.py asserts it is 0 for its scenes.

The per-point lookup itself must not pay the gather-index rate it exists
to save, so the cell query is computed as one-hot MXU contractions
(row-select matmul + column-select reduce). Measured on v5e
(scripts/trace_stage_render.py; round-5 score_chunk sweep at 512²:
4096 → 16.7 ms, 8192 → 19.6 ms, 32768 → 36.6 ms — 4096 is the default;
chunking only reshapes the pass, outputs bit-identical; cell 8 ~= 16):
the anchor-only TIGHT pass 2.3 ms per 256² camera
/ 17.9 ms at 512² (~1% of the culled fast render; round 4's all-sample
pass measured 14-16 / 30-33 ms), the strict all-sample pass
8.8 / 12.6 ms — the march it saves costs 20-80x more.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.aabb import ray_aabb_intersection
from ..geometry.cameras import compose_krt, ndc_xy, project_points
from ..geometry.sampling import importance_z, stratified_z

# Rays with score <= threshold are provably all-invalid: the model's
# validity test is fg > 0.1 on a value bounded above by score + rounding
# (bf16 map storage + bf16 blend, both < 1%, absorbed by the 0.01 margin).
EMPTY_SCORE_THRESHOLD = 0.09


def suggest_cull_budget(cfg, vb, cameras, height, width, feats=None,
                        margin=1.3, quantum=1 / 64):
    """Measure a scene's hull fraction and return a safe cull budget.

    Sizing `cull_empty_rays_ratio` by hand against `cull_overflow` is the
    error-prone part of deploying the cull (the bench orbit needs 0.25,
    the quality gate's close-up scenes 0.5). This helper runs ONE scoring
    pass per camera (the same conservative bound the renderer uses,
    14-33 ms/camera on v5e — docs/PERF.md) and returns

        ceil(max_camera_hull_fraction * margin / quantum) * quantum

    clamped to (0, 1]. Use at scene/serve setup time, then render with
    `dataclasses.replace(cfg, cull_empty_rays_ratio=budget)`; the
    renderer's `cull_overflow` output stays the runtime guarantee.

    Args:
      cfg:     KeypointNeRFConfig (the EVAL config the renders will use —
               its lerp/half flags pick the matching sound bound).
      vb:      ViewBatch (source views of the subject).
      cameras: iterable of (K, R, t) target cameras to cover.
      height/width: render resolution.
      feats:   encode() output; REQUIRED when cfg.fused_feature_map.
      margin:  hull-to-budget safety factor (1.3 default; the bench
               scene's camera-to-camera hull spread is ~1.3x).
      quantum: budget granularity (1/64 keeps marched-ray counts
               lane-friendly).
    Returns:
      (budget, max_hull_fraction) floats.
    """
    import math

    from ..geometry.cameras import camera_rays, pixel_grid

    pix = pixel_grid(height, width).astype(jnp.float32)
    worst = 0.0
    for K, R, t in cameras:
        origin, dirs, near, far = camera_rays(
            pix, K, R, t, cfg.znear, cfg.zfar
        )
        scores = empty_ray_scores(cfg, vb, origin, dirs, near, far,
                                  feats=feats)
        frac = float(jnp.mean((scores > EMPTY_SCORE_THRESHOLD)
                              .astype(jnp.float32)))
        worst = max(worst, frac)
    budget = min(1.0, math.ceil(worst * margin / quantum) * quantum)
    return max(budget, quantum), worst


def conservative_mask_cells(masks, cell):
    """Dilated max-pool of per-view masks onto a coarse cell grid.

    Args:
      masks: (V, H, W, 1) f32 foreground masks (the same array `encode`
        packs into the sampled feature map's mask channel).
      cell:  static int cell size in pixels.
    Returns:
      (V, Hc, Wc) with Hc = floor((H-1)/cell) + 1: each cell holds the max
      over pixels [cy*cell, cy*cell + cell] x [cx*cell, cx*cell + cell]
      (inclusive high edge — the +1 covers the bilinear corner x1 = x0+1
      of any clamped coordinate falling in the cell).
    """
    V, H, W = masks.shape[:3]
    hc = (H - 1) // cell + 1
    wc = (W - 1) // cell + 1
    pad_h = (hc - 1) * cell + cell + 1 - H
    pad_w = (wc - 1) * cell + cell + 1 - W
    return jax.lax.reduce_window(
        masks[..., 0],
        0.0,
        jax.lax.max,
        window_dimensions=(1, cell + 1, cell + 1),
        window_strides=(1, cell, cell),
        padding=((0, 0), (0, pad_h), (0, pad_w)),
    )


def _cell_lookup(cmax, cy, cx):
    """Nearest-cell values via one-hot MXU contractions (no lax.gather).

    cmax: (V, Hc, Wc); cy, cx: (V, P) int32 cell indices.
    Returns (V, P) f32 cell values (bf16-rounded — covered by the margin).
    """
    hc, wc = cmax.shape[1:]
    y_oh = (cy[..., None] == jnp.arange(hc, dtype=jnp.int32)).astype(jnp.bfloat16)
    rows = jnp.einsum("vph,vhw->vpw", y_oh, cmax.astype(jnp.bfloat16))
    x_oh = cx[..., None] == jnp.arange(wc, dtype=jnp.int32)
    return jnp.sum(jnp.where(x_oh, rows, 0), axis=-1).astype(jnp.float32)


def empty_ray_scores(cfg, vb, origin, dirs, near, far, cell=8, score_chunk=4096,
                     feats=None):
    """Per-ray conservative foreground scores.

    Replicates the renderer's exact sample placement for a would-be-zero
    ray (AABB-clipped near/far -> deterministic stratified coarse depths ->
    the uniform-floor importance fine depths), projects every point into
    every source view with the same camera math as `query_points`, and
    bounds its worst-view foreground value by the dilated cell max.

    Args:
      cfg:  KeypointNeRFConfig (n_coarse / n_fine / znear / zfar).
      vb:   ViewBatch (src_masks, src cameras, bounds).
      origin: (3,) target camera center; dirs (R, 3); near/far (R, 1).
      feats: the dict from `KeypointNeRF.encode`. REQUIRED for soundness
        when `cfg.fused_feature_map` is set: the bound is then built from
        the fused map's actual mask channel (which `fused_map_half`
        resamples onto the half grid — full-res `src_masks` cells would
        not cover its support). Without a fused map `src_masks` IS the
        sampled mask and `feats` may be None.
    Returns:
      (R,) f32 scores; score <= EMPTY_SCORE_THRESHOLD => the ray's output
      is exactly zero under the model's validity semantics.
    """
    H, W = vb.src_masks.shape[1:3]  # NDC convention of project/ndc_xy
    if feats is not None and "fused" in feats:
        # the mask channel the model's validity test actually samples
        # (keypoint_nerf.py query_points: fg = fused[..., base+3]); any
        # dma-gather lane padding sits AFTER it, so the index is stable
        base = cfg.geo_out_ch + cfg.geo_out_ch_hd + cfg.tex_out_ch
        mask_map = feats["fused"][..., base + 3 : base + 4]
    elif cfg.fused_feature_map:
        raise ValueError(
            "empty_ray_scores: cfg.fused_feature_map requires feats= (the "
            "bound must be built from the fused map's mask channel)"
        )
    else:
        mask_map = vb.src_masks
    V, Hm, Wm = mask_map.shape[:3]
    # gather_lerp mixes each view's gathered values along the ray, so the
    # plain per-sample all-view bound is unsound; use the tight windowed
    # bound when the eval decomposition is the default coarse+fine-group
    # one, the loose swapped reduction otherwise (docstring, step 3)
    lerp_mode = (
        feats is not None and "fused" in feats
        and cfg.gather_lerp and cfg.gather_lerp_stride >= 2
    )
    lerp_tight = lerp_mode and cfg.reuse_coarse_eval and not cfg.separate_cf
    cmax = conservative_mask_cells(mask_map.astype(jnp.float32), cell)
    krt = compose_krt(vb.src_K, vb.src_R, vb.src_t)  # (V, 4, 4)
    n = dirs.shape[0]

    # identical AABB near/far clip to render_rays (reference model.py:1038-43)
    z1, z2, hit = ray_aabb_intersection(vb.bounds, origin, dirs)
    near = jnp.where(hit & (z1 > near), z1, near)
    far = jnp.where(hit & (z2 < far), z2, far)

    n_pad = (-n) % score_chunk
    if n_pad:
        idx = jnp.arange(n + n_pad, dtype=jnp.int32) % n
        dirs, near, far = (jnp.take(x, idx, axis=0) for x in (dirs, near, far))
    shape = lambda x: x.reshape((-1, score_chunk) + x.shape[1:])

    # lerp_tight: the model only gathers anchor positions (every
    # stride-th + last, per group — _strided_gather_lerp), so only those
    # need scoring (docstring step 3 TIGHT): ~stride x fewer lookups AND
    # a tighter bound. Static per-group anchor index tables:
    if lerp_tight:
        import numpy as _np

        k = cfg.gather_lerp_stride
        anch = lambda S: _np.concatenate(
            [_np.arange(0, S, k), [S - 1]]).astype(_np.int32)
        ia_c, ia_f = anch(cfg.n_coarse), anch(cfg.n_fine)
        n_anch_c = ia_c.shape[0]

    def body(args):
        d, nr, fr = args  # (c, 3), (c, 1), (c, 1)
        z = stratified_z(None, nr, fr, cfg.n_coarse, jitter=False)  # (c, Sc)
        z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
        zf = importance_z(
            None, jnp.zeros_like(z[..., : cfg.n_coarse - 2]), z_mid,
            cfg.n_fine, uniform=True,
        )
        if lerp_tight:
            z_all = jnp.concatenate([z[..., ia_c], zf[..., ia_f]], axis=-1)
        else:
            z_all = jnp.concatenate([z, zf], axis=-1)   # (c, S)
        pts = origin + d[:, None, :] * z_all[..., None]  # (c, S, 3)
        xy_pix, _ = project_points(pts.reshape(1, -1, 3), krt)  # (V, c*S, 2)
        xy = ndc_xy(xy_pix, W, H)
        # the sampler's NDC->pixel map + border clamp (ops/feat_sample.py)
        # onto the MAP grid (Hm/Wm may be the half-res fused-map grid)
        px = jnp.clip((xy[..., 0] + 1.0) * 0.5 * (Wm - 1), 0.0, Wm - 1.0)
        py = jnp.clip((xy[..., 1] + 1.0) * 0.5 * (Hm - 1), 0.0, Hm - 1.0)
        cx = jnp.floor(px / cell).astype(jnp.int32)
        cy = jnp.floor(py / cell).astype(jnp.int32)
        vals = _cell_lookup(cmax, cy, cx)               # (V, c*S)
        vals = vals.reshape(V, -1, z_all.shape[-1])      # (V, c, S)
        if lerp_tight:
            def group_score(v):  # (V, c, Ga) over the ANCHOR axis -> (c,)
                # window 3 centered at anchor j covers the {j, j+1} pair
                # any sample in segment j mixes (docstring step 3 TIGHT)
                w = jax.lax.reduce_window(
                    v, -jnp.inf, jax.lax.max,
                    window_dimensions=(1, 1, 3),
                    window_strides=(1, 1, 1), padding="SAME",
                )
                return jnp.max(jnp.min(w, axis=0), axis=-1)

            return jnp.maximum(
                group_score(vals[..., :n_anch_c]),
                group_score(vals[..., n_anch_c:]),
            )
        if lerp_mode:
            return jnp.min(jnp.max(vals, axis=-1), axis=0)  # (c,)
        return jnp.max(jnp.min(vals, axis=0), axis=-1)       # (c,)

    scores = jax.lax.map(body, (shape(dirs), shape(near), shape(far)))
    return scores.reshape(-1)[:n]
