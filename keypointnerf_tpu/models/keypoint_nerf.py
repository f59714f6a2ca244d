"""KeypointNeRF — the full generalizable volumetric-avatar model (Flax).

TPU-first assembly of the whole pipeline that the reference spreads across
`KeypointNeRF` + `batch_render_pifu_nerf` (reference src/model.py:558-1237):

  * `encode()`      — pixel-aligned CNN features for the V source views
                      (reference attach_geo_feat/attach_tex_feat, model.py:653-680).
  * `query_points()` — per-3D-point evaluation: project into source views,
                      validity masking + view dropout, bilinear feature
                      sampling, relative spatial encoding, geometry MLP
                      fusion and the IBR color head
                      (reference query/query_color, model.py:690-843).
  * `render_rays()` — coarse+fine stratified ray-march with importance
                      resampling and alpha compositing
                      (reference batch_render_pifu_nerf, model.py:942-1108).
  * `__call__()`    — one training forward: random fg-centered patch,
                      coarse+fine render, GT gather
                      (reference forward, model.py:845-895).

Design notes (TPU-native, not a translation):
  * Everything is per-sample and functional — no attach-state; features flow
    through arguments, batching is `jax.vmap` outside.
  * All shapes are static: the random patch is chosen with a categorical
    draw over the foreground mask inside jit (replacing the reference's
    dynamic `torch.where(msk)` indexing, model.py:1011-1012), and AABB
    misses are masked rather than filtered.
  * Point layout is (V, N, C) with N = rays * samples flattened, so every
    MLP matmul is one large MXU contraction.
  * Optional bf16 compute via `cfg.compute_dtype`; params stay f32.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..geometry.aabb import ray_aabb_intersection
from ..geometry.cameras import (
    camera_center,
    camera_rays,
    compose_krt,
    ndc_xy,
    ndc_z,
    pixel_grid,
    project_points,
    world_to_cam,
)
from ..geometry.compositing import composite
from ..geometry.sampling import (
    importance_z,
    merge_sorted_payloads,
    stratified_z,
    union_sorted_z,
)
from ..ops.feat_sample import (
    multiview_bilinear_sample,
    multiview_bilinear_sample_mm,
)
from .cnn import HGFilter, ResBlkEncoder
from .ibr_head import IBRRenderingHead
from .mlp import GeoFusionMLP
from .spatial_encoding import SpatialEncodingConfig, spatial_encode, spatial_encoding_dim

# remat-policy tag for the gathered per-point features (see
# KeypointNeRFConfig.remat_save_gathers). checkpoint_name is a no-op
# outside jax.checkpoint, so tagging unconditionally is free.
from jax.ad_checkpoint import checkpoint_name as _ckpt_name


@dataclasses.dataclass(frozen=True)
class KeypointNeRFConfig:
    """Hyperparameters; defaults reproduce the reference zju config
    (reference configs/zju.json)."""

    # spatial encoding (zju.json:39-45)
    sp_level: int = 3
    sp_type: str = "rel_z_decay"
    sp_scale: float = 1.0
    sp_sigma: float = 0.1
    n_kpt: int = 24
    # geometry CNN (zju.json:47-51)
    geo_n_stack: int = 1
    geo_n_downsample: int = 4
    geo_out_ch: int = 64
    geo_out_ch_hd: int = 8
    # texture CNN (zju.json:82-89)
    tex_out_ch: int = 8
    tex_ngf: int = 64
    tex_n_downsample: int = 3
    tex_n_blocks: int = 4
    tex_n_upsample: int = 2
    # geometry MLP (zju.json:52-81); dims1[0] is overridden by the spatial
    # encoding width (reference model.py:569-570)
    mlp_dims1: Tuple[int, ...] = (168, 128, 128, 120, 64)
    mlp_dims2: Tuple[int, ...] = (128, 64, 64, 2)
    mlp_skip_layers: Tuple[int, ...] = (0, 2)
    mlp_nl: str = "softplus"
    pool_types: Tuple[str, ...] = ("mean", "var")
    # cross-view pooling mode: "" = masked mean/var (zju default);
    # "attention_v0" / "attention_v1" = the reference PoolModule attention
    # variants (src/utils.py:589-647)
    pool_mode: str = ""
    # IBR color head (zju.json:90-99)
    ibr_in_feat_ch: int = 32
    gcompress_out: int = 24
    # rendering (zju.json:100-108, model.py:43-47)
    n_coarse: int = 64
    n_fine: int = 64
    patch_h: int = 64
    patch_w: int = 64
    rand_noise_std: float = 0.01
    # separate coarse/fine radiance channels (reference dr_kwargs
    # `separate_cf`, model.py:987-993: rgba = [sdf, rad_c, rad_f, rgb])
    separate_cf: bool = False
    znear: float = 2.0
    zfar: float = 5.0
    bkg_sdf: float = 0.1 / 100.0  # 0.1 / nml_scale (reference model.py:984)
    view_dropout: float = 0.5
    # disable the all-views-foreground constraint (reference model.py:567,
    # 735-739 `disable_fg_mask`)
    disable_fg_mask: bool = False
    # input downsampling factors for the encoders (reference model.py:655-676
    # ds_geo/ds_tex: avg-pool the input image 2x per level)
    ds_geo: int = 0
    ds_tex: int = 0
    # numerics
    compute_dtype: Any = jnp.float32
    # fused Pallas geometry-MLP kernel (ops/pallas/fused_geo_mlp.py);
    # interpret mode runs it on CPU for tests
    use_pallas_geo_mlp: bool = False
    pallas_interpret: bool = False
    # rematerialize the point-query in the backward pass (jax.checkpoint):
    # trades ~1.3x forward FLOPs for O(n_samples) less activation memory,
    # enabling larger patches / batches per chip
    remat: bool = False
    # with remat: SAVE the per-point gathered feature tensors (tagged
    # "kpn_gathered") instead of re-gathering them in the backward pass —
    # the gathers are index-rate-bound (docs/PERF.md) and their saved
    # footprint is small ((V, N, 12+64+8) vs the MLP activations remat
    # exists to drop), so this keeps remat's memory win while skipping
    # its most expensive recompute
    remat_save_gathers: bool = False
    # single fused feature map: align_corners-upsample the coarse and tex
    # maps to input resolution at encode time and concatenate ALL per-view
    # features ([coarse 64 | hd 8 | tex 8 | rgb 3 | mask 1] = 84 ch) so the
    # point stage does ONE bilinear gather instead of three. Gathers are the
    # dominant render cost on TPU; the upsample is amortized over all
    # samples. Numerics: interpolating the upsampled map is a piecewise-
    # linear approximation of the original bilinear lookup (no sub-pixel
    # shift — align_corners is preserved); train and eval use the same path.
    fused_feature_map: bool = False
    # build the fused map at HALF the input resolution. Maps with area
    # <= 256^2 gather at 15.2 ns/patch vs 23.6 at 512^2 on v5e (the
    # measured two-regime gather floor, docs/PERF.md) — a 512^2-input
    # model's fused map drops to the fast regime, cutting the dominant
    # render cost ~35%. Approximation on top of the fused map's own
    # (hd/rgb/mask are resampled to the half grid); quantify with
    # scripts/culling_error.py before shipping.
    fused_map_half: bool = False
    # halving applies only when min(input H, W) >= this. Rationale: the
    # half map exists SOLELY to drop the gather operand into the
    # <= 256^2-area fast regime; for inputs <= 256^2 the full-res map is
    # already there, so halving buys zero speed and costs real quality —
    # measured on the 20k-step sharp fixture at the 128^2 gate geometry:
    # the shipped preset's GT budget eroded to -3.2 dB unseen purely from
    # the 64^2 half map, while the same knob at 512^2 inputs measures
    # ~free (+0.15 dB; scripts/culling_error.py, quality_gate.json
    # trend_runs). Tests exercising the halving math at toy sizes set
    # this to 0.
    fused_map_half_min_side: int = 512
    # DMA-pipelined Pallas bilinear gather for the per-point feature lookups
    # (ops/pallas/dma_gather.py): 24-27x faster than the XLA gather on v5e
    # for RANDOM lookups with exact parity, but slower end-to-end in the
    # renderer (ray-march lookups are coherent; XLA's gather hits cache) —
    # see docs/ARCHITECTURE.md. Inference-only (the kernel has no VJP);
    # training and init fall back to the XLA gather. The fused feature map
    # is padded to 128 channels at encode time (HBM slice lane alignment).
    use_dma_gather: bool = False
    # fused Pallas composite + inverse-CDF importance resampling for the
    # coarse eval pass (ops/pallas/composite_kernel.py): keeps
    # z/alpha/contrib/cdf in VMEM between compositing and the fine-depth
    # interpolation. Inference-only.
    use_pallas_composite: bool = False
    # fine-pass ray culling (inference): only the top-K rays by coarse
    # opacity get the fine march; the rest keep their coarse result (their
    # composited weight is ~0 anyway). 1.0 = march all rays (reference
    # semantics). Typical human renders hit the subject with <40% of rays,
    # so 0.5 is conservative and cuts fine-pass points ~2x.
    fine_topk_ratio: float = 1.0
    # coarse-pass ray culling (inference): only the top-K rays by AABB hit
    # get the coarse march; misses composite as empty space. Rays outside
    # the subject's box almost never pass the all-views foreground test, so
    # this is near-exact for typical framing. 1.0 = march all rays.
    coarse_topk_ratio: float = 1.0
    # EXACT empty-ray culling (inference, render_rays_chunked only): march
    # only the top `ratio * n_rays` rays by a conservative all-view
    # foreground bound; every ray outside the budget is provably
    # all-invalid under the model's validity test and composites to
    # exactly zero (render/empty_cull.py — bit-identical outputs when the
    # topk ratios are 1.0, tests/test_model.py::test_cull_empty_rays_exact).
    # The budget must exceed the scene's dilated visual-hull ray fraction;
    # violations are surfaced at runtime via the renderer's
    # `cull_overflow` output (zero everywhere iff the budget covered the
    # hull; bench.py asserts it for its scenes). 1.0 = off.
    cull_empty_rays_ratio: float = 1.0
    # eval-time reuse of coarse point values in the union pass (exact —
    # the eval query is deterministic); disable to force the reference's
    # full re-evaluation of all union depths
    reuse_coarse_eval: bool = True
    # inference fast-path: run the geometry MLP's softplus100 activation as
    # a plain relu. softplus with beta=100 (reference src/utils.py:524)
    # differs from relu by at most log(2)/100 ~= 0.007 (decaying to <1e-4
    # for |x| > 0.09) — below bf16 activation resolution at unit magnitude —
    # while the transcendental chain is one of the largest VPU costs of the
    # render. Intended for EVAL configs on softplus-trained params; leave
    # False for training (the smooth knee matters for gradients near 0).
    nl_relu_approx: bool = False
    # inference fast-path: epipolar feature lerp. The fused-map gather is
    # index-rate-bound on TPU (~21 ns/patch regardless of payload; see
    # docs/PERF.md "the gather floor"), so the only lever is fewer
    # indices: gather features at every 2nd depth sample (+ the last),
    # and reconstruct the skipped samples by lerping the two neighboring
    # gathered features parametrically along the projected epipolar
    # segment. Adjacent samples project ~1-2 px apart at 512^2, so the
    # secant error is small; evens and the final sample stay exact.
    # Cuts gather indices ~1.94x in both marches. Eval-only, fused-map
    # path only; off = exact reference lookups.
    gather_lerp: bool = False
    # anchor stride for gather_lerp: gather every k-th depth sample (plus
    # the last) and lerp the rest. 2 keeps adjacent-sample secant error
    # (~1-2 px segments at 512^2); larger strides cut the index count
    # further (S/k+1 anchors) at growing secant error — quantify with
    # scripts/culling_error.py before shipping a stride > 2.
    gather_lerp_stride: int = 2
    # training-path: compute the bilinear-gather backward (dL/dmap) with
    # dense one-hot matmuls on the MXU instead of XLA's scatter-add, which
    # measures ~4.6 us/index on v5e vs 0.2 us/index for the forward
    # gather (22x; see docs/PERF.md). Exact same gradient, f32-accumulated.
    # Forward path is unchanged, so eval cost is identical.
    train_matmul_gather_vjp: bool = False
    # with train_matmul_gather_vjp: run the dmap contraction as a Pallas
    # kernel whose accumulator lives in VMEM (ops/pallas/onehot_dmap.py)
    # instead of XLA's chunked scan, which materializes the (N, W*C)
    # one-hot product in HBM every chunk (~58 GB/step at the ZJU train
    # geometry). Exact same gradient.
    train_pallas_dmap: bool = False
    # inference: compute the TEX map lookup as one-hot MXU contractions
    # (ops/pallas/onehot_bilinear.py) instead of an XLA gather. Exact same
    # bilinear semantics; on v5e the tex map (256^2 x 8ch) is small enough
    # that the dense arithmetic (~N*H*W*C MACs) beats the ~15 ns/index
    # gather floor. Strict-path (per-map) lookups only — the fused map
    # already amortizes its single gather.
    tex_onehot_sample: bool = False

    @property
    def sp_config(self) -> SpatialEncodingConfig:
        return SpatialEncodingConfig(
            sp_level=self.sp_level,
            sp_type=self.sp_type,
            scale=self.sp_scale,
            sigma=self.sp_sigma,
            n_kpt=self.n_kpt,
        )

    @property
    def sp_dim(self) -> int:
        return spatial_encoding_dim(self.sp_config)


@flax.struct.dataclass
class ViewBatch:
    """One training/eval sample: V source views + 1 target view.

    The reference packs this in decode_batch (src/model.py:309-414); here it
    is an explicit pytree produced by the data pipeline.
    """

    src_images: jnp.ndarray   # (V, H, W, 3) in [0, 1], fg-masked
    src_masks: jnp.ndarray    # (V, H, W, 1) foreground masks
    src_K: jnp.ndarray        # (V, 3, 3)
    src_R: jnp.ndarray        # (V, 3, 3) world->cam
    src_t: jnp.ndarray        # (V, 3)
    tar_image: jnp.ndarray    # (H, W, 3)
    tar_mask: jnp.ndarray     # (H, W, 1)
    tar_K: jnp.ndarray        # (3, 3)
    tar_R: jnp.ndarray        # (3, 3)
    tar_t: jnp.ndarray        # (3,)
    kpt3d: jnp.ndarray        # (Kp, 3) 3D body keypoints (world)
    bounds: jnp.ndarray       # (2, 3) AABB [min, max]


def _strided_gather_lerp(fmap, xy, n_samples, stride=2):
    """Gather the fused feature map at every `stride`-th depth sample (+ the
    last) and reconstruct the skipped samples by lerping the two neighboring
    gathered features parametrically along the projected segment.

    The gather is index-rate-bound (docs/PERF.md), so cutting the index
    count by ~stride cuts the dominant render cost; anchor samples remain
    exact bilinear lookups (the parametric t is exactly 0 there). `xy` is
    (V, R*S, 2) ray-major. Returns (V, R*S, C) matching
    `multiview_bilinear_sample(fmap, xy)` up to the secant approximation
    at non-anchor samples.
    """
    V, N, _ = xy.shape
    S = n_samples
    R = N // S
    k = stride
    xyr = xy.reshape(V, R, S, 2)
    # anchors = every k-th sample + the last sample
    xa = jnp.concatenate([xyr[:, :, ::k, :], xyr[:, :, -1:, :]], axis=2)
    G = xa.shape[2]
    F = multiview_bilinear_sample(fmap, xa.reshape(V, R * G, 2))
    F = F.reshape(V, R, G, -1)
    A, B = F[:, :, :-1, :], F[:, :, 1:, :]            # (V, R, G-1, C)
    # sample s lerps inside segment s//k, WITHOUT gathers: repeat each
    # segment endpoint k times ((G-1)*k >= S, slice to S). At anchors
    # xyr == xl so t == 0 and the exact gathered value passes through.
    left = jnp.repeat(A, k, axis=2)[:, :, :S]          # (V, R, S, C)
    right = jnp.repeat(B, k, axis=2)[:, :, :S]
    xl = jnp.repeat(xa[:, :, :-1, :], k, axis=2)[:, :, :S]
    xr = jnp.repeat(xa[:, :, 1:, :], k, axis=2)[:, :, :S]
    seg = xr - xl
    t = jnp.sum((xyr - xl) * seg, -1, keepdims=True) / (
        jnp.sum(seg * seg, -1, keepdims=True) + 1e-12
    )
    t = jnp.clip(t, 0.0, 1.0).astype(left.dtype)
    return (left + t * (right - left)).reshape(V, N, -1)


class KeypointNeRF(nn.Module):
    cfg: KeypointNeRFConfig

    def setup(self):
        c = self.cfg
        # mixed precision: compute in cfg.compute_dtype (params stay f32)
        dt = None if c.compute_dtype == jnp.float32 else c.compute_dtype
        self.geo_encoder = HGFilter(
            n_stack=c.geo_n_stack,
            n_downsample=c.geo_n_downsample,
            out_ch=c.geo_out_ch,
            out_ch_hd=c.geo_out_ch_hd,
            dtype=dt,
        )
        self.tex_encoder = ResBlkEncoder(
            out_ch=c.tex_out_ch,
            ngf=c.tex_ngf,
            n_downsample=c.tex_n_downsample,
            n_blocks=c.tex_n_blocks,
            n_upsample=c.tex_n_upsample,
            dtype=dt,
        )
        dims1 = (c.sp_dim,) + tuple(c.mlp_dims1[1:])
        dims2 = tuple(c.mlp_dims2)
        if c.separate_cf:
            dims2 = dims2[:-1] + (dims2[-1] + 1,)  # [sdf, rad_c, rad_f]
        if c.use_pallas_geo_mlp and c.pool_mode:
            raise ValueError(
                "use_pallas_geo_mlp supports only the default mean/var pooling"
                f" (pool_mode={c.pool_mode!r})"
            )
        if c.use_pallas_geo_mlp and c.nl_relu_approx:
            # the Pallas kernels hardcode softplus100; silently routing a
            # relu-configured model through them would un-apply the flag
            raise ValueError(
                "nl_relu_approx is not supported with use_pallas_geo_mlp "
                "(the fused kernel applies softplus100)"
            )
        nl = c.mlp_nl
        if c.nl_relu_approx and nl == "softplus":
            nl = "relu"
        self.mlp_geo = GeoFusionMLP(
            dims1=dims1,
            dims2=dims2,
            skip_dims=(c.geo_out_ch, c.geo_out_ch_hd),
            skip_layers=tuple(c.mlp_skip_layers),
            nl_layer=nl,
            pool_types=tuple(c.pool_types),
            pool_mode=c.pool_mode,
            dtype=dt,
        )
        self.ibr_head = IBRRenderingHead(in_feat_ch=c.ibr_in_feat_ch, dtype=dt)
        self.gcompress = nn.Dense(c.gcompress_out, dtype=dt)

    # ------------------------------------------------------------------ encode
    def encode(self, src_images, src_masks=None, train=False):
        """Run the CNN encoders over the V source views.

        Reference attach_geo_feat/attach_tex_feat (src/model.py:653-680):
        images are scaled to [-1, 1]; geometry features come back as
        [coarse (V, H/4, W/4, 64), hires (V, H, W, 8)], texture features
        as (V, H/2, W/2, 8).

        TPU gather fusion: the per-point bilinear sampling is a hot
        non-matmul cost, so maps of equal resolution are concatenated and
        gathered once — "full" packs [geo_hd | src RGB | fg mask] (12 ch at
        input resolution) when `src_masks` is provided.
        """
        from .cnn import avg_pool2

        x = (2.0 * src_images - 1.0).astype(self.cfg.compute_dtype)
        x_geo = x
        for _ in range(self.cfg.ds_geo):
            x_geo = avg_pool2(x_geo)
        x_tex = x
        for _ in range(self.cfg.ds_tex):
            x_tex = avg_pool2(x_tex)
        feat_geo = self.geo_encoder(x_geo)
        feat_tex = self.tex_encoder(x_tex)
        feats = {"geo": feat_geo, "tex": feat_tex}
        full_res = feat_geo[1].shape[1:3] == src_images.shape[1:3]
        if src_masks is not None and full_res and self.cfg.fused_feature_map:
            H, W = src_images.shape[1:3]
            V = src_images.shape[0]
            # fused_map_half: build the packed map on the HALF grid — a
            # 512^2-input model's map drops into the <=256^2-area gather
            # regime (15.2 vs 23.6 ns/patch on v5e, docs/PERF.md). The NDC
            # convention makes downstream sampling size-agnostic. Below
            # fused_map_half_min_side the full map is already in the fast
            # regime, so halving is skipped (pure quality loss otherwise —
            # see the config field's measured rationale).
            half = (self.cfg.fused_map_half
                    and min(H, W) >= self.cfg.fused_map_half_min_side)
            Hm, Wm = (H // 2, W // 2) if half else (H, W)
            grid = pixel_grid(Hm, Wm).astype(jnp.float32)
            xy = jnp.stack(
                [2.0 * grid[:, 0] / (Wm - 1.0) - 1.0, 2.0 * grid[:, 1] / (Hm - 1.0) - 1.0],
                axis=-1,
            )
            xy = jnp.broadcast_to(xy[None], (V,) + xy.shape)
            mvbs = (
                multiview_bilinear_sample_mm
                if self.cfg.train_matmul_gather_vjp
                else multiview_bilinear_sample
            )
            up_coarse = mvbs(feat_geo[0], xy).reshape(V, Hm, Wm, -1)
            up_tex = mvbs(feat_tex, xy).reshape(V, Hm, Wm, -1)
            dt = feat_geo[1].dtype
            if half:
                # hd/rgb/mask live at full res: resample them onto the half
                # grid with ONE packed gather (encode-time, amortized over
                # every ray of the render)
                full_pack = jnp.concatenate(
                    [feat_geo[1], src_images.astype(dt), src_masks.astype(dt)],
                    axis=-1,
                )
                hd_rgb_mask = mvbs(full_pack, xy).reshape(V, Hm, Wm, -1)
            else:
                hd_rgb_mask = jnp.concatenate(
                    [feat_geo[1], src_images.astype(dt), src_masks.astype(dt)],
                    axis=-1,
                )
            # keep the packed map in the compute dtype: the CNN already ran
            # in it, and the upsample's f32 interpolation weights would
            # otherwise promote the concat to f32 — doubling the HBM bytes
            # of every per-point patch gather downstream (the #1 render cost).
            # Channel layout [coarse | hd | tex | rgb | mask] is the
            # query_points slicing contract.
            hd_ch = self.cfg.geo_out_ch_hd
            fused = jnp.concatenate(
                [
                    up_coarse.astype(dt),
                    hd_rgb_mask[..., :hd_ch].astype(dt),
                    up_tex.astype(dt),
                    hd_rgb_mask[..., hd_ch:].astype(dt),
                ],
                axis=-1,
            )
            if self.cfg.use_dma_gather and not train:
                # lane-align the channel dim once here so the DMA kernel's
                # HBM patch slices need no per-query pad copy. Eval only:
                # the DMA kernel never runs in training, where the pad
                # would inflate the dominant gather + its VJP by the dead
                # channels
                c_pad = (-fused.shape[-1]) % 128
                if c_pad:
                    fused = jnp.pad(
                        fused, ((0, 0), (0, 0), (0, 0), (0, c_pad))
                    )
            feats["fused"] = fused
        elif src_masks is not None and full_res:
            feats["full"] = jnp.concatenate(
                [
                    feat_geo[1],
                    src_images.astype(feat_geo[1].dtype),
                    src_masks.astype(feat_geo[1].dtype),
                ],
                axis=-1,
            )
        return feats

    # ----------------------------------------------------------------- query
    def query_points(
        self,
        pts,          # (N, 3) world-space query points
        view_dirs,    # (N, 3) unit ray directions (target camera)
        feats,        # dict from encode()
        vb: ViewBatch,
        n_samples: int,
        rng: Optional[jax.Array],
        train: bool,
    ):
        """Evaluate [sdf, radiance, rgb] at N world points.

        Reference query/query_color (src/model.py:690-843). Returns
        (sdf (N,1), rad (N,1), rgb (N,3), valid (N,1)).
        """
        c = self.cfg
        V = vb.src_images.shape[0]
        H, W = vb.src_images.shape[1:3]
        N = pts.shape[0]
        cdt = c.compute_dtype

        krt = compose_krt(vb.src_K, vb.src_R, vb.src_t)  # (V, 4, 4)
        xy_pix, z = project_points(pts[None], krt)       # (V, N, 2), (V, N, 1)
        xy = ndc_xy(xy_pix, W, H)                        # (V, N, 2)
        zn = ndc_z(z, c.znear, c.zfar)                   # (V, N, 1)

        # frustum validity (reference model.py:725-730)
        eps = 1e-2
        in_xy = jnp.all((xy >= -1.0 - eps) & (xy <= 1.0 + eps), axis=-1, keepdims=True)
        mask = (in_xy & (zn >= -1.0)).astype(jnp.float32)  # (V, N, 1)

        # fused gathers: ONE pass over the packed per-view feature map when
        # encode() built it; grouped/separate gathers otherwise
        hd_ch = c.geo_out_ch_hd
        co_ch = c.geo_out_ch
        tx_ch = c.tex_out_ch
        feat_coarse = feat_xy = None
        # interpret-mode fallback on CPU: configs/zju.json ships
        # train_pallas_dmap=true for the TPU, but the same config must
        # still train on a CPU host (tests, smoke runs) where the Mosaic
        # kernel cannot lower
        pallas_dmap = c.train_pallas_dmap and (
            "interpret"
            if (c.pallas_interpret or jax.default_backend() == "cpu")
            else True
        )
        mvbs = (
            functools.partial(
                multiview_bilinear_sample_mm, pallas_dmap=pallas_dmap
            )
            if c.train_matmul_gather_vjp
            else multiview_bilinear_sample
        )
        if "fused" in feats:
            dma = c.use_dma_gather and not train and not self.is_initializing()
            lerp = (
                c.gather_lerp and not train and not dma
                and n_samples > c.gather_lerp_stride >= 2
                and N % n_samples == 0
            )
            if dma:
                from ..ops.feat_sample import multiview_bilinear_sample_dma

                fx = multiview_bilinear_sample_dma(
                    feats["fused"], xy.astype(jnp.float32),
                    interpret=c.pallas_interpret,
                )  # (V, N, 84 [+pad])
            elif lerp:
                fx = _strided_gather_lerp(
                    feats["fused"], xy, n_samples, c.gather_lerp_stride
                )
            else:
                fx = _ckpt_name(mvbs(feats["fused"], xy), "kpn_gathered")  # (V, N, 84)
            feat_coarse = fx[..., :co_ch]
            feat_hd = fx[..., co_ch : co_ch + hd_ch]
            feat_xy = fx[..., co_ch + hd_ch : co_ch + hd_ch + tx_ch]
            base = co_ch + hd_ch + tx_ch
            img_xy = fx[..., base : base + 3]
            fg = fx[..., base + 3 : base + 4]  # exactly 1 ch (map may be lane-padded)
        elif "full" in feats:
            if c.train_matmul_gather_vjp:
                # restrict the matmul-VJP map gradient to the hd prefix:
                # the RGB/mask channels' map gradients die at the
                # src_images/src_masks input leaves, so their dense
                # N*H*W*C contraction (the dominant backward term on this
                # 512^2 map) is skipped exactly (ops/feat_sample.py)
                full_xy = multiview_bilinear_sample_mm(
                    feats["full"], xy, grad_channels=hd_ch,
                    pallas_dmap=pallas_dmap,
                )  # (V, N, 12)
            else:
                full_xy = mvbs(feats["full"], xy)  # (V, N, 12)
            full_xy = _ckpt_name(full_xy, "kpn_gathered")
            feat_hd = full_xy[..., :hd_ch]
            img_xy = full_xy[..., hd_ch : hd_ch + 3]
            fg = full_xy[..., hd_ch + 3 : hd_ch + 4]
        else:
            feat_hd = mvbs(feats["geo"][1], xy)
            img_xy = multiview_bilinear_sample(vb.src_images, xy)
            fg = multiview_bilinear_sample(vb.src_masks, xy)

        # all views must land on the foreground (reference model.py:732-739)
        all_valid = jnp.all(mask > 0.0, axis=0)
        if not c.disable_fg_mask:
            all_valid = all_valid & jnp.all(fg > 0.1, axis=0)
        mask = mask * all_valid[None].astype(mask.dtype)

        # view dropout: keep one random view, others with p=0.5, shuffled
        # (reference model.py:742-748; per sample, not per point)
        if train and V > 1:
            rng, k1, k2 = jax.random.split(rng, 3)
            keep = jnp.concatenate(
                [
                    jnp.ones((1,), mask.dtype),
                    (jax.random.uniform(k1, (V - 1,)) > c.view_dropout).astype(mask.dtype),
                ]
            )
            keep = jax.random.permutation(k2, keep)
            mask = mask * keep[:, None, None]

        # smooth border pixel weights (reference model.py:750-759)
        xyz01 = 0.5 * jnp.concatenate([xy, zn], axis=-1) + 0.5  # (V, N, 3)
        dist_b = jnp.minimum(xyz01, 1.0 - xyz01)
        pw = jax.nn.sigmoid(5.0 * (dist_b / 0.1 - 1.0))
        pw = pw[..., 0:1] * pw[..., 1:2] * pw[..., 2:3]
        pw = pw * mask
        pw = pw / (jnp.sum(pw, axis=0, keepdims=True) + 1e-6)
        pw = jax.lax.stop_gradient(pw)

        # pixel-aligned features (reference model.py:761-769); already
        # fetched above when the fused map is in play
        if feat_coarse is None:
            feat_coarse = _ckpt_name(mvbs(feats["geo"][0], xy), "kpn_gathered")
        if feat_xy is None:
            if c.tex_onehot_sample and not train and not self.is_initializing():
                from ..ops.pallas import multiview_onehot_bilinear_sample

                feat_xy = multiview_onehot_bilinear_sample(
                    feats["tex"], xy, interpret=c.pallas_interpret
                )                                    # (V, N, 8) exact, MXU
            else:
                feat_xy = _ckpt_name(mvbs(feats["tex"], xy), "kpn_gathered")

        # relative spatial encoding (reference model.py:771-775 → spatial.py)
        pts_cam = world_to_cam(pts[None], vb.src_R, vb.src_t)    # (V, N, 3)
        kpt_cam = world_to_cam(vb.kpt3d[None], vb.src_R, vb.src_t)  # (V, Kp, 3)

        use_pallas = c.use_pallas_geo_mlp and not self.is_initializing()
        if use_pallas and c.sp_type == "rel_z_decay":
            # sp-fused kernel: the 168-wide encoding is computed in VMEM and
            # never materialized in HBM
            from ..ops.pallas import sp_geo_mlp_apply

            out, valid, _, latent_fused = sp_geo_mlp_apply(
                self.mlp_geo.variables["params"],
                pts_cam.astype(jnp.float32),
                kpt_cam.astype(jnp.float32),
                feat_coarse.astype(jnp.float32),
                feat_hd.astype(jnp.float32),
                mask.astype(jnp.float32),
                pw.astype(jnp.float32),
                sp_level=c.sp_level,
                sp_sigma=c.sp_sigma,
                sp_scale=c.sp_scale,
                interpret=c.pallas_interpret,
                compute_dtype=cdt,
            )
            sp = None
        else:
            sp = spatial_encode(
                c.sp_config, pts, pts_cam, vb.kpt3d, kpt_cam, z_ndc=zn, xy_ndc=xy
            )

        if use_pallas and c.sp_type != "rel_z_decay":
            from ..ops.pallas import geo_mlp_apply

            out, valid, _, latent_fused = geo_mlp_apply(
                self.mlp_geo.variables["params"],
                sp.astype(jnp.float32),
                feat_coarse.astype(jnp.float32),
                feat_hd.astype(jnp.float32),
                mask.astype(jnp.float32),
                pw.astype(jnp.float32),
                interpret=c.pallas_interpret,
                compute_dtype=cdt,
            )
        elif not use_pallas:
            out, valid, _, latent_fused = self.mlp_geo(
                sp.astype(cdt), [feat_coarse.astype(cdt), feat_hd.astype(cdt)],
                mask.astype(cdt), pw.astype(cdt),
            )

        # ---- color (reference query_color, model.py:784-843)
        latent24 = self.gcompress(latent_fused)                 # (N, 24)
        latent24 = jnp.broadcast_to(latent24[None], (V, N, c.gcompress_out))
        rgb_feat = jnp.concatenate(
            [img_xy.astype(cdt), feat_xy.astype(cdt), latent24], axis=-1
        )  # (V, N, 35)

        # per-view camera rays to the query points (reference model.py:823-832)
        cam_pos = camera_center(vb.src_R, vb.src_t)             # (V, 3)
        cam_rays = pts[None] - cam_pos[:, None, :]
        cam_rays = cam_rays / (jnp.linalg.norm(cam_rays, axis=-1, keepdims=True) + 1e-9)
        rd = view_dirs[None] - cam_rays                         # (V, N, 3)
        rd_norm = jnp.linalg.norm(rd, axis=-1, keepdims=True)
        rd_dir = rd / jnp.maximum(rd_norm, 1e-6)
        rd_dot = jnp.sum(cam_rays * view_dirs[None], axis=-1, keepdims=True)
        ray_diff = jnp.concatenate([rd_dir, rd_dot], axis=-1)   # (V, N, 4)

        # head stays in the native view-major (V, N, C) layout — the
        # reference's (rays, samples, views, C) reshape (model.py:828-838)
        # would materialize large transposes for no semantic difference
        rgb = self.ibr_head(
            rgb_feat, ray_diff.astype(cdt), mask.astype(cdt)
        )  # (N, 3)

        sdf = out[..., 0:1].astype(jnp.float32)
        rads = out[..., 1:].astype(jnp.float32)  # 1 ch, or 2 with separate_cf
        return sdf, rads, rgb.astype(jnp.float32), valid.astype(jnp.float32)

    def _eval_density(self, pts, view_dirs, feats, vb, n_samples, rng, train,
                      fine=False):
        """eval_func of the reference renderer (src/model.py:978-997):
        background sdf substitution, radiance noise, alpha = mask*relu(rad).
        With cfg.separate_cf the fine pass reads the second radiance channel
        (reference model.py:987-990)."""
        c = self.cfg
        noise_rng = None
        if train and rng is not None:
            rng, noise_rng = jax.random.split(rng)
        if c.remat and train:
            policy = (
                jax.checkpoint_policies.save_only_these_names("kpn_gathered")
                if c.remat_save_gathers
                else None
            )
            query = nn.remat(
                type(self).query_points, static_argnums=(5, 7), policy=policy
            )
            sdf, rads, rgb, valid = query(
                self, pts, view_dirs, feats, vb, n_samples, rng, train
            )
        else:
            sdf, rads, rgb, valid = self.query_points(
                pts, view_dirs, feats, vb, n_samples, rng, train
            )
        rad = rads[..., 1:2] if (c.separate_cf and fine) else rads[..., 0:1]
        sdf = valid * sdf + (1.0 - valid) * c.bkg_sdf
        if train and c.rand_noise_std > 0.0:
            rad = rad + jax.random.normal(noise_rng, rad.shape) * c.rand_noise_std
        alpha = valid * jax.nn.relu(rad)
        return alpha[..., 0], sdf[..., 0], rgb

    # ------------------------------------------------------------ ray march
    def render_rays(
        self,
        feats,
        vb: ViewBatch,
        origin,        # (3,) target camera center (world)
        dirs,          # (R, 3) unit ray directions (world)
        near,          # (R, 1) metric near
        far,           # (R, 1) metric far
        rng: Optional[jax.Array],
        train: bool,
        fine: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Coarse+fine ray-march (reference batch_render_pifu_nerf,
        src/model.py:1038-1096). Rays whose AABB intersection misses keep the
        full [znear, zfar] slab, exactly like the reference."""
        c = self.cfg
        Rn = dirs.shape[0]

        # clip near/far by ray-AABB intersection (reference model.py:1038-1043)
        z1, z2, hit = ray_aabb_intersection(vb.bounds, origin, dirs)
        near = jnp.where(hit & (z1 > near), z1, near)
        far = jnp.where(hit & (z2 < far), z2, far)

        if rng is not None:
            rng, k_strat, k_coarse, k_imp, k_fine = jax.random.split(rng, 5)
        else:
            k_strat = k_coarse = k_imp = k_fine = None

        z = stratified_z(k_strat, near, far, c.n_coarse, jitter=train)  # (R, S)

        ccull = (not train) and c.coarse_topk_ratio < 1.0
        if ccull:
            # coarse-pass culling: march only the top-K rays by AABB hit —
            # rays that miss the subject's box almost never pass the
            # all-views foreground test, so they composite to black anyway.
            Kc = max(1, int(Rn * c.coarse_topk_ratio))
            csel = jax.lax.top_k(hit[..., 0].astype(jnp.float32), Kc)[1]
            dirs_c = jnp.take(dirs, csel, axis=0)
            z_c = jnp.take(z, csel, axis=0)
            Rc = Kc
        else:
            csel = None
            dirs_c, z_c, Rc = dirs, z, Rn

        pts = origin + dirs_c[:, None, :] * z_c[..., None]              # (Rc, S, 3)
        view = jnp.broadcast_to(dirs_c[:, None, :], pts.shape)

        alpha_m, sdf_m, rgb_m = self._eval_density(
            pts.reshape(-1, 3), view.reshape(-1, 3), feats, vb, c.n_coarse,
            k_coarse, train,
        )
        if ccull:
            # write the marched values back to full-ray order. XLA:TPU
            # scatter serializes per index (docs/PERF.md "scatter is the
            # enemy"), so instead of scattering three big payloads, scatter
            # ONE tiny int32 inverse-index array and turn the write-back
            # into a single packed row-gather (unmarched rays take the
            # empty-space defaults row at index Rc).
            S = c.n_coarse
            inv = jnp.full((Rn,), Rc, jnp.int32).at[csel].set(
                jnp.arange(Rc, dtype=jnp.int32)
            )
            packed = jnp.concatenate(
                [
                    alpha_m.reshape(Rc, S),
                    sdf_m.reshape(Rc, S),
                    rgb_m.reshape(Rc, S * 3),
                ],
                axis=-1,
            )
            defaults = jnp.concatenate(
                [
                    jnp.zeros((1, S), packed.dtype),
                    jnp.full((1, S), c.bkg_sdf, packed.dtype),
                    jnp.zeros((1, S * 3), packed.dtype),
                ],
                axis=-1,
            )
            packed = jnp.take(
                jnp.concatenate([packed, defaults], axis=0), inv, axis=0
            )  # (Rn, 5S)
            alpha = packed[:, :S]
            sdf = packed[:, S : 2 * S]
            rgb = packed[:, 2 * S :].reshape(Rn, S, 3)
        else:
            alpha = alpha_m.reshape(Rn, c.n_coarse)
            sdf = sdf_m.reshape(Rn, c.n_coarse)
            rgb = rgb_m.reshape(Rn, c.n_coarse, 3)

        # fused composite + importance kernel (eval): one VMEM-resident
        # pass produces the coarse outputs AND the fine depths
        use_pc = (not train) and c.use_pallas_composite and fine
        if use_pc:
            from ..geometry.compositing import CompositeOut
            from ..ops.pallas import composite_importance_pallas

            u = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, c.n_fine, dtype=z.dtype),
                (Rn, c.n_fine),
            )
            pc_color, pc_depth, pc_acc, pc_sdf, pc_contrib, z_fine = (
                composite_importance_pallas(
                    z, alpha, sdf, rgb, u, interpret=c.pallas_interpret
                )
            )
            coarse = CompositeOut(pc_color, pc_depth, pc_acc, pc_contrib, pc_sdf)
        else:
            coarse = composite(alpha, sdf, rgb, z)

        out = {
            "rgb_coarse": coarse.color,
            "depth_coarse": coarse.depth,
            "acc_coarse": coarse.acc,
        }
        if not fine:
            return out

        if not use_pc:
            # importance resampling over interior bins (reference
            # model.py:1072-1076)
            z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
            contrib = jax.lax.stop_gradient(coarse.contrib[..., 1:-1])
            z_fine = importance_z(
                k_imp, contrib, z_mid, c.n_fine, uniform=not train
            )
        n_all = c.n_coarse + c.n_fine

        cull = (not train) and c.fine_topk_ratio < 1.0
        if cull:
            # fine-pass ray culling: march only the top-K rays by coarse
            # opacity; the rest keep the coarse result (their contribution
            # is ~0). Fixed K keeps shapes static.
            K = max(1, int(Rn * c.fine_topk_ratio))
            sel = jax.lax.top_k(coarse.acc, K)[1]                  # (K,)
            dirs_f = jnp.take(dirs, sel, axis=0)
            Rf = K
        else:
            sel = None
            dirs_f, Rf = dirs, Rn

        # Eval-time coarse-value reuse: the union pass re-evaluates the 64
        # coarse depths (reference model.py:1076 re-runs eval_func on the
        # full union); without train-time noise/dropout the query is
        # deterministic, so evaluate ONLY the new fine depths and merge the
        # cached coarse values by a payload sort — exact result, 1/3 fewer
        # point evaluations.
        reuse = (not train) and c.reuse_coarse_eval and not c.separate_cf
        if reuse:
            z_f = jnp.take(z_fine, sel, axis=0) if cull else z_fine  # (Rf, Sf)
            pts = origin + dirs_f[:, None, :] * z_f[..., None]
            view = jnp.broadcast_to(dirs_f[:, None, :], pts.shape)
            alpha_f, sdf_f, rgb_f = self._eval_density(
                pts.reshape(-1, 3), view.reshape(-1, 3), feats, vb, c.n_fine,
                k_fine, train, fine=True,
            )
            alpha_c = jnp.take(alpha, sel, axis=0) if cull else alpha
            sdf_c = jnp.take(sdf, sel, axis=0) if cull else sdf
            rgb_c = jnp.take(rgb, sel, axis=0) if cull else rgb
            z_c = jnp.take(z, sel, axis=0) if cull else z
            # both depth arrays are sorted at eval (stratified bins;
            # inverse-CDF of increasing u), so the stable payload sort the
            # reference implies is a stable MERGE — one comparison-count +
            # permutation contraction instead of a bitonic sort over five
            # payload columns (exact; geometry/sampling.py)
            v_c = jnp.concatenate([alpha_c[..., None], sdf_c[..., None], rgb_c], -1)
            v_f = jnp.concatenate(
                [
                    alpha_f.reshape(Rf, c.n_fine, 1),
                    sdf_f.reshape(Rf, c.n_fine, 1),
                    rgb_f.reshape(Rf, c.n_fine, 3),
                ],
                axis=-1,
            )
            zs, vs = merge_sorted_payloads(z_c, z_f, v_c, v_f)
            fine_out = composite(vs[..., 0], vs[..., 1], vs[..., 2:5], zs)
        else:
            z_all = union_sorted_z(z, z_fine)                      # (R, Sc+Sf)
            z_all_f = jnp.take(z_all, sel, axis=0) if cull else z_all
            pts = origin + dirs_f[:, None, :] * z_all_f[..., None]
            view = jnp.broadcast_to(dirs_f[:, None, :], pts.shape)
            alpha_a, sdf_a, rgb_a = self._eval_density(
                pts.reshape(-1, 3), view.reshape(-1, 3), feats, vb, n_all,
                k_fine, train, fine=True,
            )
            fine_out = composite(
                alpha_a.reshape(Rf, n_all), sdf_a.reshape(Rf, n_all),
                rgb_a.reshape(Rf, n_all, 3), z_all_f,
            )
        if cull:
            # same inverse-index + packed row-gather as the coarse cull:
            # one tiny int32 scatter, then unmarched rays select their
            # per-ray coarse fallback with a jnp.where
            inv = jnp.full((Rn,), Rf, jnp.int32).at[sel].set(
                jnp.arange(Rf, dtype=jnp.int32)
            )
            fine_packed = jnp.concatenate(
                [
                    fine_out.color,
                    fine_out.depth[:, None],
                    fine_out.acc[:, None],
                    fine_out.sdf[:, None],
                ],
                axis=-1,
            )  # (Rf, 6)
            fine_packed = jnp.concatenate(
                [fine_packed, jnp.zeros((1, 6), fine_packed.dtype)], axis=0
            )
            taken = jnp.take(fine_packed, inv, axis=0)             # (Rn, 6)
            fallback = jnp.concatenate(
                [
                    jnp.asarray(coarse.color),
                    coarse.depth[:, None],
                    coarse.acc[:, None],
                    coarse.sdf[:, None].astype(taken.dtype),
                ],
                axis=-1,
            )
            res = jnp.where((inv < Rf)[:, None], taken, fallback)
            out.update(
                {"rgb_fine": res[:, :3], "depth_fine": res[:, 3],
                 "acc_fine": res[:, 4], "sdf_fine": res[:, 5]}
            )
        else:
            out.update(
                {
                    "rgb_fine": fine_out.color,
                    "depth_fine": fine_out.depth,
                    "acc_fine": fine_out.acc,
                    "sdf_fine": fine_out.sdf,
                }
            )
        return out

    # ------------------------------------------------------------- training
    def sample_patch_pixels(self, vb: ViewBatch, rng) -> jnp.ndarray:
        """Random patch centered on a foreground pixel (reference
        model.py:1008-1017), drawn inside jit with a categorical over the
        mask. Returns (P*P, 2) integer pixel coords."""
        c = self.cfg
        H, W = vb.tar_mask.shape[:2]
        flat = vb.tar_mask.reshape(-1)
        logits = jnp.where(flat > 0.5, 0.0, -jnp.inf)
        # guard: if the mask is empty, fall back to uniform
        logits = jnp.where(jnp.any(flat > 0.5), logits, jnp.zeros_like(logits))
        idx = jax.random.categorical(rng, logits)
        cy, cx = idx // W, idx % W
        # shift the patch WINDOW inside the frame (don't clamp pixels
        # individually — that duplicates border rows/columns and feeds the
        # patch-structured VGG loss a smeared image no real patch matches)
        x0 = jnp.clip(cx - c.patch_w // 2, 0, max(W - c.patch_w, 0))
        y0 = jnp.clip(cy - c.patch_h // 2, 0, max(H - c.patch_h, 0))
        grid = pixel_grid(c.patch_h, c.patch_w) + jnp.stack([x0, y0])
        # belt-and-braces per-axis clamp for the degenerate patch > image
        # case: x in [0, W-1], y in [0, H-1]
        return jnp.clip(grid, 0, jnp.array([W - 1, H - 1]))

    def __call__(self, vb: ViewBatch, train: bool = True):
        """One full forward: encode views, render a training patch, gather GT.

        Returns dict with (P, P, ...) images: rgb_coarse/rgb_fine/depth/acc +
        target_rgb/target_alpha, ready for the loss stack.
        """
        c = self.cfg
        H, W = vb.tar_image.shape[:2]
        rng = self.make_rng("render") if train else None

        feats = self.encode(vb.src_images, vb.src_masks, train)

        if train:
            rng, k_patch = jax.random.split(rng)
            pix = self.sample_patch_pixels(vb, k_patch)  # (P*P, 2)
            ph, pw = c.patch_h, c.patch_w
        else:
            pix = pixel_grid(H, W)
            ph, pw = H, W

        origin, dirs, near, far = camera_rays(
            pix.astype(jnp.float32), vb.tar_K, vb.tar_R, vb.tar_t, c.znear, c.zfar
        )
        out = self.render_rays(feats, vb, origin, dirs, near, far, rng, train)

        flat_idx = pix[:, 1] * W + pix[:, 0]
        tar_rgb = jnp.take(vb.tar_image.reshape(-1, 3), flat_idx, axis=0)
        tar_alpha = jnp.take(vb.tar_mask.reshape(-1, 1), flat_idx, axis=0)

        images = {
            k: v.reshape((ph, pw) + v.shape[1:]) for k, v in out.items()
        }
        images["target_rgb"] = tar_rgb.reshape(ph, pw, 3)
        images["target_alpha"] = tar_alpha.reshape(ph, pw, 1)
        return images
