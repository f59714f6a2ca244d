"""Geometry MLP stack (Flax): weight-norm linears, skip-injected per-view
MLP, masked cross-view pooling, and the fused geometry head.

Functional redesign of the reference's MLPUNet / PoolModule / MLPUNetFusion
(src/utils.py:476-748). Shapes are kept flat — (V, N, C) or (N, C) — so the
matmuls land on the MXU as large (N x C_in) x (C_in x C_out) contractions.
No attach-state; everything flows through arguments.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn
from jax.nn.initializers import he_normal, zeros


def softplus100(x):
    """Softplus with beta=100 (reference src/utils.py:524): effectively a
    smooth ReLU with a very tight knee.

    Computed via the overflow-safe identity
    softplus(y) = max(y, 0) + log1p(exp(-|y|)): same math as
    jnp.logaddexp(y, 0) but skips logaddexp's generic two-operand
    max/select plumbing — the activation runs on the VPU over every
    (view, point, channel) element of the geometry MLP, where it is one
    of the largest non-gather costs of the render."""
    y = 100.0 * x
    return (jnp.maximum(y, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(y)))) * 0.01


_NL: dict[str, Optional[Callable]] = {
    "softplus": softplus100,
    "relu": nn.relu,
    "elu": nn.elu,
    "leakyrelu": lambda x: nn.leaky_relu(x, 0.2),
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
    "none": None,
    "": None,
    None: None,
}


def get_nl(name):
    if name not in _NL:
        raise NotImplementedError(f"unsupported nl layer {name}")
    return _NL[name]


class WNDense(nn.Module):
    """Dense layer with optional weight normalization.

    Weight-norm reparametrization w = g * v / ||v||_col (torch
    `weight_norm` with dim=0, i.e. one gain per output unit; reference
    src/utils.py:543). `g` is initialized to sqrt(2) so the initial
    effective std approximates He-normal fan-in init.

    `x` may also be a tuple/list of arrays whose channel widths sum to
    the layer's input width. The concatenation is folded into the
    contraction — dot(concat(xs), W) == sum_i dot(x_i, W_i) with W_i
    row-blocks of W — so the wide concat input is never materialized in
    HBM (XLA cannot fuse a concatenate into a dot operand; on TPU the
    (V, N, 168)-style skip concats otherwise cost a full write+read of
    HBM traffic per layer). Param shapes are identical either way.
    """

    features: int
    use_wn: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        xs = x if isinstance(x, (list, tuple)) else (x,)
        in_features = sum(a.shape[-1] for a in xs)
        v = self.param("kernel", he_normal(), (in_features, self.features))
        b = self.param("bias", zeros, (self.features,))
        if self.use_wn:
            g = self.param(
                "gain", lambda key, shape: jnp.full(shape, jnp.sqrt(2.0)), (self.features,)
            )
            # weight-norm math in f32 (cheap, numerically sensitive)
            norm = jnp.linalg.norm(v, axis=0, keepdims=True)
            w = v * (g[None, :] / (norm + 1e-12))
        else:
            w = v
        if self.dtype is not None:
            xs = tuple(a.astype(self.dtype) for a in xs)
            w = w.astype(self.dtype)
        out = None
        off = 0
        for a in xs:
            wi = w[off : off + a.shape[-1]]
            off += a.shape[-1]
            d = jnp.dot(a, wi, preferred_element_type=jnp.float32)
            out = d if out is None else out + d
        return out + b


class MLP(nn.Module):
    """Plain MLP with optional input re-concat skips (reference
    src/utils.py:555-587). Last layer: no nonlinearity, no weight norm."""

    dims: Sequence[int]          # (in, hidden..., out)
    skip_layers: Sequence[int] = ()
    nl_layer: str = "softplus"
    weight_norm: bool = True
    last_op: Optional[str] = None
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        nl = get_nl(self.nl_layer)
        x0 = x
        n = len(self.dims) - 1
        for i in range(n):
            if i in self.skip_layers:
                x = (x, x0)  # folded into the next contraction (no concat)
            last = i == n - 1
            x = WNDense(self.dims[i + 1], use_wn=self.weight_norm and not last,
                        dtype=self.dtype)(x)
            if not last and nl is not None:
                x = nl(x)
        last_nl = get_nl(self.last_op)
        return last_nl(x) if last_nl is not None else x


class MLPUNet(nn.Module):
    """MLP with image-feature skip injection (reference src/utils.py:649-720):
    at each layer listed in `skip_layers`, the corresponding entry of the
    feature list is concatenated to the activations before the linear."""

    dims: Sequence[int]
    skip_dims: Sequence[int]
    skip_layers: Sequence[int]
    nl_layer: str = "softplus"
    weight_norm: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, feats: Sequence[jnp.ndarray]):
        assert len(self.skip_dims) == len(self.skip_layers)
        skip_idx = {layer: i for i, layer in enumerate(self.skip_layers)}
        nl = get_nl(self.nl_layer)
        n = len(self.dims) - 1
        for i in range(n):
            if i in skip_idx:
                f = feats[skip_idx[i]]
                # feature injection folds into the contraction (no concat)
                x = f if x is None else (x, f)
            last = i == n - 1
            x = WNDense(self.dims[i + 1], use_wn=self.weight_norm and not last,
                        dtype=self.dtype)(x)
            if not last and nl is not None:
                x = nl(x)
        return x


def pool_ops(x, pool_types, weight):
    """Weighted pooling primitives over the view axis (reference
    src/utils.py:722-748). x: (V, N, C); weight: (V, N, 1-or-C)."""
    outs = []
    if "max" in pool_types:
        outs.append(jnp.max(x, axis=0))
    mean = jnp.sum(weight * x, axis=0)
    if "mean" in pool_types:
        outs.append(mean)
    if "var" in pool_types:
        outs.append(jnp.sum(weight * (x - mean[None]) ** 2, axis=0))
    return jnp.concatenate(outs, axis=-1)


def masked_pool(x, mask, weight=None, pool_types=("mean", "var")):
    """Masked weighted mean/var pooling across the view axis.

    Reference PoolModule/pool_ops (src/utils.py:589-647, 722-748), reduced to
    the weighted mean/var path used by the zju config. Pure function — the
    attention pooling variants live in :class:`AttentionPool` below.

    Args:
      x:      (V, N, C) per-view latents.
      mask:   (V, N, 1) validity.
      weight: (V, N, 1) normalized pixel weights (defaults to mask/sum).
      pool_types: subset of {"max", "mean", "var"}.
    Returns:
      pooled: (N, len(pool_types) * C)
      valid:  (N, 1) bool — at least one view valid.
    """
    a_sum = jnp.sum(mask, axis=0)  # (N, 1)
    if weight is None:
        weight = mask / (a_sum[None] + 1e-6)
    outs = []
    if "max" in pool_types:
        outs.append(jnp.max(x, axis=0))
    mean = jnp.sum(weight * x, axis=0)  # (N, C)
    if "mean" in pool_types:
        outs.append(mean)
    if "var" in pool_types:
        var = jnp.sum(weight * (x - mean[None]) ** 2, axis=0)
        outs.append(var)
    valid = a_sum > 0.0
    return jnp.concatenate(outs, axis=-1), valid


class GeoFusionMLP(nn.Module):
    """The full geometry head (reference MLPUNetFusion, src/utils.py:476-517):
    per-view skip-injected MLP -> masked mean/var pool -> fusion MLP.

    Inputs are per-sample (no batch axis): vmap over batch outside.
    """

    dims1: Sequence[int]          # e.g. (168, 128, 128, 120, 64)
    dims2: Sequence[int]          # e.g. (128, 64, 64, 2)
    skip_dims: Sequence[int]      # e.g. (64, 8)
    skip_layers: Sequence[int]    # e.g. (0, 2)
    nl_layer: str = "softplus"
    weight_norm: bool = True
    pool_types: Sequence[str] = ("mean", "var")
    # "" = plain masked mean/var pooling (the zju default); "attention_v0" /
    # "attention_v1" select the reference PoolModule's attention modes
    # (src/utils.py:589-647)
    pool_mode: str = ""
    dtype: object = None

    @nn.compact
    def __call__(self, sp_feat, im_feats, mask, weight):
        """
        Args:
          sp_feat:  (V, N, D_sp) spatial encoding per view.
          im_feats: list of (V, N, C_i) sampled image features (skip inputs).
          mask:     (V, N, 1) per-view validity.
          weight:   (V, N, 1) normalized pixel weights.
        Returns:
          out:          (N, dims2[-1]) fused prediction ([sdf-proxy, radiance]).
          valid:        (N, 1) any-view-valid mask.
          latent_view:  (V, N, dims1[-1]) per-view latents.
          latent_fused: (N, dims2[0]) pooled latent (input of the fusion MLP).
        """
        latent_view = MLPUNet(
            self.dims1, self.skip_dims, self.skip_layers, self.nl_layer,
            self.weight_norm, self.dtype,
        )(sp_feat, im_feats)
        if self.pool_mode in ("attention_v0", "attention_v1"):
            latent_fused, valid = AttentionPool(
                pool_types=tuple(self.pool_types), pool_mode=self.pool_mode
            )(latent_view, mask, weight)
        else:
            latent_fused, valid = masked_pool(
                latent_view, mask, weight, tuple(self.pool_types)
            )
        out = MLP(self.dims2, (), self.nl_layer, self.weight_norm,
                  dtype=self.dtype)(latent_fused)
        return out, valid, latent_view, latent_fused


class AttentionPool(nn.Module):
    """Attention-weighted cross-view pooling — the reference PoolModule's
    optional `attention_v0` / `attention_v1` modes (src/utils.py:589-647),
    unused by the zju config but part of the reference surface.

    v0: per-(view, point) scalar logits from a linear projection reweight
        the pixel weights.
    v1: multi-head dot-product attention between a pooled query (max+mean)
        and per-view keys.
    """

    pool_types: Sequence[str] = ("mean", "var")
    pool_mode: str = "attention_v0"
    n_heads: int = 1

    @nn.compact
    def __call__(self, x, mask, weight=None):
        """x: (V, N, C); mask: (V, N, 1). Returns (pooled, valid)."""
        V, N, C = x.shape
        a_sum = jnp.sum(mask, axis=0)
        if weight is None:
            weight = mask / (a_sum[None] + 1e-6)
        w = weight
        if V > 1:
            if self.pool_mode == "attention_v0":
                att = jnp.exp(nn.Dense(1)(x))                   # (V, N, 1)
                w = w * att
                w = w / (jnp.sum(w, axis=0, keepdims=True) + 1e-6)
            elif self.pool_mode == "attention_v1":
                D = C // self.n_heads
                q = nn.Dense(C)(pool_ops(x, ["max", "mean"], mask / (a_sum[None] + 1e-6))[..., : 2 * C])
                q = q.reshape(N, D, self.n_heads)
                k = nn.Dense(C)(x).reshape(V, N, D, self.n_heads)
                att = jnp.einsum("ndh,vndh->vnh", q, k) / (D**2)
                att = jnp.exp(att)[..., None, :]                # (V, N, 1, H)
                att = jnp.broadcast_to(att, (V, N, D, self.n_heads)).reshape(V, N, C)
                w = w * att
                w = w / (jnp.sum(w, axis=0, keepdims=True) + 1e-6)
        pooled = pool_ops(x, tuple(self.pool_types), w)
        valid = a_sum > (1.0 if tuple(self.pool_types) == ("var",) else 0.0)
        return pooled, valid
