"""IBRNet-style color blending head (Flax).

Semantics of the reference IBRRenderingHead (src/model.py:1239-1302): encode
per-view ray differences, compute anisotropy-weighted view statistics, run a
small residual/visibility MLP, and softmax-blend the *source-view RGB* with
the predicted per-view logits.

TPU layout note: the reference reshapes points to (rays, samples, views, C)
before the head (src/model.py:828-838) — on TPU those transposes materialize
multi-GB intermediates. Every op in the head is per-point except the view
reductions, so this implementation keeps the renderer's native **view-major
(V, N, C)** layout and reduces over axis 0; the reshape disappears entirely.
"""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn
from jax.nn.initializers import he_normal, zeros, constant

from .mlp import WNDense


def _dense(feats, dtype=None, name=None):
    return nn.Dense(
        feats, kernel_init=he_normal(), bias_init=zeros, dtype=dtype, name=name
    )


def _split_dense(feats, dtype=None, name=None):
    """Dense over a TUPLE of inputs with the concatenation folded into the
    contraction: dot(concat(xs), W) == sum_i dot(x_i, W_i) over row-blocks
    of W. Two wins on TPU: the wide concat input is never materialized in
    HBM, and parts with a broadcast leading dim (e.g. the (1, N, C)
    cross-view mean/var) are contracted BEFORE broadcasting to (V, N, C) —
    1/V of the matmul FLOPs for those parts. Shares WNDense (use_wn=False:
    identical kernel/bias param tree and he_normal init as nn.Dense, f32
    partial-sum accumulation) rather than duplicating the fold logic."""
    return WNDense(features=feats, use_wn=False, dtype=dtype, name=name)


def weighted_mean_var(x, w, axis=0):
    """Weighted mean/variance over the view axis (reference
    `fused_mean_variance`, src/utils.py:91-95)."""
    mean = jnp.sum(x * w, axis=axis, keepdims=True)
    var = jnp.sum(w * (x - mean) ** 2, axis=axis, keepdims=True)
    return mean, var


class IBRRenderingHead(nn.Module):
    """Predict per-point RGB by blending source-view pixels.

    Inputs are view-major: (V, N, C). Returns (N, 3).
    """

    in_feat_ch: int = 32  # rgb_feat width = in_feat_ch + 3
    dtype: object = None

    @nn.compact
    def __call__(self, rgb_feats, ray_diffs, proj_mask):
        """
        Args:
          rgb_feats: (V, N, in_feat_ch + 3) [src RGB | tex feat | geo latent].
          ray_diffs: (V, N, 4) [unit ray-difference dir, dot product].
          proj_mask: (V, N, 1) validity of each view\'s projection.
        Returns:
          (N, 3) blended colors.
        """
        width = self.in_feat_ch + 3

        ani_al = self.param("ani_al", constant(0.2), ())

        # all Dense modules are explicitly named to keep the param tree
        # identical to the original nn.Dense auto-numbering (Dense_0..10) —
        # checkpoints and the torch importer depend on those paths
        dir_feat = _dense(16, self.dtype, name="Dense_0")(ray_diffs)
        dir_feat = nn.elu(dir_feat)
        dir_feat = _dense(width, self.dtype, name="Dense_1")(dir_feat)
        dir_feat = nn.elu(dir_feat)

        src_rgb = rgb_feats[..., :3]
        feats = jnp.concatenate(
            [rgb_feats[..., :width] + dir_feat, rgb_feats[..., width:]], axis=-1
        )

        dot = ray_diffs[..., 3:4]
        exp_dot = jnp.exp(jnp.abs(ani_al) * (dot - 1.0))
        w = (exp_dot - jnp.min(exp_dot, axis=0, keepdims=True)) * proj_mask
        w = w / (jnp.sum(w, axis=0, keepdims=True) + 1e-8)

        mean, var = weighted_mean_var(feats, w, axis=0)     # (1, N, width) x2
        # concat([mean, var, feats]) folded into the Dense_2 contraction —
        # the mean/var parts contract at (1, N, .) and broadcast after
        x = nn.elu(_split_dense(64, self.dtype, name="Dense_2")((mean, var, feats)))
        x = nn.elu(_dense(32, self.dtype, name="Dense_3")(x))

        # NOTE: the original code built these denses inline in nested
        # expressions, so Flax numbered them in CONSTRUCTION order (outer
        # call first) — e.g. Dense_4 is the 33-wide layer applied AFTER
        # Dense_5. The explicit names below reproduce that historical
        # numbering exactly.
        pred = nn.elu(
            _dense(33, self.dtype, name="Dense_4")(
                nn.elu(_dense(32, self.dtype, name="Dense_5")(x * w))
            )
        )
        res, vis = pred[..., :-1], pred[..., -1:]
        x = x + res
        vis = nn.sigmoid(
            _dense(1, self.dtype, name="Dense_6")(
                nn.elu(
                    _dense(32, self.dtype, name="Dense_7")(
                        x * nn.sigmoid(vis) * proj_mask
                    )
                )
            )
        )
        vis = vis * proj_mask

        # concat([x, vis, ray_diffs]) folded into the Dense_10 contraction
        x = _split_dense(16, self.dtype, name="Dense_10")((x, vis, ray_diffs))
        x = _dense(1, self.dtype, name="Dense_8")(
            nn.elu(_dense(8, self.dtype, name="Dense_9")(nn.elu(x)))
        )
        logits = jnp.where(proj_mask == 0.0, -1e9, x.astype(jnp.float32))
        blend = nn.softmax(logits, axis=0)
        return jnp.sum(src_rgb * blend, axis=0)
