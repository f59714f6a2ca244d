"""Convolutional feature encoders (Flax, NHWC).

TPU-native equivalents of the reference's pixel-aligned encoders:

  * HGFilter — stacked-hourglass geometry encoder (reference HGFilterV2,
    src/utils.py:322-414): input (V, H, W, 3) in [-1, 1]; returns a 64-ch
    coarse map at H/4 and an 8-ch hi-res map at H/2.
  * ResBlkEncoder — conv encoder-decoder texture encoder (reference
    src/utils.py:216-259): 8-ch output at H/2 (3 downs, 2 ups).

Design notes (TPU-first, not a translation):
  * NHWC layout throughout — XLA's native conv layout on TPU.
  * GroupNorm instead of (Sync)BatchNorm: the zju config already uses
    GroupNorm (utils.py:327), and GroupNorm needs no cross-device stat sync.
  * InstanceNorm is GroupNorm with one group per channel.
  * The hourglass's bicubic align_corners upsample is expressed as two
    small dense interpolation matmuls (MXU-friendly), numerically exact vs
    torch `interpolate(..., align_corners=True)` (utils.py:304).
  * Replication padding = jnp.pad(mode='edge').
  * All convolutions use explicit torch-style padding so reference torch
    checkpoints import with exact numerics (utils/import_torch.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.nn.initializers import he_normal, zeros


def _conv(out_ch, kernel, stride=1, use_bias=True, padding=None, dtype=None):
    """Conv with torch-style symmetric padding p = (k-1)//2.

    Identical to "SAME" at stride 1; at stride 2 XLA's SAME pads (p-1, p)
    while torch pads (p, p) — a one-pixel feature-map shift that would break
    numeric parity with imported reference checkpoints, so the padding is
    always explicit.
    """
    if padding is None:
        p = (kernel - 1) // 2
        padding = ((p, p), (p, p))
    return nn.Conv(
        out_ch,
        (kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        use_bias=use_bias,
        kernel_init=he_normal(),
        bias_init=zeros,
        dtype=dtype,
    )


def _deconv2x(out_ch, kernel=3, use_bias=True, dtype=None):
    """2x upsampling transposed conv, exactly torch
    ConvTranspose2d(k=3, s=2, p=1, output_padding=1): lo/hi padding
    (k-1-p, k-1-p+op) = (1, 2) on the dilated input, flipped kernel
    (transpose_kernel=True; param layout (kh, kw, out, in)).

    With the transposed layout the input-channel axis is LAST, so the
    fan axes are passed explicitly — he_normal()'s default (in_axis=-2)
    would compute fan-in from the output channels and inflate the init
    std by sqrt(in/out) on every 2x-up deconv (in=2*out here), which
    measurably destabilizes early training."""
    return nn.ConvTranspose(
        out_ch,
        (kernel, kernel),
        strides=(2, 2),
        padding=((1, 2), (1, 2)),
        transpose_kernel=True,
        use_bias=use_bias,
        kernel_init=he_normal(in_axis=-1, out_axis=-2),
        bias_init=zeros,
        dtype=dtype,
    )


def avg_pool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def replication_pad(x, pad):
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


def group_norm(ch, dtype=None):
    # epsilon 1e-5 = torch GroupNorm default (parity for imported ckpts)
    return nn.GroupNorm(num_groups=min(32, ch), epsilon=1e-5, dtype=dtype)


def instance_norm(dtype=None):
    """InstanceNorm2d affine=False: per-sample per-channel normalization."""
    return nn.GroupNorm(
        num_groups=None, group_size=1, use_bias=False, use_scale=False,
        epsilon=1e-5, dtype=dtype,
    )


def upsample2x_bicubic_align_corners(x):
    """2x bicubic upsample with align_corners=True — exactly torch
    `F.interpolate(scale_factor=2, mode='bicubic', align_corners=True)`
    (the reference hourglass upsample, src/utils.py:304).

    jax.image.resize has no align_corners mode, so the (static-shape)
    interpolation is expressed as two small dense matmuls out = A x Aᵀ —
    MXU-friendly and exact. x: (..., H, W, C).
    """
    import numpy as np

    def upmat(n: int) -> jnp.ndarray:
        m = 2 * n
        A = np.zeros((m, n), np.float32)
        a = -0.75  # torch cubic convolution constant

        def cubic(t):
            t = abs(t)
            if t <= 1.0:
                return (a + 2) * t**3 - (a + 3) * t**2 + 1
            if t < 2.0:
                return a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a
            return 0.0

        for i in range(m):
            src = i * (n - 1) / (m - 1) if m > 1 else 0.0
            i0 = int(np.floor(src))
            t = src - i0
            for k in range(-1, 3):
                j = min(max(i0 + k, 0), n - 1)  # border clamp
                A[i, j] += cubic(k - t)
        return jnp.asarray(A)

    H, W = x.shape[-3], x.shape[-2]
    Ah, Aw = upmat(H), upmat(W)
    dt = x.dtype
    y = jnp.einsum("ih,...hwc->...iwc", Ah, x.astype(jnp.float32))
    y = jnp.einsum("jw,...iwc->...ijc", Aw, y)
    return y.astype(dt)


class ConvBlock(nn.Module):
    """Pre-activation multi-scale residual block (reference ConvBlock,
    src/utils.py:416-474): three 3x3 convs at C/2, C/4, C/4 whose outputs are
    concatenated, plus a 1x1-projected residual when widths differ."""

    out_ch: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        dt = self.dtype
        h1 = _conv(self.out_ch // 2, 3, use_bias=False, dtype=dt)(nn.relu(group_norm(in_ch, dt)(x)))
        h2 = _conv(self.out_ch // 4, 3, use_bias=False, dtype=dt)(nn.relu(group_norm(self.out_ch // 2, dt)(h1)))
        h3 = _conv(self.out_ch // 4, 3, use_bias=False, dtype=dt)(nn.relu(group_norm(self.out_ch // 4, dt)(h2)))
        out = jnp.concatenate([h1, h2, h3], axis=-1)
        res = x
        if in_ch != self.out_ch:
            res = _conv(self.out_ch, 1, use_bias=False, dtype=dt)(nn.relu(group_norm(in_ch, dt)(x)))
        return out + res


class HourGlass(nn.Module):
    """Recursive hourglass (reference src/utils.py:261-309)."""

    depth: int
    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        up1 = ConvBlock(self.features, self.dtype)(x)
        low = ConvBlock(self.features, self.dtype)(avg_pool2(x))
        if self.depth > 1:
            low = HourGlass(self.depth - 1, self.features, self.dtype)(low)
        else:
            low = ConvBlock(self.features, self.dtype)(low)
        low = ConvBlock(self.features, self.dtype)(low)
        up2 = upsample2x_bicubic_align_corners(low)
        return up1 + up2


class HGFilter(nn.Module):
    """Stacked-hourglass geometry encoder.

    Input:  (V, H, W, 3) images scaled to [-1, 1].
    Output: list [coarse (V, H/4, W/4, out_ch), hires (V, H/2, W/2, out_ch_hd)].
    """

    n_stack: int = 1
    n_downsample: int = 4
    out_ch: int = 64
    out_ch_hd: int = 8
    hd: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = nn.relu(group_norm(64, dt)(_conv(64, 7, stride=2, dtype=dt)(x)))
        x = ConvBlock(128, dt)(x)

        # hi-res branch: deconv 128->32 + GN + relu, then 5x5 conv -> out_ch_hd
        hd = nn.relu(group_norm(32, dt)(_deconv2x(32, use_bias=False, dtype=dt)(x)))
        x_hd = _conv(self.out_ch_hd, 5, dtype=dt)(hd)

        if not self.hd:
            x = avg_pool2(x)
        x = ConvBlock(128, dt)(x)
        x = ConvBlock(256, dt)(x)

        previous = x
        out = None
        for i in range(self.n_stack):
            hg = HourGlass(self.n_downsample, 256, dt)(previous)
            ll = ConvBlock(256, dt)(hg)
            ll = nn.relu(group_norm(256, dt)(_conv(256, 1, dtype=dt)(ll)))
            out = _conv(self.out_ch, 1, dtype=dt)(ll)
            if i < self.n_stack - 1:
                previous = previous + _conv(256, 1, dtype=dt)(ll) + _conv(256, 1, dtype=dt)(out)
        return [out, x_hd]


class ResBlk(nn.Module):
    """Replication-padded residual block with InstanceNorm (reference
    src/utils.py:199-214)."""

    ch: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        h = _conv(self.ch, 3, padding="VALID", dtype=dt)(replication_pad(x, 1))
        h = nn.relu(instance_norm(dt)(h))
        h = _conv(self.ch, 3, padding="VALID", dtype=dt)(replication_pad(h, 1))
        h = instance_norm(dt)(h)
        return x + h


class ResBlkEncoder(nn.Module):
    """Texture encoder-decoder (reference src/utils.py:216-259).

    Input:  (V, H, W, 3) in [-1, 1].
    Output: (V, H/2, W/2, out_ch) for n_downsample=3, n_upsample=2.
    """

    out_ch: int = 8
    ngf: int = 64
    n_downsample: int = 3
    n_blocks: int = 4
    n_upsample: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = _conv(self.ngf, 7, padding="VALID", dtype=dt)(replication_pad(x, 3))
        x = nn.relu(instance_norm(dt)(x))
        for i in range(self.n_downsample):
            mult = 2**i
            x = _conv(self.ngf * mult * 2, 3, stride=2, dtype=dt)(x)
            x = nn.relu(instance_norm(dt)(x))
        for _ in range(self.n_blocks):
            x = ResBlk(self.ngf * 2**self.n_downsample, dt)(x)
        for i in range(self.n_upsample):
            mult = 2 ** (self.n_downsample - i)
            x = _deconv2x(self.ngf * mult // 2, dtype=dt)(x)
            x = nn.relu(instance_norm(dt)(x))
        if self.n_upsample > 0:
            mult = 2 ** (self.n_downsample - self.n_upsample + 1)
            x = _conv(self.out_ch, 7, padding="VALID", dtype=dt)(replication_pad(x, 3))
        return x
