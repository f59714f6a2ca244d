"""VGG19 perceptual feature network + loss (Flax).

The reference uses torchvision's ImageNet-pretrained VGG19 sliced at
relu1_1 / relu2_1 / relu3_1 / relu4_1 with L1 feature losses weighted
[1/16, 1/8, 1/4, 1] (reference src/utils.py:750-805); it contributes
lambda=0.5 of the training signal (configs/zju.json:111).

This environment has no torchvision and no network egress, so pretrained
weights cannot be downloaded here. The module therefore supports:

  * `load_torch_vgg19(path)` — convert a torchvision `vgg19` state-dict
    (.pth, loadable with plain torch) into Flax params, for machines that
    have the weights.
  * random frozen features as fallback — random-projection perceptual
    losses still regularize texture, and CI runs with them.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# conv widths of VGG19 features[:21]: slices end after relu1_1, relu2_1,
# relu3_1, relu4_1 (torchvision layer indices 2, 7, 12, 21)
_SLICES: Sequence[Sequence[int]] = (
    (64,),               # conv1_1          -> relu1_1
    (64, 128),           # conv1_2, conv2_1 -> relu2_1 (pool after conv1_2)
    (128, 256),          # conv2_2, conv3_1 -> relu3_1
    (256, 256, 256, 512),  # conv3_2..4, conv4_1 -> relu4_1
)
# torch features indices of the conv layers in the same order
_TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 16, 19)

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

LOSS_WEIGHTS = (1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


class VGG19Features(nn.Module):
    """First four VGG19 slices, NHWC. Input: (..., H, W, 3) in [0, 1].

    `slices` defaults to the real VGG19 layout; smaller layouts (used by
    tests and the multi-chip dryrun, where only the loss PLUMBING is under
    test) reuse the same naming so `vgg_loss` can reconstruct the
    architecture from the params alone."""

    slices: tuple = _SLICES

    @nn.compact
    def __call__(self, x):
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        outs = []
        prev_w = None
        for si, widths in enumerate(self.slices):
            for wi, w in enumerate(widths):
                # VGG pools exactly where the channel width doubles
                if prev_w is not None and w != prev_w:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                x = nn.Conv(w, (3, 3), padding="SAME", name=f"conv_{si}_{wi}")(x)
                x = nn.relu(x)
                prev_w = w
            outs.append(x)
        return outs


def _slices_from_params(vgg_params) -> tuple:
    """Reconstruct the slice layout from a params tree (conv_{si}_{wi}
    naming + kernel output widths) so callers need only the params."""
    p = vgg_params["params"]
    out = []
    si = 0
    while f"conv_{si}_0" in p:
        widths, wi = [], 0
        while f"conv_{si}_{wi}" in p:
            widths.append(int(p[f"conv_{si}_{wi}"]["kernel"].shape[-1]))
            wi += 1
        out.append(tuple(widths))
        si += 1
    return tuple(out)


def init_vgg_params(rng=None, slices: tuple = _SLICES):
    """Random frozen VGG feature params (fallback when no weights file)."""
    if rng is None:
        rng = jax.random.key(42)
    model = VGG19Features(slices=slices)
    dummy = jnp.zeros((1, 64, 64, 3))
    return model.init(rng, dummy)


def load_torch_vgg19(path: str):
    """Convert a torchvision vgg19 state-dict (.pth) into Flax params.

    The file must contain `features.{i}.weight/bias` tensors (the standard
    torchvision layout). OIHW -> HWIO transposition for Flax.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    names = []
    for si, widths in enumerate(_SLICES):
        for wi in range(len(widths)):
            names.append(f"conv_{si}_{wi}")
    params = {}
    for name, tidx in zip(names, _TORCH_CONV_IDX):
        w = sd[f"features.{tidx}.weight"].numpy().transpose(2, 3, 1, 0)
        b = sd[f"features.{tidx}.bias"].numpy()
        params[name] = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    return {"params": params}


def vgg_loss(vgg_params, pred, target):
    """Weighted L1 over the four feature slices (reference utils.py:797-805).

    pred/target: (H, W, 3) or (B, H, W, 3) in [0, 1].
    """
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    model = VGG19Features(slices=_slices_from_params(vgg_params))
    fp = model.apply(vgg_params, pred)
    ft = model.apply(vgg_params, jax.lax.stop_gradient(target))
    loss = 0.0
    for w, a, b in zip(LOSS_WEIGHTS, fp, ft):
        loss = loss + w * jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
    return loss
