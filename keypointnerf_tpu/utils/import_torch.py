"""Import reference PyTorch KeypointNeRF checkpoints into Flax params.

The reference trains a torch `KeypointNeRF` inside a LightningModule whose
checkpoint stores `state_dict` with a `model.` prefix (reference
src/model.py:42, 113-117). This module converts that state_dict — numpy
tensors, no torch required at convert time — into this repo's Flax param
tree, so a reference-trained `last.ckpt` can be rendered and evaluated here
with exact numerics (the conv padding / upsample / eps conventions in
models/cnn.py are torch-matched for this reason).

Layout conversions:
  * Conv2d   weight (O, I, kh, kw)  -> Flax Conv kernel (kh, kw, I, O)
  * ConvT2d  weight (I, O, kh, kw)  -> Flax ConvTranspose(transpose_kernel)
                                       kernel (kh, kw, O, I)
  * Linear   weight (O, I)          -> Dense kernel (I, O)
  * weight-norm Linear weight_v/g   -> WNDense kernel (I, O) + gain (O,)
  * GroupNorm weight/bias           -> GroupNorm scale/bias

Entry points:
  * `convert_reference_state_dict(sd, cfg)` — dict of numpy arrays -> params
  * `load_reference_checkpoint(path, cfg)` — torch .ckpt/.pth file -> params
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


Array = np.ndarray


def _np(x) -> Array:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


class _SD:
    """State-dict view that strips an optional prefix and records hits."""

    def __init__(self, sd: Mapping[str, object], prefix: str = ""):
        self.sd = sd
        self.prefix = prefix
        self.used: set[str] = set()

    def __call__(self, key: str) -> Array:
        full = self.prefix + key
        if full not in self.sd:
            raise KeyError(f"missing reference tensor {full!r}")
        self.used.add(full)
        return _np(self.sd[full])

    def has(self, key: str) -> bool:
        return self.prefix + key in self.sd


def _conv(sd: _SD, key: str, bias: bool = True) -> Dict[str, Array]:
    out = {"kernel": sd(f"{key}.weight").transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = sd(f"{key}.bias")
    return out


def _deconv(sd: _SD, key: str, bias: bool = True) -> Dict[str, Array]:
    # torch (I, O, kh, kw) -> flax transpose_kernel layout (kh, kw, O, I)
    out = {"kernel": sd(f"{key}.weight").transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = sd(f"{key}.bias")
    return out


def _norm(sd: _SD, key: str) -> Dict[str, Array]:
    return {"scale": sd(f"{key}.weight"), "bias": sd(f"{key}.bias")}


def _dense(sd: _SD, key: str) -> Dict[str, Array]:
    return {"kernel": sd(f"{key}.weight").T, "bias": sd(f"{key}.bias")}


def _wn_dense(sd: _SD, key: str) -> Dict[str, Array]:
    """weight-norm Linear: old-style weight_g/weight_v or the
    parametrize-style original0/original1."""
    if sd.has(f"{key}.weight_v"):
        v = sd(f"{key}.weight_v")
        g = sd(f"{key}.weight_g")
    else:
        g = sd(f"{key}.parametrizations.weight.original0")
        v = sd(f"{key}.parametrizations.weight.original1")
    return {
        "kernel": v.T,                     # (I, O); norm over axis 0 = torch dim-0 WN
        "gain": g.reshape(-1),
        "bias": sd(f"{key}.bias"),
    }


# --------------------------------------------------------------- CNN blocks
def _convblock(sd: _SD, key: str, has_downsample: bool) -> Dict:
    """Reference ConvBlock (src/utils.py:416-474) -> models/cnn.py ConvBlock."""
    out = {
        "GroupNorm_0": _norm(sd, f"{key}.bn1"),
        "Conv_0": _conv(sd, f"{key}.conv1", bias=False),
        "GroupNorm_1": _norm(sd, f"{key}.bn2"),
        "Conv_1": _conv(sd, f"{key}.conv2", bias=False),
        "GroupNorm_2": _norm(sd, f"{key}.bn3"),
        "Conv_2": _conv(sd, f"{key}.conv3", bias=False),
    }
    if has_downsample:
        # the reference registers bn4 both as an attribute and inside the
        # downsample Sequential (shared tensors, both key spellings appear)
        gn_key = (f"{key}.bn4" if sd.has(f"{key}.bn4.weight")
                  else f"{key}.downsample.0")
        out["GroupNorm_3"] = _norm(sd, gn_key)
        for alias in (f"{key}.bn4", f"{key}.downsample.0"):
            for suffix in (".weight", ".bias"):
                if sd.has(alias + suffix):
                    sd(alias + suffix)  # mark the shared spelling as used
        out["Conv_3"] = _conv(sd, f"{key}.downsample.2", bias=False)
    return out


def _hourglass(sd: _SD, key: str, level: int, widths_differ=lambda k: False) -> Dict:
    """Reference HourGlass stores level-suffixed flat modules (b1_L, b2_L,
    b2_plus_1, b3_L; src/utils.py:261-309); ours nests HourGlass_0 children
    with ConvBlocks in call order."""
    out = {
        "ConvBlock_0": _convblock(sd, f"{key}.b1_{level}", False),   # up branch
        "ConvBlock_1": _convblock(sd, f"{key}.b2_{level}", False),   # low pre
    }
    if level > 1:
        out["HourGlass_0"] = _hourglass(sd, key, level - 1)
        out["ConvBlock_2"] = _convblock(sd, f"{key}.b3_{level}", False)
    else:
        out["ConvBlock_2"] = _convblock(sd, f"{key}.b2_plus_{level}", False)
        out["ConvBlock_3"] = _convblock(sd, f"{key}.b3_{level}", False)
    return out


def _hgfilter(sd: _SD, key: str, n_stack: int, n_downsample: int) -> Dict:
    """Reference HGFilterV2 (src/utils.py:322-414) -> models/cnn.py HGFilter.

    Flax call-order names: Conv_0=conv1, GroupNorm_0=bn1, ConvBlock_0=conv2,
    ConvTranspose_0=unpack1.conv, GroupNorm_1=unpack1.norm, Conv_1=conv_out,
    ConvBlock_1=conv3, ConvBlock_2=conv4; per stack i: HourGlass_i=m{i},
    ConvBlock_{3+...}=top_m_{i}, Conv=conv_last{i}, GroupNorm=bn_end{i},
    Conv=l{i} (+ bl{i}, al{i} between stacks).
    """
    out = {
        "Conv_0": _conv(sd, f"{key}.conv1"),
        "GroupNorm_0": _norm(sd, f"{key}.bn1"),
        "ConvBlock_0": _convblock(sd, f"{key}.conv2", True),    # 64 -> 128
        "ConvTranspose_0": _deconv(sd, f"{key}.unpack1.conv", bias=False),
        "GroupNorm_1": _norm(sd, f"{key}.unpack1.norm"),
        "Conv_1": _conv(sd, f"{key}.conv_out"),
        "ConvBlock_1": _convblock(sd, f"{key}.conv3", False),   # 128 -> 128
        "ConvBlock_2": _convblock(sd, f"{key}.conv4", True),    # 128 -> 256
    }
    conv_i, block_i = 2, 3
    for i in range(n_stack):
        out[f"HourGlass_{i}"] = _hourglass(sd, f"{key}.m{i}", n_downsample)
        out[f"ConvBlock_{block_i}"] = _convblock(sd, f"{key}.top_m_{i}", False)
        block_i += 1
        out[f"Conv_{conv_i}"] = _conv(sd, f"{key}.conv_last{i}")
        out[f"GroupNorm_{2 + i}"] = _norm(sd, f"{key}.bn_end{i}")
        conv_i += 1
        out[f"Conv_{conv_i}"] = _conv(sd, f"{key}.l{i}")
        conv_i += 1
        if i < n_stack - 1:
            out[f"Conv_{conv_i}"] = _conv(sd, f"{key}.bl{i}")
            conv_i += 1
            out[f"Conv_{conv_i}"] = _conv(sd, f"{key}.al{i}")
            conv_i += 1
    return out


def _resblk_encoder(sd: _SD, key: str, n_downsample: int, n_blocks: int,
                    n_upsample: int) -> Dict:
    """Reference ResBlkEncoder Sequential (src/utils.py:216-259): compute the
    flat `layers.{i}` indices of the parameterized modules."""
    out = {}
    idx = 1  # layers.0 is ReplicationPad
    out["Conv_0"] = _conv(sd, f"{key}.layers.{idx}")
    idx += 3  # conv, norm (paramless instance norm), relu
    for i in range(n_downsample):
        out[f"Conv_{i + 1}"] = _conv(sd, f"{key}.layers.{idx}")
        idx += 3
    for b in range(n_blocks):
        # ResBlk inner Sequential: 0 pad, 1 conv, 2 norm, 3 relu, 4 pad, 5 conv, 6 norm
        out[f"ResBlk_{b}"] = {
            "Conv_0": _conv(sd, f"{key}.layers.{idx}.layers.1"),
            "Conv_1": _conv(sd, f"{key}.layers.{idx}.layers.5"),
        }
        idx += 1
    for u in range(n_upsample):
        out[f"ConvTranspose_{u}"] = _deconv(sd, f"{key}.layers.{idx}")
        idx += 3
    if n_upsample > 0:
        idx += 1  # trailing ReplicationPad
        out[f"Conv_{n_downsample + 1}"] = _conv(sd, f"{key}.layers.{idx}")
    return out


# ----------------------------------------------------------------- MLP stack
def _mlp_layers(sd: _SD, key: str, n_layers: int) -> Dict:
    """MLPUNet/MLP `layers.{i}.linear`: weight-norm on all but the last."""
    out = {}
    for i in range(n_layers):
        lk = f"{key}.layers.{i}.linear"
        if i < n_layers - 1:
            out[f"WNDense_{i}"] = _wn_dense(sd, lk)
        else:
            out[f"WNDense_{i}"] = _dense(sd, lk)
    return out


def _ibr_head(sd: _SD, key: str) -> Dict:
    """Reference IBRRenderingHead (src/model.py:1239-1302) -> ibr_head.

    Flax Dense numbering follows CONSTRUCTION order in ibr_head.py (callee
    before argument), hence the interleaving below.
    """
    return {
        "ani_al": sd(f"{key}.ani_al"),
        "Dense_0": _dense(sd, f"{key}.ray_encoder.0"),
        "Dense_1": _dense(sd, f"{key}.ray_encoder.2"),
        "Dense_2": _dense(sd, f"{key}.base_layer.0"),
        "Dense_3": _dense(sd, f"{key}.base_layer.2"),
        "Dense_4": _dense(sd, f"{key}.vis_layer1.2"),
        "Dense_5": _dense(sd, f"{key}.vis_layer1.0"),
        "Dense_6": _dense(sd, f"{key}.vis_layer2.2"),
        "Dense_7": _dense(sd, f"{key}.vis_layer2.0"),
        "Dense_8": _dense(sd, f"{key}.out_layer.4"),
        "Dense_9": _dense(sd, f"{key}.out_layer.2"),
        "Dense_10": _dense(sd, f"{key}.out_layer.0"),
    }


def convert_reference_state_dict(state_dict: Mapping[str, object], cfg=None,
                                 strict: bool = False):
    """Convert a reference KeypointNeRF state_dict to this repo's Flax params.

    Args:
      state_dict: mapping of torch-layout tensors/arrays. Keys may carry the
        LightningModule's "model." prefix (reference src/model.py:42) or be
        bare KeypointNeRF keys.
      cfg: KeypointNeRFConfig (defaults used when None).
      strict: raise (instead of warn) if any model tensor in `state_dict`
        was not consumed by the conversion — the audit that every reference
        layer found a home (frozen vgg_loss buffers are always exempt).
    Returns:
      {"params": ...} matching KeypointNeRF.init's tree.
    """
    from ..models.keypoint_nerf import KeypointNeRFConfig

    cfg = cfg or KeypointNeRFConfig()
    prefix = "model." if any(k.startswith("model.") for k in state_dict) else ""
    sd = _SD(state_dict, prefix)

    params = {
        "geo_encoder": _hgfilter(sd, "geo_encoder", cfg.geo_n_stack,
                                 cfg.geo_n_downsample),
        "tex_encoder": _resblk_encoder(sd, "tex_encoder", cfg.tex_n_downsample,
                                       cfg.tex_n_blocks, cfg.tex_n_upsample),
        "mlp_geo": {
            "MLPUNet_0": _mlp_layers(sd, "mlp_geo.layers1",
                                     len(cfg.mlp_dims1) - 1),
            "MLP_0": _mlp_layers(sd, "mlp_geo.layers2", len(cfg.mlp_dims2) - 1),
        },
        "ibr_head": _ibr_head(sd, "mlp_tex"),
        "gcompress": _dense(sd, "ibr_compress_gfeat"),
    }

    # report unconverted model tensors (vgg_loss etc. are expected leftovers)
    leftover = [
        k for k in state_dict
        if k.startswith(prefix) and k not in sd.used
        and not k.startswith(prefix + "vgg_loss")
    ]
    if leftover:
        msg = (f"unconverted reference tensors: {sorted(leftover)[:8]}"
               f" (+{max(0, len(leftover) - 8)} more)")
        if strict:
            raise ValueError(msg)
        import warnings

        warnings.warn(msg)

    import jax.numpy as jnp
    import jax

    return {"params": jax.tree.map(jnp.asarray, params)}


def load_reference_checkpoint(path: str, cfg=None):
    """Load a reference Lightning .ckpt (or bare .pth state_dict) and convert.

    Reference checkpoints store {"state_dict": ..., "epoch": ..., ...}
    (reference src/model.py:113-117).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return convert_reference_state_dict(sd, cfg)
