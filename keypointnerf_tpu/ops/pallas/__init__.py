from .composite_kernel import composite_importance_pallas
from .fused_geo_mlp import (
    fold_weight_norm,
    fused_geo_mlp_reference,
    geo_mlp_apply,
    sp_geo_mlp_apply,
)
from .onehot_bilinear import (
    multiview_onehot_bilinear_sample,
    onehot_bilinear_sample,
)
from .onehot_dmap import bilinear_dmap_onehot

__all__ = [
    "bilinear_dmap_onehot",
    "composite_importance_pallas",
    "fold_weight_norm",
    "geo_mlp_apply",
    "fused_geo_mlp_reference",
    "sp_geo_mlp_apply",
    "multiview_onehot_bilinear_sample",
    "onehot_bilinear_sample",
]
