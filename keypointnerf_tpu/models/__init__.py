from .spatial_encoding import SpatialEncodingConfig, spatial_encode, positional_encoding, spatial_encoding_dim
from .keypoint_nerf import KeypointNeRF, KeypointNeRFConfig, ViewBatch
from .presets import fast_preset, strict_preset

__all__ = [
    "SpatialEncodingConfig",
    "spatial_encode",
    "positional_encoding",
    "spatial_encoding_dim",
    "KeypointNeRF",
    "KeypointNeRFConfig",
    "ViewBatch",
    "fast_preset",
    "strict_preset",
]
