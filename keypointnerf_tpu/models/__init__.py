from .spatial_encoding import SpatialEncodingConfig, spatial_encode, positional_encoding, spatial_encoding_dim

__all__ = [
    "SpatialEncodingConfig",
    "spatial_encode",
    "positional_encoding",
    "spatial_encoding_dim",
]
