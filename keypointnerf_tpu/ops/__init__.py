from .feat_sample import bilinear_sample, multiview_bilinear_sample

__all__ = ["bilinear_sample", "multiview_bilinear_sample"]
