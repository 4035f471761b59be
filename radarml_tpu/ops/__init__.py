from radarml_tpu.ops.resample import (
    bicubic_resize_matrix,
    bspline_zoom_matrix,
    resample2d,
    zoom_output_size,
)
from radarml_tpu.ops.features import FeatureSpec, make_feature_fn, process_samples, predict_zoom

__all__ = [
    "bicubic_resize_matrix",
    "bspline_zoom_matrix",
    "resample2d",
    "zoom_output_size",
    "FeatureSpec",
    "make_feature_fn",
    "process_samples",
    "predict_zoom",
]
