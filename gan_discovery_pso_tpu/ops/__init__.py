from gan_discovery_pso_tpu.ops.conv import conv2d, conv_transpose2d
from gan_discovery_pso_tpu.ops.norm import (
    batch_norm_train,
    batch_norm_eval,
    BatchNormStats,
)
from gan_discovery_pso_tpu.ops.pool import max_pool2d, adaptive_max_pool2d
from gan_discovery_pso_tpu.ops.rescale import (
    rescale01,
    rescale01_per_sample,
    adjust_dynamic_range,
    postprocess_uint8,
)
from gan_discovery_pso_tpu.ops.sqrtm import sqrtm_psd, trace_sqrt_product
from gan_discovery_pso_tpu.ops.knn import knn_predict_proba

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "batch_norm_train",
    "batch_norm_eval",
    "BatchNormStats",
    "max_pool2d",
    "adaptive_max_pool2d",
    "rescale01",
    "rescale01_per_sample",
    "adjust_dynamic_range",
    "postprocess_uint8",
    "sqrtm_psd",
    "trace_sqrt_product",
    "knn_predict_proba",
]
