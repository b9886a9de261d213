from unetseg_tpu.ops.losses import (  # noqa: F401
    binary_probs_from_logits,
    cross_entropy,
    per_pixel_ce,
    weighted_cross_entropy,
)
from unetseg_tpu.ops.elastic import elastic_deform, elastic_deform_batch, gaussian_blur_2d  # noqa: F401
from unetseg_tpu.ops.edt import distance_transform_edt, edt, edt_sq  # noqa: F401
from unetseg_tpu.ops.weight_maps import weight_map, weight_map_np, weight_map_device  # noqa: F401
