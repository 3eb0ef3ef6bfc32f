"""Pure-function op library: cost volumes, warps, regression, propagation,
resize, conv helpers.  XLA implementations with Pallas kernels for the hot
paths (see semstereo_tpu.ops.pallas)."""

from semstereo_tpu.ops.convops import conv_nd, conv_transpose_nd
from semstereo_tpu.ops.cost_volume import (
    gwc_volume_norm,
    gwc_volume_norm_xla,
    normalize_groups,
)
from semstereo_tpu.ops.propagation import propagate5, propagate5_volume
from semstereo_tpu.ops.regression import (
    disparity_regression,
    disparity_values,
    disparity_variance,
    regression_topk,
    topk_planes,
)
from semstereo_tpu.ops.resize import (
    downsample_nearest_strided,
    resize_bilinear,
    resize_nearest,
    resize_trilinear,
)
from semstereo_tpu.ops.warp import (
    disparity_warp,
    lrsc_label_warp,
    warp_strength,
    warp_with_left,
)

__all__ = [
    "conv_nd",
    "conv_transpose_nd",
    "gwc_volume_norm",
    "gwc_volume_norm_xla",
    "normalize_groups",
    "propagate5",
    "propagate5_volume",
    "disparity_regression",
    "disparity_values",
    "disparity_variance",
    "regression_topk",
    "topk_planes",
    "resize_bilinear",
    "resize_nearest",
    "resize_trilinear",
    "downsample_nearest_strided",
    "disparity_warp",
    "lrsc_label_warp",
    "warp_strength",
    "warp_with_left",
]
