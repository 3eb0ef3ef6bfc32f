"""Experiment utilities: meters, TB writers, visualization, logging."""

from semstereo_tpu.utils.experiment import (
    AverageMeter,
    AverageMeterDict,
    AverageMeterDictPerKey,
    TeeLogger,
    save_images,
    save_scalars,
    tensor2float,
    tensor2numpy,
)
from semstereo_tpu.utils.debug import (
    check_finite_tree,
    debug_nans,
    jit_eager_parity,
    profile_trace,
)
from semstereo_tpu.utils.visualization import disp_error_image, label_vis

__all__ = [
    "AverageMeter",
    "AverageMeterDict",
    "AverageMeterDictPerKey",
    "TeeLogger",
    "save_images",
    "save_scalars",
    "tensor2float",
    "tensor2numpy",
    "disp_error_image",
    "label_vis",
]
