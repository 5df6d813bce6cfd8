from tpusr.ops.resample import Downsampler, get_kernel, downsample_lanczos
from tpusr.ops.bicubic import resize_bicubic, resize_matrix
from tpusr.ops.degrade import (
    add_gaussian_noise,
    add_salt_pepper_noise,
    degrade_pipeline,
)

__all__ = [
    "Downsampler",
    "get_kernel",
    "downsample_lanczos",
    "resize_bicubic",
    "resize_matrix",
    "add_gaussian_noise",
    "add_salt_pepper_noise",
    "degrade_pipeline",
]
