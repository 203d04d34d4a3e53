from .metrics import ms_ssim, psnr, ssim
from .presets import epsilon_family, init_params, x_family
from .profiling import Phase, steps_per_second, trace

__all__ = [
    "Phase",
    "epsilon_family",
    "init_params",
    "ms_ssim",
    "psnr",
    "ssim",
    "steps_per_second",
    "trace",
    "x_family",
]
