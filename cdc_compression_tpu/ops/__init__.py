from .bounds import lower_bound, ste_round, upper_bound
from .distributions import NormalParams, gaussian_interval_likelihood, std_gaussian_cdf
from .prior import FlexiblePrior
from .quantize import quantize, quantize_noise, round_with_offset
from .schedules import (
    SampleSchedule,
    TrainSchedule,
    cosine_beta_schedule,
    extract,
    linear_beta_schedule,
    make_betas,
    make_sample_schedule,
    make_train_schedule,
)

__all__ = [
    "FlexiblePrior",
    "NormalParams",
    "SampleSchedule",
    "TrainSchedule",
    "cosine_beta_schedule",
    "extract",
    "gaussian_interval_likelihood",
    "linear_beta_schedule",
    "lower_bound",
    "make_betas",
    "make_sample_schedule",
    "make_train_schedule",
    "quantize",
    "quantize_noise",
    "round_with_offset",
    "ste_round",
    "std_gaussian_cdf",
    "upper_bound",
]
