from .distill import DistillDiffusion, distill
from .gaussian import DiffusionConfig, GaussianDiffusion, scale_to_beta

__all__ = [
    "DiffusionConfig",
    "DistillDiffusion",
    "GaussianDiffusion",
    "distill",
    "scale_to_beta",
]
