from .gaussian import DiffusionConfig, GaussianDiffusion, scale_to_beta

__all__ = ["DiffusionConfig", "GaussianDiffusion", "scale_to_beta"]
