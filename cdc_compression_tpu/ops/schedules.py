"""Diffusion variance schedules and DDIM sampling-schedule algebra.

Behavioral spec from the reference:

* beta schedules — `epsilonparam/modules/utils.py:50-66` (cosine / linear);
* training buffers — `epsilonparam/modules/denoising_diffusion.py:49-71`;
* subsampled sampling schedule — `denoising_diffusion.py:81-97` and the
  x-variant's `index` map + 1-step special case
  (`xparam/modules/denoising_diffusion.py:89-108`).

Everything here is float64-free, fp32 numpy/jnp precomputation done once
outside jit; the per-step coefficient arrays are then stacked so the DDIM
loop can `lax.scan` over them fully on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule (utils.py:50-60 semantics)."""
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


def linear_beta_schedule(timesteps: int) -> np.ndarray:
    """DDPM linear schedule rescaled by 1000/T (utils.py:62-66 semantics)."""
    scale = 1000 / timesteps
    return np.linspace(scale * 0.0001, scale * 0.02, timesteps)


def make_betas(var_schedule: str, timesteps: int) -> np.ndarray:
    if var_schedule == "cosine":
        return cosine_beta_schedule(timesteps)
    if var_schedule == "linear":
        return linear_beta_schedule(timesteps)
    raise NotImplementedError(var_schedule)


class TrainSchedule(NamedTuple):
    """Per-timestep buffers over the full training grid of T steps."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    snr: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_train_schedule(var_schedule: str, timesteps: int) -> TrainSchedule:
    betas = make_betas(var_schedule, timesteps)
    alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return TrainSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        snr=f32(alphas_cumprod / (1.0 - alphas_cumprod)),
    )


class SampleSchedule(NamedTuple):
    """Coefficients over the subsampled DDIM grid of `sample_steps` steps.

    Index 0 is the *lowest-noise* step (original timestep 0); the sampling
    loop scans indices in reverse, exactly like the reference loop over
    `reversed(range(sample_steps))` (denoising_diffusion.py:166-192).
    """

    index: jax.Array  # original timestep ids on the training grid
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_alphas_cumprod_prev: jax.Array
    one_minus_alphas_cumprod: jax.Array
    one_minus_alphas_cumprod_prev: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod_prev: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    snr: jax.Array
    sigma: jax.Array  # DDIM eta-noise scale

    @property
    def sample_steps(self) -> int:
        return self.index.shape[0]


def make_sample_schedule(train: TrainSchedule, sample_steps: int) -> SampleSchedule:
    """Subsample `linspace(0, T-1, sample_steps)` and derive DDIM coeffs.

    Mirrors `set_sample_schedule` (denoising_diffusion.py:81-97) including
    the x-variant's single-step special case (`xparam/...:91-94`).
    """
    T = train.num_timesteps
    if sample_steps != 1:
        indice = np.linspace(0, T - 1, sample_steps).astype(np.int64)
    else:
        indice = np.array([T - 1], dtype=np.int64)

    ac = np.asarray(train.alphas_cumprod)[indice].astype(np.float64)
    ac_prev = np.concatenate([[1.0], ac[:-1]])
    one_m = 1.0 - ac
    one_m_prev = 1.0 - ac_prev
    sigma = np.sqrt(one_m_prev / one_m) * np.sqrt(1.0 - ac / ac_prev)

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return SampleSchedule(
        index=jnp.asarray(indice, jnp.int32),
        alphas_cumprod=f32(ac),
        alphas_cumprod_prev=f32(ac_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(ac)),
        sqrt_alphas_cumprod_prev=f32(np.sqrt(ac_prev)),
        one_minus_alphas_cumprod=f32(one_m),
        one_minus_alphas_cumprod_prev=f32(one_m_prev),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(one_m)),
        sqrt_one_minus_alphas_cumprod_prev=f32(np.sqrt(one_m_prev)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / ac)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / ac - 1.0)),
        snr=f32(ac / (1.0 - ac)),
        sigma=f32(sigma),
    )


def extract(a: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-sample coefficients and broadcast to an `ndim` tensor.

    Equivalent of the reference `extract` (utils.py:32-35) for NHWC tensors:
    a[t] reshaped to (B, 1, 1, ..., 1).
    """
    out = a[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))
