"""Image quality metrics (PSNR, MS-SSIM) in JAX.

The reference logs PSNR at validation (`xparam/modules/trainer.py:12-16`)
and pins `pytorch-msssim` in its env without using it; both are
first-class here for RD-curve evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Per-sample PSNR over NHWC images."""
    mse = jnp.mean(jnp.square(a - b), axis=tuple(range(1, a.ndim)))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def _ssim_components(a, b, kernel, c1, c2):
    """Windowed SSIM luminance*contrast maps for NHWC inputs."""
    k = kernel[:, :, None, None]
    C = a.shape[-1]
    k = jnp.tile(k, (1, 1, 1, C))

    def filt(x):
        # HIGHEST precision: on TPU the default (bf16 MXU passes) loses
        # ~1e-3 in the E[x^2]-mu^2 cancellation — comparable to c2, which
        # pushed near-perfect reconstructions to MS-SSIM > 1 (measured
        # 1.02-1.04). fp32 statistics are part of the metric's contract.
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            precision=jax.lax.Precision.HIGHEST,
        )

    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = filt(a * a) - mu_aa
    s_bb = filt(b * b) - mu_bb
    s_ab = filt(a * b) - mu_ab
    lum = (2 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    cs = (2 * s_ab + c2) / (s_aa + s_bb + c2)
    return lum, cs


def ssim(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
    lum, cs = _ssim_components(a, b, _gaussian_kernel(), c1, c2)
    return jnp.mean(lum * cs, axis=(1, 2, 3))


def ms_ssim(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    """5-scale MS-SSIM with the standard weights."""
    weights = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])
    c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
    kernel = _gaussian_kernel()
    vals = []
    for i in range(5):
        lum, cs = _ssim_components(a, b, kernel, c1, c2)
        vals.append(
            jnp.mean((lum * cs if i == 4 else cs), axis=(1, 2, 3))
        )
        if i < 4:
            a = jax.lax.reduce_window(
                a, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            b = jax.lax.reduce_window(
                b, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
    vals = jnp.stack(vals, axis=-1)
    return jnp.prod(jnp.maximum(vals, 1e-6) ** weights, axis=-1)
