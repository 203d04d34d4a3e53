"""Quantization ops for the latent/hyper-latent path.

Behavioral spec from the reference (`epsilonparam/modules/utils.py:69-86`):

* ``noise``       — additive U(-0.5, 0.5) dequantization noise (training rate path)
* ``round``       — straight-through round
* ``dequantize``  — round relative to an offset (prior medians / predicted
                    mean), i.e. Ballé's offset trick: ``round(x - o) + o``.
                    Gradient w.r.t. x is identity; w.r.t. the offset it is
                    exactly zero (the -1 from the inner subtraction cancels
                    the +1 of the outer add under the straight-through
                    estimator) — matching the PyTorch autograd behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .bounds import ste_round


def quantize_noise(x: jax.Array, key: jax.Array, scale: float = 1.0) -> jax.Array:
    """x + scale * U(-0.5, 0.5). Reference: utils.py:69-70."""
    return x + scale * (jax.random.uniform(key, x.shape, x.dtype) - 0.5)


def round_with_offset(x: jax.Array, offset: jax.Array) -> jax.Array:
    """STE round of (x - offset) then add offset back. Reference: utils.py:73-75."""
    return ste_round(x - offset) + offset


def quantize(x: jax.Array, mode: str = "noise", *, offset=None, key=None) -> jax.Array:
    if mode == "noise":
        if key is None:
            raise ValueError("quantize(mode='noise') requires a PRNG key")
        return quantize_noise(x, key)
    if mode == "round":
        return ste_round(x)
    if mode == "dequantize":
        if offset is None:
            raise ValueError("quantize(mode='dequantize') requires an offset")
        return round_with_offset(x, offset)
    raise NotImplementedError(mode)
