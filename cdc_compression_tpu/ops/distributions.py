"""Discretized Gaussian conditional used by the hyperprior rate model.

Behavioral spec: `epsilonparam/modules/utils.py:135-167` — interval
likelihood P(q - 0.5 < X < q + 0.5) under N(loc, scale), folded through
|x - loc| so upper/lower are symmetric, floored at `likelihood_min`.

Kept as pure functions over (loc, scale) arrays — idiomatic for jit /
shard_map — rather than a stateful distribution object.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .bounds import lower_bound

_INV_SQRT2 = 0.7071067811865476


def std_gaussian_cdf(x: jax.Array) -> jax.Array:
    """Standard normal CDF via erfc, matching the reference numerics."""
    return 0.5 * jax.lax.erfc(-_INV_SQRT2 * x)


class NormalParams(NamedTuple):
    """Mean/scale field predicted by the hyper-decoder (NHWC)."""

    loc: jax.Array
    scale: jax.Array

    @property
    def mean(self) -> jax.Array:
        # The reference's `.mean` property detaches: quantization offsets
        # must not backprop into the hyper-decoder (utils.py:144-146).
        return jax.lax.stop_gradient(self.loc)

    def sample(self, key: jax.Array) -> jax.Array:
        return self.scale * jax.random.normal(key, self.scale.shape, self.scale.dtype) + self.loc

    def likelihood(self, x: jax.Array, likelihood_min: float = 1e-9) -> jax.Array:
        return gaussian_interval_likelihood(x, self.loc, self.scale, likelihood_min)


def gaussian_interval_likelihood(
    x: jax.Array,
    loc: jax.Array,
    scale: jax.Array,
    likelihood_min: float = 1e-9,
) -> jax.Array:
    """P(x-0.5 < X <= x+0.5) for X ~ N(loc, scale), floored at likelihood_min."""
    d = jnp.abs(x - loc)
    upper = std_gaussian_cdf((0.5 - d) / scale)
    lower = std_gaussian_cdf((-0.5 - d) / scale)
    return lower_bound(upper - lower, jnp.asarray(likelihood_min, x.dtype))
