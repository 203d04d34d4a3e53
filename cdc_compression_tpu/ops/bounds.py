"""Straight-through and bounded ops with custom gradients.

TPU-native equivalents of the reference autograd Functions
(`epsilonparam/modules/utils.py:89-132`): `STERound`, `LowerBound`,
`UpperBound`. Implemented as `jax.custom_vjp` pure functions so they
trace/fuse cleanly under jit and inside Pallas-adjacent code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def ste_round(x: jax.Array) -> jax.Array:
    """Round to nearest integer; identity gradient (straight-through)."""
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


@jax.custom_vjp
def lower_bound(x: jax.Array, bound: jax.Array) -> jax.Array:
    """max(x, bound) with gradient passed through when it helps.

    Gradient w.r.t. x flows when `x >= bound` OR the incoming gradient
    pushes x upward (g < 0), matching the reference `LowerBound`
    (`epsilonparam/modules/utils.py:99-114`). No gradient to `bound`.
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), jnp.zeros_like(bound))


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


@jax.custom_vjp
def upper_bound(x: jax.Array, bound: jax.Array) -> jax.Array:
    """min(x, bound); gradient passes when `x <= bound` or g > 0.

    Mirror of `upper_bound` (`epsilonparam/modules/utils.py:117-132`).
    """
    return jnp.minimum(x, bound)


def _upper_bound_fwd(x, bound):
    return jnp.minimum(x, bound), (x, bound)


def _upper_bound_bwd(res, g):
    x, bound = res
    pass_through = (x <= bound) | (g > 0)
    return (jnp.where(pass_through, g, 0.0), jnp.zeros_like(bound))


upper_bound.defvjp(_upper_bound_fwd, _upper_bound_bwd)
