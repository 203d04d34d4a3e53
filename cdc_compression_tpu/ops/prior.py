"""Flexible factorized prior (Ballé et al. 2018, appendix 6.1).

Behavioral spec: `epsilonparam/modules/network_components.py:415-549`
(`PriorFunction` + `FlexiblePrior`): a per-channel univariate monotone
MLP flow whose final sigmoid is the CDF of the hyper-latent; learned
medians fix the quantization offset.

TPU-native design notes
-----------------------
The reference shapes the computation as (C, N, H, W, 1) batched matmuls
with (C,1,1,in,out) weights. Here the per-channel chain is a single
einsum over NHWC tensors — ``bhwci,cio->bhwco`` — which XLA maps onto
the MXU as a batched GEMM and fuses with the tanh gates; there is no
layout transpose at all.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .bounds import lower_bound


class FlexiblePrior(nn.Module):
    channels: int = 256
    dims: Sequence[int] = (3, 3, 3)
    init_scale: float = 10.0
    likelihood_min: float = 1e-9

    def setup(self):
        dims = [1, *self.dims, 1]
        self.chain_len = len(dims) - 1
        scale = self.init_scale ** (1 / self.chain_len)
        weights, biases, gates = [], [], []
        for i in range(self.chain_len):
            d_in, d_out = dims[i], dims[i + 1]
            init_w = float(np.log(np.expm1(1 / scale / d_out)))
            weights.append(
                self.param(
                    f"affine_{i}_w",
                    lambda key, shape, v=init_w: jnp.full(shape, v, jnp.float32),
                    (self.channels, d_in, d_out),
                )
            )
            biases.append(
                self.param(
                    f"affine_{i}_b",
                    lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -0.5, 0.5),
                    (self.channels, d_out),
                )
            )
            if i < self.chain_len - 1:
                gates.append(
                    self.param(f"gate_{i}_a", nn.initializers.zeros, (self.channels, d_out))
                )
        self.affine_w = weights
        self.affine_b = biases
        self.gate_a = gates
        # Learned medians (one per channel), trained only by the median
        # loss — reference `_medians` (network_components.py:465).
        self._medians = self.param("medians", nn.initializers.zeros, (self.channels,))

    @property
    def medians(self) -> jax.Array:
        """(1,1,1,C) quantization offsets, detached (reference :468-470)."""
        return jax.lax.stop_gradient(self._medians).reshape(1, 1, 1, self.channels)

    def cdf_logits(self, x: jax.Array, detach_params: bool = False) -> jax.Array:
        """Monotone-flow logits of the CDF, NHWC in → NHWC out.

        ``detach_params=True`` reproduces the reference's `detach=True`
        path (network_components.py:472-480): gradients flow to the input
        only, never the affine/gate parameters — used by the median loss.
        """
        sg = jax.lax.stop_gradient if detach_params else (lambda a: a)
        u = x[..., None]  # (..., C, 1)
        for i in range(self.chain_len - 1):
            w = jax.nn.softplus(sg(self.affine_w[i]))
            u = jnp.einsum("...ci,cio->...co", u, w) + sg(self.affine_b[i])
            u = u + jnp.tanh(sg(self.gate_a[i])) * jnp.tanh(u)
        w = jax.nn.softplus(sg(self.affine_w[-1]))
        u = jnp.einsum("...ci,cio->...co", u, w) + sg(self.affine_b[-1])
        return u[..., 0]

    def cdf(self, x: jax.Array, detach_params: bool = False) -> jax.Array:
        return jax.nn.sigmoid(self.cdf_logits(x, detach_params))

    def likelihood(self, x: jax.Array) -> jax.Array:
        """Sign-stabilized interval likelihood (reference :502-508)."""
        lower = self.cdf_logits(x - 0.5)
        upper = self.cdf_logits(x + 0.5)
        sign = -jnp.sign(jax.lax.stop_gradient(lower + upper))
        upper = jax.nn.sigmoid(upper * sign)
        lower = jax.nn.sigmoid(lower * sign)
        return lower_bound(jnp.abs(upper - lower), jnp.asarray(self.likelihood_min, x.dtype))

    def pdf(self, x: jax.Array) -> jax.Array:
        """Density = d/dx sigmoid(cdf_logits(x)) via forward-mode AD
        (reference `FlexiblePrior.pdf`, network_components.py:482-494)."""
        _, tangent = jax.jvp(self.cdf, (x,), (jnp.ones_like(x),))
        return tangent

    def icdf(self, p: jax.Array, bisect_iters: int = 60) -> jax.Array:
        """Inverse CDF by bracket-doubling + bisection — inference-only
        utility matching reference network_components.py:510-539.

        Fully jittable: a `lax.while_loop` doubles the symmetric bracket
        until it contains every requested quantile, then `lax.fori_loop`
        bisects to float32 resolution.
        """

        def covered(lo, hi):
            return jnp.all(self.cdf(lo) <= p) & jnp.all(self.cdf(hi) >= p)

        init = (jnp.full_like(p, -1.0), jnp.full_like(p, 1.0))
        lo, hi = jax.lax.while_loop(
            lambda lh: ~covered(*lh),
            lambda lh: (lh[0] * 2.0, lh[1] * 2.0),
            init,
        )

        def bisect(_, lh):
            lo, hi = lh
            mid = 0.5 * (lo + hi)
            go_up = self.cdf(mid) < p
            return jnp.where(go_up, mid, lo), jnp.where(go_up, hi, mid)

        lo, hi = jax.lax.fori_loop(0, bisect_iters, bisect, (lo, hi))
        return 0.5 * (lo + hi)

    def sample(self, rng: jax.Array, shape: Sequence[int]) -> jax.Array:
        """Draw hyper-latent samples by inverse-transform sampling
        (reference network_components.py:541-549). `shape` must end in
        the channel dim; returns float32 NHWC samples."""
        assert shape[-1] == self.channels, "last dim must be channels"
        u = jax.random.uniform(rng, tuple(shape), jnp.float32, 1e-5, 1.0 - 1e-5)
        return self.icdf(u)

    def median_loss(self) -> jax.Array:
        """Sum |cdf_logits(medians)| with params detached (reference :496-500).

        Drives each channel's median to CDF = 0.5. The gradient reaches
        only `_medians`, reproducing the reference's separate `aloss`
        backward pass without needing a second grad computation.
        """
        m = self._medians.reshape(1, 1, 1, self.channels)
        logits = self.cdf_logits(m, detach_params=True)
        return jnp.abs(logits).sum()
