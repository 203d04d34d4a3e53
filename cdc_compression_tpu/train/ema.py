"""Exponential moving average of a parameter pytree.

Behavioral spec: the `ema-pytorch==0.2.3` schedule the reference pins
(`xparam/modules/trainer.py:59`, `xparam/test_xparam.py:66`):
``EMA(model, beta=0.999, update_every=10, power=0.75, update_after_step=100)``
— a decay ramp ``1 - (1 + n/inv_gamma)^-power`` clamped to [min_value, beta],
updating every `update_every` calls, hard-copying until `update_after_step`.

Pure-function design: state is a pytree + an int32 step; `ema_update` is
jittable and runs inside the sharded train step, so the EMA costs one
fused multiply-add pass over HBM per `update_every` steps.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAConfig(NamedTuple):
    beta: float = 0.999
    update_every: int = 10
    update_after_step: int = 100
    inv_gamma: float = 1.0
    power: float = 0.75
    min_value: float = 0.0


class EMAState(NamedTuple):
    params: Any  # EMA shadow pytree
    step: jax.Array  # number of update() calls so far


def ema_init(params: Any) -> EMAState:
    # real copies: the shadow must not alias the live params, or buffer
    # donation in the train step would donate the same buffer twice
    return EMAState(
        params=jax.tree.map(lambda a: jnp.array(a, copy=True), params),
        step=jnp.zeros((), jnp.int32),
    )


def current_decay(step: jax.Array, cfg: EMAConfig) -> jax.Array:
    """Decay used at update-call `step` (ema_pytorch get_current_decay)."""
    epoch = jnp.clip(step.astype(jnp.float32) - cfg.update_after_step - 1, 0.0, None)
    value = 1.0 - (1.0 + epoch / cfg.inv_gamma) ** -cfg.power
    value = jnp.clip(value, cfg.min_value, cfg.beta)
    return jnp.where(epoch <= 0.0, 0.0, value)


def ema_update(state: EMAState, params: Any, cfg: EMAConfig = EMAConfig()) -> EMAState:
    """One (possibly skipped) EMA update; call once per optimizer step."""
    step = state.step
    do_update = (step % cfg.update_every) == 0
    decay = jnp.where(step <= cfg.update_after_step, 0.0, current_decay(step, cfg))
    decay = jnp.where(do_update, decay, 1.0)  # skipped step: keep shadow

    def blend(e, p):
        return e * decay.astype(e.dtype) + p.astype(e.dtype) * (1.0 - decay.astype(e.dtype))

    new_params = jax.tree.map(blend, state.params, params)
    return EMAState(params=new_params, step=step + 1)
