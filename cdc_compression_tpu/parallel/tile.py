"""Intra-image tile parallelism: decode one large image across chips.

BASELINE config 4 (2K–4K images sharded over 8 chips). The reference has
no analog — it decodes whole images on one GPU (SURVEY §2.11/§5).

Design (TPU-first): the image's H axis carries a `NamedSharding` over the
`tile` mesh axis and the whole decode (compressor transforms + the
scanned DDIM loop) is jitted under that sharding. XLA GSPMD then:

* partitions every conv spatially and materializes **halo exchanges** of
  boundary rows over ICI (its native spatial-partitioning support —
  exactly the ppermute pattern, compiler-generated and fused);
* turns the LinearAttention softmax normalizer and (d×e) KV summary into
  `psum`s — exact global attention with O(d²) cross-tile traffic
  (`models.layers.LinearAttention` keeps H,W unflattened for this);
* keeps the timestep loop fully on-device — no host sync at any step.

Exactness: tile-sharded decode computes the SAME function as single-chip
decode (no windowing/approximation); `tests/test_parallel.py` asserts
bit-level agreement on a CPU mesh.
"""

from __future__ import annotations

import copy
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def with_latent_shardings(engine, mesh: Mesh, batch_axis: str = "data",
                          tile_axis: str = "tile"):
    """Clone `engine` with SPMD layout pins on its compressor: the 1/16
    latent stays image-like (batch over `data`, H over `tile`), the 1/64
    hyper tensors stay batch-only/spatially-replicated. Without the pins
    GSPMD propagates the tile axis into the hyper grid (often 1-2 rows),
    hits an impossible reshard at the quantize `round`, and falls back to
    involuntary full rematerialization (replicate-then-repartition)."""
    eng = copy.copy(engine)
    eng.compressor = engine.compressor.clone(
        latent_sharding=NamedSharding(mesh, P(batch_axis, tile_axis)),
        hyper_sharding=NamedSharding(mesh, P(batch_axis)),
    )
    return eng


def tile_decode_fn(
    engine,
    mesh: Mesh,
    *,
    sample_steps: int = 17,
    eta: float = 0.0,
    sample_mode: str = "ddim",
    compute_dtype=None,
    bpp_return_mean: bool = False,
    batch_axis: Optional[str] = "data",
    tile_axis: Optional[str] = "tile",
):
    """Build a jitted (params, images, rng, init) -> (decoded, bpp) that
    decodes with images sharded batch->`data`, H->`tile`."""
    img_spec = P(batch_axis, tile_axis)
    repl = NamedSharding(mesh, P())
    img_sh = NamedSharding(mesh, img_spec)
    engine = with_latent_shardings(engine, mesh, batch_axis, tile_axis)

    def fn(params, images, rng, init):
        images = jax.lax.with_sharding_constraint(images, img_sh)
        return engine.compress(
            params,
            images,
            sample_steps=sample_steps,
            rng=rng,
            init=init,
            sample_mode=sample_mode,
            eta=eta,
            compute_dtype=compute_dtype,
            bpp_return_mean=bpp_return_mean,
        )

    return jax.jit(
        fn,
        in_shardings=(repl, img_sh, None, img_sh),
        out_shardings=(img_sh, None),
    )


def tile_train_step_fn(engine, optimizer, mesh: Mesh):
    """Jitted data+tile-parallel train step (params replicated, batch
    over `data`, H over `tile`; XLA psums grads over both axes)."""
    import optax

    repl = NamedSharding(mesh, P())
    img_sh = NamedSharding(mesh, P("data", "tile"))
    engine = with_latent_shardings(engine, mesh)

    def step(params, opt_state, batch, rng):
        imgs = jax.lax.with_sharding_constraint(batch * 2.0 - 1.0, img_sh)

        def loss_fn(p):
            return engine.loss(p, imgs, rng)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, metrics

    return jax.jit(
        step,
        in_shardings=(repl, repl, img_sh, None),
        out_shardings=(repl, repl, None, None),
        donate_argnums=(0, 1),
    )
