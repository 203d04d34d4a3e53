"""Headline benchmark: flagship ε-family Kodak decode on the real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures denoise throughput (DDIM steps/s) of the full-size ε-model
(dim=64, 6 levels) decoding a 768x512 Kodak image at 17 steps in bf16 —
the north-star decode config (BASELINE.json config 1, but on TPU).
The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio to a fixed reference point measured on this repo's first TPU run
(recorded below) — i.e. progress across rounds.
"""

from __future__ import annotations

import json
import os
import time

# first-round TPU measurement (v5e, 2026-08-17); later rounds show
# speedup vs this anchor
ANCHOR_STEPS_PER_S = 40.015


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from cdc_compression_tpu.utils.presets import epsilon_family, init_params

    H, W = 512, 768
    STEPS = 17

    engine = epsilon_family(aux_loss_weight=0.0)
    params = init_params(engine, 0, image_hw=(H, W))

    img_path = "/root/reference/imgs/1.png"
    if os.path.exists(img_path):
        img = np.asarray(Image.open(img_path).convert("RGB"), np.float32) / 255.0
        if img.shape[0] > img.shape[1]:
            img = np.transpose(img, (1, 0, 2))
        img = img[:H, :W]
    else:
        img = np.random.RandomState(0).rand(H, W, 3).astype(np.float32)
    x = jnp.asarray(img)[None] * 2.0 - 1.0

    rng = jax.random.PRNGKey(0)
    init = jax.random.normal(rng, x.shape) * 0.8

    @jax.jit
    def decode(p, im):
        return engine.compress(
            p, im, sample_steps=STEPS, rng=rng, init=init,
            sample_mode="ddim", compute_dtype=jnp.bfloat16,
        )

    # compile + warmup (fetch a value — block_until_ready alone can be
    # fooled by backend-level dedup of identical async calls)
    dec, bpp = decode(params, x)
    np.asarray(dec).ravel()[:1]

    reps = 5
    t0 = time.perf_counter()
    cur = x
    for _ in range(reps):
        dec, bpp = decode(params, cur)
        cur = jnp.clip(dec, -1.0, 1.0)  # chain: next rep depends on this one
    np.asarray(dec).ravel()[:1]
    t1 = time.perf_counter()

    steps_per_s = reps * STEPS / (t1 - t0)
    vs = steps_per_s / ANCHOR_STEPS_PER_S if ANCHOR_STEPS_PER_S else 1.0
    print(
        json.dumps(
            {
                "metric": "kodak768x512_ddim17_bf16_denoise_steps_per_s",
                "value": round(steps_per_s, 3),
                "unit": "steps/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
