"""Flagship-scale TPU smokes for decode variants that previously only ran
at toy scale (VERDICT r2 item 7): VBR (CDC2-header encode/decode), η>0,
and DDPM mode — each at 768×512 with device ms/step from hlo_stats.

    python tools/smoke_variants.py [--variant vbr|eta|ddpm|all]
"""

from __future__ import annotations

import argparse
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)
from hlo_breakdown import profile_and_report  # noqa: E402  (same dir)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="all", choices=["vbr", "eta", "ddpm", "all"])
    p.add_argument("--steps", type=int, default=17)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from cdc_compression_tpu.utils.presets import epsilon_family, init_params

    H, W = 512, 768
    x = jnp.asarray(np.random.RandomState(0).rand(1, H, W, 3) * 2 - 1, jnp.float32)
    rng = jax.random.PRNGKey(0)
    init = jax.random.normal(rng, x.shape) * 0.8

    def bench_loop(tag, compress_kwargs, engine, params):
        dec = jax.jit(
            lambda p, im, ini: engine.compress(
                p, im, sample_steps=args.steps, rng=rng, init=ini,
                compute_dtype=jnp.bfloat16, **compress_kwargs
            )
        )
        y, _ = dec(params, x, init)
        jax.block_until_ready(y)

        def run():
            cur = init
            for _ in range(3):
                cur = jnp.clip(dec(params, x, cur)[0], -2.0, 2.0)
            jax.block_until_ready(cur)

        print(f"===== {tag} (768x512, {args.steps} steps, bf16) =====", flush=True)
        profile_and_report(run, steps=3 * args.steps, top=5)

    want = ("vbr", "eta", "ddpm") if args.variant == "all" else (args.variant,)

    if "vbr" in want:
        engine = epsilon_family(aux_loss_weight=0.0, vbr=True)
        params = init_params(engine, 0, image_hw=(H, W))
        # full VBR bitstream roundtrip with CDC2 header at flagship scale
        from cdc_compression_tpu.entropy.codec import ImageCodec

        codec = ImageCodec(engine, params)
        img01 = np.asarray((x[0] + 1) / 2, np.float32)
        data = codec.encode(img01, bitrate_scale=0.5)
        assert data[:4] == b"CDC2", data[:4]
        out = codec.decode(data, sample_steps=2, rng=rng, compute_dtype=jnp.bfloat16)
        assert out.shape == (H, W, 3) and np.isfinite(out).all()
        print(f"VBR bitstream roundtrip OK: {len(data)} bytes "
              f"({len(data) * 8 / (H * W):.4f} bpp at scale 0.5)", flush=True)
        bench_loop("vbr s=0.5", {"bitrate_scale": jnp.full((1,), 0.5)}, engine, params)

    if "eta" in want:
        engine = epsilon_family(aux_loss_weight=0.0)
        params = init_params(engine, 0, image_hw=(H, W))
        bench_loop("eta=1.0", {"eta": 1.0}, engine, params)

    if "ddpm" in want:
        engine = epsilon_family(aux_loss_weight=0.0)
        params = init_params(engine, 0, image_hw=(H, W))
        bench_loop("ddpm", {"sample_mode": "ddpm"}, engine, params)


if __name__ == "__main__":
    main()
