"""BASELINE config 4's upper end, run virtually: 4K tile-parallel decode
on a 16-device mesh (VERDICT r3 item 6).

Round 3 established 2K on 8 virtual tiles as an executed exactness check
and concluded from compile-time memory analysis that 4K "needs 16 tiles"
on a v5e. This converts that analysis to evidence: a 3072x4096 image,
full flagship topology (6-level U-Net + 4-stage BigCompressor + 3-stage
hyper, dim reduced to 8 for CPU feasibility), H sharded over 16 virtual
CPU devices, 2-step fp32 DDIM decode — asserted EXACT against the
single-device program, with collective counts and per-device memory
captured. Results recorded in PERF.md ("4K tile decode" section).

Runs in its own process (the 16-device count must be set before jax
import):

    python tools/tile4k_virtual.py [--hw 3072 4096] [--tiles 16] [--dim 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count="
    + os.environ.get("TILE4K_DEVICES", "16")
)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hw", type=int, nargs=2, default=(3072, 4096))
    p.add_argument("--tiles", type=int, default=16)
    p.add_argument("--dim", type=int, default=8)
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from cdc_compression_tpu.parallel.mesh import make_mesh
    from cdc_compression_tpu.parallel.tile import tile_decode_fn
    from cdc_compression_tpu.utils.presets import epsilon_family, init_params

    assert len(jax.devices()) >= args.tiles, (
        f"need {args.tiles} devices, have {len(jax.devices())}; "
        "run in a fresh process (XLA device count is fixed at jax import)"
    )
    H, W = args.hw
    engine = epsilon_family(dim=args.dim, aux_loss_weight=0.0)
    params = init_params(engine, 0, image_hw=(256, 256))
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3), minval=-1, maxval=1)
    init = jax.random.normal(jax.random.PRNGKey(2), x.shape) * 0.8

    t0 = time.perf_counter()
    want, want_bpp = jax.jit(
        lambda p_, im: engine.compress(
            p_, im, sample_steps=args.steps, rng=rng, init=init, bpp_return_mean=False
        )
    )(params, x)
    want.block_until_ready()
    t_single = time.perf_counter() - t0
    print(f"single-device reference: {t_single:.1f}s", flush=True)

    mesh = make_mesh(data=1, tile=args.tiles)
    decode = tile_decode_fn(engine, mesh, sample_steps=args.steps)
    t0 = time.perf_counter()
    compiled = decode.lower(params, x, rng, init).compile()
    t_compile = time.perf_counter() - t0
    hlo = compiled.as_text()
    n_cp = hlo.count("collective-permute(")
    n_ar = hlo.count("all-reduce(")
    try:
        mem = compiled.memory_analysis()
        per_dev_bytes = (
            mem.temp_size_in_bytes
            + mem.argument_size_in_bytes
            + mem.output_size_in_bytes
        )
    except Exception:
        per_dev_bytes = None
    t0 = time.perf_counter()
    with mesh:
        got, got_bpp = decode(params, x, rng, init)
        got.block_until_ready()
    t_tiled = time.perf_counter() - t0

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-2, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_bpp), np.asarray(want_bpp), rtol=1e-3, atol=1e-5
    )
    result = {
        "hw": [H, W],
        "tiles": args.tiles,
        "dim": args.dim,
        "steps": args.steps,
        "exact_vs_single_device": True,
        "collective_permutes": n_cp,
        "all_reduces": n_ar,
        "per_device_bytes": per_dev_bytes,
        "per_device_gib": None if per_dev_bytes is None else per_dev_bytes / 2**30,
        "wall_single_s": round(t_single, 1),
        "wall_compile_s": round(t_compile, 1),
        "wall_tiled_s": round(t_tiled, 1),
    }
    print("TILE4K-OK", json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
