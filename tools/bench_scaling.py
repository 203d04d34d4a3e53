"""Throughput & scaling benchmarks beyond the headline (BASELINE configs 3-5).

Modes (one per invocation; each owns the backend for its lifetime):

  --mode batch   real-TPU batched decode throughput: images/s & steps/s
                 for the flagship ε-model at several batch sizes
                 (BASELINE config 3: "batched decode ... varying
                 sampling-step counts").
  --mode tile    tile-parallel decode scaling on an N-device mesh
                 (BASELINE config 4). On this box real multi-chip HW is
                 unavailable, so this runs on the virtual CPU mesh
                 (XLA_FLAGS=--xla_force_host_platform_device_count=N) and
                 reports *relative* scaling efficiency of the identical
                 GSPMD program that would run over ICI on a pod.
  --mode train   real-TPU train-step throughput (steps/s, images/s) at
                 the reference's batch-4 256x256 config.

Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _chain_bench(fn, x0, *args, reps=5):
    """Time fn with a data dependency between reps (defeats async dedup)."""
    import jax

    out = fn(x0, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    cur = x0
    for _ in range(reps):
        out = fn(cur, *args)
        cur = out[0] if isinstance(out, tuple) else out
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def mode_batch(steps: int, sizes) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from cdc_compression_tpu.utils.presets import epsilon_family, init_params

    H, W = 512, 768
    engine = epsilon_family(aux_loss_weight=0.0)
    params = init_params(engine, 0, image_hw=(H, W))
    rng = jax.random.PRNGKey(0)
    for b in sizes:
        x = jnp.asarray(
            np.random.RandomState(0).rand(b, H, W, 3) * 2 - 1, jnp.float32
        )
        init = jax.random.normal(rng, x.shape) * 0.8

        # serial=True is compress()'s auto default on the bf16 path: the
        # B=1 conv lowering is the efficient one on TPU, so the batch is
        # decoded image-at-a-time inside one compiled program (lax.map).
        # serial=False forces the monolithic batched lowering for
        # comparison (13-26% more device work per pixel — PERF.md).
        for serial in ([True] if b == 1 else [True, False]):
            @jax.jit
            def decode(im):
                dec, _ = engine.compress(
                    params, im, sample_steps=steps, rng=rng, init=init,
                    compute_dtype=jnp.bfloat16, batch_serial=serial,
                )
                return jnp.clip(dec, -1.0, 1.0)

            dt = _chain_bench(decode, x)
            print(json.dumps({
                "mode": "batch", "batch": b, "hw": [H, W], "steps": steps,
                "serial": serial,
                "images_per_s": round(b / dt, 3),
                "denoise_steps_per_s": round(b * steps / dt, 1),
                "ms_per_image": round(dt / b * 1000, 2),
            }), flush=True)


def mode_tile(steps: int, n_devices: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from cdc_compression_tpu.parallel.mesh import make_mesh
    from cdc_compression_tpu.parallel.tile import tile_decode_fn
    from cdc_compression_tpu.utils.presets import epsilon_family, init_params

    # dim=16 keeps CPU compile/runtime tractable; the GSPMD partitioning
    # (halo exchanges, psum'd attention) is identical to the full model's
    H, W = 1024, 1536
    engine = epsilon_family(dim=16, aux_loss_weight=0.0)
    params = init_params(engine, 0, image_hw=(H, W))
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(1, H, W, 3) * 2 - 1, jnp.float32)
    init = jax.random.normal(rng, x.shape) * 0.8

    # NOTE: virtual CPU devices share the host's cores, so wall-clock
    # "speedup" here is meaningless; what this validates is that the
    # tile-sharded program compiles, runs, and contains the expected
    # cross-tile collectives (conv halo exchanges -> collective-permute,
    # linear-attention KV summaries / normalizers -> all-reduce). Real
    # scaling efficiency must be measured on a pod slice.
    for tiles in (2, 4, n_devices):
        mesh = make_mesh(data=1, tile=tiles)
        fn = tile_decode_fn(engine, mesh, sample_steps=steps,
                            compute_dtype=jnp.bfloat16)
        lowered = jax.jit(lambda im: fn(params, im, rng, init)).lower(x)
        hlo = lowered.compile().as_text()
        counts = {  # sync (CPU) + async (TPU) spellings
            "collective_permute": hlo.count("collective-permute(")
            + hlo.count("collective-permute-start("),
            "all_reduce": hlo.count("all-reduce(") + hlo.count("all-reduce-start("),
            "all_gather": hlo.count("all-gather(") + hlo.count("all-gather-start("),
        }
        dt = _chain_bench(lambda im: fn(params, im, rng, init)[0], x, reps=3)
        print(json.dumps({
            "mode": "tile", "devices": tiles, "hw": [H, W], "steps": steps,
            "s_per_image_cpu": round(dt, 3),
            "collectives": counts,
            "note": "virtual CPU mesh: program-structure validation, not perf",
        }), flush=True)


def mode_train(batch: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from cdc_compression_tpu.train.trainer import TrainConfig, Trainer
    from cdc_compression_tpu.utils.presets import epsilon_family, init_params

    engine = epsilon_family(aux_loss_weight=0.0)
    cfg = TrainConfig(lr=4e-5, bf16=True)
    x = np.random.RandomState(0).rand(batch, 256, 256, 3).astype(np.float32)
    trainer = Trainer(engine, cfg, train_iter=iter(lambda: x, None))
    state = trainer.init_state(init_params(engine, 0, image_hw=(256, 256)))
    rng = jax.random.PRNGKey(0)
    # warmup/compile
    state, metrics = trainer.train_step(state, x, rng)
    jax.block_until_ready(metrics["loss"])
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = trainer.train_step(state, x, rng)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "mode": "train", "batch": batch, "hw": [256, 256],
        "train_steps_per_s": round(1 / dt, 2),
        "images_per_s": round(batch / dt, 1),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["batch", "tile", "train"], required=True)
    ap.add_argument("--steps", type=int, default=17)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--train_batch", type=int, default=4)
    args = ap.parse_args()
    if args.mode == "batch":
        mode_batch(args.steps, args.batches)
    elif args.mode == "tile":
        mode_tile(args.steps, args.devices)
    else:
        mode_train(args.train_batch)


if __name__ == "__main__":
    main()
