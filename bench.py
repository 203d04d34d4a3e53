"""Headline benchmark: flagship ε-family Kodak decode on the real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Measures denoise throughput (DDIM steps/s) of the full-size ε-model
(dim=64, 6 levels) decoding a 768x512 Kodak image at 17 steps in bf16 —
the north-star decode config (BASELINE.json config 1, but on TPU).
The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio to a fixed reference point measured on this repo's first TPU run
(recorded below) — i.e. progress across rounds.

Robustness (round-2 hardening, VERDICT item 1): wall-clock through the
axon tunnel drifts ±10% run-to-run and a single timed window can be
several-fold off (round 1's driver capture was 6.7x low). So this
script (a) warms the tunnel with untimed reps, (b) times WINDOWS
independent windows (median in `wall_steps_per_s`, best in
`wall_best_steps_per_s`), and (c) captures device self-time per step
from xprof traces — the tunnel-immune truth `tools/hlo_breakdown.py`
uses for optimization decisions.

Round-3 change (VERDICT r2 weak item 5): the headline `value` is now
**device-anchored** — steps/s implied by the median per-step device
self-time over DEV_TRACES independent traces — because the wall figure
under-reported device capability by ~17% and drifted ±10% between
driver captures of identical programs. `vs_baseline` is the ratio to
the round-2 driver capture of the same device metric
(`BENCH_r02.json: device 15.162 ms/step`), the earliest device-anchored
record. Wall numbers stay in the JSON for dispatch-health tracking. If
tracing is unavailable the script falls back to the wall median against
the original wall anchor and says so in `anchor`.
"""

from __future__ import annotations

import json
import os
import statistics
import time

# first-round TPU wall measurement (v5e, 2026-08-17) — fallback anchor
ANCHOR_WALL_STEPS_PER_S = 40.015
# round-2 driver capture, device self-time per denoise step (ms)
ANCHOR_DEVICE_MS_PER_STEP = 15.162

WINDOWS = 7  # independent timed wall windows; median reported
REPS = 5  # chained decodes per window
DEV_TRACES = 3  # independent xprof traces; median device time reported


def _device_ms_per_step(run_fn, steps: int) -> float | None:
    """Sum per-op device self-time over one traced run of `run_fn`."""
    try:
        import collections
        import glob
        import shutil

        import jax
        from xprof.convert import raw_to_tool_data as r2t

        trace_dir = "/tmp/.bench_trace"
        shutil.rmtree(trace_dir, ignore_errors=True)
        with jax.profiler.trace(trace_dir):
            run_fn()
        pb = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
        data, _ = r2t.xspace_to_tool_data(pb, "hlo_stats", {})
        if isinstance(data, bytes):
            data = data.decode()
        j = json.loads(data)
        cols = [c["label"] for c in j["cols"]]
        i_self = cols.index("Total self time (us)")
        tot_us = sum(float((r["c"][i_self] or {}).get("v") or 0) for r in j["rows"])
        shutil.rmtree(trace_dir, ignore_errors=True)
        return tot_us / steps / 1000.0
    except Exception:
        return None


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

    def window(n, cur):
        """Run n chained decodes (each consumes the previous output so the
        backend cannot dedup identical async calls); return final output."""
        dec = None
        for _ in range(n):
            dec, _bpp = decode(params, cur)
            cur = jnp.clip(dec, -1.0, 1.0)
        np.asarray(dec).ravel()[:1]
        return cur

    # compile + tunnel warmup (untimed)
    cur = window(3, x)

    wall = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        cur = window(REPS, cur)
        wall.append(REPS * STEPS / (time.perf_counter() - t0))

    med = statistics.median(wall)
    dev = [
        d
        for _ in range(DEV_TRACES)
        if (d := _device_ms_per_step(lambda: window(3, x), steps=3 * STEPS)) is not None
    ]
    dev_ms = statistics.median(dev) if dev else None

    out = {
        "metric": "kodak768x512_ddim17_bf16_device_denoise_steps_per_s",
        "unit": "steps/s",
        "wall_steps_per_s": round(med, 3),
        "wall_best_steps_per_s": round(max(wall), 3),
        "wall_spread_pct": round(100.0 * (max(wall) - min(wall)) / med, 1),
        "windows": WINDOWS,
        "device_ms_per_step": round(dev_ms, 3) if dev_ms is not None else None,
        "device_traces": len(dev),
    }
    if dev_ms is not None:
        out["value"] = round(1000.0 / dev_ms, 3)
        out["vs_baseline"] = round(ANCHOR_DEVICE_MS_PER_STEP / dev_ms, 3)
        out["anchor"] = "device: BENCH_r02 15.162 ms/step"
    else:
        out["metric"] = "kodak768x512_ddim17_bf16_denoise_steps_per_s"
        out["value"] = round(med, 3)
        out["vs_baseline"] = round(med / ANCHOR_WALL_STEPS_PER_S, 3)
        out["anchor"] = "wall: first TPU run 40.015 steps/s (tracing unavailable)"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
