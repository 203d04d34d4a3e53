"""Device-truth profiling: capture + summarize hlo_stats for any jitted fn.

Wall-clock timing on a tunneled (axon) TPU drifts more than the effects
under study (PERF.md "Measurement methodology correction"); this tool is
the reliable alternative: it sums per-op device self-time from an xprof
trace — immune to host/dispatch noise, reproducible to ~0.1 ms.

Usage (as a library):

    from tools.hlo_breakdown import profile_and_report
    profile_and_report(lambda: run_my_jitted_thing(), steps=51)

or as a CLI over the flagship decode loop:

    python tools/hlo_breakdown.py            # decode loop, current toggles
    python tools/hlo_breakdown.py --train    # flagship train step
"""

from __future__ import annotations

import collections
import glob
import json
import re
import shutil


def summarize(trace_dir: str, steps: int = 1, top: int = 25):
    """Parse hlo_stats from an xprof trace dir; print per-category and
    per-op device self-time normalized to `steps`."""
    from xprof.convert import raw_to_tool_data as r2t

    pb = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    data, _ = r2t.xspace_to_tool_data(pb, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    j = json.loads(data)
    cols = [c["label"] for c in j["cols"]]
    i_cat = cols.index("HLO op category")
    i_tf = cols.index("Framework op name")
    i_self = cols.index("Total self time (us)")
    i_fl = cols.index("Normalized GFLOP/s")
    i_bw = cols.index("Measured memory BW (GiB/s)")
    cat, rows, site = collections.Counter(), [], collections.Counter()
    for r in j["rows"]:
        v = [c.get("v") if c else None for c in r["c"]]
        t = float(v[i_self] or 0)
        cat[v[i_cat]] += t
        rows.append((t, v))
        m = re.search(r"Unet/([a-z0-9_]+)/|(Compressor|lpips)", str(v[i_tf]))
        site[m.group(1) or m.group(2) if m else "other"] += t
    tot = sum(cat.values())
    print(f"total device self-time: {tot/steps/1000:.3f} ms per step ({steps} steps)")
    for c, t in cat.most_common(10):
        print(f"  {t/steps/1000:8.3f} ms  {t/tot*100:5.1f}%  {c}")
    rows.sort(key=lambda x: -x[0])
    print(f"--- top {top} ops (us/step) ---")
    for t, v in rows[:top]:
        tf = str(v[i_tf]).split("closed_call/")[-1][:72]
        print(
            f"{t/steps:8.1f} [{str(v[i_cat])[:14]:14s}] "
            f"gf={float(v[i_fl] or 0):9.0f} bw={float(v[i_bw] or 0):6.0f} {tf}"
        )
    return cat, rows


def profile_and_report(run_fn, *, steps: int, trace_dir: str = "/tmp/.hlo_breakdown", top: int = 25):
    """Trace `run_fn()` (must block until done) and summarize."""
    import jax

    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        run_fn()
    return summarize(trace_dir, steps=steps, top=top)


def _main():
    import argparse
    import os

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--train", action="store_true", help="profile the train step instead of decode")
    p.add_argument("--family", choices=["epsilon", "x"], default="epsilon")
    p.add_argument("--steps", type=int, default=17)
    p.add_argument("--loops", type=int, default=3)
    p.add_argument("--hw", type=int, nargs=2, default=(512, 768))
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--fold_l0", choices=["auto", "on", "off"], default="auto",
                   help="force the down-level-0 width fold (ops.folding)")
    p.add_argument("--fold_up", action="store_true",
                   help="fold the last up stage too")
    p.add_argument("--fold_downsample", choices=["on", "off"], default="on",
                   help="fold Downsample inputs (default on — measured win)")
    p.add_argument("--ctx_hoist", choices=["on", "off"], default="on",
                   help="hoist loop-invariant context convs out of the scan")
    p.add_argument("--folded_ln", choices=["on", "off"], default="off",
                   help="route folded LayerNorms through the one-pass "
                        "Pallas kernel (ops.pallas_kernels.enable_folded_ln)")
    args = p.parse_args()

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from cdc_compression_tpu.ops import folding
    from cdc_compression_tpu.utils.presets import epsilon_family, init_params, x_family

    if args.fold_l0 != "auto":
        folding.enable_fold_l0(args.fold_l0 == "on")
    if args.fold_up:
        folding.enable_fold_up(True)
    folding.enable_fold_downsample(args.fold_downsample == "on")
    folding.enable_ctx_hoist(args.ctx_hoist == "on")
    if args.folded_ln == "on":
        from cdc_compression_tpu.ops import pallas_kernels

        pallas_kernels.enable_folded_ln(True)
    H, W = args.hw
    if args.train:
        from cdc_compression_tpu.train.trainer import TrainConfig, Trainer

        engine = epsilon_family(aux_loss_weight=0.0)
        params = init_params(engine, 0, image_hw=(256, 256))
        tr = Trainer(engine, TrainConfig(bf16=True), iter(lambda: None, 1))
        state = tr.init_state(params)
        batch = jnp.asarray(np.random.RandomState(0).rand(4, 256, 256, 3), jnp.float32)
        rng = jax.random.PRNGKey(0)
        state, m = tr.train_step(state, batch, rng)
        jax.block_until_ready(m["loss"])

        def run():
            nonlocal state
            for i in range(5):
                state, mm = tr.train_step(state, batch, jax.random.fold_in(rng, i))
            jax.block_until_ready(mm["loss"])

        profile_and_report(run, steps=5, top=args.top)
        return

    from cdc_compression_tpu.ops.schedules import make_sample_schedule

    fam = epsilon_family if args.family == "epsilon" else x_family
    engine = fam(aux_loss_weight=0.0)
    params = init_params(engine, 0, image_hw=(H, W))
    x = jnp.asarray(np.random.RandomState(0).rand(1, H, W, 3) * 2 - 1, jnp.float32)
    rng = jax.random.PRNGKey(0)
    init = jax.random.normal(rng, x.shape) * 0.8
    sched = make_sample_schedule(engine.train_sched, args.steps)
    ctx = jax.jit(lambda p, im: engine.compressor.apply(p, im)["output"])(
        params["compressor"], x
    )
    clip = "none" if args.family == "epsilon" else True
    loop = jax.jit(
        lambda p, c, ini: engine.p_sample_loop(
            p, x.shape, list(c), sched, rng, init=ini, clip_denoised=clip,
            compute_dtype=jnp.bfloat16,
        )
    )
    y = loop(params, ctx, init)
    jax.block_until_ready(y)

    def run():
        cur = init
        for _ in range(args.loops):
            cur = jnp.clip(loop(params, ctx, cur), -2.0, 2.0)
        jax.block_until_ready(cur)

    profile_and_report(run, steps=args.loops * args.steps, top=args.top)


if __name__ == "__main__":
    _main()
