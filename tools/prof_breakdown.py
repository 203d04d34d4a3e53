"""Phase breakdown of the flagship decode on the real TPU."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from cdc_compression_tpu.ops.schedules import make_sample_schedule
from cdc_compression_tpu.utils.presets import epsilon_family, init_params

H, W, STEPS = 512, 768, 17
engine = epsilon_family(aux_loss_weight=0.0)
params = init_params(engine, 0, image_hw=(H, W))
x = jnp.asarray(np.random.RandomState(0).rand(1, H, W, 3) * 2 - 1, jnp.float32)
rng = jax.random.PRNGKey(0)
init = jax.random.normal(rng, x.shape) * 0.8
sched = make_sample_schedule(engine.train_sched, STEPS)

ctx_fn = jax.jit(lambda p, im: engine.compressor.apply(p, im)["output"])
context = ctx_fn(params["compressor"], x)

loop = jax.jit(lambda p, ctx: engine.p_sample_loop(
    p, x.shape, list(ctx), sched, rng, init=init, clip_denoised="none",
    compute_dtype=jnp.bfloat16))
full = jax.jit(lambda p, im: engine.compress(
    p, im, sample_steps=STEPS, rng=rng, init=init, compute_dtype=jnp.bfloat16))

# one denoise step alone
step1 = jax.jit(lambda p, xx, ctx: engine.ddim_step(
    {"unet": jax.tree.map(lambda a: a.astype(jnp.bfloat16), p["unet"]),
     "compressor": None}, sched, xx, jnp.asarray(3, jnp.int32),
    [c.astype(jnp.bfloat16) for c in ctx], rng, clip_denoised="none",
    compute_dtype=jnp.bfloat16))

def t(name, fn, *a, reps=10):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/reps*1000
    print(f"{name:24s} {dt:8.2f} ms")
    return dt

d_ctx  = t("compressor fwd", ctx_fn, params["compressor"], x)
d_step = t("1 ddim step", step1, params, init, context)
d_loop = t("scan 17 steps", loop, params, context, reps=5)
d_full = t("full compress", full, params, x, reps=5)
print(f"\nscan overhead vs 17*step: {d_loop - 17*d_step:.2f} ms")
print(f"full vs scan+ctx:         {d_full - d_loop - d_ctx:.2f} ms")
print(f"implied steps/s full:     {17/d_full*1000:.1f}")
