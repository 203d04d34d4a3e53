"""Progressive step-halving distillation of the denoiser.

Behavioral spec: `epsilonparam/modules/distill_diffusion.py:233-319` +
`distill_trainer.py:118-175` — per round k, the student (trained at
timestep stride 2^k) matches the teacher's one-DDIM-step-then-predict
target; after each round student weights become the next teacher.

Functional design: teacher and student are the SAME flax module with two
param trees. One jitted loss per round (k is static — it changes the
timestep grid length). The context model is frozen (reference wraps it in
no_grad, :240-241): we stop_gradient its outputs and only differentiate
w.r.t. student params.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.schedules import extract, make_sample_schedule
from .gaussian import GaussianDiffusion


class DistillDiffusion:
    """`base_steps=None` reproduces the reference grid (stride 2^k over the
    full T, `distill_diffusion.py:233-319`). `base_steps=N` distills the
    DEPLOYED N-step DDIM sampler instead: round k's teacher grid is the
    `(N-1)/2^k + 1`-step `linspace(0, T-1, n)` schedule — exactly what
    `make_sample_schedule` decodes with — so each round halves the decode
    step count (17 → 9 → 5 → 3) and the student's training grid IS its
    inference schedule. The grids nest: `linspace(0,T-1,2n-1)[::2] ==
    linspace(0,T-1,n)` elementwise for integer grids, so the promoted
    student always trains on points of its teacher's grid."""

    def __init__(self, engine: GaussianDiffusion, base_steps: int | None = None):
        self.engine = engine
        self.base_steps = base_steps

    def _grid(self, k: int) -> np.ndarray:
        T = self.engine.cfg.num_timesteps
        if self.base_steps is None:
            return np.arange(0, T, 2 ** k, dtype=np.int64)
        n = (self.base_steps - 1) // (2 ** k) + 1
        if (self.base_steps - 1) % (2 ** k):
            raise ValueError(
                f"base_steps-1 ({self.base_steps - 1}) must be divisible by "
                f"2^k for round k={k} (use N = m*2^kiter + 1, e.g. 17)")
        return np.linspace(0, T - 1, n).astype(np.int64)

    def loss(
        self,
        student_params: Dict[str, Any],
        teacher_params: Dict[str, Any],
        compressor_params: Dict[str, Any],
        images: jax.Array,
        k: int,
        rng: jax.Array,
    ) -> jax.Array:
        """One distillation loss for round k (static int)."""
        eng = self.engine
        cfg = eng.cfg
        B = images.shape[0]
        tidx2train = jnp.asarray(self._grid(k))  # teacher grid, stride 2^k
        # student trains on every second grid point (skipping 0)
        sidx2train = tidx2train[::2][1:]

        k_t, k_noise = jax.random.split(rng)
        sample = jax.random.randint(k_t, (B,), 0, sidx2train.shape[0])
        t_train = sidx2train[sample]  # original-timestep ids

        ctx = eng.compressor.apply(compressor_params, images)
        context = [jax.lax.stop_gradient(c) for c in ctx["output"]]

        noise = jax.random.normal(k_noise, images.shape, images.dtype)
        x_noisy = eng.q_sample(images, t_train, noise)

        # schedule over the teacher grid for the intermediate DDIM step
        sched = make_sample_schedule(eng.train_sched, int(tidx2train.shape[0]))

        def time_in(t_ids):
            if cfg.embd_type == "01":
                return t_ids.astype(jnp.float32)[:, None] / cfg.num_timesteps
            return t_ids.astype(jnp.float32)

        # student prediction at t
        fx = eng.unet.apply(student_params["unet"], x_noisy, time_in(t_train), context)

        # teacher: one DDIM step from t to the previous grid point, then
        # re-evaluate — all under stop_gradient
        grid_idx = jnp.searchsorted(tidx2train, t_train)
        tparams = {"unet": teacher_params["unet"]}
        x_next = eng.ddim_step(
            tparams, sched, x_noisy, grid_idx, context,
            jax.random.PRNGKey(0), clip_denoised=True, eta=0.0,
        )
        t_prev = tidx2train[grid_idx - 1]
        target = eng.unet.apply(teacher_params["unet"], x_next, time_in(t_prev), context)
        target = jax.lax.stop_gradient(target)

        snr = eng.train_sched.snr[t_train]
        m = cfg.loss_weight_min
        if cfg.use_loss_weight:
            clipped = jnp.minimum(snr, m) if m > 0 else jnp.maximum(snr, -m)
            if cfg.pred_mode == "noise":
                weight = clipped / snr
            elif cfg.pred_mode == "x":
                weight = clipped
            else:
                weight = clipped / (snr + 1.0)
        else:
            weight = jnp.ones_like(snr)

        per = jnp.mean(
            jnp.abs(target - fx) if cfg.loss_type == "l1" else jnp.square(target - fx),
            axis=tuple(range(1, fx.ndim)),
        )
        if cfg.loss_type == "l1":
            return (per * jnp.sqrt(weight)).mean()
        return (per * weight).mean()

    def make_round_step(self, optimizer, k: int):
        """Jitted student update for round k; teacher/compressor frozen."""

        @jax.jit
        def step(student_params, opt_state, teacher_params, compressor_params, images, rng):
            def lf(sp):
                return self.loss(sp, teacher_params, compressor_params, images, k, rng)

            loss, grads = jax.value_and_grad(lf)(student_params)
            updates, opt_state = optimizer.update(grads, opt_state, student_params)
            import optax

            student_params = optax.apply_updates(student_params, updates)
            return student_params, opt_state, loss

        return step


def distill(
    engine: GaussianDiffusion,
    params: Dict[str, Any],
    data_iter=None,
    *,
    kiter: int = 3,
    steps_per_round: int = 1000,
    lr: float = 4e-5,
    rng=None,
    device_images=None,
    batch_size: int = 4,
    crop_size: int = 256,
    hflip: bool = True,
    bf16: bool = False,
    steps_per_call: int = 1,
    log_every: int = 500,
    base_steps: int | None = None,
    save_round_fn=None,
):
    """Outer loop (`distill_trainer.py:118-175`): for each k round copy
    teacher->student, train the student at stride 2^k, then promote.
    Returns the final distilled params tree.

    Two data paths, mirroring the Trainer: `data_iter` (host batches in
    [0,1]) for small/CPU runs, or `device_images` ((N,H,W,C) in [0,1])
    to keep the bank on device and sample crops inside the compiled
    round step — required for long TPU runs here (the axon client leaks
    every host input transfer, CLAUDE.md). `steps_per_call` scans K
    student updates per dispatched program; `bf16` casts the batch so
    the networks run in bf16 like the mixed-precision trainer."""
    import optax

    assert (data_iter is None) != (device_images is None), (
        "pass exactly one of data_iter / device_images"
    )
    rng = jax.random.PRNGKey(0) if rng is None else rng
    dd = DistillDiffusion(engine, base_steps=base_steps)
    teacher = {"unet": params["unet"]}
    compressor = params["compressor"]
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    if device_images is not None:
        device_images = jnp.asarray(device_images, jnp.float32)

    for k in range(kiter):
        student = jax.tree.map(lambda a: a, teacher)  # copy teacher -> student
        opt = optax.adam(lr)
        opt_state = opt.init(student)

        if device_images is None:
            step = dd.make_round_step(opt, k)
            for i in range(steps_per_round):
                images = jnp.asarray(next(data_iter), dtype) * 2.0 - 1.0
                rng, sub = jax.random.split(rng)
                student, opt_state, loss = step(
                    student, opt_state, teacher, compressor, images, sub
                )
                if log_every and (i + 1) % log_every == 0:
                    print(f"round k={k} step {i + 1}: loss={float(loss):.4g}",
                          flush=True)
        else:
            from ..train.trainer import sample_crop_batch

            K = max(1, steps_per_call)

            @jax.jit
            def multi_step(student, opt_state, teacher, comp, rngs):
                def body(carry, r):
                    sp, os_ = carry
                    k_data, k_loss = jax.random.split(r)
                    images = sample_crop_batch(
                        device_images, k_data, batch_size, crop_size, hflip
                    ).astype(dtype) * 2.0 - 1.0

                    def lf(sp_):
                        return dd.loss(sp_, teacher, comp, images, k, k_loss)

                    loss, grads = jax.value_and_grad(lf)(sp)
                    updates, os2 = opt.update(grads, os_, sp)
                    return (optax.apply_updates(sp, updates), os2), loss

                (student, opt_state), losses = jax.lax.scan(
                    body, (student, opt_state), rngs
                )
                return student, opt_state, losses[-1]

            i = 0
            while i < steps_per_round:
                keys = jax.random.split(rng, K + 1)
                rng = keys[0]
                student, opt_state, loss = multi_step(
                    student, opt_state, teacher, compressor, keys[1:]
                )
                i += K
                if log_every and i % log_every < K:
                    print(f"round k={k} step {i}: loss={float(loss):.4g}",
                          flush=True)
        teacher = student  # student -> teacher for the next round
        if save_round_fn is not None:
            save_round_fn(k, {"unet": teacher["unet"], "compressor": compressor})
    return {"unet": teacher["unet"], "compressor": compressor}
