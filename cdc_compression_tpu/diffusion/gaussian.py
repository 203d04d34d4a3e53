"""Gaussian diffusion engine: training losses + on-device DDIM decoding.

Behavioral spec: `epsilonparam/modules/denoising_diffusion.py` and
`xparam/modules/denoising_diffusion.py`. Covers both model families:

* ε-parameterization (pred_mode="noise"), L1/L2, optional LPIPS aux,
  VBR β-conditioning, clip modes "none"/"half"/"full";
* x̂₀/v-parameterization with SNR-clipped loss weights and EMA-friendly
  pure-function structure.

TPU-native design
-----------------
The reference runs the sampling loop in Python with one host sync per
step (`denoising_diffusion.py:166-192`). Here the whole loop is a
`lax.scan` over stacked per-step schedule coefficients: one compiled
program, zero host round-trips, PRNG threaded as jax.random keys. The
engine is a *pure-function* factory — params in, arrays out — so the
same code path jits under `pjit` shardings (data parallel) and
`shard_map` (tile parallel) unchanged.

Time-input conventions (faithful to the reference quirks):
* training ("01"): t / num_timesteps (both variants);
* ε sampling: t / sample_steps (`epsilonparam/...:121,138` divides the
  *subsampled* index by sample_steps — an inference/training mismatch the
  released checkpoints were evaluated with, so we reproduce it);
* x sampling: index[t] / num_timesteps (`xparam/...:154`), or raw
  index[t] for embd_type="index".
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import folding
from ..ops.schedules import (
    SampleSchedule,
    TrainSchedule,
    extract,
    make_sample_schedule,
    make_train_schedule,
)


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    num_timesteps: int = 8193
    var_schedule: str = "cosine"  # "cosine" | "linear"
    pred_mode: str = "noise"  # "noise" | "x" | "v"
    loss_type: str = "l2"  # "l1" | "l2"
    lagrangian: float = 0.0032  # β in β·bpp + distortion
    aux_loss_weight: float = 0.0  # ρ
    aux_loss_type: str = "l1"  # "l1" | "l2" | "lpips"
    clip_noise: str = "none"  # ε-family: "none"|"half"|"full"; x-family uses sample-time flag
    vbr: bool = False
    use_loss_weight: bool = False  # x-family SNR-clipped weights
    loss_weight_min: float = 5.0
    use_aux_loss_weight_schedule: bool = False
    # clamp aux pred_x0 to [-1,1] before the perceptual/pixel aux loss —
    # ε-family does (denoising_diffusion.py:248), x-family doesn't
    # (xparam/...:311-317); never applied in latent (ae) mode.
    aux_pred_clip: bool = True
    embd_type: str = "01"  # "01" | "index"
    # which time value the denoiser sees during sampling (see module doc)
    sample_time_convention: str = "step_frac"  # "step_frac" (ε) | "index_frac" (x)


def scale_to_beta(bitrate_scale: jax.Array) -> jax.Array:
    """VBR knob s∈[0,1] -> β∈[5e-4, 4e-3] (denoising_diffusion.py:282-283)."""
    return 2.0 ** (3.0 * bitrate_scale) * 5e-4


class GaussianDiffusion:
    """Functional diffusion codec over a (unet, compressor) module pair.

    Parameters are always passed explicitly:
      params = {"unet": {...}, "compressor": {...}}
    """

    def __init__(
        self,
        unet,
        compressor,
        config: DiffusionConfig,
        perceptual_fn: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None,
        ae=None,
    ):
        self.unet = unet
        self.compressor = compressor
        self.cfg = config
        self.train_sched: TrainSchedule = make_train_schedule(
            config.var_schedule, config.num_timesteps
        )
        self.perceptual_fn = perceptual_fn
        # frozen KL autoencoder for latent-space diffusion (the reference's
        # `ae_fn`, xparam/denoising_diffusion.py:221-231,350-360 — designed
        # but shipped broken, SURVEY §2.5). When set, params must carry an
        # "ae" subtree; it is stop_gradient-frozen in the loss.
        self.ae = ae
        if config.aux_loss_weight > 0 and config.aux_loss_type == "lpips" and perceptual_fn is None:
            raise ValueError("aux_loss_type='lpips' requires a perceptual_fn")

    # ------------------------------------------------------------------
    # shared algebra
    # ------------------------------------------------------------------
    def _predict_start_from_noise(self, sched, x_t, t, noise):
        return (
            extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
        )

    def _predict_noise_from_start(self, sched, x_t, t, x0):
        return (
            extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - x0
        ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)

    def _predict_v(self, sched, x_start, t, noise):
        return (
            extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * noise
            - extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * x_start
        )

    def _predict_start_from_v(self, sched, x_t, t, v):
        return (
            extract(sched.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
            - extract(sched.sqrt_one_minus_alphas_cumprod, t, x_t.ndim) * v
        )

    def q_sample(self, x_start, t, noise):
        s = self.train_sched
        return (
            extract(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + extract(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def _clip_recon(self, x_recon, clip_denoised):
        if clip_denoised in (True, "full"):
            return jnp.clip(x_recon, -1.0, 1.0)
        if clip_denoised == "half":
            b = x_recon.shape[0]
            clipped = jnp.clip(x_recon, -1.0, 1.0)
            mask = (jnp.arange(b) < b // 2).reshape(b, *((1,) * (x_recon.ndim - 1)))
            return jnp.where(mask, clipped, x_recon)
        return x_recon

    # ------------------------------------------------------------------
    # sampling (decode)
    # ------------------------------------------------------------------
    def _denoise_time_input(self, sched: SampleSchedule, t: jax.Array, b: int) -> jax.Array:
        cfg = self.cfg
        if cfg.embd_type == "index":
            return jnp.broadcast_to(sched.index[t].astype(jnp.float32), (b,))
        if cfg.sample_time_convention == "step_frac":
            tv = t.astype(jnp.float32) / sched.sample_steps
        else:
            tv = sched.index[t].astype(jnp.float32) / cfg.num_timesteps
        return jnp.broadcast_to(tv, (b,))[:, None]

    def ddim_step(
        self,
        params,
        sched: SampleSchedule,
        x: jax.Array,
        t: jax.Array,
        context,
        rng: jax.Array,
        clip_denoised,
        eta: float = 0.0,
        compute_dtype=None,
        ctx_contrib=None,
    ) -> jax.Array:
        """One DDIM update x_t -> x_{t-1} (denoising_diffusion.py:137-152,
        xparam:152-174). Pure function of (params, x, t, rng).

        `compute_dtype=jnp.bfloat16` runs the U-Net on the MXU in bf16
        (params/context pre-cast by the caller); the schedule algebra
        stays fp32. `ctx_contrib` carries the hoisted loop-invariant
        context convolutions (Unet precompute_ctx)."""
        cfg = self.cfg
        b = x.shape[0]
        t_in = self._denoise_time_input(sched, jnp.broadcast_to(t, (b,)), b)
        x_in = x if compute_dtype is None else x.astype(compute_dtype)
        fx = self.unet.apply(params["unet"], x_in, t_in, context,
                             ctx_contrib=ctx_contrib)
        fx = fx.astype(jnp.float32)
        if cfg.pred_mode == "noise":
            x_recon = self._predict_start_from_noise(sched, x, jnp.broadcast_to(t, (b,)), fx)
        elif cfg.pred_mode == "x":
            x_recon = fx
        elif cfg.pred_mode == "v":
            x_recon = self._predict_start_from_v(sched, x, jnp.broadcast_to(t, (b,)), fx)
        else:
            raise NotImplementedError(cfg.pred_mode)
        x_recon = self._clip_recon(x_recon, clip_denoised)
        tb = jnp.broadcast_to(t, (b,))
        if cfg.pred_mode == "noise":
            noise = fx
        else:
            noise = self._predict_noise_from_start(sched, x, tb, x_recon)
        sigma_t = extract(sched.sigma, tb, x.ndim)
        var = extract(sched.one_minus_alphas_cumprod_prev, tb, x.ndim) - (eta * sigma_t) ** 2
        x_next = (
            extract(sched.sqrt_alphas_cumprod_prev, tb, x.ndim) * x_recon
            + jnp.sqrt(jnp.maximum(var, 0.0)) * noise
        )
        if eta > 0:
            x_next = x_next + eta * sigma_t * jax.random.normal(rng, x.shape, x.dtype)
        return x_next

    def ddpm_step(self, params, sched, x, t, context, rng, clip_denoised,
                  compute_dtype=None, ctx_contrib=None):
        """Correct ancestral DDPM step. The reference's DDPM branch crashes
        (posterior coeffs never registered, denoising_diffusion.py:111-116);
        this is the working capability it intended."""
        cfg = self.cfg
        b = x.shape[0]
        tb = jnp.broadcast_to(t, (b,))
        t_in = self._denoise_time_input(sched, tb, b)
        # cast like ddim_step: fp32 x against bf16 params would promote
        # every conv back to fp32 (measured 28.3 vs 15.0 ms/step)
        x_in = x if compute_dtype is None else x.astype(compute_dtype)
        fx = self.unet.apply(params["unet"], x_in, t_in, context,
                             ctx_contrib=ctx_contrib)
        fx = fx.astype(jnp.float32)
        if cfg.pred_mode == "noise":
            x_recon = self._predict_start_from_noise(sched, x, tb, fx)
        elif cfg.pred_mode == "x":
            x_recon = fx
        else:
            x_recon = self._predict_start_from_v(sched, x, tb, fx)
        x_recon = self._clip_recon(x_recon, clip_denoised)
        ac = extract(sched.alphas_cumprod, tb, x.ndim)
        ac_prev = extract(sched.alphas_cumprod_prev, tb, x.ndim)
        alpha_t = ac / ac_prev
        beta_t = 1.0 - alpha_t
        coef1 = beta_t * jnp.sqrt(ac_prev) / (1.0 - ac)
        coef2 = (1.0 - ac_prev) * jnp.sqrt(alpha_t) / (1.0 - ac)
        mean = coef1 * x_recon + coef2 * x
        sigma_t = extract(sched.sigma, tb, x.ndim)
        noise = jax.random.normal(rng, x.shape, x.dtype)
        return jnp.where(t > 0, mean + sigma_t * noise, mean)

    def p_sample_loop(
        self,
        params,
        shape: Tuple[int, ...],
        context,
        sched: SampleSchedule,
        rng: jax.Array,
        *,
        sample_mode: str = "ddim",
        clip_denoised=False,
        init: Optional[jax.Array] = None,
        eta: float = 0.0,
        compute_dtype=None,
    ) -> jax.Array:
        """Full reverse loop as one `lax.scan` — fully on device."""
        img = jnp.zeros(shape, jnp.float32) if init is None else init
        steps = sched.sample_steps
        step_fn = self.ddim_step if sample_mode == "ddim" else self.ddpm_step
        if compute_dtype is not None:
            params = {
                "unet": jax.tree.map(lambda a: a.astype(compute_dtype), params["unet"]),
                "compressor": params.get("compressor"),
            }
            context = [c.astype(compute_dtype) for c in context]

        # hoist the loop-invariant context convolutions out of the scan
        # (bf16 serving path only: the split changes fp32 summation order
        # and the fp32 lowering is the golden-parity path)
        ctx_contrib = None
        if (
            compute_dtype == jnp.bfloat16
            and len(context) > 0
            and folding.ctx_hoist_active()
            and isinstance(getattr(self.unet, "context_dim_mults", None), (list, tuple))
        ):
            ctx_contrib = self.unet.apply(
                params["unet"], None, None, context, precompute_ctx=True
            )

        def body(carry, t):
            x, key = carry
            key, sub = jax.random.split(key)
            if sample_mode == "ddim":
                x = step_fn(params, sched, x, t, context, sub, clip_denoised, eta,
                            compute_dtype=compute_dtype, ctx_contrib=ctx_contrib)
            else:
                x = step_fn(params, sched, x, t, context, sub, clip_denoised,
                            compute_dtype=compute_dtype, ctx_contrib=ctx_contrib)
            return (x, key), None

        ts = jnp.arange(steps - 1, -1, -1)
        (img, _), _ = jax.lax.scan(body, (img, rng), ts)
        return img

    def compress(
        self,
        params,
        images: jax.Array,
        *,
        sample_steps: Optional[int] = None,
        rng: jax.Array,
        bitrate_scale: Optional[jax.Array] = None,
        sample_mode: str = "ddim",
        bpp_return_mean: bool = True,
        init: Optional[jax.Array] = None,
        eta: float = 0.0,
        clip_denoised=None,
        compute_dtype=None,
        batch_serial: Optional[bool] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Encode + decode in one jittable call (denoising_diffusion.py:194-215).

        `images` NHWC in [-1, 1]. Returns (decoded, bpp).

        batch_serial: decode the batch one image at a time via `lax.map`
        (encode stays batched). On TPU the B=1 conv lowering is the
        efficient one — B>1 inflates device work 13-26% per pixel at
        768x512 (PERF.md "mode batch") — so serial decode inside the one
        compiled program recovers per-image speed for batched serving.
        Default None = auto: on for the bf16 path when it is exact (DDIM,
        eta=0, no batch-coupled "half" clip), off otherwise. With eta>0,
        serial mode draws per-image noise keys, so trajectories differ
        from the batched lowering's (both are valid samples).
        clip_denoised="half" couples images within the batch (the clip
        mask is arange(b) < b//2), so it is incompatible with serial
        decode (B=1 bodies would clip nothing) — explicitly requesting
        both raises. Latent (AE) mode always decodes batched;
        batch_serial=True raises there too."""
        cfg = self.cfg
        if batch_serial and clip_denoised == "half":
            raise ValueError(
                "batch_serial decode is incompatible with the batch-coupled "
                "clip_denoised='half' mode (each lax.map body runs B=1, so "
                "b//2 == 0 would clip nothing)"
            )
        if batch_serial and self.ae is not None:
            raise ValueError("batch_serial decode is not supported in latent (AE) mode")
        H, W = images.shape[1:3]
        # divisibility: compressor strides (enc + hyper) and U-Net strides
        comp, unet = self.compressor, self.unet
        mult = max(
            2 ** (len(comp.dim_mults) + len(comp.hyper_dims_mults) - 1),
            2 ** (len(unet.dim_mults) - 1),
        )
        if H % mult or W % mult:
            raise ValueError(
                f"image size {H}x{W} must be a multiple of {mult} for this "
                f"architecture (pad with data.PadToMultiple({mult}) and crop "
                "after decode)"
            )
        comp_vars = params["compressor"]
        if compute_dtype is not None:
            # synthesis kernels in bf16 (MXU); analysis/hyper/prior stay
            # fp32 so quantization decisions (= coded symbols) and bpp are
            # bit-identical to the fp32 path — see BaseCompressor.__call__
            cvp = comp_vars["params"]
            cvp = {
                k: (jax.tree.map(lambda a: a.astype(compute_dtype), v) if k.startswith("dec_") else v)
                for k, v in cvp.items()
            }
            comp_vars = {**comp_vars, "params": cvp}
        ctx_out = self.compressor.apply(
            comp_vars, images, bitrate_scale, compute_dtype=compute_dtype
        )
        context, bpp = ctx_out["output"], ctx_out["bpp"]
        steps = cfg.num_timesteps if sample_steps is None else sample_steps
        sched = make_sample_schedule(self.train_sched, steps)
        if self.ae is not None:
            # latent mode (xparam/denoising_diffusion.py:228-231): denoise
            # in z-space (unclipped), then decode through the frozen AE
            z = self.ae.apply(params["ae"], images, method="encode").mode
            dec_z = self.p_sample_loop(
                params,
                z.shape,
                context,
                sched,
                rng,
                sample_mode=sample_mode,
                clip_denoised=False,
                init=init,
                eta=eta,
                compute_dtype=compute_dtype,
            )
            decoded = self.ae.apply(params["ae"], dec_z, method="decode")
            return decoded, (bpp.mean() if bpp_return_mean else bpp)
        if clip_denoised is None:
            # ε-family uses its configured clip mode; x-family clips fully
            clip_denoised = cfg.clip_noise if cfg.pred_mode == "noise" else True
        B = images.shape[0]
        if batch_serial is None:
            # auto rule is deliberately bf16-only: the fp32 batched
            # lowering is the golden-parity path and must stay bit-stable
            batch_serial = (
                compute_dtype == jnp.bfloat16
                and B > 1
                and sample_mode == "ddim"
                and eta == 0.0
                and clip_denoised != "half"
            )
        if batch_serial and B > 1:
            keys = jax.random.split(rng, B)
            init_b = jnp.zeros(images.shape, jnp.float32) if init is None else init

            def _decode_one(args):
                ctx_i, init_i, key = args
                return self.p_sample_loop(
                    params,
                    (1, *images.shape[1:]),
                    [c[None] for c in ctx_i],
                    sched,
                    key,
                    sample_mode=sample_mode,
                    clip_denoised=clip_denoised,
                    init=init_i[None],
                    eta=eta,
                    compute_dtype=compute_dtype,
                )[0]

            decoded = jax.lax.map(_decode_one, (tuple(context), init_b, keys))
            return decoded, (bpp.mean() if bpp_return_mean else bpp)
        decoded = self.p_sample_loop(
            params,
            images.shape,
            context,
            sched,
            rng,
            sample_mode=sample_mode,
            clip_denoised=clip_denoised,
            init=init,
            eta=eta,
            compute_dtype=compute_dtype,
        )
        return decoded, (bpp.mean() if bpp_return_mean else bpp)

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------
    def _loss_weight(self, t: jax.Array) -> jax.Array:
        """SNR-clipped per-sample weights (xparam/...:253-303)."""
        cfg = self.cfg
        snr = self.train_sched.snr[t]
        m = cfg.loss_weight_min
        if not cfg.use_loss_weight:
            if cfg.pred_mode == "v":
                return snr / (snr + 1.0)
            return jnp.ones_like(snr)
        clipped = jnp.minimum(snr, m) if m > 0 else jnp.maximum(snr, -m)
        if cfg.pred_mode == "noise":
            return clipped / snr
        if cfg.pred_mode == "x":
            return clipped
        return clipped / (snr + 1.0)

    def p_losses(
        self,
        params,
        x_start: jax.Array,
        context_dict: Dict[str, Any],
        t: jax.Array,
        rng: jax.Array,
        lagrangian_beta=None,
        aux_img: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        cfg = self.cfg
        sched = self.train_sched
        noise = jax.random.normal(rng, x_start.shape, jnp.float32)
        # q_sample promotes to fp32 (schedule buffers); cast back so bf16
        # training keeps the U-Net on the MXU in bf16
        x_noisy = self.q_sample(x_start.astype(jnp.float32), t, noise).astype(x_start.dtype)
        if cfg.embd_type == "01":
            t_in = t.astype(jnp.float32)[:, None] / cfg.num_timesteps
        else:
            t_in = t.astype(jnp.float32)
        fx = self.unet.apply(params["unet"], x_noisy, t_in, context_dict["output"])
        fx = fx.astype(jnp.float32)
        x_start = x_start.astype(jnp.float32)
        x_noisy = x_noisy.astype(jnp.float32)

        if cfg.pred_mode == "noise":
            target = noise
        elif cfg.pred_mode == "x":
            target = x_start
        else:
            target = self._predict_v(sched, x_start, t, noise)

        weight = self._loss_weight(t)
        per_sample = jnp.mean(
            jnp.abs(target - fx) if cfg.loss_type == "l1" else jnp.square(target - fx),
            axis=tuple(range(1, fx.ndim)),
        )
        if cfg.loss_type == "l1":
            err = (per_sample * jnp.sqrt(weight)).mean()
        else:
            err = (per_sample * weight).mean()

        metrics = {"diffusion_loss": err, "bpp": context_dict["bpp"].mean()}
        beta = cfg.lagrangian if lagrangian_beta is None else lagrangian_beta
        aux_err = 0.0
        if cfg.aux_loss_weight > 0:
            if cfg.pred_mode == "noise":
                pred_x0 = self._predict_start_from_noise(sched, x_noisy, t, fx)
            elif cfg.pred_mode == "x":
                pred_x0 = fx
            else:
                pred_x0 = self._predict_start_from_v(sched, x_noisy, t, fx)
            if self.ae is not None:
                # latent mode: aux loss in pixel space through the frozen
                # decoder (xparam/...:316-317); no clamp on z-space pred
                pred_x0 = self.ae.apply(
                    jax.lax.stop_gradient(params["ae"]), pred_x0, method="decode"
                )
            elif cfg.aux_pred_clip:
                pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)
            target_img = x_start if aux_img is None else aux_img
            if cfg.use_aux_loss_weight_schedule:
                m = cfg.loss_weight_min
                aux_w = jnp.minimum(sched.snr[t], m) if m > 0 else jnp.maximum(sched.snr[t], -m)
            else:
                aux_w = jnp.ones_like(weight)
            if cfg.aux_loss_type == "l1":
                pa = jnp.mean(jnp.abs(target_img - pred_x0), axis=tuple(range(1, fx.ndim)))
                aux_err = (pa * jnp.sqrt(aux_w)).mean()
            elif cfg.aux_loss_type == "l2":
                pa = jnp.mean(jnp.square(target_img - pred_x0), axis=tuple(range(1, fx.ndim)))
                aux_err = (pa * aux_w).mean()
            elif cfg.aux_loss_type == "lpips":
                pa = self.perceptual_fn(target_img, pred_x0)
                aux_err = (pa * aux_w).mean()
            else:
                raise NotImplementedError(cfg.aux_loss_type)
            metrics["aux_loss"] = aux_err
            loss = (
                beta * context_dict["bpp"].mean()
                + err * (1 - cfg.aux_loss_weight)
                + aux_err * cfg.aux_loss_weight
            )
        else:
            loss = beta * context_dict["bpp"].mean() + err
        metrics["loss"] = loss
        return loss, metrics

    def loss(
        self, params, images: jax.Array, rng: jax.Array
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Full RD(P) training loss + prior median loss, one grad pass.

        Equivalent of `forward` + the trainer's two backwards
        (`trainer.py:130-132`): the median loss's gradient is disjoint by
        construction (stop_gradient inside `FlexiblePrior.median_loss`),
        so summing is exact.
        """
        cfg = self.cfg
        B = images.shape[0]
        k_t, k_bpp, k_noise, k_vbr = jax.random.split(rng, 4)
        t = jax.random.randint(k_t, (B,), 0, cfg.num_timesteps)
        if cfg.vbr:
            bitrate_scale = jax.random.uniform(k_vbr, (B,))
            beta = scale_to_beta(bitrate_scale)
        else:
            bitrate_scale, beta = None, None
        context_dict = self.compressor.apply(
            params["compressor"], images, bitrate_scale, rng=k_bpp, training=True
        )
        if self.ae is not None:
            # diffuse the frozen-AE latent; aux loss still targets pixels
            # (xparam/denoising_diffusion.py:355-357)
            z = self.ae.apply(
                jax.lax.stop_gradient(params["ae"]), images, method="encode"
            ).mode
            loss, metrics = self.p_losses(
                params, z, context_dict, t, k_noise, lagrangian_beta=beta, aux_img=images
            )
        else:
            loss, metrics = self.p_losses(
                params, images, context_dict, t, k_noise, lagrangian_beta=beta
            )
        median_loss = self.compressor.apply(
            params["compressor"], method="median_loss"
        )
        metrics["median_loss"] = median_loss
        total = loss + median_loss
        metrics["total_loss"] = total
        return total, metrics
