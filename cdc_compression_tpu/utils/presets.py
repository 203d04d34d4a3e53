"""Model-family presets reproducing the two shipped reference configs.

One typed factory per family (SURVEY §5 config-system note: the reference
has three inconsistent config generations; here presets are the single
source of truth).

* `epsilon_family` — `epsilonparam/test_epsilonparam.py:27-56`:
  ε-prediction, T=20000 linear, L1, 3-channel image-space context,
  BigCompressor, clip "none", DDIM with t/sample_steps time input.
* `x_family` — `xparam/test_xparam.py:29-61`: x̂₀-prediction, T=8193
  cosine, SNR-weighted L2 (min 5), 64-channel context, ResnetCompressor,
  EMA weights at inference, index/T time input.
"""

from __future__ import annotations

from typing import Optional, Tuple

from ..diffusion.gaussian import DiffusionConfig, GaussianDiffusion
from ..models import BigCompressor, ResnetCompressor, Unet


def epsilon_family(
    *,
    dim: int = 64,
    lagrangian: float = 0.0032,
    aux_loss_weight: float = 0.9,
    aux_loss_type: str = "lpips",
    vbr: bool = False,
    num_timesteps: int = 20000,
    perceptual_fn=None,
) -> GaussianDiffusion:
    unet = Unet(
        dim=dim,
        channels=3,
        context_channels=3,
        dim_mults=(1, 2, 3, 4, 5, 6),
        context_dim_mults=(1, 2, 3, 4),
    )
    compressor = BigCompressor(
        dim=dim,
        dim_mults=(1, 2, 3, 4),
        hyper_dims_mults=(4, 4, 4),
        channels=3,
        out_channels=3,
        vbr=vbr,
    )
    cfg = DiffusionConfig(
        num_timesteps=num_timesteps,
        var_schedule="linear",
        pred_mode="noise",
        loss_type="l1",
        lagrangian=lagrangian,
        aux_loss_weight=aux_loss_weight,
        aux_loss_type=aux_loss_type,
        clip_noise="none",
        vbr=vbr,
        embd_type="01",
        sample_time_convention="step_frac",
    )
    return GaussianDiffusion(unet, compressor, cfg, perceptual_fn=perceptual_fn)


def x_family(
    *,
    dim: int = 64,
    lagrangian: float = 0.0032,
    aux_loss_weight: float = 0.0,
    aux_loss_type: str = "lpips",
    num_timesteps: int = 8193,
    pred_mode: str = "x",
    embd_type: str = "01",
    use_loss_weight: bool = True,
    loss_weight_min: float = 5.0,
    perceptual_fn=None,
) -> GaussianDiffusion:
    unet = Unet(
        dim=dim,
        channels=3,
        context_channels=dim,
        dim_mults=(1, 2, 3, 4, 5, 6),
        context_dim_mults=(1, 2, 3, 4),
        embd_type=embd_type,
    )
    compressor = ResnetCompressor(
        dim=dim,
        dim_mults=(1, 2, 3, 4),
        reverse_dim_mults=(4, 3, 2, 1),
        hyper_dims_mults=(4, 4, 4),
        channels=3,
        out_channels=dim,
    )
    cfg = DiffusionConfig(
        num_timesteps=num_timesteps,
        var_schedule="cosine",
        pred_mode=pred_mode,
        loss_type="l2",
        lagrangian=lagrangian,
        aux_loss_weight=aux_loss_weight,
        aux_loss_type=aux_loss_type,
        use_loss_weight=use_loss_weight,
        loss_weight_min=loss_weight_min,
        aux_pred_clip=False,  # xparam/...:311-317 does not clamp pred_x0
        embd_type=embd_type,
        sample_time_convention="index_frac",
    )
    return GaussianDiffusion(unet, compressor, cfg, perceptual_fn=perceptual_fn)


def latent_family(
    *,
    dim: int = 64,
    ae_ch: int = 128,
    z_channels: int = 3,
    ae_ch_mult: Tuple[int, ...] = (1, 2, 4),
    lagrangian: float = 0.0032,
    aux_loss_weight: float = 0.0,
    aux_loss_type: str = "l2",
    num_timesteps: int = 8193,
    pred_mode: str = "x",
    embd_type: str = "01",
    use_loss_weight: bool = True,
    loss_weight_min: float = 5.0,
    perceptual_fn=None,
) -> GaussianDiffusion:
    """Latent-space diffusion codec behind a frozen `AutoencoderKL`.

    The capability the reference designed but shipped broken
    (xparam/train.py:104-114 intends z_channels=3, ch_mult=[1,2,4],
    ch=128; SURVEY §2.5 documents the two bugs). Working geometry: the AE
    downsamples 2^(len(ch_mult)-1)=4x, so the U-Net runs on z at 1/4
    image resolution; the compressor's context pyramid must therefore sit
    at z-relative scales — achieved with a 2-stage `reverse_dim_mults`
    (pyramid at image-1/4 and image-1/8) and a 2-level U-Net context
    contract, instead of the reference's impossible image-scale pyramid.
    """
    from ..models.autoencoder import AutoencoderKL

    ae_down = 2 ** (len(ae_ch_mult) - 1)
    assert ae_down == 4, "latent preset assumes a 4x AE (ch_mult of length 3)"
    unet = Unet(
        dim=dim,
        channels=z_channels,
        context_channels=dim,
        dim_mults=(1, 2, 3, 4),
        context_dim_mults=(1, 2),
        embd_type=embd_type,
    )
    compressor = ResnetCompressor(
        dim=dim,
        dim_mults=(1, 2, 3, 4),
        reverse_dim_mults=(4, 3),
        hyper_dims_mults=(4, 4, 4),
        channels=3,
        out_channels=dim,
    )
    ae = AutoencoderKL(ch=ae_ch, z_channels=z_channels, ch_mult=ae_ch_mult)
    cfg = DiffusionConfig(
        num_timesteps=num_timesteps,
        var_schedule="cosine",
        pred_mode=pred_mode,
        loss_type="l2",
        lagrangian=lagrangian,
        aux_loss_weight=aux_loss_weight,
        aux_loss_type=aux_loss_type,
        use_loss_weight=use_loss_weight,
        loss_weight_min=loss_weight_min,
        aux_pred_clip=False,
        embd_type=embd_type,
        sample_time_convention="index_frac",
    )
    return GaussianDiffusion(unet, compressor, cfg, perceptual_fn=perceptual_fn, ae=ae)


def init_params(engine: GaussianDiffusion, rng, image_hw: Tuple[int, int] = (256, 256)):
    """Initialize a {unet, compressor[, ae]} param tree for an engine.

    For latent engines (`engine.ae` set) the U-Net is initialized on the
    AE's z-shape and an "ae" subtree is included (randomly initialized —
    overwrite it with pretrained weights from `cli.train_ae`)."""
    import jax
    import jax.numpy as jnp

    h, w = image_hw
    k1, k2, k3 = jax.random.split(
        jax.random.PRNGKey(rng) if isinstance(rng, int) else rng, 3
    )
    x = jnp.zeros((1, h, w, 3))
    cond = jnp.full((1,), 0.5, jnp.float32) if engine.compressor.vbr else None
    # jit every init/apply: flax init otherwise executes op-by-op, which
    # takes minutes against a remote-attached (axon) TPU at full size
    comp_params = jax.jit(engine.compressor.init)(k2, x, cond)
    ctx = jax.jit(engine.compressor.apply)(comp_params, x, cond)["output"]
    time0 = jnp.zeros((1, 1)) if engine.cfg.embd_type == "01" else jnp.zeros((1,))
    net_in = x
    params = {"compressor": comp_params}
    if engine.ae is not None:
        ae_params = jax.jit(engine.ae.init, static_argnums=(3,))(k3, x, k3, True)
        net_in = jax.jit(lambda p, a: engine.ae.apply(p, a, method="encode").mode)(
            ae_params, x
        )
        params["ae"] = ae_params
    params["unet"] = jax.jit(engine.unet.init)(k1, net_in, time0, ctx)
    return params
