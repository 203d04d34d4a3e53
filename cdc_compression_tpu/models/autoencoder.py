"""KL autoencoder for latent-space diffusion.

Behavioral spec: `epsilonparam/modules/ae.py` (LDM-style encoder/decoder
over this repo's ResnetBlock/LinearAttention/LayerNorm primitives, KL
posterior N(m, exp(s))). The reference ships this **broken** two ways
(SURVEY §2.5: wrong-directory import, `large_filter=` kwarg mismatch);
this is the working version of the designed capability, wired into
`GaussianDiffusion` via `ae_fn` semantics (xparam/denoising_diffusion.py
:221-231, :350-360).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import ChannelLayerNorm, Conv2d, Downsample, LinearAttention, ResnetBlock, Upsample


class DiagonalGaussian(NamedTuple):
    mean: jax.Array
    logstd: jax.Array

    @property
    def mode(self) -> jax.Array:
        return self.mean

    def sample(self, key: jax.Array) -> jax.Array:
        return self.mean + jnp.exp(self.logstd) * jax.random.normal(
            key, self.mean.shape, self.mean.dtype
        )

    def kl(self) -> jax.Array:
        """KL(N(mean, std) || N(0,1)) per sample."""
        var = jnp.exp(2 * self.logstd)
        return 0.5 * jnp.sum(
            jnp.square(self.mean) + var - 1.0 - 2 * self.logstd,
            axis=tuple(range(1, self.mean.ndim)),
        )


class AEEncoder(nn.Module):
    ch: int = 64
    z_channels: int = 64
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2

    @nn.compact
    def __call__(self, x):
        h = Conv2d(self.ch, 3, padding=1, name="conv_in")(x)
        n_res = len(self.ch_mult)
        for i_level in range(n_res):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(
                    block_out,
                    large=(i_level == 0 and i_block == 0),
                    name=f"down_{i_level}_block_{i_block}",
                )(h)
            if i_level != n_res - 1:
                h = Downsample(block_out, name=f"down_{i_level}_downsample")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block1")(h)
        h = h + LinearAttention(name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block2")(h)
        h = ChannelLayerNorm(name="norm_out")(h)
        h = nn.leaky_relu(h, 0.2)
        return Conv2d(2 * self.z_channels, 3, padding=1, name="conv_out")(h)


class AEDecoder(nn.Module):
    ch: int = 64
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2

    @nn.compact
    def __call__(self, z):
        n_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        h = Conv2d(block_in, 3, padding=1, name="conv_in")(z)
        h = ResnetBlock(block_in, name="mid_block1")(h)
        h = h + LinearAttention(name="mid_attn")(h)
        h = ResnetBlock(block_in, name="mid_block2")(h)
        for i_level in reversed(range(n_res)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(block_out, name=f"up_{i_level}_block_{i_block}")(h)
            if i_level != 0:
                h = Upsample(block_out, name=f"up_{i_level}_upsample")(h)
        h = ChannelLayerNorm(name="norm_out")(h)
        h = nn.leaky_relu(h, 0.2)
        return Conv2d(self.out_ch, 3, padding=1, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    ch: int = 64
    z_channels: int = 64
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    img_ch: int = 3

    def setup(self):
        self.encoder = AEEncoder(
            ch=self.ch, z_channels=self.z_channels, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks, name="encoder",
        )
        self.decoder = AEDecoder(
            ch=self.ch, out_ch=self.img_ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks, name="decoder",
        )

    def encode(self, x) -> DiagonalGaussian:
        m, s = jnp.split(self.encoder(x), 2, axis=-1)
        return DiagonalGaussian(mean=m, logstd=s)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, rng=None, training=False):
        posterior = self.encode(x)
        z = posterior.sample(rng) if training else posterior.mode
        return self.decode(z), posterior
