"""Analysis/synthesis transforms with a hyperprior entropy model.

Behavioral spec: `epsilonparam/modules/compress_modules.py` (Big/Simple)
and `xparam/modules/compress_modules.py` (Resnet). Pipeline:

  encode:  4×(stage → down) to a 1/16 latent → hyper-enc to a 1/64
           hyper-latent → quantize around learned prior medians →
           hyper-dec to (mean, scale) → quantize latent around mean.
  decode:  4×(stage → up), collecting after every stage; returns the
           multi-resolution context pyramid finest-first for the U-Net.
  bpp:     analytic -log2 likelihood of both quantized latents per pixel
           (training: additive-noise; eval: round-with-offset).

The real bitstream path (range coder) lives in `entropy/`; it consumes
the same prior CDF and (mean, scale) fields so analytic bpp and coded
bits agree to <1-2%.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.distributions import NormalParams
from ..ops.prior import FlexiblePrior
from ..ops.quantize import quantize_noise, round_with_offset
from .layers import Conv2d, ConvTranspose2d, Downsample, GDN, ResnetBlock, Upsample, VBRCondition


class BaseCompressor(nn.Module):
    """Shared encode/decode/bpp plumbing; subclasses build the stages."""

    dim: int = 64
    dim_mults: Sequence[int] = (1, 2, 3, 4)
    reverse_dim_mults: Sequence[int] = (4, 3, 2, 1)
    hyper_dims_mults: Sequence[int] = (4, 4, 4)
    channels: int = 3
    out_channels: int = 3
    vbr: bool = False
    # Optional NamedShardings for SPMD runs (set via .clone() by
    # parallel.tile helpers): `latent_sharding` is the image-like layout
    # (batch over data, H over tile) for the 1/16 latent; `hyper_sharding`
    # is batch-only — the 1/64 hyper tensors are tiny and must stay
    # spatially replicated, otherwise GSPMD propagates the tile axis into
    # a grid too small to shard and falls back to involuntary full
    # rematerialization at the quantize boundary (encode's round op).
    latent_sharding: Optional[Any] = None
    hyper_sharding: Optional[Any] = None

    def _constrain(self, x, sharding):
        return x if sharding is None else jax.lax.with_sharding_constraint(x, sharding)

    @property
    def latent_channels(self) -> int:
        return self.dim * self.dim_mults[-1]

    @property
    def hyper_channels(self) -> int:
        return self.dim * self.hyper_dims_mults[-1]

    @property
    def latent_downsample(self) -> int:
        """Spatial stride image -> latent: one 2x down per encode stage."""
        return 2 ** len(self.dim_mults)

    @property
    def hyper_downsample(self) -> int:
        """Spatial stride image -> hyper-latent: the hyper encoder's first
        conv is stride 1, the rest are stride 2 (`build_hyper`)."""
        return self.latent_downsample * 2 ** (len(self.hyper_dims_mults) - 1)

    def setup(self):
        self.prior = FlexiblePrior(self.hyper_channels, name="prior")
        self.build_stages()
        self.build_hyper()

    # ---- subclass hooks -------------------------------------------------
    def build_stages(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def apply_enc_stage(self, i, x, cond):  # pragma: no cover - abstract
        raise NotImplementedError

    def apply_dec_stage(self, i, x, cond):  # pragma: no cover - abstract
        raise NotImplementedError

    # ---- hyper path (shared by all variants) ----------------------------
    def build_hyper(self):
        n = len(self.hyper_dims_mults)
        hyper_dims = [self.latent_channels, *(self.dim * m for m in self.hyper_dims_mults)]
        enc = []
        for i, dim_out in enumerate(hyper_dims[1:]):
            enc.append(
                Conv2d(dim_out, 3, 1, 1, name=f"hyper_enc_{i}")
                if i == 0
                else Conv2d(dim_out, 5, 2, 2, name=f"hyper_enc_{i}")
            )
        self.hyper_enc_layers = enc
        self.hyper_enc_vbr = (
            [VBRCondition(d, name=f"hyper_enc_vbr_{i}") for i, d in enumerate(hyper_dims[1:-1])]
            if self.vbr
            else []
        )
        rev = list(reversed([self.latent_channels * 2, *(self.dim * m for m in self.hyper_dims_mults)]))
        dec = []
        for i, dim_out in enumerate(rev[1:]):
            is_last = i == n - 1
            dec.append(
                Conv2d(dim_out, 3, 1, 1, name=f"hyper_dec_{i}")
                if is_last
                else ConvTranspose2d(dim_out, 5, 2, 2, 1, name=f"hyper_dec_{i}")
            )
        self.hyper_dec_layers = dec
        self.hyper_dec_vbr = (
            [VBRCondition(d, name=f"hyper_dec_vbr_{i}") for i, d in enumerate(rev[1:-1])]
            if self.vbr
            else []
        )

    def hyper_encode(self, x, cond=None):
        n = len(self.hyper_enc_layers)
        for i, conv in enumerate(self.hyper_enc_layers):
            x = conv(x)
            if self.vbr and i != n - 1:
                x = self.hyper_enc_vbr[i](x, cond)
            if i != n - 1:
                x = nn.leaky_relu(x, 0.2)
        return x

    def hyper_decode(self, x, cond=None):
        n = len(self.hyper_dec_layers)
        for i, conv in enumerate(self.hyper_dec_layers):
            x = conv(x)
            if self.vbr and i != n - 1:
                x = self.hyper_dec_vbr[i](x, cond)
            if i != n - 1:
                x = nn.leaky_relu(x, 0.2)
        return x

    # ---- codec API ------------------------------------------------------
    def encode(self, x, cond=None) -> Tuple[jax.Array, jax.Array, Dict[str, Any]]:
        """Image -> (q_latent, q_hyper_latent, state4bpp). NHWC throughout.

        Mirrors `compress_modules.py:43-72`: quantization is round-with-
        offset (prior medians for the hyper-latent, predicted mean for the
        latent)."""
        for i in range(len(self.enc_stages)):
            x = self.apply_enc_stage(i, x, cond)
        latent = self._constrain(x, self.latent_sharding)
        hyper_latent = self._constrain(self.hyper_encode(latent, cond), self.hyper_sharding)
        q_hyper_latent = round_with_offset(hyper_latent, self.prior.medians)
        q_hyper_latent = self._constrain(q_hyper_latent, self.hyper_sharding)
        # mean/scale stay batch-only too: the whole hyper path (1/64 grid
        # up to the 1/16 mean field) is tiny, and pinning it spatially
        # replicated stops GSPMD back-propagating the tile axis into it;
        # the elementwise quantize below mixes the tile-sharded latent
        # with the replicated mean for free (slice of a replicated
        # operand), and q_latent re-pins the image-like layout.
        mean_scale = self._constrain(
            self.hyper_decode(q_hyper_latent, cond), self.hyper_sharding
        )
        mean, scale = jnp.split(mean_scale, 2, axis=-1)
        dist = NormalParams(mean, jnp.maximum(scale, 0.1))
        q_latent = self._constrain(round_with_offset(latent, dist.mean), self.latent_sharding)
        state4bpp = {"latent": latent, "hyper_latent": hyper_latent, "dist": dist}
        return q_latent, q_hyper_latent, state4bpp

    def decode(self, q_latent, cond=None) -> Tuple[jax.Array, ...]:
        """Quantized latent -> context pyramid, finest resolution first
        (`compress_modules.py:74-82`)."""
        out = []
        x = q_latent
        for i in range(len(self.dec_stages)):
            x = self.apply_dec_stage(i, x, cond)
            out.append(x)
        return tuple(out[::-1])

    def bpp(self, image_hw, state4bpp, rng=None, training=False) -> jax.Array:
        """Per-sample analytic rate (`compress_modules.py:84-98`).

        Always computed in fp32: likelihood tails underflow in bf16."""
        H, W = image_hw
        latent = state4bpp["latent"].astype(jnp.float32)
        hyper_latent = state4bpp["hyper_latent"].astype(jnp.float32)
        dist: NormalParams = NormalParams(
            state4bpp["dist"].loc.astype(jnp.float32),
            state4bpp["dist"].scale.astype(jnp.float32),
        )
        if training:
            k1, k2 = jax.random.split(rng)
            q_hyper = quantize_noise(hyper_latent, k1)
            q_latent = quantize_noise(latent, k2)
        else:
            q_hyper = round_with_offset(hyper_latent, self.prior.medians)
            q_latent = round_with_offset(latent, dist.mean)
        hyper_rate = -jnp.log2(self.prior.likelihood(q_hyper))
        cond_rate = -jnp.log2(dist.likelihood(q_latent))
        return (hyper_rate.sum(axis=(1, 2, 3)) + cond_rate.sum(axis=(1, 2, 3))) / (H * W)

    def median_loss(self):
        return self.prior.median_loss()

    def __call__(self, x, cond=None, rng=None, training=False,
                 compute_dtype=None) -> Dict[str, Any]:
        """Full forward (`compress_modules.py:100-109`).

        `compute_dtype=jnp.bfloat16` (pair it with the `dec_*` param
        kernels cast to bf16, see `GaussianDiffusion.compress`) runs only
        the *synthesis* stages in bf16. The analysis + hyper path and all
        quantization/likelihood math stay fp32 on purpose: bf16 noise in
        the latent flips ~8% of round-to-nearest decisions (symbols!),
        changing the bitstream and the rate — whereas bf16 in synthesis
        only adds rounding noise to a context pyramid that is cast to
        bf16 for the U-Net anyway. q_latent and bpp are bit-identical to
        the fp32 path.
        """
        q_latent, q_hyper_latent, state4bpp = self.encode(x, cond)
        bpp = self.bpp(x.shape[1:3], state4bpp, rng=rng, training=training)
        dq = q_latent if compute_dtype is None else q_latent.astype(compute_dtype)
        output = self.decode(dq, cond)
        return {
            "output": output,
            "bpp": bpp,
            "q_latent": q_latent,
            "q_hyper_latent": q_hyper_latent,
            "mean": state4bpp["dist"].loc,
            "scale": state4bpp["dist"].scale,
        }


class ResnetCompressor(BaseCompressor):
    """ResnetBlock stages, first block 7x7 (`xparam/compress_modules.py:104-177`).

    With `out_channels=3, reverse_dim_mults=(3,2,1)+last-stage-identity`
    semantics this also covers the ε-variant `BigCompressor`
    (`epsilonparam/compress_modules.py:112-184`): both decode the latent
    through ResnetBlock+Upsample stages — they differ only in the channel
    plan, which is config here, not code.
    """

    def _reverse_mults(self) -> Tuple[int, ...]:
        return tuple(self.reverse_dim_mults)

    def build_stages(self):
        dims = [self.channels, *(self.dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))
        self.enc_stages = [
            (
                ResnetBlock(dim_out, large=(i == 0), name=f"enc_{i}_res"),
                Downsample(dim_out, name=f"enc_{i}_down"),
            )
            for i, (_, dim_out) in enumerate(in_out)
        ]
        self.enc_vbr = (
            [VBRCondition(d, name=f"enc_vbr_{i}") for i, (_, d) in enumerate(in_out)]
            if self.vbr
            else []
        )
        rev_dims = [*(self.dim * m for m in self._reverse_mults()), self.out_channels]
        rev_in_out = list(zip(rev_dims[:-1], rev_dims[1:]))
        n = len(rev_in_out)
        dec = []
        for i, (dim_in, dim_out) in enumerate(rev_in_out):
            is_last = i == n - 1
            res_dim = dim_out if not is_last else dim_in
            dec.append(
                (
                    ResnetBlock(res_dim, name=f"dec_{i}_res"),
                    Upsample(dim_out, name=f"dec_{i}_up"),
                )
            )
        self.dec_stages = dec
        self.dec_vbr = (
            [
                VBRCondition(d if i != n - 1 else rev_in_out[i][0], name=f"dec_vbr_{i}")
                for i, (_, d) in enumerate(rev_in_out)
            ]
            if self.vbr
            else []
        )

    def apply_enc_stage(self, i, x, cond):
        res, down = self.enc_stages[i]
        x = res(x)
        if self.vbr:
            x = self.enc_vbr[i](x, cond)
        return down(x)

    def apply_dec_stage(self, i, x, cond):
        res, up = self.dec_stages[i]
        x = res(x)
        if self.vbr:
            x = self.dec_vbr[i](x, cond)
        return up(x)


class BigCompressor(ResnetCompressor):
    """ε-variant channel plan: decoder mirrors the encoder and ends in
    `out_channels` (`epsilonparam/compress_modules.py:112-184`).

    reverse plan is derived from dim_mults: reversed([out] + dims) with the
    last stage keeping its input width (is_last res keeps dim_in)."""

    def _reverse_mults(self) -> Tuple[int, ...]:
        return tuple(reversed(tuple(self.dim_mults)))


class SimpleCompressor(BaseCompressor):
    """Conv5s2+GDN1 encoder / convT5s2+iGDN1 decoder
    (`epsilonparam/compress_modules.py:187-257`)."""

    def build_stages(self):
        dims = [self.channels, *(self.dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))
        n = len(in_out)
        self.enc_stages = [
            (
                Conv2d(dim_out, 5, 2, 2, name=f"enc_{i}_conv"),
                GDN(name=f"enc_{i}_gdn") if i != n - 1 else None,
            )
            for i, (_, dim_out) in enumerate(in_out)
        ]
        self.enc_vbr = (
            [VBRCondition(d, name=f"enc_vbr_{i}") for i, (_, d) in enumerate(in_out[:-1])]
            if self.vbr
            else []
        )
        rev_dims = list(reversed([self.out_channels, *(self.dim * m for m in self.dim_mults)]))
        rev_in_out = list(zip(rev_dims[:-1], rev_dims[1:]))
        self.dec_stages = [
            (
                ConvTranspose2d(dim_out, 5, 2, 2, 1, name=f"dec_{i}_conv"),
                GDN(inverse=True, name=f"dec_{i}_gdn") if i != n - 1 else None,
            )
            for i, (_, dim_out) in enumerate(rev_in_out)
        ]
        self.dec_vbr = (
            [VBRCondition(d, name=f"dec_vbr_{i}") for i, (_, d) in enumerate(rev_in_out[:-1])]
            if self.vbr
            else []
        )

    def apply_enc_stage(self, i, x, cond):
        conv, gdn = self.enc_stages[i]
        x = conv(x)
        if self.vbr and i < len(self.enc_vbr):
            x = self.enc_vbr[i](x, cond)
        if gdn is not None:
            x = gdn(x)
        return x

    def apply_dec_stage(self, i, x, cond):
        conv, gdn = self.dec_stages[i]
        x = conv(x)
        if self.vbr and i < len(self.dec_vbr):
            x = self.dec_vbr[i](x, cond)
        if gdn is not None:
            x = gdn(x)
        return x
