"""Conditional U-Net denoiser.

Behavioral spec: `epsilonparam/modules/unet.py` / `xparam/modules/unet.py`.
Six-resolution encoder/decoder of paired ResnetBlocks + linear attention,
with the compressor's context pyramid channel-concatenated at the first
`len(context)` levels, a time-MLP bias in every ResnetBlock, and a
LayerNorm→7x7 head.

TPU design: NHWC, static shapes, channel-concat context injection (the
concats are free under XLA fusion), and attention whose global state is
O(d²) — see `layers.LinearAttention` for why that makes intra-image tile
parallelism exact.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import folding, pallas_kernels
from .layers import (
    Block,
    ChannelLayerNorm,
    Conv2d,
    Downsample,
    PreNormLinearAttention,
    ResnetBlock,
    TimeEmbedding01,
    TimeEmbeddingIndex,
    Upsample,
)


class Unet(nn.Module):
    dim: int = 64
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 3, 4, 5, 6)
    context_dim_mults: Sequence[int] = (1, 2, 3, 4)
    channels: int = 3
    context_channels: int = 3
    with_time_emb: bool = True
    embd_type: str = "01"

    @nn.compact
    def __call__(self, x, time=None, context=(), ctx_contrib=None,
                 precompute_ctx: bool = False):
        """x: (B,H,W,C) noisy image; time: (B,1) in [0,1] ("01") or (B,)
        index ("index"); context: coarse-to-fine-reversed pyramid, finest
        first, concatenated at down levels 0..len(context)-1.

        Context hoisting (decode fast path): the context half of every
        context-consuming conv (each down level's res1 block1 + 1x1 skip)
        is loop-invariant across the DDIM scan, so
        ``apply(params, None, None, context, precompute_ctx=True)``
        computes those contributions ONCE and the per-step call consumes
        them via ``ctx_contrib=`` without re-convolving the context —
        exact split of each conv (Conv2d cin_total/in_offset)."""
        dims = [self.channels, *(self.dim * m for m in self.dim_mults)]
        num_resolutions = len(dims) - 1

        if precompute_ctx:
            n_ctx = min(len(context), len(self.context_dim_mults))
            c0 = context[0]
            foldable = (
                c0.dtype == jnp.bfloat16 and c0.shape[2] % 2 == 0 and num_resolutions > 1
            )
            l0_cin = self.channels + self.context_channels
            fold0 = foldable and folding.fold_l0_active(
                l0_cin, c0.shape[1] * c0.shape[2]
            )
            time_dim = self.dim if self.with_time_emb else None
            out = []
            for ind in range(n_ctx):
                folded = fold0 and ind == 0
                cin_total = dims[ind] + context[ind].shape[-1]
                if (
                    cin_total == dims[ind + 1]
                    or context[ind].shape[-1] < folding.CTX_HOIST_MIN_CH
                ):
                    # identity skip (the residual IS the concat, which the
                    # split cannot hoist) or a context too narrow to pay
                    # for the split (measured, ops.folding) — these levels
                    # keep the concat path
                    out.append(None)
                    continue
                ctx_l = folding.fold2(context[ind]) if folded else context[ind]
                out.append(
                    ResnetBlock(
                        dims[ind + 1], time_emb_dim=time_dim, large=(ind == 0),
                        name=f"down_{ind}_res1",
                    )(ctx_l, None, folded=folded, cin_total=cin_total, contrib=True)
                )
            return out

        if self.with_time_emb:
            if self.embd_type == "01":
                t = TimeEmbedding01(self.dim, name="time_mlp")(time)
            elif self.embd_type == "index":
                t = TimeEmbeddingIndex(self.dim, name="time_mlp")(time)
            else:
                raise NotImplementedError(self.embd_type)
        else:
            t = None
        time_dim = self.dim if self.with_time_emb else None

        # consume at most len(context_dim_mults) pyramid levels — the
        # reference's implicit contract between compressor and U-Net
        n_ctx = min(len(context), len(self.context_dim_mults))
        # width-folded level 0 (bf16 path): all full-resolution tensors
        # run as (H, W/2, 2C) so the 64-channel maps fill all 128 lanes —
        # exact, measured faster on TPU (ops/folding.py). The region is
        # self-contained: the stride-2 downsample consumes folded input
        # and emits the (unfolded, >=128-channel) level-1 map.
        foldable = (
            x.dtype == jnp.bfloat16 and x.shape[2] % 2 == 0 and num_resolutions > 1
        )
        l0_cin = self.channels + (self.context_channels if n_ctx > 0 else 0)
        px0 = x.shape[1] * x.shape[2]
        fold0 = foldable and folding.fold_l0_active(l0_cin, px0)
        hoisted = ctx_contrib is not None
        h = []
        for ind in range(num_resolutions):
            is_last = ind >= num_resolutions - 1
            dim_out = dims[ind + 1]
            folded = fold0 and ind == 0
            level_hoisted = hoisted and ind < n_ctx and ctx_contrib[ind] is not None
            if ind < n_ctx and not level_hoisted:
                x = jnp.concatenate([x, context[ind].astype(x.dtype)], axis=-1)
            if folded:
                x = folding.fold2(x)
            if level_hoisted:
                x = ResnetBlock(
                    dim_out, time_emb_dim=time_dim, large=(ind == 0),
                    name=f"down_{ind}_res1",
                )(x, t, folded=folded,
                  cin_total=dims[ind] + context[ind].shape[-1],
                  ctx_contrib=ctx_contrib[ind])
            else:
                x = ResnetBlock(
                    dim_out, time_emb_dim=time_dim, large=(ind == 0), name=f"down_{ind}_res1"
                )(x, t, folded=folded)
            x = ResnetBlock(dim_out, time_emb_dim=time_dim, name=f"down_{ind}_res2")(
                x, t, folded=folded
            )
            x = PreNormLinearAttention(name=f"down_{ind}_attn")(x, folded=folded)
            # h[0] is structurally dead (the up path pops one level less
            # than the down path appends), so this unfold is DCE'd
            h.append(folding.unfold2(x) if folded else x)
            if not is_last:
                # optional input-only fold: fold2 right before the stride-2
                # conv (exits unfolded — no folded LN anywhere), running the
                # downsample lane-dense without the stage fold's LN tax
                fold_in = (
                    not folded
                    and foldable
                    and folding.fold_downsample_active()
                    and x.shape[2] % 2 == 0
                )
                x = Downsample(dim_out, name=f"down_{ind}_downsample")(
                    folding.fold2(x) if fold_in else x, folded=folded or fold_in
                )

        mid_dim = dims[-1]
        x = ResnetBlock(mid_dim, time_emb_dim=time_dim, name="mid_block1")(x, t)
        x = PreNormLinearAttention(name="mid_attn")(x)
        x = ResnetBlock(mid_dim, time_emb_dim=time_dim, name="mid_block2")(x, t)

        # up path over reversed(in_out[1:]): level pairs (dim_in, dim_out)
        up_pairs = list(zip(dims[1:-1], dims[2:]))[::-1]
        for ind, (dim_in, dim_out) in enumerate(up_pairs):
            # the last up level runs dim-wide (64-ch) maps at half
            # resolution and its Upsample emits the full-resolution map:
            # fold it like level 0 (same lane-density argument)
            last_up = ind == len(up_pairs) - 1
            foldu = foldable and folding.fold_up_active(px0) and last_up
            fold_tail = foldable and folding.fold_head_active() and last_up
            x = jnp.concatenate([x, h.pop()], axis=-1)
            if foldu:
                x = folding.fold2(x)
            x = ResnetBlock(dim_in, time_emb_dim=time_dim, name=f"up_{ind}_res1")(
                x, t, folded=foldu
            )
            x = ResnetBlock(dim_in, time_emb_dim=time_dim, name=f"up_{ind}_res2")(
                x, t, folded=foldu
            )
            x = PreNormLinearAttention(name=f"up_{ind}_attn")(x, folded=foldu)
            if foldu:
                # the folded-in/folded-out transposed conv would mix the
                # two fold parities; a cheap unfold here (the map is 4x
                # smaller than level 0) keeps the convT exact and simple
                x = folding.unfold2(x)
            x = Upsample(dim_in, name=f"up_{ind}_upsample")(x, folded_out=fold_tail)

        out_dim = self.out_dim if self.out_dim is not None else self.channels
        norm = ChannelLayerNorm(name="final_norm")
        conv = Conv2d(out_dim, 7, padding=3, name="final_conv")
        if foldable and folding.fold_head_active() and up_pairs:
            # x is width-folded: folded LN + folded shift-add head, then
            # one small unfold of the out_dim-channel result
            y = conv(norm(x, folded=True), folded=True)
            return folding.unfold2(y)
        if pallas_kernels.fused_head_active() and x.dtype == jnp.bfloat16:
            # decode fast path: LN + 7x7 head in one Pallas HBM pass — the
            # fat-GEMM intermediate stays in VMEM (see ops.pallas_kernels)
            g, b = norm(x, params_only=True)
            w, bias = conv(x, params_only=True)
            return pallas_kernels.fused_head(x, g, b, w, bias)
        return conv(norm(x))
