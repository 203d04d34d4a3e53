"""Primitive NN building blocks, NHWC / TPU-first.

Behavioral spec: `epsilonparam/modules/network_components.py` (+ the
x-variant's sinusoidal embeddings). Re-designed for TPU:

* everything is NHWC — channels on the 128-lane axis, so 1x1 convs,
  LayerNorm, and the attention einsums all vectorize on the VPU/MXU
  without relayout;
* padding is always explicit and matches PyTorch's symmetric padding so
  converted reference checkpoints are numerically exact;
* transposed convs are expressed as input-dilated convolutions
  (`lax.conv_general_dilated` with ``lhs_dilation``), the canonical XLA
  form, with the exact torch ``(kernel, stride, padding, output_padding)``
  geometry.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import folding, pallas_kernels
from ..ops.bounds import lower_bound

# ---------------------------------------------------------------------------
# conv wrappers with torch-exact geometry
# ---------------------------------------------------------------------------


def _torch_conv_init(key, shape, dtype=jnp.float32):
    """U(-b, b) with b = 1/sqrt(fan_in) — torch's default Conv2d init."""
    kh, kw, cin, _ = shape
    bound = 1.0 / math.sqrt(kh * kw * cin)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv2d(nn.Module):
    """Conv with explicit symmetric padding (torch Conv2d semantics)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, *, params_only: bool = False, folded: bool = False,
                 cin_total: int | None = None, in_offset: int = 0,
                 add_bias: bool = True):
        k = self.kernel_size
        # folded=True: x is the width-folded (B, H, W/2, 2*cin) view of a
        # (B, H, W, cin) map (ops.folding); params keep unfolded shapes.
        # cin_total/in_offset: x carries only a channel SLICE of this
        # conv's input (the context-hoisting split, ops.folding docs) —
        # the kernel keeps its full (k,k,cin_total,out) shape and is
        # sliced for the contraction; conv(x_slice, K[off:off+xc]) sums
        # with the other slice's contribution to the exact full conv.
        xc = x.shape[-1] // 2 if folded else x.shape[-1]
        cin = cin_total if cin_total is not None else xc
        kernel = self.param("kernel", _torch_conv_init, (k, k, cin, self.features))
        bias = None
        if self.use_bias:
            bound = 1.0 / math.sqrt(k * k * cin)
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
                (self.features,),
            )
        if params_only:
            # expose (kernel, bias) for a fused Pallas caller; x is
            # shape-only here (sets fan-in), nothing is computed
            return kernel, bias
        if cin_total is not None and (in_offset != 0 or xc != cin_total):
            kernel = kernel[:, :, in_offset : in_offset + xc, :]
        if not add_bias:
            bias = None
        if folded:
            return self._folded_conv(x, kernel, bias)
        if (
            self.stride == 1
            and k >= 3
            and self.features <= 16
            and self.features * 8 <= x.shape[-1]
            and x.dtype == jnp.bfloat16
        ):
            return self._shift_add_conv(x, kernel, bias)
        if k == 1 and self.stride == 1 and x.shape[-1] <= 16 and x.dtype == jnp.bfloat16:
            # tiny-input-channel 1x1 conv (the L0 skip conv, 6->64): the
            # conv form makes XLA relayout the wide output at 768x512
            # (~170 GB/s measured); a flat GEMM stays in the NHWC-flat
            # layout its LN/add neighbours use. Exact same dot.
            n, h, wdt, cin = x.shape
            y = (x.reshape(-1, cin) @ kernel.reshape(cin, self.features).astype(x.dtype))
            y = y.reshape(n, h, wdt, self.features)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    def _shift_add_conv(self, x, kernel, bias):
        """Tiny-output-channel k×k conv as one fat 1×1 GEMM + shift-add.

        A k×k conv to M≤16 channels runs the MXU at M/128 lane
        utilization — the U-Net's 7×7 64→3 output head alone costs
        ~3.3 ms/step at 768×512 when lowered directly. Recast it as a
        1×1 conv to k²·M channels (a dense, lane-filling GEMM) followed
        by a sum of k² shifted slices, which XLA fuses into a single
        pass over the fat intermediate. Exact up to fp32 summation
        order, so it is gated to the bf16 decode path (the fp32 path
        keeps XLA's direct lowering for golden parity).
        """
        k, p, m = self.kernel_size, self.padding, self.features
        n, h, w, cin = x.shape
        w2 = kernel.transpose(2, 0, 1, 3).reshape(cin, k * k * m)
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        hp, wp = h + 2 * p, w + 2 * p
        # flat dot (not lax.conv): the flatten/unflatten are bitcasts, so
        # XLA emits one GEMM + one slice-add fusion with no relayout copies
        z = (xp.reshape(-1, cin) @ w2.astype(x.dtype)).reshape(n, hp, wp, k * k * m)
        ho, wo = h + 2 * p - k + 1, w + 2 * p - k + 1
        acc = jnp.zeros((n, ho, wo, m), jnp.float32)
        for a in range(k):
            for b in range(k):
                i = (a * k + b) * m
                acc = acc + z[:, a : a + ho, b : b + wo, i : i + m].astype(jnp.float32)
        y = acc.astype(x.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    def _folded_conv(self, x, kernel, bias):
        """Conv on a width-folded (B, H, W/2, 2*cin) input — exact
        (ops.folding docstring). Stride 1 emits folded output; the 3x3
        stride-2 downsample emits the next level's unfolded map."""
        k, p = self.kernel_size, self.padding
        if k == 1 and self.stride == 1:
            # per-pixel contraction against a 2-block block-diagonal
            # weight — dense 128 lanes, same FLOPs
            n, h, w2, cin2 = x.shape
            # NOTE(perf): the tiny-cin (K=12) flat GEMM reads as pathological
            # in isolation (2.8 TFLOP/s on the ε-family level-0 skip at 2K),
            # but rewriting it as a 1x1 conv was measured NET-SLOWER (the
            # conv fuses into the residual add and bloats it: 180.4 vs
            # 177.2 ms/step) — keep the flat GEMM for all widths.
            wf = folding.blockdiag2(kernel.reshape(cin2 // 2, self.features)).astype(x.dtype)
            y = (x.reshape(-1, cin2) @ wf).reshape(n, h, w2, 2 * self.features)
            if bias is not None:
                y = y + folding.tile2(bias).astype(y.dtype)
            return y
        if self.stride == 1:
            kf, (pl_, pr) = folding.fold_conv_kernel(kernel, p)
            if self.features <= 16 and k >= 3:
                # folded analog of _shift_add_conv: the U-Net's 7x7 -> 3ch
                # head as one fat lane-dense GEMM + shift-add; the fat
                # intermediate has k*kwf*2m channels over W/2 columns —
                # ~30% fewer bytes than the unfolded 49m-over-W form
                n, h, w2, cin2 = x.shape
                kwf = kf.shape[1]
                m2 = 2 * self.features
                wmat = kf.transpose(2, 0, 1, 3).reshape(cin2, k * kwf * m2)
                xp = jnp.pad(x, ((0, 0), (p, p), (pl_, pr), (0, 0)))
                hp, wp = h + 2 * p, w2 + pl_ + pr
                z = (xp.reshape(-1, cin2) @ wmat.astype(x.dtype)).reshape(
                    n, hp, wp, k * kwf * m2
                )
                acc = jnp.zeros((n, h, w2, m2), jnp.float32)
                for a in range(k):
                    for b in range(kwf):
                        i = (a * kwf + b) * m2
                        acc = acc + z[:, a : a + h, b : b + w2, i : i + m2].astype(jnp.float32)
                y = acc.astype(x.dtype)
                if bias is not None:
                    y = y + folding.tile2(bias).astype(y.dtype)
                return y
            y = jax.lax.conv_general_dilated(
                x,
                kf.astype(x.dtype),
                window_strides=(1, 1),
                padding=((p, p), (pl_, pr)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + folding.tile2(bias).astype(y.dtype)
            return y
        assert self.stride == 2 and k == 3 and p == 1, (
            "folded conv supports stride-1 or the 3x3/s2/p1 downsample"
        )
        kf = folding.fold_downsample_kernel(kernel)
        y = jax.lax.conv_general_dilated(
            x,
            kf.astype(x.dtype),
            window_strides=(2, 1),
            padding=((1, 1), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class ConvTranspose2d(nn.Module):
    """Transposed conv with torch ConvTranspose2d geometry.

    Output size: ``(in - 1)*stride - 2*padding + kernel + output_padding``.
    Implemented as an input-dilated convolution with a spatially flipped
    kernel — the form XLA:TPU lowers directly onto the MXU.

    The kernel parameter is stored (kh, kw, in, out); a torch weight
    (in, out, kh, kw) converts by pure transpose (2,3,0,1).
    """

    features: int
    kernel_size: int
    stride: int = 2
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, folded_out: bool = False):
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        cin = x.shape[-1]
        # torch convT fan_in = out_channels * k * k (weight shape (in,out,k,k), dim-1 fan)
        bound = 1.0 / math.sqrt(k * k * self.features)
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (k, k, cin, self.features),
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
                (self.features,),
            )
        if folded_out:
            # emit the width-folded (B, 2H, W, 2*features) map directly:
            # the W direction of a stride-2 transposed conv folds to a
            # plain stride-1 conv over input columns (ops.folding)
            assert s == 2 and (k + op) % 2 == 0, "folded output needs even width"
            kf, (pl_, pr) = folding.fold_convT_kernel(kernel, p, op)
            y = jax.lax.conv_general_dilated(
                x,
                kf.astype(x.dtype),
                window_strides=(1, 1),
                padding=((k - 1 - p, k - 1 - p + op), (pl_, pr)),
                lhs_dilation=(s, 1),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if bias is not None:
                y = y + folding.tile2(bias).astype(y.dtype)
            return y
        # equivalent forward conv on the dilated input uses the spatially
        # flipped kernel; (kh,kw,in,out) is already HWIO for that conv
        w = jnp.flip(kernel, (0, 1))
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(1, 1),
            padding=((k - 1 - p, k - 1 - p + op), (k - 1 - p, k - 1 - p + op)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class Downsample(nn.Module):
    """Stride-2 3x3 conv (network_components.py:45-53)."""

    features: int

    @nn.compact
    def __call__(self, x, folded: bool = False):
        # folded input exits the folded region: output is the next
        # level's unfolded (and >=128-lane) map — no unfold relayout
        return Conv2d(self.features, 3, stride=2, padding=1, name="conv")(x, folded=folded)


class Upsample(nn.Module):
    """Stride-2 4x4 transposed conv (network_components.py:34-42)."""

    features: int

    @nn.compact
    def __call__(self, x, folded_out: bool = False):
        return ConvTranspose2d(self.features, 4, stride=2, padding=1, name="conv")(
            x, folded_out=folded_out
        )


# ---------------------------------------------------------------------------
# norms / blocks
# ---------------------------------------------------------------------------


class ChannelLayerNorm(nn.Module):
    """Channelwise LayerNorm with biased variance (network_components.py:56-66).

    NHWC: reduces over the last axis; one fused VPU pass under XLA.
    """

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, *, params_only: bool = False, folded: bool = False):
        dim = x.shape[-1] // 2 if folded else x.shape[-1]
        g = self.param("g", nn.initializers.ones, (dim,))
        b = self.param("b", nn.initializers.zeros, (dim,))
        if params_only:
            return g, b
        if folded:
            return folding.folded_layer_norm(x, g, b, eps=self.eps)
        # NOTE(perf): the tempting single-pass E[x^2]-E[x]^2 variant was
        # profiled SLOWER on v5e (XLA materializes the square and runs two
        # reduce passes: 23.5 vs 21.6 ms/fwd) — keep the two-pass form.
        if x.dtype == jnp.bfloat16:
            # stop XLA from hoisting the fp32 upcast into the producer
            # (conv/attention) epilogue, which would materialize a 2x-byte
            # f32 tensor in HBM; identity numerically
            x = jax.lax.optimization_barrier(x)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * g + b).astype(x.dtype)


class Block(nn.Module):
    """conv(3|7) + LayerNorm + ReLU (network_components.py:83-91).

    `in_bias` (B, Cin) is added to the input and `residual` (B,H,W,Cout)
    to the output — the hooks ResnetBlock uses so that, on TPU with
    `ops.pallas_kernels.enable_fused_blocks(True)`, the whole
    conv+LN+ReLU(+bias+skip) chain runs as one VMEM-resident Pallas
    kernel (decode-only: the kernel has no VJP). The XLA path is
    numerically identical (fp32 LN statistics) and remains the default.
    """

    features: int
    large: bool = False

    @nn.compact
    def __call__(self, x, in_bias=None, residual=None, folded: bool = False,
                 cin_total: int | None = None, in_offset: int = 0,
                 conv_extra=None, conv_only: bool = False):
        k, p = (7, 3) if self.large else (3, 1)
        conv = Conv2d(self.features, k, padding=p, name="conv")
        norm = ChannelLayerNorm(name="norm")
        if conv_only:
            # context-hoisting contribution: the biasless conv of an input
            # channel slice, no LN/ReLU (those wrap the summed conv)
            return conv(x, folded=folded, cin_total=cin_total,
                        in_offset=in_offset, add_bias=False)
        if folded:
            if in_bias is not None:
                x = x + folding.tile2(in_bias)[:, None, None, :].astype(x.dtype)
            x = conv(x, folded=True, cin_total=cin_total)
            if conv_extra is not None:
                x = x + conv_extra.astype(x.dtype)
            if pallas_kernels.folded_ln_active(x):
                # LN + ReLU ride the one-pass folded-LN kernel
                g, b = norm(x, params_only=True, folded=True)
                x = pallas_kernels.fused_folded_layernorm(x, g, b, relu=True)
            else:
                x = norm(x, folded=True)
                x = nn.relu(x)
            if residual is not None:
                x = x + residual.astype(x.dtype)
            return x
        if pallas_kernels.fused_blocks_active() and conv_extra is None and cin_total is None:
            # XLA keeps the conv (its conv kernels beat a hand-rolled
            # halo pipeline — measured); the LN+ReLU+skip epilogue runs
            # as one Pallas HBM pass instead of XLA's reduce+normalize
            if in_bias is not None:
                x = x + in_bias[:, None, None, :].astype(x.dtype)
            y = conv(x)
            g, b = norm(jnp.zeros((1, 1, 1, self.features), x.dtype), params_only=True)
            return pallas_kernels.fused_layernorm(y, g, b, residual=residual)
        if in_bias is not None:
            x = x + in_bias[:, None, None, :].astype(x.dtype)
        x = conv(x, cin_total=cin_total)
        if conv_extra is not None:
            x = x + conv_extra.astype(x.dtype)
        x = norm(x)
        x = nn.relu(x)
        if residual is not None:
            x = x + residual.astype(x.dtype)
        return x


class ResnetBlock(nn.Module):
    """Two Blocks with a time-bias injection and 1x1 skip
    (network_components.py:94-114)."""

    features: int
    time_emb_dim: Optional[int] = None
    large: bool = False

    @nn.compact
    def __call__(self, x, time_emb=None, folded: bool = False,
                 cin_total: int | None = None, ctx_contrib=None,
                 contrib: bool = False):
        if contrib:
            # context-hoisting precompute (ops.folding docs): x here is
            # the CONTEXT slice (already folded if `folded`), which sits
            # at the END of the concat this block normally consumes.
            # Returns the loop-invariant (block1-conv, skip-conv)
            # contributions; biases stay with the in-loop half.
            xc = x.shape[-1] // 2 if folded else x.shape[-1]
            off = cin_total - xc
            c1 = Block(self.features, large=self.large, name="block1")(
                x, folded=folded, cin_total=cin_total, in_offset=off, conv_only=True
            )
            s1 = None
            if cin_total != self.features:
                s1 = Conv2d(self.features, 1, name="res_conv")(
                    x, folded=folded, cin_total=cin_total, in_offset=off, add_bias=False
                )
            return c1, s1
        cin = cin_total if cin_total is not None else (
            x.shape[-1] // 2 if folded else x.shape[-1]
        )
        c1 = s1 = None
        if ctx_contrib is not None:
            c1, s1 = ctx_contrib
        h = Block(self.features, large=self.large, name="block1")(
            x, folded=folded, cin_total=cin_total, conv_extra=c1
        )
        t = None
        if time_emb is not None:
            assert self.time_emb_dim is not None
            t = nn.Dense(
                self.features,
                name="time_mlp",
                kernel_init=_dense_torch_init,
                bias_init=_dense_torch_bias_init,
            )(nn.leaky_relu(time_emb, 0.2))
        skip = x
        if cin != self.features:
            skip = Conv2d(self.features, 1, name="res_conv")(x, folded=folded,
                                                            cin_total=cin_total)
            if s1 is not None:
                skip = skip + s1.astype(skip.dtype)
        # time bias + skip ride along block2 (one fused kernel on TPU)
        return Block(self.features, name="block2")(h, in_bias=t, residual=skip, folded=folded)


def _dense_torch_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _dense_torch_bias_init(key, shape, dtype=jnp.float32):
    # flax passes only the bias shape; approximate torch's U(-1/sqrt(fan_in),..)
    # with zeros — bias init scale is immaterial for training parity.
    return jnp.zeros(shape, dtype)


class LinearAttention(nn.Module):
    """Softmax-over-keys linear attention (network_components.py:117-139).

    O(N·d²) instead of O(N²·d): the KV summary ``context[d,e] = Σ_n
    softmax(k)_d[n] v_e[n]`` is a (d×d) matrix — on TPU both einsums are
    MXU GEMMs, and under spatial tile parallelism the summary (plus the
    key-softmax normalizer) is exactly `psum`-reducible across tiles.
    """

    heads: int = 1
    dim_head: Optional[int] = None

    @nn.compact
    def __call__(self, x, folded: bool = False):
        b, h, w, c = x.shape
        if folded:
            c = c // 2
        dh = self.dim_head if self.dim_head is not None else c
        hidden = dh * self.heads
        scale = dh ** -0.5
        to_qkv = Conv2d(hidden * 3, 1, use_bias=False, name="to_qkv")
        to_out = Conv2d(c, 1, name="to_out")
        if folded:
            assert self.heads == 1 and dh == c, "folded attention: 1 head, dh == c"
            return self._folded_attention(x, to_qkv, to_out, c, scale)
        if x.dtype == jnp.bfloat16 and self.heads == 1 and dh == c:
            # decode fast path. Two structural changes vs the textbook
            # lowering, both exact:
            # (1) flat GEMMs instead of 1x1 convs (the conv form makes XLA
            #     relayout the projections at 768x512 — pure copies);
            # (2) single-head linear attention is LINEAR in q after the KV
            #     summary:  out = to_out(q @ ctx) = xn @ (scale·Wq·ctx·Wo)
            #     + b_o,  so the q projection, the O(N·d²) out-einsum and
            #     the out projection collapse into ONE (c,c) matrix per
            #     image — the N-sized stream is touched by a single GEMM.
            #     Measured: kills ~0.8 ms/step of qkv slice/copy relayouts
            #     plus two N-wide dots at level 0 of the 768x512 decode.
            wq, _ = to_qkv(x, params_only=True)
            wo, bo = to_out(x, params_only=True)
            wq3 = wq.reshape(c, 3 * hidden)
            xf = x.reshape(b, h * w, c)
            kv = xf @ wq3[:, hidden:].astype(x.dtype)  # (b, N, 2c): k and v only
            k = kv[..., :hidden]
            v = kv[..., hidden:]
            # max of the bf16 k equals the max of its f32 upcast — keep the
            # reduce on bf16 bytes, upcast inside the exp fusion
            kmax = jnp.max(k, axis=1, keepdims=True).astype(jnp.float32)
            kexp = jnp.exp(k.astype(jnp.float32) - kmax)
            kn = (kexp / jnp.sum(kexp, axis=1, keepdims=True)).astype(x.dtype)
            ctx = jnp.einsum("bnd,bne->bde", kn, v)
            m = jnp.einsum(
                "df,bfe,eg->bdg",
                scale * wq3[:, :hidden].astype(jnp.float32),
                ctx.astype(jnp.float32),
                wo.reshape(hidden, c),
            )
            out = jnp.einsum("bnd,bdg->bng", xf, m.astype(x.dtype)) + bo.astype(x.dtype)
            return out.reshape(b, h, w, c)
        qkv = to_qkv(x)
        # keep H,W unflattened: under spatial (tile) sharding the softmax
        # normalizer and the (d x e) KV summary reduce over the sharded
        # axes, which XLA GSPMD lowers to psum over ICI — exact, O(d^2)
        # cross-tile state, no gather of the full feature map.
        qkv = qkv.reshape(b, h, w, 3, self.heads, dh)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        q = q * scale
        k32 = k.astype(jnp.float32)
        kmax = jnp.max(k32, axis=(1, 2), keepdims=True)
        kexp = jnp.exp(k32 - kmax)
        k = (kexp / jnp.sum(kexp, axis=(1, 2), keepdims=True)).astype(x.dtype)
        context = jnp.einsum("bxyhd,bxyhe->bhde", k, v)
        out = jnp.einsum("bhde,bxyhd->bxyhe", context, q)
        out = out.reshape(b, h, w, hidden)
        return to_out(out)

    def _folded_attention(self, x, to_qkv, to_out, c, scale):
        """Linear attention on a width-folded (B, H, W/2, 2c) map, exact.

        Projections run against 2-block block-diagonal weights (dense
        128 lanes); the KV summary of the folded stream is a (2c, 2c)
        matrix whose two diagonal c x c blocks sum to the exact unfolded
        summary ``sum_n softmax(k)_d[n] v_e[n]`` (the two halves are just
        the even/odd pixel sub-streams). The softmax-over-keys max and
        normalizer combine across halves the same way. The final
        contraction folds ``ctx @ W_out`` into one block-diagonal GEMM.
        """
        b, h, w2, c2 = x.shape
        wq, _ = to_qkv(x, params_only=True, folded=True)
        wo, bo = to_out(x, params_only=True, folded=True)
        wq = wq.reshape(c, 3 * c)
        blocks = [folding.blockdiag2(wq[:, i * c : (i + 1) * c]) for i in range(1, 3)]
        wkv_f = jnp.concatenate(blocks, axis=1).astype(x.dtype)  # (2c, 4c): k, v
        xf = x.reshape(b, h * w2, c2)
        kv = xf @ wkv_f
        k = kv[..., : 2 * c]
        v = kv[..., 2 * c :]
        kmax = jnp.max(k, axis=1, keepdims=True).astype(jnp.float32)  # (b, 1, 2c)
        kmax = folding.tile2(jnp.maximum(kmax[..., :c], kmax[..., c:]))
        kexp = jnp.exp(k.astype(jnp.float32) - kmax)
        z = jnp.sum(kexp, axis=1, keepdims=True)
        z = folding.tile2(z[..., :c] + z[..., c:])
        kn = (kexp / z).astype(x.dtype)
        big = jnp.einsum("bnd,bne->bde", kn, v)  # (b, 2c, 2c)
        ctx = big[:, :c, :c] + big[:, c:, c:]  # exact unfolded KV summary
        # out = q @ (ctx·Wo) + b_o is linear in q = scale·xn@Wq — collapse
        # the whole output side into one (c,c) matrix (see the unfolded
        # fast path), block-diagonalized for the folded stream
        m = jnp.einsum(
            "df,bfe,eg->bdg",
            scale * wq[:, :c].astype(jnp.float32),
            ctx.astype(jnp.float32),
            wo.reshape(c, c),
        )
        m_f = jax.vmap(folding.blockdiag2)(m.astype(x.dtype))  # (b, 2c, 2c)
        out = jnp.einsum("bnd,bdf->bnf", xf, m_f) + folding.tile2(bo).astype(x.dtype)
        return out.reshape(b, h, w2, c2)


class PreNormLinearAttention(nn.Module):
    """Residual(PreNorm(LinearAttention)) fused wrapper (unet.py usage)."""

    heads: int = 1

    @nn.compact
    def __call__(self, x, folded: bool = False):
        y = ChannelLayerNorm(name="norm")(x, folded=folded)
        y = LinearAttention(heads=self.heads, name="attn")(y, folded=folded)
        return x + y


# ---------------------------------------------------------------------------
# conditioning / codec-specific layers
# ---------------------------------------------------------------------------


class VBRCondition(nn.Module):
    """FiLM scale/shift from a scalar bitrate knob
    (network_components.py:304-314)."""

    features: int

    @nn.compact
    def __call__(self, x, cond):
        cond = cond.reshape(-1, 1, 1, 1).astype(x.dtype)
        scale = Conv2d(self.features, 1, name="scale")(cond)
        shift = Conv2d(self.features, 1, name="shift")(cond)
        return x * scale + shift


class GDN(nn.Module):
    """Generalized divisive normalization (network_components.py:317-412).

    ``simplified=True`` is GDN1: |x| pooling, no sqrt. The channel mixing
    is a 1x1 conv → a single MXU GEMM in NHWC.
    """

    inverse: bool = False
    simplified: bool = True
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    reparam_offset: float = 2 ** -18

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        pedestal = self.reparam_offset ** 2
        beta_bound = (self.beta_min + pedestal) ** 0.5
        gamma_bound = self.reparam_offset

        beta = self.param(
            "beta", lambda k, s: jnp.sqrt(jnp.ones(s) + pedestal), (ch,)
        )
        gamma = self.param(
            "gamma",
            lambda k, s: jnp.sqrt(self.gamma_init * jnp.eye(ch) + pedestal),
            (ch, ch),
        )
        beta = jnp.square(lower_bound(beta, beta_bound)) - pedestal
        gamma = jnp.square(lower_bound(gamma, gamma_bound)) - pedestal

        pooled = jnp.abs(x) if self.simplified else jnp.square(x)
        # gamma[j, i]: contribution of input channel j to output i
        norm = jnp.einsum("bhwj,ji->bhwi", pooled.astype(jnp.float32), gamma) + beta
        if not self.simplified:
            norm = jnp.sqrt(norm)
        norm = norm.astype(x.dtype)
        return x * norm if self.inverse else x / norm


# ---------------------------------------------------------------------------
# time embeddings
# ---------------------------------------------------------------------------


class TimeEmbedding01(nn.Module):
    """t/T scalar -> Linear(1,4d) -> GELU -> Linear(4d,d) (unet.py:40)."""

    dim: int

    @nn.compact
    def __call__(self, t):
        # t: (B, 1) float in [0, 1]
        h = nn.Dense(self.dim * 4, name="fc1", kernel_init=_dense_torch_init)(t)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, name="fc2", kernel_init=_dense_torch_init)(h)


class ImprovedSinusoidalPosEmb(nn.Module):
    """Random-Fourier time embedding (xparam/network_components.py:154-170)."""

    dim: int  # half_dim count of random frequencies

    @nn.compact
    def __call__(self, x):
        # x: (B,) float timestep index
        half_dim = self.dim // 2
        weights = self.param("weights", nn.initializers.normal(1.0), (half_dim,))
        x = x.reshape(-1, 1)
        freqs = x * weights[None, :] * (2 * math.pi)
        return jnp.concatenate([x, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


# The reference's LearnedSinusoidalPosEmb (xparam/network_components.py:142-153)
# computes the identical forward — ImprovedSinusoidalPosEmb only adds an
# `is_random` (freeze-weights) switch, which in JAX is a stop_gradient /
# optimizer-mask decision, not a module one. Alias kept for API parity.
LearnedSinusoidalPosEmb = ImprovedSinusoidalPosEmb


class TimeEmbeddingIndex(nn.Module):
    """ImprovedSinusoidalPosEmb -> MLP (xparam/unet.py:42-49)."""

    dim: int

    @nn.compact
    def __call__(self, t):
        # t: (B,) integer-valued float timestep
        emb = ImprovedSinusoidalPosEmb(self.dim // 2, name="pos")(t.reshape(-1).astype(jnp.float32))
        h = nn.Dense(self.dim * 4, name="fc1", kernel_init=_dense_torch_init)(emb)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, name="fc2", kernel_init=_dense_torch_init)(h)


class SinusoidalPosEmb(nn.Module):
    """Classic transformer sinusoidal embedding (network_components.py:19-31;
    defined-but-unused in the reference unet — kept for capability parity)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        # x: (B,) float timestep
        half_dim = self.dim // 2
        scale = math.log(10000.0) / (half_dim - 1)
        freqs = jnp.exp(-scale * jnp.arange(half_dim, dtype=jnp.float32))
        ang = x.reshape(-1, 1).astype(jnp.float32) * freqs[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


# ---------------------------------------------------------------------------
# recurrent conv cells (video-era capability, network_components.py:142-301)
# ---------------------------------------------------------------------------


class ConvLSTMCell(nn.Module):
    """Convolutional LSTM cell over NHWC maps (network_components.py:142-226).

    One fused 4x-wide conv over [x, h] produces the input/forget/cell/out
    gates — a single MXU matmul per step instead of four. State is an
    (h, c) tuple shaped (B, H, W, hidden).
    """

    hidden: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, state):
        h, c = state
        gates = Conv2d(
            4 * self.hidden, self.kernel_size, padding=self.kernel_size // 2, name="gates"
        )(jnp.concatenate([x, h], axis=-1))
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return h, (h, c)

    @staticmethod
    def init_state(batch, height, width, hidden, dtype=jnp.float32):
        z = jnp.zeros((batch, height, width, hidden), dtype)
        return (z, z)


class ConvGRUCell(nn.Module):
    """Convolutional GRU cell over NHWC maps (network_components.py:229-301)."""

    hidden: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, h):
        rz = Conv2d(
            2 * self.hidden, self.kernel_size, padding=self.kernel_size // 2, name="rz"
        )(jnp.concatenate([x, h], axis=-1))
        r, z = jnp.split(jax.nn.sigmoid(rz), 2, axis=-1)
        n = jnp.tanh(
            Conv2d(self.hidden, self.kernel_size, padding=self.kernel_size // 2, name="n")(
                jnp.concatenate([x, r * h], axis=-1)
            )
        )
        h = (1.0 - z) * n + z * h
        return h, h

    @staticmethod
    def init_state(batch, height, width, hidden, dtype=jnp.float32):
        return jnp.zeros((batch, height, width, hidden), dtype)
