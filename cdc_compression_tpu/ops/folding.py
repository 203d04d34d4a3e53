"""Width-folded (W/2, 2C) layout for the U-Net's full-resolution stage.

Why: on TPU the last (lane) axis of a tensor is padded to 128. The
flagship U-Net's level-0 feature maps are 64-channel — every elementwise
op, LayerNorm and conv at 768x512 therefore touches 2x the HBM bytes it
needs, and the MXU runs the level-0 convs at half lane utilization (the
measured "64-channel penalty": ~66 TFLOP/s vs ~194 at 128 channels —
PERF.md). The reference never hits this because cuDNN/NCHW has no lane
tiling (it's a CUDA artifact-free axis); the TPU-native fix is a layout
change, not a kernel.

The fold packs two horizontally adjacent pixels into the channel axis:

    (B, H, W, C)  ->  (B, H, W/2, 2C)      row-major reshape

and rewrites the affected ops to act on folded tensors *exactly*:

* k x k stride-1 convs become convs with a widened, block-structured
  kernel over folded columns (`fold_conv_kernel`) — 2x the issued MXU
  FLOPs (half the folded kernel is structural zeros) but full 128-lane
  utilization and half the HBM bytes. Measured per-op: the level-0 3x3
  runs 192 vs 66 TFLOP/s (0.31 vs 0.45+0.15 ms incl. windowing copies).
* the stride-2 downsample consumes folded input directly and emits the
  (already 128-channel, unfolded) next level (`fold_downsample_kernel`)
  — so the folded region needs NO unfold relayout at its exit.
* the stride-2 transposed conv (Upsample) emits folded output from
  unfolded input: its W direction folds to a plain stride-1 conv
  (`fold_convT_kernel`) — 96 vs 47 TFLOP/s measured on the final
  Upsample.
* 1x1 convs contract per-pixel: run them as one flat GEMM against a
  2-block block-diagonal weight (`blockdiag2`) — same FLOPs, dense lanes.
* channelwise LayerNorm becomes per-half statistics computed with a
  +/- sign trick so all four accumulators (sum, signed sum, sum of
  squares, signed sum of squares) ride ONE pass over 128-lane data
  (`folded_layer_norm`); no (…, 2, C) reshape, which would relayout.
* linear attention's KV summary is computed on folded q/k/v against
  block-diagonal projections; the (2C, 2C) summary's two diagonal C x C
  blocks sum to the exact unfolded summary (see layers.LinearAttention).

Everything here is differentiable (gathers/scatters of the small kernel
tensors), so the folded path works under jax.grad too; it is enabled on
the bf16 compute path only, because folding changes fp32 summation
order (fp32 golden parity against the PyTorch reference stays on the
direct lowering).

MEASURED VERDICT (v5e, 768x512 17-step bf16 decode, device self-time
from xprof hlo_stats over the scanned loop). The tail fold always wins;
the stage folds pay a fixed `folded_layer_norm` tax — its stats pass
cannot fuse into the producing conv's epilogue the way the plain
64-channel LN does (~0.33 ms vs ~0.05 ms per full-res instance; masked
4-acc, variadic reduce, (…,2,C)-reshape, lane-slice, GEMM-stats and
three Pallas kernel variants all measured ≥ that, and dropping the
upcast barrier materializes f32 activations: 26.2 ms/step) — so the
down-level-0 fold pays off only when the entry conv is big enough:

    ε-family (3-ch context, level-0 cin 6):
        fold head only (default)        15.63 ms/step
        no folding                      15.95
        + down level-0 folded           16.38
        + up stage folded               16.46
    x-family (64-ch context, level-0 cin 67):
        head only                       20.35 ms/step
        + down level-0 folded (default) 18.45

Hence defaults: FOLD_HEAD on; FOLD_L0 auto by level-0 input width
(>= FOLD_L0_AUTO_MIN_CIN folds — the x-family's 7x7 165-GFLOP entry
conv runs at 125 vs 39 TFLOP/s folded); FOLD_UP off.

Reference behavior being accelerated: the full-resolution blocks of
`epsilonparam/modules/unet.py:49-69` / `network_components.py:83-139`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_FOLD_L0 = None  # None = auto (per-model), True/False = forced
_FOLD_UP = None  # None = auto by resolution (see fold_up_active)
_FOLD_HEAD = True
# decode-time context hoisting (see enable_ctx_hoist)
_CTX_HOIST = True
# downsample-input fold: measured −0.40 ms/step on the ε-family 768x512
# 17-step bf16 decode (15.12 -> 14.72, device self-time) — see PERF.md
_FOLD_DOWNSAMPLE = True

# auto rule: fold the down-level-0 stage when its input channel count
# (image + context channels) is at least this — the stage fold's fixed
# LayerNorm tax (~1.65 ms/step at 768x512) is paid off by the entry
# conv's FLOPs, which scale with cin. Measured: ε-family (cin 6) loses
# 0.43 ms/step folded; x-family (cin 67) WINS 1.9 ms/step (20.35 ->
# 18.45) because its 7x7 165-GFLOP entry conv runs at 125 vs 39 TFLOP/s.
FOLD_L0_AUTO_MIN_CIN = 32

# second auto rule (round 2): fold the ε-family's narrow-cin level 0 too
# once the full-resolution map is large. The unfolded level-0 conv
# windowing copies grow FASTER than linearly with resolution (768x512:
# ~0.275 ms/conv; 1536x2048: ~1.9 ms/conv — 8x pixels, ~14x copy cost),
# while the folded-LN tax stays linear, so the stage fold flips from
# +0.6 ms/step at 768x512 to −7.7 ms/step at 2K (measured, PERF.md).
FOLD_L0_AUTO_MIN_PIXELS = 2 << 20  # ~2 Mpx: the 2K/4K high-res regime


def enable_fold_l0(on) -> None:
    """Force the folded down-level-0 U-Net stage on/off (bf16 path), or
    pass None to restore the auto rule (fold iff the level-0 input has
    >= FOLD_L0_AUTO_MIN_CIN channels, or the full-resolution map has
    >= FOLD_L0_AUTO_MIN_PIXELS pixels — see the measured tables above)."""
    global _FOLD_L0
    _FOLD_L0 = None if on is None else bool(on)


def fold_l0_active(l0_cin: int = 0, l0_pixels: int = 0) -> bool:
    """Whether to fold the down-level-0 stage for a model whose level-0
    input (image + concatenated context) has `l0_cin` channels and
    `l0_pixels` (= H*W) pixels."""
    if _FOLD_L0 is None:
        return l0_cin >= FOLD_L0_AUTO_MIN_CIN or l0_pixels >= FOLD_L0_AUTO_MIN_PIXELS
    return _FOLD_L0


def enable_fold_up(on) -> None:
    """Force folding of the last up-stage resblocks/attention on/off, or
    pass None to restore the auto rule (fold once the full-resolution map
    is >= FOLD_L0_AUTO_MIN_PIXELS). Same LN-tax trade-off as the down
    stage: measured −6.7 ms/step at 2K (175.1 -> 168.4, round 3) but
    +0.8 ms/step at 768x512 (PERF.md)."""
    global _FOLD_UP
    _FOLD_UP = None if on is None else bool(on)


def fold_up_active(pixels: int = 0) -> bool:
    if _FOLD_UP is None:
        return pixels >= FOLD_L0_AUTO_MIN_PIXELS
    return _FOLD_UP


def enable_fold_downsample(on: bool) -> None:
    """Toggle width-folding of Downsample *inputs* only: `fold2` the map
    right before the stride-2 conv and use the folded downsample kernel
    (which emits the next level's unfolded map). Unlike the stage folds
    this creates no folded LayerNorm — the fold lives entirely inside
    the conv — so it is pure conv-efficiency upside when it wins."""
    global _FOLD_DOWNSAMPLE
    _FOLD_DOWNSAMPLE = bool(on)


def fold_downsample_active() -> bool:
    return _FOLD_DOWNSAMPLE


# hoist only levels whose context is at least this wide: the split costs
# one extra in-loop add and makes the in-loop conv's cin smaller (more
# lane-sparse), so it must save real FLOPs to pay off. Measured (v5e,
# 768x512 17-step bf16 decode, device self-time): ε-family ctx widths
# 3-12 LOSE 0.49 ms/step hoisted (14.72 -> 15.21); x-family ctx widths
# 64-256 WIN 2.36 ms/step (17.50 -> 15.14).
CTX_HOIST_MIN_CH = 32


def enable_ctx_hoist(on: bool) -> None:
    """Toggle decode-time context hoisting: the context half of every
    wide-context conv (each down level's res1 block1 + 1x1 skip, ctx >=
    CTX_HOIST_MIN_CH channels) is computed ONCE outside the DDIM scan
    and added in-loop, so the per-step convs contract only the x
    channels. Exact split of each conv; bf16 decode path only (changes
    fp32 summation order)."""
    global _CTX_HOIST
    _CTX_HOIST = bool(on)


def ctx_hoist_active() -> bool:
    return _CTX_HOIST


def enable_fold_head(on: bool) -> None:
    """Toggle the folded tail: final Upsample emits folded output, the
    final LayerNorm runs per-half, and the 7x7 head runs as a folded
    fat-GEMM shift-add (smaller fat intermediate, lane-dense reads)."""
    global _FOLD_HEAD
    _FOLD_HEAD = bool(on)


def fold_head_active() -> bool:
    return _FOLD_HEAD


def fold2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H, W//2, 2C); pairs of adjacent columns pack
    into the channel axis (row-major reshape, no data movement needed in
    the unpadded logical layout)."""
    b, h, w, c = x.shape
    assert w % 2 == 0, f"fold2 needs even W, got {w}"
    return x.reshape(b, h, w // 2, 2 * c)


def unfold2(x: jax.Array) -> jax.Array:
    """Inverse of fold2."""
    b, h, w2, c2 = x.shape
    assert c2 % 2 == 0
    return x.reshape(b, h, w2 * 2, c2 // 2)


def fold_conv_kernel(kernel: jax.Array, padding: int):
    """Fold an HWIO stride-1 conv kernel along W by 2.

    For y[w] = sum_j x[w - p + j] K[:, j] and w = 2*wc + po, the source
    column 2*wc + po - p + j lands in folded column wc + df, half pi,
    with df = floor((po - p + j)/2), pi = (po - p + j) mod 2. Returns
    (folded_kernel (kh, kwf, 2ci, 2co), (pad_left, pad_right)) such that

        conv(fold2(x), folded_kernel, stride 1, pad) == fold2(conv(x, kernel, pad=p))

    exactly (the extra kernel entries are structural zeros).
    """
    kh, kw, ci, co = kernel.shape
    p = padding
    df_min = -((p + 1) // 2)  # floor(-p / 2)
    df_max = (kw - p) // 2
    kwf = df_max - df_min + 1
    kf = jnp.zeros((kh, kwf, 2 * ci, 2 * co), kernel.dtype)
    for po in (0, 1):
        for j in range(kw):
            s = po - p + j
            df, pi = s // 2, s % 2  # python floor-div/mod: correct for s < 0
            kf = kf.at[
                :, df - df_min, pi * ci : (pi + 1) * ci, po * co : (po + 1) * co
            ].set(kernel[:, j])
    return kf, (-df_min, df_max)


def fold_downsample_kernel(kernel: jax.Array):
    """Fold a 3x3 stride-2 pad-1 conv kernel to consume folded input and
    emit *unfolded* output (the natural exit of the folded region: the
    next U-Net level has >= 128 channels).

    y[wo] = sum_j x[2*wo - 1 + j] K[:, j]; source folded column
    wo + floor((j-1)/2), half (j-1) mod 2 -> folded taps {wo-1, wo}:
    kernel (kh, 2, 2ci, co), window stride (2, 1), W padding (1, 0).
    """
    kh, kw, ci, co = kernel.shape
    assert kw == 3, "folded downsample supports the reference's 3x3 stride-2 conv"
    kf = jnp.zeros((kh, 2, 2 * ci, co), kernel.dtype)
    for j in range(3):
        s = j - 1
        df, pi = s // 2, s % 2
        kf = kf.at[:, df + 1, pi * ci : (pi + 1) * ci, :].set(kernel[:, j])
    return kf


def fold_convT_kernel(kernel: jax.Array, padding: int, output_padding: int = 0):
    """Fold a stride-2 transposed-conv kernel to emit *folded* output from
    *unfolded* input (the ``(in-1)*2 - 2p + k + op`` torch geometry).

    For out[2*wi - p + kk] += x[wi] K[:, kk] and folded output column
    (jo, po): kk = po + p - 2*(wi - jo), so each folded output column
    reads input columns jo + d for d in a small window. Returns
    (folded_kernel (kh, wd, ci, 2co), (pad_left, pad_right)) for a conv
    with ``lhs_dilation=(2, 1)`` (H stays the usual dilated form, W is a
    plain stride-1 conv over the input columns), H padding
    (k-1-p, k-1-p+op) as in the direct lowering. The H axis of the
    returned kernel is already flipped.
    """
    kh, kw, ci, co = kernel.shape
    p = padding
    ds = []
    for po in (0, 1):
        for kk in range(kw):
            if (po + p - kk) % 2 == 0:
                ds.append((po + p - kk) // 2)
    d_min, d_max = min(ds), max(ds)
    wd = d_max - d_min + 1
    kf = jnp.zeros((kh, wd, ci, 2 * co), kernel.dtype)
    for po in (0, 1):
        for kk in range(kw):
            if (po + p - kk) % 2 != 0:
                continue
            d = (po + p - kk) // 2
            kf = kf.at[:, d - d_min, :, po * co : (po + 1) * co].set(kernel[:, kk])
    kf = jnp.flip(kf, 0)  # equivalent-forward-conv form needs flipped H taps
    return kf, (-d_min, d_max)


def blockdiag2(w: jax.Array) -> jax.Array:
    """(a, b) -> (2a, 2b) block-diagonal [[w, 0], [0, w]]: the folded form
    of any per-pixel (1x1 conv / dense) contraction."""
    z = jnp.zeros_like(w)
    return jnp.concatenate(
        [jnp.concatenate([w, z], axis=1), jnp.concatenate([z, w], axis=1)], axis=0
    )


def tile2(v: jax.Array) -> jax.Array:
    """Per-channel vector (…, C) -> (…, 2C) for folded tensors."""
    return jnp.concatenate([v, v], axis=-1)


def folded_layer_norm(x, g, b, eps: float = 1e-5):
    """Channelwise LayerNorm of the *unfolded* C channels, computed on
    folded (…, 2C) data without leaving the 128-lane layout.

    Per-half sums come from (full sum, signed sum) pairs — four
    accumulators over one read of x (XLA multi-output reduce fusion),
    variance via E[x^2] - m^2 (exact-enough: the reduction is only over
    C lanes and the squares of bf16 inputs are exact in fp32). g/b are
    the unfolded (C,) affine parameters.
    """
    from . import pallas_kernels

    if pallas_kernels.folded_ln_active(x):
        return pallas_kernels.fused_folded_layernorm(x, g, b, eps=eps)
    c2 = x.shape[-1]
    c = c2 // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1,) * (x.ndim - 1) + (c2,), x.ndim - 1)
    is_lo = lane < c
    if x.dtype == jnp.bfloat16:
        # same producer-epilogue barrier as ChannelLayerNorm: stop XLA
        # from hoisting the fp32 upcast into the producing conv.
        # Removing it was measured at 26.2 ms/step vs 16.5 (f32
        # activations materialize across the level); the hoped-for
        # stats-into-conv-epilogue fusion does not materialize.
        x = jax.lax.optimization_barrier(x)
    x32 = x.astype(jnp.float32)
    sgn = jnp.where(is_lo, 1.0, -1.0)
    s1 = jnp.sum(x32, -1, keepdims=True)
    d1 = jnp.sum(x32 * sgn, -1, keepdims=True)
    sq = jnp.square(x32)
    s2 = jnp.sum(sq, -1, keepdims=True)
    d2 = jnp.sum(sq * sgn, -1, keepdims=True)
    m = jnp.where(is_lo, s1 + d1, s1 - d1) / (2 * c)
    ex2 = jnp.where(is_lo, s2 + d2, s2 - d2) / (2 * c)
    var = jnp.maximum(ex2 - jnp.square(m), 0.0)
    y = (x32 - m) * jax.lax.rsqrt(var + eps)
    return (y * tile2(g) + tile2(b)).astype(x.dtype)
