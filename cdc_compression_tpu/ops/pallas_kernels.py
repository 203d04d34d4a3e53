"""Pallas TPU kernels for the conv+LN+ReLU block — measured, kept OFF.

Hypothesis (from an xplane profile of the 768x512 flagship decode): the
U-Net forward looked HBM-bound with LN/elementwise ops ~29% of device
time, so fusing the reference Block

    out = relu(LN(conv3x3_same(x [+ in_bias]) + conv_bias)) [+ residual]

into VMEM-resident Pallas kernels should cut full-tensor round trips.

Measured verdict (v5e-via-axon, 17-step 768x512 bf16 decode; XLA
baseline 39.7 denoise-steps/s):

* `fused_block` w/ hand-rolled halo DMA + 128-lane channel padding
  (Mosaic rejects row-sliced HBM copies with unaligned lane extents,
  so 64-ch layers pay 2x bytes+FLOPs): 33.2; with double-buffered
  prefetch: 36.1 — still short of XLA.
* `fused_block` w/ stacked overlapping halo windows (BlockSpec
  auto-pipelining, no channel pad): the nt-way stack-of-slices stalls
  XLA compiles; a row-gather instead compiles but runs 24.8.
* `fused_layernorm` epilogue-only (conv stays XLA): 23.4 — each
  pallas_call is an opaque custom-call boundary that defeats XLA's own
  conv+epilogue fusions, which are evidently already good.

Conclusion: XLA:TPU wins on this op mix; the kernels remain available
behind `enable_fused_blocks` (decode-only, no VJP) as infrastructure
for shapes/workloads where the trade-off may flip (e.g. very large
tiles under tile-parallel decode), but the default path is pure XLA.

What DID win instead (all in models/layers.py, measured on the same
flagship decode; 40.0 -> 57.2 denoise-steps/s raw step time):

* tiny-output-channel convs (the 7x7 64->3 output head) as a fat flat
  GEMM + 49-slice shift-add — 3.3 -> ~1.2 ms (`Conv2d._shift_add_conv`);
* `optimization_barrier` before every LayerNorm fp32 upcast, stopping
  XLA from fusing the cast into the producer conv and materializing
  f32 activations (2x HBM bytes on the hot maps) — ~1.5 ms/step;
* flat-GEMM qkv/out projections in LinearAttention (bf16 path),
  removing a 0.6 ms relayout copy of the 192-ch qkv map.

Rejected after measurement: matmul-with-ones LN statistics (extra MXU
passes + x^2 materialization, 2.4 -> 3.6 ms per L0 block pair);
width-folding L0 to 128 lanes (1.4x on isolated convs but ~1 ms net in
graph for a full-stage rewrite); flat-2D-reshape LN (XLA canonicalizes
it to the identical program).

Round-1 second pass (hlo_stats profile of the 17-step bf16 decode;
step 20.1 ms at the time):

* tiny-INPUT-channel 1x1 convs as flat GEMMs (`layers.Conv2d`): the L0
  skip conv's conv-form lowering cost 0.83 ms/step (0.31 conv at
  168 GiB/s + 0.52 of relayout copies around it) — the GEMM form
  removes the relayouts entirely. Step 20.1 -> 17.57 ms (57 steps/s).
* `fused_head` below (LN + 7x7 head in one pass, fat GEMM in VMEM):
  MEASURED SLOWER — 42.6 ms/step vs 17.6. The 49 lane-offset tap
  slices of the (rows, cols, 49*M) intermediate each materialize a
  lane-rotated copy on Mosaic's stack (~41 MB scoped VMEM, needs a
  raised per-kernel cap just to compile). Kept available + tested for
  documentation, OFF by default; the XLA shift-add head (0.63 ms)
  stays the production path. A faster kernel needs the tap index in
  sublanes, not lanes.
* `--xla_tpu_run_space_to_batch=false` (libtpu flag): no-op on this
  program — the [512,8,97,64]-style conv shapes come from the conv
  emitter itself, not the SpaceToBatchConverter pass.

Round-4 pass — `fused_folded_layernorm` at 2K folded shapes (the one
configuration the r3 perf-bar accounting left open): MEASURED SLOWER,
217.8 ms/step vs 168.4 with it off (1536x2048, 17-step bf16, 51-step
paired hlo_stats). The kernel itself wins its op (~2.0 ms/call vs ~2.6
for XLA's split stats+normalize) but the custom-call boundary forces
relayouts in the surrounding folded convs (down_0 convs 2.7 -> 12.2
ms each, conv bucket 50.2 -> 140.7 ms): net -49 ms/step for ~+6 ms of
LN wins. Same mechanism as the r1 768x512 fused_layernorm rejection —
on XLA:TPU an opaque kernel between convs costs more in lost
conv/layout pipelining than any elementwise win repays. OFF by
default; PERF.md re-sets the 2K bar accordingly (53.5 µs/Mpx floor).

Numerics match `models.layers.Block` (fp32 LN statistics) — asserted in
tests/test_pallas.py against the XLA path in interpret mode on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------------
# global toggles — models.layers / models.unet consult these at trace time
# ---------------------------------------------------------------------------

_FUSED_BLOCKS = False
_FUSED_HEAD = False


def enable_fused_head(on: bool) -> None:
    """Route the U-Net output head (final LayerNorm + 7x7 small-cout conv)
    through `fused_head`. Decode-only (no VJP), bf16 path only — enable
    around inference/bench, never under `jax.grad`."""
    global _FUSED_HEAD
    _FUSED_HEAD = bool(on)


def fused_head_active() -> bool:
    return _FUSED_HEAD and jax.default_backend() == "tpu"


def enable_fused_blocks(on: bool) -> None:
    """Route `models.layers.Block` (3x3, non-large) through `fused_block`.

    Off by default: the kernel has no VJP, so it is decode-only — enable
    around inference/bench paths (cli.compress, bench.py), never under
    `jax.grad`. TPU backend only; Block falls back to XLA elsewhere."""
    global _FUSED_BLOCKS
    _FUSED_BLOCKS = bool(on)


def fused_blocks_active() -> bool:
    return _FUSED_BLOCKS and jax.default_backend() == "tpu"


def _block_kernel(
    xw_ref, w_ref, bias_ref, scale_ref, shift_ref, res_ref, o_ref,
    *, th: int, wdt: int, cin: int, cout: int, eps: float,
    relu: bool, has_residual: bool,
):
    x = xw_ref[0, 0]  # (th+2, wdt+2, cin) halo window
    acc = jnp.broadcast_to(
        bias_ref[...].astype(jnp.float32), (th * wdt, cout)
    )
    for dy in range(3):
        for dx in range(3):
            patch = x[dy : dy + th, dx : dx + wdt, :].reshape(th * wdt, cin)
            acc = acc + jnp.dot(
                patch, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    mean = jnp.mean(acc, axis=-1, keepdims=True)
    cent = acc - mean
    var = jnp.mean(cent * cent, axis=-1, keepdims=True)
    y = cent * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + shift_ref[...].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    y = y.reshape(th, wdt, cout)
    if has_residual:
        y = y + res_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_tile(h: int, w: int, cin: int, cout: int, dtype_bytes: int = 2) -> int:
    """Largest row-tile (divisor of h) fitting the scoped-VMEM budget.

    Accounts for what Mosaic actually stack-allocates (verified against a
    compile-time OOM at 512x768xf32): the double-buffered input window
    and output block, the fp32 accumulator, ~2 live shifted-patch
    temporaries from the 9-tap dot loop, and several (th*w, cout) fp32
    LN-epilogue temporaries — hence ~2.5x headroom against the 16MB
    scoped-VMEM default."""
    budget = 6 * 1024 * 1024
    best = 1
    for th in range(1, h + 1):
        if h % th:
            continue
        in_bytes = 2 * (th + 2) * (w + 2) * cin * dtype_bytes  # double-buffered
        out_bytes = 2 * th * w * cout * dtype_bytes
        acc_bytes = th * w * cout * 4
        patch_bytes = 2 * th * w * cin * dtype_bytes
        if in_bytes + out_bytes + acc_bytes + patch_bytes <= budget:
            best = th
    return best


@functools.partial(jax.jit, static_argnames=("relu", "eps", "interpret"))
def fused_block(
    x: jax.Array,
    w: jax.Array,
    conv_bias: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    in_bias: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
    *,
    relu: bool = True,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """relu(LN(conv3x3_same(x [+ in_bias]) + conv_bias)) [+ residual].

    x (B,H,W,Cin); w (3,3,Cin,Cout); conv_bias/gamma/beta (Cout,);
    in_bias (B,Cin) — the ResnetBlock time bias applied to the *input*
    (i.e. fuse `h + t` into the following Block); residual (B,H,W,Cout).
    Batch is looped at the grid level; B=1 per step keeps windows simple.
    """
    b, h, wdt, cin = x.shape
    cout = w.shape[-1]
    # keep the MXU dots in the activation dtype (a fp32 weight against a
    # bf16 activation would silently promote the matmul to fp32)
    w = w.astype(x.dtype)
    th = _pick_tile(h, wdt, cin, cout, dtype_bytes=x.dtype.itemsize)
    nt = h // th
    grid = (b, nt)

    if in_bias is not None:
        # fold the (per-sample) input bias into the window pass — XLA
        # fuses add+pad+stack into one read of x, and the padding ring
        # stays zero ('SAME' conv semantics)
        x = x + in_bias[:, None, None, :].astype(x.dtype)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # stacked overlapping halo windows: (b, nt, th+2, W+2, Cin). One
    # row-gather, not an nt-way stack-of-slices — the latter inflates the
    # HLO (nt up to ~128 concat operands per call site) enough to stall
    # XLA compiles inside the scanned decode loop.
    row_idx = jnp.arange(nt)[:, None] * th + jnp.arange(th + 2)[None, :]
    windows = x_pad[:, row_idx]

    has_residual = residual is not None
    res = residual if has_residual else jnp.zeros((b, 1, 1, cout), x.dtype)

    kernel = functools.partial(
        _block_kernel,
        th=th, wdt=wdt, cin=cin, cout=cout, eps=eps, relu=relu,
        has_residual=has_residual,
    )

    res_spec = (
        pl.BlockSpec((1, th, wdt, cout), lambda bi, i: (bi, i, 0, 0))
        if has_residual
        else pl.BlockSpec((1, 1, 1, cout), lambda bi, i: (bi, 0, 0, 0))
    )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, th + 2, wdt + 2, cin), lambda bi, i: (bi, i, 0, 0, 0)),
            pl.BlockSpec((3, 3, cin, cout), lambda bi, i: (0, 0, 0, 0)),
            pl.BlockSpec((cout,), lambda bi, i: (0,)),
            pl.BlockSpec((cout,), lambda bi, i: (0,)),
            pl.BlockSpec((cout,), lambda bi, i: (0,)),
            res_spec,
        ],
        out_specs=pl.BlockSpec((1, th, wdt, cout), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wdt, cout), x.dtype),
        interpret=interpret,
    )(windows, w, conv_bias, gamma, beta, res)


# ---------------------------------------------------------------------------
# fused LayerNorm epilogue — the measured win on the decode path
# ---------------------------------------------------------------------------


def _ln_kernel(
    y_ref, scale_ref, shift_ref, res_ref, o_ref,
    *, eps: float, relu: bool, has_residual: bool,
):
    y = y_ref[0].astype(jnp.float32)  # (th, W, C)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    cent = y - mean
    var = jnp.mean(cent * cent, axis=-1, keepdims=True)
    out = cent * jax.lax.rsqrt(var + eps)
    out = out * scale_ref[...].astype(jnp.float32) + shift_ref[...].astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    if has_residual:
        out = out + res_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _pick_ln_tile(h: int, w: int, c: int, dtype_bytes: int) -> int:
    """Row tile for the LN kernel: in+out double-buffered blocks plus a
    handful of fp32 temporaries, under the same conservative budget."""
    budget = 6 * 1024 * 1024
    best = 1
    for th in range(1, h + 1):
        if h % th:
            continue
        io_bytes = 4 * th * w * c * dtype_bytes  # in+out, double-buffered
        tmp_bytes = 4 * th * w * c * 4  # fp32 cast + centered + out temps
        if io_bytes + tmp_bytes <= budget:
            best = th
    return best


@functools.partial(jax.jit, static_argnames=("relu", "eps", "interpret"))
def fused_layernorm(
    y: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    residual: Optional[jax.Array] = None,
    *,
    relu: bool = True,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """[relu(]LN_channel(y)·γ+β[)] [+ residual] in ONE HBM pass.

    The channelwise LayerNorm + ReLU (+ skip add) after each conv is
    where XLA leaves bandwidth on the table (separate reduce + normalize
    passes); here statistics, affine, ReLU and the residual ride a single
    read and a single write. No halo — plain row-blocked BlockSpecs,
    auto-pipelined. fp32 statistics match `models.layers.ChannelLayerNorm`.
    """
    b, h, w, c = y.shape
    th = _pick_ln_tile(h, w, c, y.dtype.itemsize)
    grid = (b, h // th)
    has_residual = residual is not None
    res = residual if has_residual else jnp.zeros((b, 1, 1, c), y.dtype)
    res_spec = (
        pl.BlockSpec((1, th, w, c), lambda bi, i: (bi, i, 0, 0))
        if has_residual
        else pl.BlockSpec((1, 1, 1, c), lambda bi, i: (bi, 0, 0, 0))
    )
    kernel = functools.partial(
        _ln_kernel, eps=eps, relu=relu, has_residual=has_residual
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((c,), lambda bi, i: (0,)),
            pl.BlockSpec((c,), lambda bi, i: (0,)),
            res_spec,
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), y.dtype),
        interpret=interpret,
    )(y, gamma, beta, res)


# ---------------------------------------------------------------------------
# fused U-Net output head: LayerNorm + KxK conv to a tiny channel count
# ---------------------------------------------------------------------------
#
# The head (`unet.py` final LN -> 7x7 conv 64->3) is pathological for both
# standard lowerings: the direct conv runs the MXU at 3/128 lanes (~3.3 ms
# at 768x512), and the shift-add fat GEMM (layers.Conv2d._shift_add_conv)
# is HBM-bound on the 147-channel intermediate it materializes (~0.6 ms at
# ~520 GiB/s measured). Here the fat (C, K*K*M) GEMM runs per row-block in
# VMEM — the intermediate never touches HBM — and the LN that precedes it
# rides the same read, so the whole head costs ONE pass over x plus the
# (H,W,M) write.


def _head_kernel(
    xw_ref, g_ref, b_ref, w_ref, bias_ref, o_ref,
    *, th: int, wdt: int, p: int, cout: int, k: int, eps: float, h: int,
):
    i = pl.program_id(1)
    xw = xw_ref[0, 0]  # (th+2p, wdt+2p, cin) halo window
    x32 = xw.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    cent = x32 - mean
    var = jnp.mean(cent * cent, axis=-1, keepdims=True)
    ln = cent * jax.lax.rsqrt(var + eps)
    ln = ln * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    # zero the SAME-padding ring: LN(0-pixel) = b, but conv must see 0
    rows = i * th + jax.lax.broadcasted_iota(jnp.int32, (th + 2 * p, 1, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, wdt + 2 * p, 1), 1)
    mask = (rows >= p) & (rows < h + p) & (cols >= p) & (cols < wdt + p)
    ln = jnp.where(mask, ln, 0.0).astype(xw.dtype)
    # fat GEMM to K*K*cout lanes, VMEM-resident
    z = jnp.dot(
        ln.reshape((th + 2 * p) * (wdt + 2 * p), xw.shape[-1]), w_ref[...],
        preferred_element_type=jnp.float32,
    ).reshape(th + 2 * p, wdt + 2 * p, k * k * cout)
    acc = jnp.broadcast_to(
        bias_ref[...].astype(jnp.float32), (th, wdt, cout)
    )
    for a in range(k):
        for bb in range(k):
            s = (a * k + bb) * cout
            acc = acc + z[a : a + th, bb : bb + wdt, s : s + cout]
    o_ref[0] = acc.astype(o_ref.dtype)


def _pick_head_tile(h: int, w: int, cin: int, k: int, cout: int) -> int:
    """Row tile under the scoped-VMEM budget: double-buffered halo windows,
    fp32 LN temporaries, and the fp32 fat-GEMM intermediate."""
    budget = 10 * 1024 * 1024
    p = k // 2
    best = 1
    for th in range(1, h + 1):
        if h % th:
            continue
        rows, cols = th + 2 * p, w + 2 * p
        win = 2 * rows * cols * cin * 2       # double-buffered bf16 windows
        ln_tmp = 2 * rows * cols * cin * 4    # fp32 cast + centered
        z = rows * cols * k * k * cout * 4    # fp32 fat intermediate
        if win + ln_tmp + z <= budget:
            best = th
    return best


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_head(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array],
    *,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jax.Array:
    """conv_KxK_same(LN_channel(x)·γ+β, w) + bias in one HBM pass.

    x (B,H,W,Cin); w (K,K,Cin,M) with M small (the 3-channel image head);
    gamma/beta (Cin,); bias (M,) or None. fp32 LN statistics and fp32
    tap accumulation — numerically matches ChannelLayerNorm + Conv2d's
    shift-add path (bf16 GEMM, fp32 adds).
    """
    b, h, wdt, cin = x.shape
    k = w.shape[0]
    cout = w.shape[-1]
    p = k // 2
    wf = w.transpose(2, 0, 1, 3).reshape(cin, k * k * cout).astype(x.dtype)
    th = _pick_head_tile(h, wdt, cin, k, cout)
    nt = h // th
    x_pad = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    row_idx = jnp.arange(nt)[:, None] * th + jnp.arange(th + 2 * p)[None, :]
    windows = x_pad[:, row_idx]  # (B, nt, th+2p, W+2p, Cin)
    bias_arr = bias if bias is not None else jnp.zeros((cout,), x.dtype)
    kernel = functools.partial(
        _head_kernel, th=th, wdt=wdt, p=p, cout=cout, k=k, eps=eps, h=h
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(
                (1, 1, th + 2 * p, wdt + 2 * p, cin), lambda bi, i: (bi, i, 0, 0, 0)
            ),
            pl.BlockSpec((cin,), lambda bi, i: (0,)),
            pl.BlockSpec((cin,), lambda bi, i: (0,)),
            pl.BlockSpec((cin, k * k * cout), lambda bi, i: (0, 0)),
            pl.BlockSpec((cout,), lambda bi, i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, th, wdt, cout), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wdt, cout), x.dtype),
        # the 49 lane-offset tap slices of z materialize rotated copies on
        # Mosaic's stack — raise the per-kernel scoped-VMEM cap for them
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(windows, gamma, beta, wf, bias_arr)


# ---------------------------------------------------------------------------
# folded LayerNorm (round 4): one-pass stats+normalize(+ReLU) on the
# width-folded 128-lane layout
# ---------------------------------------------------------------------------
#
# Why this one gets a Pallas kernel when the unfolded LN epilogue lost
# (header log): for the PLAIN 64-channel LN, XLA fuses the whole
# stats+normalize into the producing conv's epilogue (~0.05 ms/instance)
# and a pallas_call boundary only breaks that fusion. For the FOLDED
# (…, 2C) LN, XLA demonstrably canNOT fuse the two-half statistics pass
# into the producer (measured ~0.33 ms/instance at 768x512 and ~2.6 ms
# at 2K — the dominant residual of the 2K perf bar, PERF.md "Perf-bar
# accounting"), so the boundary costs nothing and a single VMEM pass
# (read bf16 once, 4 lane-reductions, normalize, optional ReLU, write
# once) replaces XLA's separate stats + normalize HBM passes.

_FOLDED_LN = False


def enable_folded_ln(on: bool) -> None:
    """Route `folding.folded_layer_norm` (and the folded Block's LN+ReLU)
    through the one-pass Pallas kernel on the TPU bf16 path.

    Single-device programs only: a pallas_call is an opaque custom call
    that GSPMD cannot partition, so keep this OFF when tracing the
    tile-parallel decode (`parallel.tile_decode_fn`) or any pjit-sharded
    program — the XLA folded-LN path is the sharded one."""
    global _FOLDED_LN
    _FOLDED_LN = bool(on)


def folded_ln_active(x: Optional[jax.Array] = None) -> bool:
    # "axon" is the tunneled-TPU platform name on the dev box
    if not (_FOLDED_LN and jax.default_backend() in ("tpu", "axon")):
        return False
    if x is None:
        return True
    return x.dtype == jnp.bfloat16 and x.shape[-1] == 128


def _folded_ln_kernel(y_ref, gb_ref, o_ref, *, eps: float, relu: bool):
    y = y_ref[0].astype(jnp.float32)  # (th, W, 2C)
    c2 = y.shape[-1]
    c = c2 // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c2), 2)
    is_lo = lane < c
    sgn = jnp.where(is_lo, 1.0, -1.0)
    s1 = jnp.sum(y, -1, keepdims=True)
    d1 = jnp.sum(y * sgn, -1, keepdims=True)
    sq = y * y
    s2 = jnp.sum(sq, -1, keepdims=True)
    d2 = jnp.sum(sq * sgn, -1, keepdims=True)
    m = jnp.where(is_lo, s1 + d1, s1 - d1) / (2 * c)
    ex2 = jnp.where(is_lo, s2 + d2, s2 - d2) / (2 * c)
    var = jnp.maximum(ex2 - m * m, 0.0)
    out = (y - m) * jax.lax.rsqrt(var + eps)
    out = out * gb_ref[0][None, None, :] + gb_ref[1][None, None, :]
    if relu:
        out = jnp.maximum(out, 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


def _folded_ln_call(x, gb, eps: float, relu: bool, interpret: bool):
    b, h, w, c2 = x.shape
    th = _pick_ln_tile(h, w, c2, x.dtype.itemsize)
    kernel = functools.partial(_folded_ln_kernel, eps=eps, relu=relu)
    return pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, c2), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((2, c2), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, w, c2), lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c2), x.dtype),
        interpret=interpret,
    )(x, gb)


def _folded_ln_ref(x, gb, eps: float, relu: bool):
    """Pure-XLA twin of the kernel math (used for the custom VJP): the
    same per-half statistics as `folding.folded_layer_norm`, with the
    affine params pre-tiled into gb."""
    c2 = x.shape[-1]
    c = c2 // 2
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (1,) * (x.ndim - 1) + (c2,), x.ndim - 1
    )
    is_lo = lane < c
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
    y = y * gb[0] + gb[1]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _folded_ln(x, gb, eps, relu, interpret):
    return _folded_ln_call(x, gb, eps, relu, interpret)


def _folded_ln_fwd(x, gb, eps, relu, interpret):
    return _folded_ln_call(x, gb, eps, relu, interpret), (x, gb)


def _folded_ln_bwd(eps, relu, interpret, res, ct):
    x, gb = res
    _, vjp = jax.vjp(lambda x_, gb_: _folded_ln_ref(x_, gb_, eps, relu), x, gb)
    return vjp(ct)


_folded_ln.defvjp(_folded_ln_fwd, _folded_ln_bwd)


def fused_folded_layernorm(
    x: jax.Array,
    g: jax.Array,
    b: jax.Array,
    *,
    eps: float = 1e-5,
    relu: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Channelwise LayerNorm of the unfolded C channels on width-folded
    (B, H, W/2, 2C) data — statistics, normalize, affine and optional
    ReLU in ONE Pallas HBM pass (vs XLA's separate stats + normalize
    fusions on this layout). g/b are the unfolded (C,) affine params.
    Differentiable: the VJP runs the pure-XLA twin (`_folded_ln_ref`),
    so the folded bf16 TRAIN path keeps working when this is enabled.
    Numerics match `folding.folded_layer_norm` (+`nn.relu`) exactly —
    asserted in tests/test_pallas.py in interpret mode."""
    from . import folding

    gb = jnp.stack([folding.tile2(g), folding.tile2(b)]).astype(jnp.float32)
    return _folded_ln(x, gb, eps, relu, interpret)
