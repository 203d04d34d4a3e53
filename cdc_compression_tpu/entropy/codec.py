"""Bitstream codec: image -> .cdc bytes -> image.

The capability the reference estimates but never implements
(`compress_modules.py:84-98` computes analytic bpp only). Pipeline:

  encode: analysis transform -> q_hyper, then hyper-decode on the
          *quantized* hyper-latent to get (mean, scale) -> two rANS
          streams (factorized prior + Gaussian conditional) + header.
  decode: decode hyper symbols -> hyper-decode -> (mean, scale) ->
          decode latent symbols -> synthesis transform -> context
          pyramid -> DDIM loop.

Decode reproduces the exact q_latent/q_hyper_latent tensors (integer
offsets around medians / predicted means), so decoded images are
bit-identical to the analytic path's.

Header (little-endian): magic "CDC1", u32 H, u32 W, u8 levels(unused:0),
u32 len(hyper_stream), u32 len(latent_stream). VBR bitstreams use magic
"CDC2" and append one f32: the bitrate_scale that conditioned the
transforms (FiLM, `network_components.py:304-314`), so decode is
self-contained. Latent/hyper grid shapes are NOT stored: they are
derived from the compressor config (`latent_downsample` /
`hyper_downsample`), so the container works for any stage count.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import coder

_MAGIC = b"CDC1"
_MAGIC_VBR = b"CDC2"


def _to_uint8(img):
    """[0,1] float image -> uint8 on device (round-half-even, matching
    host `np.round(x*255)` exactly)."""
    return jnp.round(img * 255.0).astype(jnp.uint8)


@dataclass
class CodecTables:
    """Static per-model tables; build once per checkpoint."""

    prior: coder.CdfTable
    gaussian: coder.CdfTable
    medians: np.ndarray  # (C_hyper,)

    @staticmethod
    def build(compressor, comp_params, half_range: int = 64) -> "CodecTables":
        medians = np.asarray(
            compressor.apply(comp_params, method=lambda m: m.prior.medians)
        ).reshape(-1)

        def cdf_fn(pts: np.ndarray) -> np.ndarray:
            v = jnp.asarray(pts, jnp.float32).reshape(1, -1, 1, pts.shape[-1])
            out = compressor.apply(comp_params, v, method=lambda m, a: m.prior.cdf(a))
            return np.asarray(out).reshape(pts.shape)

        prior = coder.build_prior_tables(cdf_fn, medians, half_range=half_range)
        gaussian = coder.build_gaussian_tables()
        return CodecTables(prior=prior, gaussian=gaussian, medians=medians)


class ImageCodec:
    """Real-bitstream wrapper around (compressor, diffusion engine).

    Heavy math (transforms, hyper-dec, DDIM loop) is jitted on device;
    only symbols cross to the host for entropy coding.
    """

    def __init__(self, engine, params, tables: Optional[CodecTables] = None):
        self.engine = engine
        self.params = params
        self.tables = tables or CodecTables.build(engine.compressor, params["compressor"])
        self._encode_jit = jax.jit(self._encode_device)
        # uint8 ingest: ship 1 byte/channel over the link and normalize
        # on device — bitwise the same [-1,1] values as the host float
        # path ((u8/255)*2-1 in fp32 both ways), so bitstreams are
        # byte-identical. 4x fewer input bytes through a transfer-bound
        # link (PERF.md serving table).
        self._encode_u8_jit = jax.jit(
            lambda u8, cond: self._encode_device(
                u8.astype(jnp.float32) / 255.0 * 2.0 - 1.0, cond
            )
        )
        self._ctx_jit = jax.jit(self._context_device)
        self._ms_jit = jax.jit(self._mean_scale_device)
        self._decode_cache = {}

    # ---- device-side pure functions ----------------------------------
    def _encode_device(self, images, cond=None):
        comp = self.engine.compressor
        q_latent, q_hyper, state = comp.apply(
            self.params["compressor"], images, cond, method="encode"
        )
        dist = state["dist"]
        return q_hyper, q_latent, dist.mean, dist.scale

    def _context_device(self, q_hyper, q_latent, cond=None):
        """Recompute (mean, scale) from decoded hyper symbols + context."""
        comp = self.engine.compressor

        def run(m, qh, ql, c):
            ms = m.hyper_decode(qh, c)
            mean, scale = jnp.split(ms, 2, axis=-1)
            ctx = m.decode(ql, c)
            return ctx, mean, jnp.maximum(scale, 0.1)

        return comp.apply(self.params["compressor"], q_hyper, q_latent, cond, method=run)

    def _mean_scale_device(self, q_hyper, cond=None):
        comp = self.engine.compressor

        def run(m, qh, c):
            ms = m.hyper_decode(qh, c)
            mean, scale = jnp.split(ms, 2, axis=-1)
            return jax.lax.stop_gradient(mean), jnp.maximum(scale, 0.1)

        return comp.apply(self.params["compressor"], q_hyper, cond, method=run)

    # ---- public API ----------------------------------------------------
    def _pack_one(
        self, H, W, q_hyper, q_latent, mean, scale, bitrate_scale
    ) -> bytes:
        """Entropy-code ONE image's (1,...) arrays into .cdc bytes."""
        med = self.tables.medians.reshape(1, 1, 1, -1)
        h_sym = np.round(q_hyper - med).astype(np.int32)
        h_idx = np.broadcast_to(
            np.arange(h_sym.shape[-1], dtype=np.int32), h_sym.shape
        )
        h_bytes = coder.encode_symbols(h_sym, h_idx, self.tables.prior)

        l_sym = np.round(q_latent - mean).astype(np.int32)
        l_idx = coder.scale_indexes(scale)
        l_bytes = coder.encode_symbols(l_sym, l_idx, self.tables.gaussian)

        if bitrate_scale is None:
            header = _MAGIC + struct.pack("<IIBII", H, W, 0, len(h_bytes), len(l_bytes))
        else:
            header = _MAGIC_VBR + struct.pack(
                "<IIBIIf", H, W, 0, len(h_bytes), len(l_bytes), float(bitrate_scale)
            )
        return header + h_bytes + l_bytes

    def encode(self, image: np.ndarray, bitrate_scale: Optional[float] = None) -> bytes:
        """image: (H,W,3) float in [0,1] OR uint8 -> .cdc bytes. uint8
        input is shipped as-is and normalized on device (bitstreams are
        byte-identical to the float path for the same pixels).
        `bitrate_scale` (VBR models only) conditions the transforms and
        is recorded in the header."""
        H, W = image.shape[:2]
        comp = self.engine.compressor
        if H % comp.hyper_downsample or W % comp.hyper_downsample:
            raise ValueError(
                f"image {H}x{W} not a multiple of the hyper stride "
                f"{comp.hyper_downsample} (pad first)"
            )
        cond = None if bitrate_scale is None else jnp.full((1,), bitrate_scale, jnp.float32)
        if image.dtype == np.uint8:
            out = self._encode_u8_jit(jnp.asarray(image)[None], cond)
        else:
            x = jnp.asarray(image, jnp.float32)[None] * 2.0 - 1.0
            out = self._encode_jit(x, cond)
        q_hyper, q_latent, mean, scale = map(np.asarray, out)
        assert q_hyper.shape[1:3] == (H // comp.hyper_downsample, W // comp.hyper_downsample)
        assert q_latent.shape[1:3] == (H // comp.latent_downsample, W // comp.latent_downsample)
        return self._pack_one(H, W, q_hyper, q_latent, mean, scale, bitrate_scale)

    def encode_batch(
        self, images, bitrate_scales=None
    ) -> list:
        """Batched serving encode: list of same-shape (H,W,3) images
        (float [0,1], or uint8 shipped raw and normalized on device —
        4x fewer input bytes) -> list of .cdc payloads via ONE device
        dispatch for the whole batch (per-dispatch link latency
        dominates serving wall through a remote-device tunnel — PERF.md
        serving table), then per-image host rANS. Bitstreams are byte-identical to per-image
        `encode`'s: the analysis transform is batch-independent and the
        rate path is fp32 on every configuration.

        `bitrate_scales` (VBR models): one float per image, or None."""
        H, W = images[0].shape[:2]
        for im in images:
            if im.shape[:2] != (H, W):
                raise ValueError("encode_batch requires same-shape images")
        if bitrate_scales is None:
            cond = None
        else:
            if len(bitrate_scales) != len(images):
                raise ValueError("need one bitrate_scale per image")
            cond = jnp.asarray(bitrate_scales, jnp.float32)
        stacked = np.stack(images)
        if stacked.dtype == np.uint8:
            out = self._encode_u8_jit(jnp.asarray(stacked), cond)
        else:
            out = self._encode_jit(jnp.asarray(stacked, jnp.float32) * 2.0 - 1.0, cond)
        q_hyper, q_latent, mean, scale = map(np.asarray, out)
        return [
            self._pack_one(
                H, W, q_hyper[i : i + 1], q_latent[i : i + 1],
                mean[i : i + 1], scale[i : i + 1],
                None if bitrate_scales is None else bitrate_scales[i],
            )
            for i in range(len(images))
        ]

    @staticmethod
    def _parse_container(data: bytes):
        """.cdc bytes -> (H, W, h_bytes, l_bytes, bitrate_scale|None)."""
        magic = data[:4]
        assert magic in (_MAGIC, _MAGIC_VBR), "bad magic"
        H, W, _, n_h, n_l = struct.unpack("<IIBII", data[4:21])
        off = 21
        bitrate_scale = None
        if magic == _MAGIC_VBR:
            (bitrate_scale,) = struct.unpack("<f", data[off : off + 4])
            off += 4
        h_bytes = data[off : off + n_h]
        l_bytes = data[off + n_h : off + n_h + n_l]
        return H, W, h_bytes, l_bytes, bitrate_scale

    def _decode_hyper_symbols(self, H: int, W: int, h_bytes: bytes) -> np.ndarray:
        """hyper stream -> (1,hh,hw,C) float array of dequantized values."""
        C_hyper = self.tables.medians.shape[0]
        ds = self.engine.compressor.hyper_downsample
        hh, hw = H // ds, W // ds
        h_idx = np.broadcast_to(
            np.arange(C_hyper, dtype=np.int32), (1, hh, hw, C_hyper)
        )
        h_sym = coder.decode_symbols(h_bytes, h_idx, self.tables.prior).reshape(h_idx.shape)
        med = self.tables.medians.reshape(1, 1, 1, -1)
        return h_sym.astype(np.float32) + med

    def decode_latents(self, data: bytes):
        """bytes -> (q_hyper, q_latent) device tensors + (H, W) +
        bitrate_scale (None unless a VBR stream)."""
        H, W, h_bytes, l_bytes, bitrate_scale = self._parse_container(data)
        q_hyper = jnp.asarray(self._decode_hyper_symbols(H, W, h_bytes))

        cond = None if bitrate_scale is None else jnp.full((1,), bitrate_scale, jnp.float32)
        mean, scale = self._ms_jit(q_hyper, cond)
        mean, scale = np.asarray(mean), np.asarray(scale)
        l_idx = coder.scale_indexes(scale)
        l_sym = coder.decode_symbols(l_bytes, l_idx, self.tables.gaussian).reshape(mean.shape)
        q_latent = jnp.asarray(l_sym.astype(np.float32) + mean)
        return q_hyper, q_latent, (H, W), bitrate_scale

    def decode(
        self,
        data: bytes,
        *,
        sample_steps: int = 17,
        gamma: float = 0.8,
        rng: Optional[jax.Array] = None,
        eta: float = 0.0,
        compute_dtype=None,
        output_uint8: bool = False,
    ) -> np.ndarray:
        """bytes -> (H,W,3) image via the DDIM loop: float in [0,1], or
        uint8 quantized ON DEVICE when `output_uint8` (4x fewer output
        bytes over a transfer-bound link; equals
        `round(clip(float_out)*255)`)."""
        from ..ops.schedules import make_sample_schedule

        rng = jax.random.PRNGKey(0) if rng is None else rng
        q_hyper, q_latent, (H, W), bitrate_scale = self.decode_latents(data)
        return self.decode_from_latents(
            q_latent, (H, W), sample_steps=sample_steps, gamma=gamma,
            rng=rng, eta=eta, compute_dtype=compute_dtype,
            bitrate_scale=bitrate_scale, output_uint8=output_uint8,
        )

    def decode_from_latents(
        self,
        q_latent,
        hw: Tuple[int, int],
        *,
        sample_steps: int = 17,
        gamma: float = 0.8,
        rng: Optional[jax.Array] = None,
        eta: float = 0.0,
        compute_dtype=None,
        bitrate_scale: Optional[float] = None,
        output_uint8: bool = False,
    ) -> np.ndarray:
        """(q_latent, (H, W)) -> image; the jitted synthesis + DDIM
        program shared by `decode` (bitstream path) and by callers that
        already hold the quantized latents."""
        from ..ops.schedules import make_sample_schedule

        rng = jax.random.PRNGKey(0) if rng is None else rng
        H, W = hw
        shape = (1, H, W, 3)
        # one jitted program per (shape, steps, eta, dtype): synthesis
        # transform + gamma-scaled init + the whole DDIM scan. Without
        # this, each op dispatches individually — orders of magnitude
        # slower over a remote-device (axon) link.
        key = (shape, int(sample_steps), float(eta), compute_dtype,
               bitrate_scale is None, output_uint8)
        fn = self._decode_cache.get(key)
        if fn is None:
            sched = make_sample_schedule(self.engine.train_sched, sample_steps)
            cfg = self.engine.cfg
            clip = cfg.clip_noise if cfg.pred_mode == "noise" else True

            def run(params, ql, k, g, cond):
                context = self.engine.compressor.apply(
                    params["compressor"], ql, cond, method="decode"
                )
                k_init, k_loop = jax.random.split(k)
                init = jax.random.normal(k_init, shape) * g
                decoded = self.engine.p_sample_loop(
                    params, shape, context, sched, k_loop,
                    sample_mode="ddim", clip_denoised=clip, init=init, eta=eta,
                    compute_dtype=compute_dtype,
                )
                img = jnp.clip(decoded, -1, 1)[0] / 2.0 + 0.5
                return _to_uint8(img) if output_uint8 else img

            fn = self._decode_cache[key] = jax.jit(run)
        cond = None if bitrate_scale is None else jnp.full((1,), bitrate_scale, jnp.float32)
        return np.asarray(fn(self.params, q_latent, rng, jnp.float32(gamma), cond))

    def decode_batch(
        self,
        payloads,
        *,
        sample_steps: int = 17,
        gamma: float = 0.8,
        rngs=None,
        eta: float = 0.0,
        compute_dtype=None,
        output_uint8: bool = False,
    ) -> np.ndarray:
        """Batched serving decode: list of same-shape .cdc payloads ->
        (B,H,W,3) images via ONE device program ([0,1] float, or uint8
        quantized on device when `output_uint8` — 4x fewer output bytes
        over a transfer-bound link). Host rANS decodes each
        payload's symbols (≤1.2% of wall, PERF.md), the batch is stacked,
        and a single compiled program runs the batched context decode plus
        a `lax.map` over per-image DDIM loops — the B=1 conv lowering is
        the fast one on TPU (`GaussianDiffusion.compress` batch_serial
        rationale), and one dispatch amortizes the per-dispatch link tax
        that dominates per-image serving wall through the axon tunnel.

        The symbol/latent path is bit-identical to per-image `decode`
        (same rANS streams, same fp32 dequantization). The decoded
        images equal `decode(payloads[i], rng=rngs[i])` up to
        cross-program float noise: the batched program tiles its convs
        for shape (B,...) where the per-image program tiles for (1,...),
        and those reductions can differ by ~1 ulp
        (tests/test_codec.py::TestBatchedServing). `rngs`: one PRNG key
        per payload; default `split(PRNGKey(0), B)`. VBR payloads may
        carry distinct bitrate_scales; mixing VBR and non-VBR payloads
        in one batch raises."""
        from ..ops.schedules import make_sample_schedule

        B = len(payloads)
        parsed = [self._parse_container(d) for d in payloads]
        H, W = parsed[0][0], parsed[0][1]
        if any((p[0], p[1]) != (H, W) for p in parsed):
            raise ValueError("decode_batch requires same-shape payloads")
        n_vbr = sum(p[4] is not None for p in parsed)
        if n_vbr not in (0, B):
            raise ValueError("decode_batch cannot mix VBR and non-VBR payloads")

        q_hyper = jnp.asarray(
            np.concatenate([self._decode_hyper_symbols(H, W, p[2]) for p in parsed])
        )
        cond = (
            None if n_vbr == 0
            else jnp.asarray([p[4] for p in parsed], jnp.float32)
        )
        mean, scale = map(np.asarray, self._ms_jit(q_hyper, cond))
        q_latent = np.empty_like(mean)
        for i, p in enumerate(parsed):
            l_idx = coder.scale_indexes(scale[i : i + 1])
            l_sym = coder.decode_symbols(p[3], l_idx, self.tables.gaussian)
            q_latent[i] = l_sym.reshape(mean.shape[1:]).astype(np.float32) + mean[i]

        if rngs is None:
            rngs = jax.random.split(jax.random.PRNGKey(0), B)
        keys = jnp.stack([jnp.asarray(k) for k in rngs])

        shape1 = (1, H, W, 3)
        key = ("batch", B, shape1, int(sample_steps), float(eta),
               compute_dtype, cond is None, output_uint8)
        fn = self._decode_cache.get(key)
        if fn is None:
            sched = make_sample_schedule(self.engine.train_sched, sample_steps)
            cfg = self.engine.cfg
            clip = cfg.clip_noise if cfg.pred_mode == "noise" else True

            def run(params, ql, ks, g, c):
                context = self.engine.compressor.apply(
                    params["compressor"], ql, c, method="decode"
                )

                def body(args):
                    ctx_i, ki = args
                    k_init, k_loop = jax.random.split(ki)
                    init = jax.random.normal(k_init, shape1) * g
                    out = self.engine.p_sample_loop(
                        params, shape1, [cc[None] for cc in ctx_i], sched,
                        k_loop, sample_mode="ddim", clip_denoised=clip,
                        init=init, eta=eta, compute_dtype=compute_dtype,
                    )
                    return out[0]

                decoded = jax.lax.map(body, (tuple(context), ks))
                img = jnp.clip(decoded, -1, 1) / 2.0 + 0.5
                return _to_uint8(img) if output_uint8 else img

            fn = self._decode_cache[key] = jax.jit(run)
        return np.asarray(
            fn(self.params, jnp.asarray(q_latent), keys, jnp.float32(gamma), cond)
        )
