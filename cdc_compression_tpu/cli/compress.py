"""Compression/decompression CLI (real bitstreams).

Behavioral spec: the reference demo scripts `test_epsilonparam.py` /
`test_xparam.py` (read dir of images -> decode -> save + print bpp), but
with an actual .cdc bitstream in the middle instead of an analytic bpp.

Usage:
  # encode + decode every image in a dir (round-trip demo):
  python -m cdc_compression_tpu.cli.compress --ckpt ck.npz --family epsilon \
      --img_dir ./imgs --out_dir ./out --n_denoise_step 17 --gamma 0.8
  # keep bitstreams:
  ... --save_bitstreams
"""

from __future__ import annotations

import argparse
import pathlib


def build_parser():
    p = argparse.ArgumentParser(description="CDC codec: compress/decompress images")
    p.add_argument("--ckpt", default=None,
                   help=".npz params (or torch .pt reference checkpoint to convert); "
                        "random init if absent (smoke runs)")
    p.add_argument("--family", choices=["epsilon", "x"], default="epsilon")
    p.add_argument("--dim", type=int, default=64,
                   help="U-Net base width (64 = the shipped models; small "
                        "values for smoke runs)")
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--n_denoise_step", type=int, default=17)
    p.add_argument("--img_dir", default="./imgs")
    p.add_argument("--out_dir", default="./compressed_imgs")
    p.add_argument("--beta", type=float, default=0.0032)
    p.add_argument("--lpips_weight", type=float, default=0.0)
    p.add_argument("--save_bitstreams", action="store_true")
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--vbr", action="store_true",
                   help="variable-bitrate model (FiLM-conditioned transforms)")
    p.add_argument("--bitrate_scale", type=float, default=None,
                   help="VBR rate knob in [0,1]; recorded in the bitstream header")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--use_ema", action="store_true", help="use EMA weights from ckpt")
    p.add_argument("--io_workers", type=int, default=0,
                   help="overlap host image IO with device compute: N reader/"
                        "writer threads (0 = fully sequential)")
    return p


def load_params(ckpt, engine, use_ema: bool = False):
    """Load a param tree from a .pt/.pth (converted), .npz, or Trainer
    orbax dir; `use_ema` picks the EMA tree where one exists."""
    import jax
    import numpy as np

    from ..utils.presets import init_params

    if ckpt is None:
        print("WARNING: no --ckpt, using random init")
        return init_params(engine, 0, (256, 256))
    import os

    if os.path.isdir(ckpt):
        # Trainer orbax checkpoint dir ({model_name}_{idx}, or its `state`
        # subdir). use_ema picks the EMA param tree — the path the
        # reference bootstraps distillation from (distill_trainer.py:100-108)
        # and x-family inference uses (test_xparam.py:66-68).
        import orbax.checkpoint as ocp

        path = os.path.abspath(ckpt)
        if os.path.isdir(os.path.join(path, "state")):
            path = os.path.join(path, "state")
        payload = ocp.StandardCheckpointer().restore(path)
        if use_ema == "auto":
            # EMA when the checkpoint has one: the shipped inference
            # contract for trained models (xparam/test_xparam.py:66-68),
            # and measurably better on this repo's own flagship run
            # (PERF.md: 200k raw 17.5 dB vs EMA 24.3 dB).
            use_ema = "ema" in payload
        if use_ema:
            if "ema" not in payload:
                raise ValueError(f"use_ema set but checkpoint {ckpt} has no EMA tree")
            return payload["ema"]["params"]
        return payload["params"]
    if ckpt.endswith(".pt") or ckpt.endswith(".pth"):
        import torch

        from ..utils.convert import convert_diffusion_checkpoint

        loaded = torch.load(ckpt, map_location="cpu")
        sd = loaded.get("ema" if use_ema else "model", loaded)
        return convert_diffusion_checkpoint(sd, embd_type=engine.cfg.embd_type)
    loaded = np.load(ckpt, allow_pickle=True)
    return jax.tree.map(lambda a: a, loaded["params"].item())


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ..data.datasets import PadToMultiple
    from ..entropy.codec import ImageCodec
    from ..utils.presets import epsilon_family, x_family

    if args.family == "epsilon":
        engine = epsilon_family(
            dim=args.dim, lagrangian=args.beta, aux_loss_weight=0.0, vbr=args.vbr
        )
    else:
        engine = x_family(dim=args.dim, lagrangian=args.beta, aux_loss_weight=0.0)
    scale = args.bitrate_scale if args.vbr else None
    if args.vbr and scale is None:
        scale = 0.5

    params = load_params(args.ckpt, engine, use_ema=args.use_ema)
    codec = ImageCodec(engine, params)
    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    pad = PadToMultiple(64)

    dtype = jnp.bfloat16 if args.bf16 else None
    paths = [
        p for p in sorted(pathlib.Path(args.img_dir).iterdir())
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    ]

    def read(img_path):
        raw = np.asarray(Image.open(img_path).convert("RGB"), np.uint8)
        return raw, pad(raw).astype(np.float32) / 255.0

    def finish(img_path, raw, data, out):
        """Host-side epilogue: crop, save, report (runs off-thread when
        --io_workers > 0 — PNG encode overlaps the next image's decode)."""
        H0, W0 = raw.shape[:2]
        out = np.asarray(out)[:H0, :W0]
        bpp = len(data) * 8 / (H0 * W0)
        if args.save_bitstreams:
            (out_dir / (img_path.stem + ".cdc")).write_bytes(data)
        Image.fromarray((np.clip(out, 0, 1) * 255).round().astype(np.uint8)).save(
            out_dir / img_path.name
        )
        mse = float(np.mean(np.square(out - raw.astype(np.float32) / 255.0)))
        psnr = -10 * np.log10(max(mse, 1e-12))
        print(f"{img_path.name}: bpp={bpp:.4f} psnr={psnr:.2f} bytes={len(data)}")

    def run_one(img_path, loaded):
        raw, img = loaded
        data = codec.encode(img, bitrate_scale=scale)
        out = codec.decode(
            data, sample_steps=args.n_denoise_step, gamma=args.gamma,
            rng=jax.random.PRNGKey(0), eta=args.eta, compute_dtype=dtype,
        )
        return raw, data, out

    if args.io_workers <= 0:
        for img_path in paths:
            finish(img_path, *run_one(img_path, read(img_path)))
        return

    # pipelined serving: reader threads prefetch + pad, the main thread
    # drives the (single) device, writer threads crop/encode/save —
    # device compute for image i overlaps PIL decode of i+1..i+N and
    # PNG encode of i-1 (results are printed in submission order)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(args.io_workers) as readers, ThreadPoolExecutor(
        args.io_workers
    ) as writers:
        prefetch = args.io_workers + 1
        reads = {p: readers.submit(read, p) for p in paths[:prefetch]}
        writes = []
        for i, img_path in enumerate(paths):
            if i + prefetch < len(paths):
                nxt = paths[i + prefetch]
                reads[nxt] = readers.submit(read, nxt)
            raw, data, out = run_one(img_path, reads.pop(img_path).result())
            writes.append(writers.submit(finish, img_path, raw, data, out))
        for w in writes:
            w.result()


if __name__ == "__main__":
    main()
