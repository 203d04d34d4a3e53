"""RD-curve evaluation: PSNR / MS-SSIM / LPIPS vs real-bitstream bpp.

BASELINE config 2 (Kodak-24 rate sweep). Evaluates one checkpoint per
rate point over an image folder and emits a JSON table.

Usage:
  python -m cdc_compression_tpu.cli.evaluate --family x \
      --ckpts b0.0032=ck1.npz b0.016=ck2.npz --img_dir /data/kodak \
      --n_denoise_step 17 --out rd_curve.json
"""

from __future__ import annotations

import argparse
import json
import pathlib


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--family", choices=["epsilon", "x"], required=True,
                   help="model family of the checkpoints (no default: the "
                        "wrong family silently produces garbage RD numbers)")
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--ckpts", nargs="+", required=True,
                   help="label=path pairs, one per rate point")
    p.add_argument("--img_dir", required=True)
    p.add_argument("--n_denoise_step", type=int, default=17)
    p.add_argument("--gamma", type=float, default=0.8)
    ema = p.add_mutually_exclusive_group()
    ema.add_argument("--use_ema", action="store_true", default=None,
                     help="force the EMA tree (error if absent)")
    ema.add_argument("--raw_params", action="store_true",
                     help="force raw params; default is EMA when the "
                          "checkpoint has one (the shipped inference "
                          "contract, xparam/test_xparam.py:66-68)")
    p.add_argument("--lpips_path", default=None)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--out", default="rd_curve.json")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ..data.datasets import PadToMultiple
    from ..entropy.codec import ImageCodec
    from ..utils.metrics import ms_ssim, psnr
    from ..utils.presets import epsilon_family, x_family
    from .compress import load_params

    lpips_fn = None
    if args.lpips_path:
        from ..train.lpips import make_perceptual_fn

        loaded = np.load(args.lpips_path, allow_pickle=True)
        lpips_fn = make_perceptual_fn(loaded["params"].item())

    pad = PadToMultiple(64)
    images = []
    for f in sorted(pathlib.Path(args.img_dir).iterdir()):
        if f.suffix.lower() in (".png", ".jpg", ".jpeg"):
            images.append((f.name, np.asarray(Image.open(f).convert("RGB"), np.uint8)))

    results = []
    for pair in args.ckpts:
        label, _, path = pair.partition("=")
        fam = epsilon_family if args.family == "epsilon" else x_family
        engine = fam(dim=args.dim, aux_loss_weight=0.0)
        use_ema = True if args.use_ema else (False if args.raw_params else "auto")
        params = load_params(path, engine, use_ema=use_ema)
        codec = ImageCodec(engine, params)
        dtype = jnp.bfloat16 if args.bf16 else None

        point = {"label": label, "images": {}}
        bpps, psnrs, msssims, lpipss = [], [], [], []
        for name, raw in images:
            H0, W0 = raw.shape[:2]
            img = pad(raw).astype(np.float32) / 255.0
            data = codec.encode(img)
            out = codec.decode(data, sample_steps=args.n_denoise_step,
                               gamma=args.gamma, rng=jax.random.PRNGKey(0),
                               compute_dtype=dtype)[:H0, :W0]
            ref = raw.astype(np.float32) / 255.0
            bpp = len(data) * 8 / (H0 * W0)
            ps = float(psnr(jnp.asarray(out)[None], jnp.asarray(ref)[None])[0])
            ms = float(ms_ssim(jnp.asarray(out)[None], jnp.asarray(ref)[None])[0])
            rec = {"bpp": bpp, "psnr": ps, "ms_ssim": ms}
            if lpips_fn is not None:
                rec["lpips"] = float(
                    lpips_fn(jnp.asarray(out)[None] * 2 - 1, jnp.asarray(ref)[None] * 2 - 1)[0]
                )
                lpipss.append(rec["lpips"])
            point["images"][name] = rec
            bpps.append(bpp); psnrs.append(ps); msssims.append(ms)
        point["mean"] = {
            "bpp": float(np.mean(bpps)),
            "psnr": float(np.mean(psnrs)),
            "ms_ssim": float(np.mean(msssims)),
        }
        if lpipss:
            point["mean"]["lpips"] = float(np.mean(lpipss))
        results.append(point)
        print(label, point["mean"])

    pathlib.Path(args.out).write_text(json.dumps(results, indent=1) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
