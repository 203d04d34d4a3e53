"""Post-training RD analysis on the flagship checkpoint (one TPU process).

For each Kodak image: real `.cdc` bitstream bpp (C++ rANS payload) vs
the analytic fp32 rate estimate at flagship scale (VERDICT r2 ask:
agreement <2%), plus PSNR/MS-SSIM of the 17-step bf16 decode from the
DECODED bitstream symbols — the full serving path, not the
analytic shortcut. Usage:

    python tools/rd_analysis.py <ckpt_dir> [--use_ema] [--steps 17]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt")
    p.add_argument("--family", choices=["epsilon", "x"], default="epsilon")
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--steps", type=int, default=17)
    p.add_argument("--img_dir", default="/root/reference/imgs")
    p.add_argument("--vbr_scale", type=float, default=None,
                   help="VBR models: the bitrate_scale in [0,1] to encode "
                        "at (sweep this flag over one checkpoint for a "
                        "one-model RD curve; CDC2 container records it)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from cdc_compression_tpu.cli.compress import load_params
    from cdc_compression_tpu.entropy.codec import ImageCodec
    from cdc_compression_tpu.utils.metrics import ms_ssim, psnr
    from cdc_compression_tpu.utils.presets import epsilon_family, x_family

    vbr = args.vbr_scale is not None
    if vbr and args.family != "epsilon":
        raise SystemExit("--vbr_scale is an epsilon-family capability")
    fam = epsilon_family if args.family == "epsilon" else x_family
    kw = {"vbr": True} if vbr else {}
    engine = fam(dim=args.dim, aux_loss_weight=0.0, **kw)
    params = load_params(args.ckpt, engine, use_ema=args.use_ema)
    codec = ImageCodec(engine, params)
    rows = []
    cond0 = None if not vbr else jnp.full((1,), args.vbr_scale, jnp.float32)
    analytic_jit = jax.jit(
        lambda p, im: engine.compressor.apply(p, im, cond0)["bpp"]
    )
    header_len = 25 if vbr else 21  # CDC2 appends the f32 bitrate_scale
    for name in sorted(os.listdir(args.img_dir)):
        if not name.endswith((".png", ".jpg")):
            continue
        raw = np.asarray(
            Image.open(os.path.join(args.img_dir, name)).convert("RGB"), np.uint8
        )
        H, W = raw.shape[:2]
        img = raw.astype(np.float32) / 255.0
        x = jnp.asarray(img)[None] * 2 - 1
        analytic = float(analytic_jit(params["compressor"], x)[0])
        data = codec.encode(img, bitrate_scale=args.vbr_scale)
        real_payload = (len(data) - header_len) * 8 / (H * W)  # minus container header
        real_total = len(data) * 8 / (H * W)
        out = codec.decode(
            data, sample_steps=args.steps, gamma=0.8,
            rng=jax.random.PRNGKey(0), compute_dtype=jnp.bfloat16,
        )
        ps = float(psnr(jnp.asarray(out)[None], jnp.asarray(img)[None])[0])
        ms = float(ms_ssim(jnp.asarray(out)[None], jnp.asarray(img)[None])[0])
        rows.append({
            "image": name, "analytic_bpp": analytic,
            "real_bpp_payload": real_payload, "real_bpp": real_total,
            "payload_vs_analytic_pct": 100 * (real_payload - analytic) / analytic,
            "psnr": ps, "ms_ssim": ms,
        })
        print(json.dumps(rows[-1]), flush=True)
    mean = {
        k: float(np.mean([r[k] for r in rows]))
        for k in rows[0] if k != "image"
    }
    print("MEAN", json.dumps(mean))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"images": rows, "mean": mean,
                       "ckpt": args.ckpt, "use_ema": args.use_ema,
                       "steps": args.steps, "family": args.family,
                       "vbr_scale": args.vbr_scale}, f, indent=1)
            f.write("\n")
        print("wrote", args.out)


if __name__ == "__main__":
    main()
