"""Progressive distillation CLI.

The reference ships distillation as a library with **no entry script**
(SURVEY §2.6: nothing imports `distill_trainer.py`); this provides one.

Usage:
  python -m cdc_compression_tpu.cli.distill --family epsilon --ckpt ck.npz \
      --data_path /data/vimeo --kiter 3 --steps_per_round 10000 --out distilled.npz
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--family", choices=["epsilon", "x"], default="epsilon")
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--ckpt", required=True,
                   help=".pt/.pth (converted), .npz, or a Trainer orbax dir; "
                        "--use_ema bootstraps the teacher from the EMA tree "
                        "(reference distill_trainer.py:100-108)")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--data_path", required=True)
    p.add_argument("--dataset", default="vimeo")
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--kiter", type=int, default=3)
    p.add_argument("--steps_per_round", type=int, default=10_000)
    p.add_argument("--lr", type=float, default=4e-5)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 activations (mixed-precision trainer parity)")
    p.add_argument("--hflip", action="store_true")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="student updates per dispatched program (lax.scan)")
    p.add_argument("--on_device_data", action="store_true",
                   help="upload the (small, equal-size) dataset once and "
                        "sample crops inside the compiled step — required "
                        "for long TPU runs (axon input-transfer leak)")
    p.add_argument("--base_steps", type=int, default=None,
                   help="distill the deployed N-step DDIM sampler instead of "
                        "the full-T grid: round k trains the (N-1)/2^k+1-step "
                        "schedule, halving decode steps per round (17->9->5). "
                        "Use N = m*2^kiter + 1.")
    p.add_argument("--save_rounds", action="store_true",
                   help="also write {out}.k{K}.npz after each round (e.g. the "
                        "9-step student from a 17->9->5 run)")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from ..data import Loader, load_dataset
    from ..diffusion.distill import distill
    from ..utils.presets import epsilon_family, x_family
    from .compress import load_params

    fam = epsilon_family if args.family == "epsilon" else x_family
    engine = fam(dim=args.dim, aux_loss_weight=0.0)

    params = load_params(args.ckpt, engine, use_ema=args.use_ema)
    data_iter = None
    device_images = None
    if args.on_device_data:
        import pathlib

        from PIL import Image

        files = sorted(p for p in pathlib.Path(args.data_path).rglob("*")
                       if p.suffix.lower() in (".png", ".jpg", ".jpeg"))
        imgs = [np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
                for f in files]
        device_images = np.stack(imgs)
        print(f"on-device data bank: {device_images.shape}")
    else:
        ds = load_dataset(args.dataset, args.data_path, train=True,
                          img_size=args.img_size)
        data_iter = iter(Loader(ds, args.batch_size, host_id=jax.process_index(),
                                num_hosts=jax.process_count()))
    save_round_fn = None
    if args.save_rounds:
        def save_round_fn(k, tree):
            path = f"{args.out}.k{k}.npz"
            np.savez(path,
                     params=np.asarray(jax.tree.map(np.asarray, tree),
                                       dtype=object))
            print(f"wrote round-{k} student {path}", flush=True)
    out = distill(
        engine, params, data_iter,
        kiter=args.kiter, steps_per_round=args.steps_per_round, lr=args.lr,
        device_images=device_images, batch_size=args.batch_size,
        crop_size=args.img_size, hflip=args.hflip, bf16=args.bf16,
        steps_per_call=args.steps_per_call, base_steps=args.base_steps,
        save_round_fn=save_round_fn,
    )
    np.savez(args.out, params=np.asarray(jax.tree.map(np.asarray, out), dtype=object))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
