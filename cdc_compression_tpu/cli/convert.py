"""Convert a reference PyTorch checkpoint to a JAX .npz param tree.

Usage:
  python -m cdc_compression_tpu.cli.convert --ckpt model_0.pt --out model.npz \
      [--use_ema] [--embd_type 01]

Handles both checkpoint shapes the reference writes: ε-trainer
`{"step", "model"}` (`epsilonparam/modules/trainer.py:99-106`) and
x-trainer `{"step", "model", "ema"}` with `ema_model.*` key prefixes
(`xparam/modules/trainer.py:75-82`).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--embd_type", default="01", choices=["01", "index"])
    args = p.parse_args(argv)

    import numpy as np
    import torch

    from ..utils.convert import convert_diffusion_checkpoint

    loaded = torch.load(args.ckpt, map_location="cpu")
    if args.use_ema:
        sd = loaded["ema"]
    else:
        sd = loaded.get("model", loaded)
    params = convert_diffusion_checkpoint(sd, embd_type=args.embd_type)
    np.savez(args.out, params=np.asarray(params, dtype=object))
    print(f"wrote {args.out} (step={loaded.get('step', '?')})")


if __name__ == "__main__":
    main()
