"""Training CLI.

Behavioral spec: the union of the reference's three config generations
(`epsilonparam/config.py` + `epsilonparam/train.py` + `xparam/train.py`,
SURVEY §2.9/§5) collapsed into one argparse surface over the typed
presets. The model-name string encodes the config like the reference's
(`epsilonparam/train.py:19-23`).

Usage:
  python -m cdc_compression_tpu.cli.train --family epsilon \
      --data_path /data/vimeo --dataset vimeo --beta 0.0032 --alpha 0.9
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train a CDC codec (TPU-native)")
    p.add_argument("--family", choices=["epsilon", "x"], default="epsilon")
    p.add_argument("--pred_mode", choices=["noise", "x", "v"], default=None,
                   help="override the family default parameterization")
    p.add_argument("--beta", type=float, default=0.0032, help="rate lagrangian")
    p.add_argument("--alpha", type=float, default=0.0, help="perceptual weight rho")
    p.add_argument("--aux_loss_type", default="lpips", choices=["l1", "l2", "lpips"])
    p.add_argument("--iteration_step", type=int, default=None, help="diffusion T")
    p.add_argument("--embed_dim", type=int, default=64)
    p.add_argument("--embd_type", choices=["01", "index"], default="01")
    p.add_argument("--vbr", action="store_true")
    p.add_argument("--use_weighted_loss", action="store_true")
    p.add_argument("--weight_clip", type=float, default=5.0)
    p.add_argument("--use_mixed_precision", action="store_true")
    # training
    p.add_argument("--lr", type=float, default=4e-5)
    p.add_argument("--optimizer", choices=["adam", "adamw"], default="adam")
    p.add_argument("--n_step", type=int, default=1_000_000,
                   help="number of train steps to run; RELATIVE to the "
                        "restored step when resuming with --load_idx")
    p.add_argument("--scheduler_checkpoint_step", type=int, default=100_000)
    p.add_argument("--decay", type=float, default=0.9)
    p.add_argument("--minf", type=float, default=0.5)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--no_ema", action="store_true")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="train steps per dispatched device program (lax.scan); "
                        ">1 hides host->device dispatch latency")
    p.add_argument("--save_every", type=int, default=5000)
    p.add_argument("--sample_steps", type=int, default=200)
    # data
    p.add_argument("--dataset", default="vimeo")
    p.add_argument("--data_path", required=True)
    p.add_argument("--hflip", action="store_true",
                   help="random horizontal flip on the train crop stack")
    p.add_argument("--on_device_data", action="store_true",
                   help="upload the whole (small, equal-size-image) dataset "
                        "to device once and sample crops inside the jitted "
                        "step — zero per-step host->device input transfer")
    p.add_argument("--val_dataset", default=None)
    p.add_argument("--val_data_path", default=None)
    p.add_argument("--n_workers", type=int, default=4)
    # io
    p.add_argument("--results_dir", default="./results")
    p.add_argument("--tensorboard_dir", default=None)
    p.add_argument("--load_idx", type=int, default=None)
    p.add_argument("--init_from", default=None,
                   help="bootstrap params from another run's checkpoint dir "
                        "(fresh optimizer/step/EMA — for fine-tuning, e.g. at "
                        "a new --beta); unlike --load_idx this does NOT "
                        "resume the optimizer or step counter")
    p.add_argument("--init_from_ema", action="store_true",
                   help="bootstrap from the EMA tree of --init_from (the "
                        "best params of a converged run)")
    p.add_argument("--lpips_path", default=None,
                   help="converted LPIPS weights (.npz); random init if absent")
    # parallel
    p.add_argument("--data_axis", type=int, default=0,
                   help="devices on the data axis (0 = all)")
    p.add_argument("--tile_axis", type=int, default=1)
    # latent mode (reference xparam/train.py:104-114 `--ae_path`)
    p.add_argument("--ae_path", default="",
                   help="pretrained AutoencoderKL weights from cli.train_ae; "
                        "enables latent-space diffusion (x-family only)")
    p.add_argument("--ae_ch", type=int, default=128)
    p.add_argument("--z_channels", type=int, default=3)
    return p


def model_name(args) -> str:
    fam = args.family
    if getattr(args, "ae_path", ""):
        fam = "latent"  # latent-vs-image naming (xparam/train.py:71-75)
    pm = args.pred_mode or ("noise" if fam == "epsilon" else "x")
    return (
        f"{fam}-{pm}-d{args.embed_dim}-t{args.iteration_step or 'def'}-"
        f"b{args.beta}-a{args.alpha}-{args.aux_loss_type}"
        f"{'-vbr' if args.vbr else ''}"
    )


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    from ..data import Loader, load_dataset
    from ..train import EMAConfig, TrainConfig, Trainer
    from ..utils.presets import epsilon_family, init_params, x_family

    perceptual_fn = None
    if args.alpha > 0 and args.aux_loss_type == "lpips":
        from ..train.lpips import init_lpips_params, make_perceptual_fn

        if args.lpips_path:
            loaded = np.load(args.lpips_path, allow_pickle=True)
            params = loaded["params"].item()
            perceptual_fn = make_perceptual_fn(params)
        else:
            print("WARNING: no --lpips_path; using randomly initialized LPIPS")
            perceptual_fn = make_perceptual_fn(init_lpips_params())

    common = dict(
        dim=args.embed_dim,
        lagrangian=args.beta,
        aux_loss_weight=args.alpha,
        aux_loss_type=args.aux_loss_type,
        perceptual_fn=perceptual_fn,
    )
    if args.ae_path:
        from ..utils.presets import latent_family

        if args.family == "epsilon":
            raise SystemExit("--ae_path (latent mode) is an x-family capability")
        engine = latent_family(
            num_timesteps=args.iteration_step or 8193,
            pred_mode=args.pred_mode or "x",
            embd_type=args.embd_type,
            use_loss_weight=args.use_weighted_loss,
            loss_weight_min=args.weight_clip,
            ae_ch=args.ae_ch,
            z_channels=args.z_channels,
            **common,
        )
    elif args.family == "epsilon":
        engine = epsilon_family(
            vbr=args.vbr,
            num_timesteps=args.iteration_step or 20000,
            **common,
        )
    else:
        engine = x_family(
            num_timesteps=args.iteration_step or 8193,
            pred_mode=args.pred_mode or "x",
            embd_type=args.embd_type,
            use_loss_weight=args.use_weighted_loss,
            loss_weight_min=args.weight_clip,
            **common,
        )

    host_id, num_hosts = jax.process_index(), jax.process_count()
    device_images = None
    train_iter = None
    if args.on_device_data:
        from PIL import Image
        import pathlib

        files = sorted(p for p in pathlib.Path(args.data_path).rglob("*")
                       if p.suffix.lower() in (".png", ".jpg", ".jpeg"))
        imgs = [np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
                for f in files]
        shapes = {im.shape for im in imgs}
        if len(shapes) != 1:
            raise SystemExit(f"--on_device_data needs equal-size images, got {shapes}")
        device_images = np.stack(imgs)
        mb = device_images.nbytes / 2**20
        if mb > 2048:
            raise SystemExit(f"--on_device_data bank is {mb:.0f} MB; too large")
        print(f"on-device data bank: {device_images.shape} ({mb:.1f} MB)")
    else:
        train_ds = load_dataset(args.dataset, args.data_path, train=True,
                                img_size=args.img_size, hflip=args.hflip)
        train_iter = iter(
            Loader(train_ds, args.batch_size, num_workers=args.n_workers,
                   host_id=host_id, num_hosts=num_hosts)
        )
    val_iter = None
    if args.val_data_path:
        val_ds = load_dataset(args.val_dataset or args.dataset, args.val_data_path, train=False)
        val_iter = iter(Loader(val_ds, 1, shuffle=False, num_workers=1))

    mesh = None
    if len(jax.devices()) > 1:
        from ..parallel import make_mesh

        data_axis = args.data_axis or (len(jax.devices()) // args.tile_axis)
        # the per-host batch is sharded over `data`; clamp to the largest
        # divisor so small smoke batches still run on many-device hosts
        while args.batch_size % data_axis:
            data_axis -= 1
        if data_axis * args.tile_axis < len(jax.devices()):
            print(f"WARNING: batch_size={args.batch_size} not divisible by "
                  f"the full device count; using a {data_axis}x{args.tile_axis} mesh")
        mesh = make_mesh(data=data_axis, tile=args.tile_axis)

    cfg = TrainConfig(
        lr=args.lr,
        optimizer=args.optimizer,
        n_steps=args.n_step,
        scheduler_checkpoint_step=args.scheduler_checkpoint_step,
        lr_decay=args.decay,
        lr_min_factor=args.minf,
        grad_clip=args.grad_clip if args.grad_clip > 0 else None,
        use_ema=not args.no_ema,
        ema=EMAConfig(),
        bf16=args.use_mixed_precision,
        steps_per_call=args.steps_per_call,
        save_every=args.save_every,
        sample_steps=args.sample_steps,
        results_dir=args.results_dir,
        tensorboard_dir=args.tensorboard_dir,
        model_name=model_name(args),
    )
    trainer = Trainer(engine, cfg, train_iter, val_iter, mesh=mesh,
                      device_images=device_images, batch_size=args.batch_size,
                      crop_size=args.img_size, hflip=args.hflip)
    params = init_params(engine, 0, (args.img_size, args.img_size))
    if args.init_from:
        from .compress import load_params

        params = load_params(args.init_from, engine,
                             use_ema=args.init_from_ema)
        print(f"bootstrapped params from {args.init_from} "
              f"({'EMA' if args.init_from_ema else 'raw'} tree)")
    if args.ae_path:
        from flax import serialization

        with open(args.ae_path, "rb") as f:
            params["ae"] = serialization.from_bytes(params["ae"], f.read())
    if args.load_idx is not None:
        state = trainer.load(args.load_idx, template=trainer.init_state(params))
    else:
        state = trainer.init_state(params)
    trainer.train(state, jax.random.PRNGKey(0))


if __name__ == "__main__":
    main()
