"""KL-autoencoder pretraining CLI.

The reference *designs for* latent-space diffusion behind a frozen
`AutoencoderKL` (`xparam/train.py:104-114` wires `--ae_path`, and
`xparam/config_ae.py` carries the intended training hyperparameters:
1M steps, Adam lr 4e-5 with 0.9/0.5 step decay, batch 4 of vimeo
256-crops) but ships **no pretraining script** and a broken module
(SURVEY §2.5). This CLI is the missing piece: it pretrains our working
`AutoencoderKL` so `cli.train --ae_path ...` can run latent diffusion.

Loss: recon (L1 or L2) + kl_weight * KL(posterior || N(0,1)) — the
standard LDM first-stage objective the reference's `config_ae` implies.

Usage:
  python -m cdc_compression_tpu.cli.train_ae --data_path /data/vimeo \
      --dataset vimeo --z_channels 3 --ch_mult 1 2 4 --out ae.npz
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Pretrain the KL autoencoder")
    # model (defaults = xparam/train.py:104-114 intended usage)
    p.add_argument("--ch", type=int, default=128)
    p.add_argument("--z_channels", type=int, default=3)
    p.add_argument("--ch_mult", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--num_res_blocks", type=int, default=2)
    # training (defaults = xparam/config_ae.py)
    p.add_argument("--n_step", type=int, default=1_000_000)
    p.add_argument("--lr", type=float, default=4e-5)
    p.add_argument("--decay", type=float, default=0.9)
    p.add_argument("--minf", type=float, default=0.5)
    p.add_argument("--scheduler_checkpoint_step", type=int, default=100_000)
    p.add_argument("--optimizer", choices=["adam", "adamw"], default="adam")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--recon_loss", choices=["l1", "l2"], default="l1")
    p.add_argument("--kl_weight", type=float, default=1e-6)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--save_every", type=int, default=5000)
    # data
    p.add_argument("--dataset", default="vimeo")
    p.add_argument("--data_path", required=True)
    p.add_argument("--n_workers", type=int, default=4)
    # io
    p.add_argument("--out", default="ae.npz")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import serialization

    from ..data import Loader, load_dataset
    from ..models.autoencoder import AutoencoderKL
    from ..train.trainer import TrainConfig, make_lr_schedule

    ae = AutoencoderKL(
        ch=args.ch,
        z_channels=args.z_channels,
        ch_mult=tuple(args.ch_mult),
        num_res_blocks=args.num_res_blocks,
    )
    rng = jax.random.PRNGKey(args.seed)
    params = ae.init(rng, jnp.zeros((1, args.img_size, args.img_size, 3)), rng, True)

    lr_cfg = TrainConfig(
        lr=args.lr, lr_decay=args.decay, lr_min_factor=args.minf,
        scheduler_checkpoint_step=args.scheduler_checkpoint_step,
    )
    opt_cls = optax.adam if args.optimizer == "adam" else optax.adamw
    opt = optax.chain(
        optax.clip_by_global_norm(args.grad_clip),
        opt_cls(make_lr_schedule(lr_cfg)),
    )
    opt_state = opt.init(params)

    def loss_fn(prm, batch, key):
        x = batch * 2.0 - 1.0
        recon, posterior = ae.apply(prm, x, key, True)
        err = jnp.abs(recon - x) if args.recon_loss == "l1" else jnp.square(recon - x)
        recon_loss = err.mean()
        kl = posterior.kl().mean() / np.prod(x.shape[1:3])
        return recon_loss + args.kl_weight * kl, (recon_loss, kl)

    @jax.jit
    def step_fn(prm, opt_state, batch, key):
        (loss, (rl, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(prm, batch, key)
        updates, opt_state = opt.update(grads, opt_state, prm)
        prm = optax.apply_updates(prm, updates)
        return prm, opt_state, loss, rl, kl

    ds = load_dataset(args.dataset, args.data_path, train=True, img_size=args.img_size)
    it = iter(Loader(ds, args.batch_size, num_workers=args.n_workers,
                     host_id=jax.process_index(), num_hosts=jax.process_count()))

    def save():
        with open(args.out, "wb") as f:
            f.write(serialization.to_bytes(params))

    for step in range(args.n_step):
        rng, sub = jax.random.split(rng)
        batch = jnp.asarray(next(it))
        params, opt_state, loss, rl, kl = step_fn(params, opt_state, batch, sub)
        if step % args.log_every == 0:
            print(f"step {step}: loss {float(loss):.5f} recon {float(rl):.5f} "
                  f"kl {float(kl):.5f}", flush=True)
        if step and step % args.save_every == 0:
            save()
    save()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
