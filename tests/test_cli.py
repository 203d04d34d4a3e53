"""End-to-end CLI smoke tests (CPU, tiny dims).

The reference ships demo scripts, not tests (SURVEY §4); here every CLI
entry point is exercised through its real `main(argv)` path: compress
(real bitstream round-trip), evaluate (RD sweep json), train (2 steps +
checkpoint write), convert (torch ckpt -> npz -> compress --ckpt).
"""

import json
import os
import pathlib

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(d / "a.png")
    # non-multiple-of-64 size exercises PadToMultiple + crop-back
    Image.fromarray(rng.randint(0, 255, (72, 80, 3), np.uint8)).save(d / "b.png")
    (d / "ignore.txt").write_text("not an image")
    return d


class TestCompressCLI:
    def test_roundtrip_with_bitstreams(self, img_dir, tmp_path, capsys):
        from cdc_compression_tpu.cli.compress import main

        out = tmp_path / "out"
        main([
            "--img_dir", str(img_dir), "--out_dir", str(out),
            "--dim", "16", "--n_denoise_step", "2", "--save_bitstreams",
        ])
        got = capsys.readouterr().out
        for name in ("a", "b"):
            assert (out / f"{name}.png").exists()
            assert (out / f"{name}.cdc").exists()
            assert (out / f"{name}.cdc").stat().st_size > 0
            assert f"{name}.png: bpp=" in got
        # decoded image keeps the original (pre-pad) size
        assert Image.open(out / "b.png").size == (80, 72)

    def test_pipelined_io_matches_sequential(self, img_dir, tmp_path, capsys):
        """--io_workers overlaps host IO with device compute; outputs
        must be byte-identical to the sequential path."""
        from cdc_compression_tpu.cli.compress import main

        seq, pipe = tmp_path / "seq", tmp_path / "pipe"
        base = ["--img_dir", str(img_dir), "--dim", "16", "--n_denoise_step", "2",
                "--save_bitstreams"]
        main(base + ["--out_dir", str(seq)])
        main(base + ["--out_dir", str(pipe), "--io_workers", "2"])
        capsys.readouterr()
        for name in ("a", "b"):
            for ext in (".png", ".cdc"):
                assert (pipe / f"{name}{ext}").read_bytes() == (
                    seq / f"{name}{ext}"
                ).read_bytes()


class TestEvaluateCLI:
    def test_rd_sweep_json(self, img_dir, tmp_path):
        import jax

        from cdc_compression_tpu.cli.evaluate import main
        from cdc_compression_tpu.utils.presets import init_params, x_family

        engine = x_family(dim=16, aux_loss_weight=0.0)
        params = init_params(engine, 0, (64, 64))
        ckpt = tmp_path / "p.npz"
        np.savez(ckpt, params=np.asarray(
            jax.tree.map(np.asarray, params), dtype=object))
        out = tmp_path / "rd.json"
        main([
            "--family", "x", "--dim", "16", "--ckpts", f"q1={ckpt}",
            "--img_dir", str(img_dir), "--n_denoise_step", "2",
            "--out", str(out),
        ])
        results = json.loads(out.read_text())
        assert len(results) == 1 and results[0]["label"] == "q1"
        mean = results[0]["mean"]
        assert mean["bpp"] > 0 and np.isfinite(mean["psnr"])
        assert set(results[0]["images"]) == {"a.png", "b.png"}


class TestTrainCLI:
    def test_two_steps_and_checkpoint(self, img_dir, tmp_path):
        from cdc_compression_tpu.cli.train import main

        results = tmp_path / "results"
        main([
            "--family", "epsilon", "--embed_dim", "16", "--alpha", "0",
            "--data_path", str(img_dir), "--dataset", "img",
            "--img_size", "64", "--batch_size", "2", "--n_step", "2",
            "--save_every", "1000", "--n_workers", "0",
            "--results_dir", str(results),
        ])
        ckpts = list(results.rglob("*"))
        assert any(p.is_file() for p in ckpts), f"no checkpoint written: {ckpts}"


class TestDistillCLI:
    def test_distill_from_ema_orbax_checkpoint(self, img_dir, tmp_path):
        """Bootstrap the distillation teacher from a Trainer EMA orbax
        checkpoint (the reference's distill_trainer.py:100-108 key-rename
        path, done natively here): train 2 EMA steps, save, distill one
        round through the CLI, and check the student actually moved."""
        import jax
        import numpy as np

        from cdc_compression_tpu.cli.distill import main as distill_main
        from cdc_compression_tpu.train import TrainConfig, Trainer
        from cdc_compression_tpu.train.ema import EMAConfig
        from cdc_compression_tpu.utils.presets import epsilon_family, init_params

        engine = epsilon_family(dim=16, aux_loss_weight=0.0)
        cfg = TrainConfig(use_ema=True,
                          ema=EMAConfig(update_after_step=0, update_every=1),
                          results_dir=str(tmp_path / "results"))
        trainer = Trainer(engine, cfg, train_iter=None)
        state = trainer.init_state(init_params(engine, 0, image_hw=(64, 64)))
        batch = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
        for i in range(2):
            state, _ = trainer.train_step(state, batch, jax.random.PRNGKey(i))
        trainer.save(state)
        ckpt_dir = tmp_path / "results" / "model_0"
        assert ckpt_dir.is_dir()

        out = tmp_path / "distilled.npz"
        distill_main([
            "--family", "epsilon", "--dim", "16", "--use_ema",
            "--ckpt", str(ckpt_dir), "--data_path", str(img_dir),
            "--dataset", "img", "--img_size", "64", "--batch_size", "1",
            "--kiter", "1", "--steps_per_round", "2", "--out", str(out),
        ])
        assert out.exists()
        got = np.load(out, allow_pickle=True)["params"].item()
        teacher_ema = state.ema.params
        leaves_got = jax.tree.leaves(got["unet"])
        leaves_ema = jax.tree.leaves(teacher_ema["unet"])
        assert all(np.isfinite(np.asarray(a)).all() for a in leaves_got)
        # student was trained from the EMA teacher: same structure, moved values
        assert len(leaves_got) == len(leaves_ema)
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(leaves_got, leaves_ema)
        )
        # the frozen context model must ride through unchanged from the EMA tree
        for a, b in zip(jax.tree.leaves(got["compressor"]),
                        jax.tree.leaves(teacher_ema["compressor"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestConvertCLI:
    @pytest.mark.golden
    def test_released_key_inventory(self, reference_modules):
        """convert_diffusion_checkpoint against the exact key inventories
        the released checkpoints carry (SURVEY §2.7 / test_epsilonparam.py:22):

        * ε: flat GaussianDiffusion state_dict with `train_*` schedule
          buffers and `loss_fn_vgg.*` LPIPS weights baked in;
        * x: ema_pytorch.EMA state_dict — `ema_model.*` + `online_model.*`
          + `initted`/`step` bookkeeping — where inference must use the
          EMA weights (xparam/test_xparam.py:66-68).
        """
        import jax
        import torch

        from cdc_compression_tpu.utils import convert

        ref = reference_modules
        torch.manual_seed(3)
        unet = ref.unet.Unet(dim=8, channels=3, context_channels=3,
                             dim_mults=(1, 2), context_dim_mults=(1,))
        comp = ref.cm.BigCompressor(dim=8, dim_mults=(1, 2), hyper_dims_mults=(4, 4),
                                    channels=3, out_channels=3, vbr=False)
        base = {}
        for k, v in unet.state_dict().items():
            base[f"denoise_fn.{k}"] = v
        for k, v in comp.state_dict().items():
            base[f"context_fn.{k}"] = v
        noise = {
            "train_betas": torch.rand(7),
            "train_alphas_cumprod": torch.rand(7),
            "train_sqrt_alphas_cumprod": torch.rand(7),
            "loss_fn_vgg.scaling_layer.shift": torch.rand(1, 3, 1, 1),
            "loss_fn_vgg.net.slice1.0.weight": torch.rand(4, 3, 3, 3),
            "loss_fn_vgg.lin0.model.1.weight": torch.rand(1, 4, 1, 1),
        }
        want = convert.convert_diffusion_checkpoint(base, n_levels=2, n_enc=2)

        # ε flat checkpoint: noise keys must be ignored, weights unchanged
        got = convert.convert_diffusion_checkpoint({**base, **noise}, n_levels=2, n_enc=2)
        for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # x EMA checkpoint: EMA weights win over the online model's
        ema_sd = {}
        for k, v in base.items():
            ema_sd[f"ema_model.{k}"] = v
            ema_sd[f"online_model.{k}"] = v * 2.0 + 1.0  # decoy
        for k, v in noise.items():
            ema_sd[f"ema_model.{k}"] = v
        ema_sd["initted"] = torch.tensor(True)
        ema_sd["step"] = torch.tensor(123)
        got_ema = convert.convert_diffusion_checkpoint(ema_sd, n_levels=2, n_enc=2)
        for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got_ema)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.golden
    def test_convert_then_compress(self, reference_modules, img_dir, tmp_path):
        """Build a reference-shaped ε checkpoint, convert it via the CLI,
        and decode with it through cli.compress --ckpt."""
        ref = reference_modules
        torch = ref.torch
        torch.manual_seed(0)
        unet = ref.unet.Unet(dim=16, channels=3, context_channels=3,
                             dim_mults=(1, 2, 3, 4, 5, 6),
                             context_dim_mults=(1, 2, 3, 4))
        comp = ref.cm.BigCompressor(dim=16, dim_mults=(1, 2, 3, 4),
                                    hyper_dims_mults=(4, 4, 4), channels=3,
                                    out_channels=3, vbr=False)
        sd = {}
        for k, v in unet.state_dict().items():
            sd[f"denoise_fn.{k}"] = v
        for k, v in comp.state_dict().items():
            sd[f"context_fn.{k}"] = v
        pt = tmp_path / "ref.pt"
        torch.save({"step": 7, "model": sd}, pt)

        from cdc_compression_tpu.cli.compress import main as compress_main
        from cdc_compression_tpu.cli.convert import main as convert_main

        npz = tmp_path / "conv.npz"
        convert_main(["--ckpt", str(pt), "--out", str(npz)])
        out = tmp_path / "out"
        compress_main([
            "--ckpt", str(npz), "--img_dir", str(img_dir),
            "--out_dir", str(out), "--dim", "16", "--n_denoise_step", "2",
        ])
        assert (out / "a.png").exists()
