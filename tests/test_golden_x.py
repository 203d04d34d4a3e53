"""Golden parity tests for the x-variant (x̂₀-prediction) family."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cdc_compression_tpu import models
from cdc_compression_tpu.diffusion import DiffusionConfig, GaussianDiffusion


def nhwc(a):
    return np.transpose(a, (0, 2, 3, 1))


def nchw(a):
    return np.transpose(a, (0, 3, 1, 2))


@pytest.mark.golden
class TestGoldenXVariant:
    def test_resnet_compressor_matches(self, reference_modules_x):
        ref = reference_modules_x
        torch = ref.torch
        torch.manual_seed(0)
        rcomp = ref.cm.ResnetCompressor(
            dim=8, dim_mults=(1, 2, 3, 4), reverse_dim_mults=(4, 3, 2, 1),
            hyper_dims_mults=(4, 4, 4), channels=3, out_channels=8,
        ).eval()

        from cdc_compression_tpu.utils import convert

        params = convert._to_jnp(convert.convert_compressor(convert._SD(rcomp.state_dict())))
        m = models.ResnetCompressor(dim=8, dim_mults=(1, 2, 3, 4), reverse_dim_mults=(4, 3, 2, 1),
                                    hyper_dims_mults=(4, 4, 4), channels=3, out_channels=8)
        rng = np.random.RandomState(0)
        x = rng.randn(1, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            want = rcomp(torch.tensor(x))
        got = m.apply({"params": params}, jnp.array(nhwc(x)))
        for i, (g, w) in enumerate(zip(got["output"], want["output"])):
            np.testing.assert_allclose(
                nchw(np.asarray(g)), w.numpy(), rtol=1e-3, atol=1e-4, err_msg=f"level {i}"
            )
        np.testing.assert_allclose(np.asarray(got["bpp"]), want["bpp"].numpy(), rtol=1e-3)

    def test_x_pred_ddim_trajectory_matches(self, reference_modules_x):
        """Full x-parameterized DDIM decode parity incl. clip_denoised=True
        and the index/T time convention (xparam/denoising_diffusion.py:152-174)."""
        ref = reference_modules_x
        torch = ref.torch
        torch.manual_seed(1)
        r_unet = ref.unet.Unet(dim=8, channels=3, context_channels=8,
                               dim_mults=(1, 2), context_dim_mults=(1,),
                               embd_type="01").eval()
        r_comp = ref.cm.ResnetCompressor(dim=8, dim_mults=(1,), reverse_dim_mults=(1,),
                                         hyper_dims_mults=(1,), channels=3,
                                         out_channels=8).eval()
        r_diff = ref.dd.GaussianDiffusion(
            denoise_fn=r_unet, context_fn=r_comp, num_timesteps=257, loss_type="l2",
            pred_mode="x", var_schedule="cosine", aux_loss_weight=0,
            use_loss_weight=True, loss_weight_min=5,
        ).eval()

        from cdc_compression_tpu.utils import convert

        unet_p = convert._to_jnp(convert.convert_unet(convert._SD(r_unet.state_dict()), n_levels=2))
        comp_p = convert._to_jnp(convert.convert_compressor(convert._SD(r_comp.state_dict())))
        params = {"unet": {"params": unet_p}, "compressor": {"params": comp_p}}

        unet = models.Unet(dim=8, dim_mults=(1, 2), context_dim_mults=(1,),
                           channels=3, context_channels=8)
        comp = models.ResnetCompressor(dim=8, dim_mults=(1,), reverse_dim_mults=(1,),
                                       hyper_dims_mults=(1,), channels=3, out_channels=8)
        cfg = DiffusionConfig(num_timesteps=257, var_schedule="cosine", pred_mode="x",
                              loss_type="l2", sample_time_convention="index_frac")
        eng = GaussianDiffusion(unet, comp, cfg)

        rng = np.random.RandomState(5)
        x = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
        init = (rng.randn(1, 3, 32, 32) * 0.8).astype(np.float32)

        with torch.no_grad():
            want, want_bpp = r_diff.compress(
                torch.tensor(x), sample_steps=5, bpp_return_mean=False,
                init=torch.tensor(init),
            )
        got, got_bpp = eng.compress(
            params, jnp.array(nhwc(x)), sample_steps=5, rng=jax.random.PRNGKey(0),
            init=jnp.array(nhwc(init)), bpp_return_mean=False, clip_denoised=True,
        )
        np.testing.assert_allclose(nchw(np.asarray(got)), want.numpy(), rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(got_bpp), want_bpp.numpy(), rtol=1e-3, atol=1e-4)

    def test_one_step_decode_matches(self, reference_modules_x):
        """sample_steps=1 special case (xparam/...:91-94)."""
        ref = reference_modules_x
        torch = ref.torch
        torch.manual_seed(2)
        r_unet = ref.unet.Unet(dim=8, channels=3, context_channels=8,
                               dim_mults=(1, 2), context_dim_mults=(1,),
                               embd_type="01").eval()
        r_comp = ref.cm.ResnetCompressor(dim=8, dim_mults=(1,), reverse_dim_mults=(1,),
                                         hyper_dims_mults=(1,), channels=3,
                                         out_channels=8).eval()
        r_diff = ref.dd.GaussianDiffusion(
            denoise_fn=r_unet, context_fn=r_comp, num_timesteps=65, loss_type="l2",
            pred_mode="x", var_schedule="cosine", aux_loss_weight=0,
        ).eval()

        from cdc_compression_tpu.utils import convert

        params = {
            "unet": {"params": convert._to_jnp(convert.convert_unet(convert._SD(r_unet.state_dict()), n_levels=2))},
            "compressor": {"params": convert._to_jnp(convert.convert_compressor(convert._SD(r_comp.state_dict())))},
        }
        unet = models.Unet(dim=8, dim_mults=(1, 2), context_dim_mults=(1,),
                           channels=3, context_channels=8)
        comp = models.ResnetCompressor(dim=8, dim_mults=(1,), reverse_dim_mults=(1,),
                                       hyper_dims_mults=(1,), channels=3, out_channels=8)
        cfg = DiffusionConfig(num_timesteps=65, var_schedule="cosine", pred_mode="x",
                              loss_type="l2", sample_time_convention="index_frac")
        eng = GaussianDiffusion(unet, comp, cfg)

        rng = np.random.RandomState(7)
        x = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
        init = (rng.randn(1, 3, 32, 32) * 0.8).astype(np.float32)
        with torch.no_grad():
            want, _ = r_diff.compress(torch.tensor(x), sample_steps=1,
                                      init=torch.tensor(init))
        got, _ = eng.compress(params, jnp.array(nhwc(x)), sample_steps=1,
                              rng=jax.random.PRNGKey(0), init=jnp.array(nhwc(init)),
                              clip_denoised=True)
        np.testing.assert_allclose(nchw(np.asarray(got)), want.numpy(), rtol=1e-3, atol=1e-3)
