"""Diffusion engine tests: schedule algebra, sampling loop, losses, golden DDIM."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cdc_compression_tpu import models, ops
from cdc_compression_tpu.diffusion import DiffusionConfig, GaussianDiffusion


def tiny_engine(pred_mode="noise", **cfg_kw):
    unet = models.Unet(dim=8, dim_mults=(1, 2), context_dim_mults=(1,),
                       channels=3, context_channels=3)
    comp = models.BigCompressor(dim=8, dim_mults=(1,), hyper_dims_mults=(1,),
                                channels=3, out_channels=3)
    cfg = DiffusionConfig(num_timesteps=64, var_schedule="linear", pred_mode=pred_mode,
                          loss_type="l2", **cfg_kw)
    return GaussianDiffusion(unet, comp, cfg)


def tiny_params(engine, key=0, hw=16):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    x = jnp.zeros((1, hw, hw, 3))
    ctx = [jnp.zeros((1, hw, hw, 3))]
    unet_p = engine.unet.init(k1, x, jnp.zeros((1, 1)), ctx)
    comp_p = engine.compressor.init(k2, x)
    return {"unet": unet_p, "compressor": comp_p}


class TestAlgebra:
    def test_q_sample_then_predict_start_roundtrip(self):
        eng = tiny_engine()
        key = jax.random.PRNGKey(0)
        x0 = jax.random.uniform(key, (2, 4, 4, 3), minval=-1, maxval=1)
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = jnp.array([3, 50])
        xt = eng.q_sample(x0, t, noise)
        rec = eng._predict_start_from_noise(eng.train_sched, xt, t, noise)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-3, atol=1e-4)

    def test_v_parameterization_roundtrip(self):
        eng = tiny_engine("v")
        x0 = jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 4, 3), minval=-1, maxval=1)
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = jnp.array([10, 30])
        xt = eng.q_sample(x0, t, noise)
        v = eng._predict_v(eng.train_sched, x0, t, noise)
        rec = eng._predict_start_from_v(eng.train_sched, xt, t, v)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), rtol=1e-3, atol=1e-4)

    def test_noise_from_start_inverse(self):
        eng = tiny_engine()
        sched = ops.make_sample_schedule(eng.train_sched, 8)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = jnp.array([2, 5])
        xt = (
            ops.extract(sched.sqrt_alphas_cumprod, t, 4) * x0
            + ops.extract(sched.sqrt_one_minus_alphas_cumprod, t, 4) * noise
        )
        got = eng._predict_noise_from_start(sched, xt, t, x0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(noise), rtol=1e-3, atol=1e-4)


class TestSamplingLoop:
    @pytest.mark.parametrize("pred_mode", ["noise", "x", "v"])
    def test_compress_shapes(self, pred_mode):
        eng = tiny_engine(pred_mode)
        params = tiny_params(eng)
        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3), minval=-1, maxval=1)
        dec, bpp = eng.compress(params, x, sample_steps=3, rng=jax.random.PRNGKey(0))
        assert dec.shape == x.shape
        assert np.isfinite(np.asarray(dec)).all()
        assert float(bpp) > 0

    def test_compress_jits_and_is_deterministic(self):
        eng = tiny_engine()
        params = tiny_params(eng)
        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3), minval=-1, maxval=1)
        init = jax.random.normal(jax.random.PRNGKey(7), x.shape) * 0.8

        @jax.jit
        def run(p, img):
            return eng.compress(p, img, sample_steps=4, rng=jax.random.PRNGKey(0), init=init)

        d1, b1 = run(params, x)
        d2, b2 = run(params, x)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

    def test_eta_stochastic(self):
        eng = tiny_engine()
        params = tiny_params(eng)
        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3), minval=-1, maxval=1)
        d1, _ = eng.compress(params, x, sample_steps=3, rng=jax.random.PRNGKey(0), eta=1.0)
        d2, _ = eng.compress(params, x, sample_steps=3, rng=jax.random.PRNGKey(1), eta=1.0)
        assert np.abs(np.asarray(d1) - np.asarray(d2)).max() > 1e-6

    def test_batch_serial_matches_per_image_decode(self):
        """`batch_serial` (lax.map over images — the TPU batched-serving
        path, PERF.md "mode batch") must be bit-identical to decoding
        each image alone: the map body IS the B=1 program."""
        eng = tiny_engine()
        params = tiny_params(eng)
        x = jax.random.uniform(jax.random.PRNGKey(2), (3, 16, 16, 3), minval=-1, maxval=1)
        init = jax.random.normal(jax.random.PRNGKey(7), x.shape) * 0.8
        rng = jax.random.PRNGKey(0)
        got, bpp_s = eng.compress(params, x, sample_steps=2, rng=rng, init=init,
                                  batch_serial=True)
        want = np.stack([
            np.asarray(eng.compress(params, x[i:i+1], sample_steps=2, rng=rng,
                                    init=init[i:i+1], batch_serial=False)[0][0])
            for i in range(3)
        ])
        np.testing.assert_array_equal(np.asarray(got), want)
        # and bpp (batched encode) is unaffected by the decode strategy
        _, bpp_b = eng.compress(params, x, sample_steps=2, rng=rng, init=init,
                                batch_serial=False)
        np.testing.assert_array_equal(np.asarray(bpp_s), np.asarray(bpp_b))

    def test_batch_serial_guards(self):
        """Explicit batch_serial=True must raise with the batch-coupled
        'half' clip (each B=1 map body would clip nothing) and in latent
        mode (decode is always batched there) — advisor round-2 items."""
        eng = tiny_engine()
        params = tiny_params(eng)
        x = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3), minval=-1, maxval=1)
        with pytest.raises(ValueError, match="half"):
            eng.compress(params, x, sample_steps=2, rng=jax.random.PRNGKey(0),
                         batch_serial=True, clip_denoised="half")

    def test_batch_serial_auto_rule_is_bf16_only(self):
        """compute_dtype=float32 must NOT auto-enable serial decode: the
        fp32 batched lowering is the golden-parity path (advisor item).
        Explicit fp32 compute must be bit-identical to the default path."""
        eng = tiny_engine()
        params = tiny_params(eng)
        x = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3), minval=-1, maxval=1)
        init = jax.random.normal(jax.random.PRNGKey(7), x.shape) * 0.8
        rng = jax.random.PRNGKey(0)
        d_auto, _ = eng.compress(params, x, sample_steps=2, rng=rng, init=init,
                                 compute_dtype=jnp.float32)
        d_batched, _ = eng.compress(params, x, sample_steps=2, rng=rng, init=init,
                                    compute_dtype=jnp.float32, batch_serial=False)
        np.testing.assert_array_equal(np.asarray(d_auto), np.asarray(d_batched))

    def test_ddpm_mode_runs(self):
        eng = tiny_engine()
        params = tiny_params(eng)
        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 3), minval=-1, maxval=1)
        dec, _ = eng.compress(params, x, sample_steps=3, rng=jax.random.PRNGKey(0),
                              sample_mode="ddpm")
        assert np.isfinite(np.asarray(dec)).all()


class TestLosses:
    @pytest.mark.parametrize("pred_mode,use_w", [("noise", False), ("x", True), ("v", True)])
    def test_loss_finite_and_differentiable(self, pred_mode, use_w):
        eng = tiny_engine(pred_mode, use_loss_weight=use_w, loss_weight_min=5)
        params = tiny_params(eng)
        x = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 3), minval=-1, maxval=1)

        def lf(p):
            return eng.loss(p, x, jax.random.PRNGKey(0))[0]

        loss, grads = jax.value_and_grad(lf)(params)
        assert np.isfinite(float(loss))
        gnorm = jax.tree_util.tree_reduce(
            lambda a, l: a + float(jnp.sum(jnp.abs(l))), grads, 0.0
        )
        assert np.isfinite(gnorm) and gnorm > 0

    def test_vbr_loss_runs(self):
        eng = tiny_engine("noise", vbr=False)  # vbr compressor covered in model tests
        params = tiny_params(eng)
        x = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 3), minval=-1, maxval=1)
        loss, metrics = eng.loss(params, x, jax.random.PRNGKey(0))
        assert "bpp" in metrics and "median_loss" in metrics

    def test_aux_l2_loss(self):
        eng = tiny_engine("noise", aux_loss_weight=0.5, aux_loss_type="l2")
        params = tiny_params(eng)
        x = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 3), minval=-1, maxval=1)
        loss, metrics = eng.loss(params, x, jax.random.PRNGKey(0))
        assert "aux_loss" in metrics and np.isfinite(float(loss))


class TestEMA:
    def test_schedule_matches_ema_pytorch_semantics(self):
        from cdc_compression_tpu.train.ema import EMAConfig, EMAState, current_decay, ema_init, ema_update

        cfg = EMAConfig(beta=0.999, update_every=10, update_after_step=100, power=0.75)
        # before update_after_step the decay is 0 (hard copy)
        assert float(current_decay(jnp.asarray(50), cfg)) == 0.0
        # far in training the decay approaches beta
        assert float(current_decay(jnp.asarray(10_000_000), cfg)) == pytest.approx(0.999)

        params = {"w": jnp.ones((2,))}
        st = ema_init(params)
        for i in range(105):
            st = ema_update(st, {"w": jnp.full((2,), float(i))}, cfg)
        # at step<=100 the shadow hard-copies on every 10th call
        assert int(st.step) == 105
        st2 = ema_update(st, {"w": jnp.full((2,), 200.0)}, cfg)
        # step 105 is not a multiple of 10 -> shadow unchanged
        np.testing.assert_array_equal(np.asarray(st2.params["w"]), np.asarray(st.params["w"]))


@pytest.mark.golden
class TestGoldenDDIM:
    def test_ddim_trajectory_matches_reference(self, reference_modules):
        """Run the reference ε-model DDIM loop vs ours with identical tiny
        weights, context, and init noise: trajectories must match."""
        ref = reference_modules
        torch = ref.torch
        torch.manual_seed(0)

        r_unet = ref.unet.Unet(dim=8, channels=3, context_channels=3,
                               dim_mults=(1, 2), context_dim_mults=(1,)).eval()
        r_comp = ref.cm.BigCompressor(dim=8, dim_mults=(1,), hyper_dims_mults=(1,),
                                      channels=3, out_channels=3).eval()
        r_diff = ref.dd.GaussianDiffusion(
            denoise_fn=r_unet, context_fn=r_comp, num_timesteps=64, loss_type="l1",
            clip_noise="none", pred_mode="noise", var_schedule="linear", aux_loss_weight=0,
        ).eval()

        from cdc_compression_tpu.utils import convert

        unet_p = convert._to_jnp(convert.convert_unet(convert._SD(r_unet.state_dict()), n_levels=2))
        comp_p = convert._to_jnp(convert.convert_compressor(convert._SD(r_comp.state_dict()), n_enc=1))
        params = {"unet": {"params": unet_p}, "compressor": {"params": comp_p}}

        unet = models.Unet(dim=8, dim_mults=(1, 2), context_dim_mults=(1,),
                           channels=3, context_channels=3)
        comp = models.BigCompressor(dim=8, dim_mults=(1,), hyper_dims_mults=(1,),
                                    channels=3, out_channels=3)
        cfg = DiffusionConfig(num_timesteps=64, var_schedule="linear", pred_mode="noise",
                              loss_type="l1", clip_noise="none",
                              sample_time_convention="step_frac")
        eng = GaussianDiffusion(unet, comp, cfg)

        rng = np.random.RandomState(5)
        x = rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
        init = (rng.randn(1, 3, 16, 16) * 0.8).astype(np.float32)

        with torch.no_grad():
            want, want_bpp = r_diff.compress(
                torch.tensor(x), sample_steps=5, sample_mode="ddim",
                bpp_return_mean=False, init=torch.tensor(init),
            )

        nhwc = lambda a: np.transpose(a, (0, 2, 3, 1))
        got, got_bpp = eng.compress(
            params, jnp.array(nhwc(x)), sample_steps=5, rng=jax.random.PRNGKey(0),
            init=jnp.array(nhwc(init)), bpp_return_mean=False,
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(got), (0, 3, 1, 2)), want.numpy(), rtol=1e-3, atol=2e-3
        )
        np.testing.assert_allclose(np.asarray(got_bpp), want_bpp.numpy(), rtol=1e-3, atol=1e-4)


class TestLatentMode:
    """Latent-space diffusion behind a frozen AutoencoderKL — the
    reference's `ae_fn` capability (xparam/denoising_diffusion.py:221-231,
    350-360), wired working here (the reference shipped it broken,
    SURVEY §2.5)."""

    def _latent_engine(self, aux_loss_weight=0.0):
        unet = models.Unet(dim=8, dim_mults=(1, 2), context_dim_mults=(1,),
                           channels=3, context_channels=3)
        # latent at 1/8, one decode stage -> context pyramid at image-1/4
        # = z resolution (AE downsamples 4x)
        comp = models.ResnetCompressor(dim=8, dim_mults=(1, 2, 3),
                                       reverse_dim_mults=(3,),
                                       hyper_dims_mults=(1,),
                                       channels=3, out_channels=3)
        from cdc_compression_tpu.models.autoencoder import AutoencoderKL
        ae = AutoencoderKL(ch=8, z_channels=3, ch_mult=(1, 2, 4), num_res_blocks=1)
        cfg = DiffusionConfig(num_timesteps=64, var_schedule="cosine", pred_mode="x",
                              loss_type="l2", aux_loss_weight=aux_loss_weight,
                              aux_loss_type="l2", aux_pred_clip=False,
                              sample_time_convention="index_frac")
        return GaussianDiffusion(unet, comp, cfg, ae=ae)

    def _latent_params(self, eng, hw=32):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        x = jnp.zeros((1, hw, hw, 3))
        comp_p = eng.compressor.init(k2, x)
        ctx = eng.compressor.apply(comp_p, x)["output"]
        ae_p = eng.ae.init(k3, x)
        z = eng.ae.apply(ae_p, x, method="encode").mode
        unet_p = eng.unet.init(k1, z, jnp.zeros((1, 1)), ctx)
        return {"unet": unet_p, "compressor": comp_p, "ae": ae_p}

    def test_loss_finite_and_ae_frozen(self):
        eng = self._latent_engine(aux_loss_weight=0.5)
        params = self._latent_params(eng)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 2 - 1

        def loss_fn(p):
            return eng.loss(p, x, jax.random.PRNGKey(2))[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        # AE is frozen: its grads must be exactly zero
        ae_gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["ae"]))
        assert ae_gnorm == 0.0
        unet_gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["unet"]))
        assert unet_gnorm > 0.0

    def test_compress_decodes_to_image_shape(self):
        eng = self._latent_engine()
        params = self._latent_params(eng)
        x = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3)) * 2 - 1
        decoded, bpp = eng.compress(params, x, sample_steps=3, rng=jax.random.PRNGKey(4))
        assert decoded.shape == x.shape
        assert np.isfinite(float(bpp))
