"""Layer/shape tests + golden parity vs the reference networks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cdc_compression_tpu import models


def nhwc(a):
    return np.transpose(a, (0, 2, 3, 1))


def nchw(a):
    return np.transpose(a, (0, 3, 1, 2))


class TestConvGeometry:
    @pytest.mark.parametrize("k,s,p", [(3, 1, 1), (3, 2, 1), (5, 2, 2), (7, 1, 3), (1, 1, 0)])
    def test_conv2d_matches_torch(self, k, s, p):
        import torch
        import torch.nn.functional as F

        rng = np.random.RandomState(k * 10 + s)
        x = rng.randn(2, 6, 16, 12).astype(np.float32)  # NCHW for torch
        w = rng.randn(8, 6, k, k).astype(np.float32)
        b = rng.randn(8).astype(np.float32)
        want = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=s, padding=p).numpy()

        m = models.Conv2d(8, k, stride=s, padding=p)
        params = {"params": {"kernel": jnp.array(np.transpose(w, (2, 3, 1, 0))), "bias": jnp.array(b)}}
        got = np.asarray(m.apply(params, jnp.array(nhwc(x))))
        np.testing.assert_allclose(nchw(got), want, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("k,s,p,op", [(4, 2, 1, 0), (5, 2, 2, 1)])
    def test_conv_transpose2d_matches_torch(self, k, s, p, op):
        import torch
        import torch.nn.functional as F

        rng = np.random.RandomState(k)
        x = rng.randn(2, 6, 8, 10).astype(np.float32)
        w = rng.randn(6, 8, k, k).astype(np.float32)  # (in, out, k, k)
        b = rng.randn(8).astype(np.float32)
        want = F.conv_transpose2d(
            torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=s, padding=p, output_padding=op
        ).numpy()

        m = models.ConvTranspose2d(8, k, stride=s, padding=p, output_padding=op)
        params = {"params": {"kernel": jnp.array(np.transpose(w, (2, 3, 0, 1))), "bias": jnp.array(b)}}
        got = np.asarray(m.apply(params, jnp.array(nhwc(x))))
        assert got.shape[1] == (x.shape[2] - 1) * s - 2 * p + k + op
        np.testing.assert_allclose(nchw(got), want, rtol=1e-4, atol=1e-4)


class TestLayerNorm:
    def test_biased_variance_channelwise(self):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 4, 4, 16).astype(np.float32)
        m = models.ChannelLayerNorm()
        params = m.init(jax.random.PRNGKey(0), jnp.array(x))
        got = np.asarray(m.apply(params, jnp.array(x)))
        mean = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)  # biased
        want = (x - mean) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestShapes:
    def test_unet_shapes_tiny(self):
        net = models.Unet(dim=8, dim_mults=(1, 2, 3, 4, 5, 6), context_dim_mults=(1, 2, 3, 4),
                          channels=3, context_channels=3)
        x = jnp.zeros((1, 64, 64, 3))
        t = jnp.zeros((1, 1))
        ctx = [
            jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 32, 32, 8)),
            jnp.zeros((1, 16, 16, 16)),
            jnp.zeros((1, 8, 8, 24)),
        ]
        params = net.init(jax.random.PRNGKey(0), x, t, ctx)
        y = net.apply(params, x, t, ctx)
        assert y.shape == (1, 64, 64, 3)

    @pytest.mark.parametrize("cls,out_ch", [(models.ResnetCompressor, 8), (models.BigCompressor, 3)])
    def test_compressor_pyramid(self, cls, out_ch):
        comp = cls(dim=8, dim_mults=(1, 2, 3, 4), reverse_dim_mults=(4, 3, 2, 1),
                   hyper_dims_mults=(4, 4, 4), channels=3, out_channels=out_ch)
        x = jnp.zeros((1, 64, 64, 3))
        params = comp.init(jax.random.PRNGKey(0), x)
        out = comp.apply(params, x)
        pyr = out["output"]
        assert len(pyr) == 4
        assert pyr[0].shape == (1, 64, 64, out_ch)
        assert pyr[1].shape == (1, 32, 32, 8)
        assert pyr[2].shape == (1, 16, 16, 16)
        assert pyr[3].shape == (1, 8, 8, 24)
        assert out["bpp"].shape == (1,)
        assert out["q_latent"].shape == (1, 4, 4, 32)
        assert out["q_hyper_latent"].shape == (1, 1, 1, 32)

    def test_simple_compressor_runs(self):
        comp = models.SimpleCompressor(dim=8, dim_mults=(1, 2, 3, 3), hyper_dims_mults=(3, 3, 3),
                                       channels=3, out_channels=3)
        x = jnp.zeros((1, 64, 64, 3))
        params = comp.init(jax.random.PRNGKey(0), x)
        out = comp.apply(params, x)
        assert len(out["output"]) == 4
        assert out["output"][0].shape == (1, 64, 64, 3)

    def test_vbr_compressor_runs(self):
        comp = models.BigCompressor(dim=8, dim_mults=(1, 2, 3, 4), hyper_dims_mults=(4, 4, 4),
                                    channels=3, out_channels=3, vbr=True)
        x = jnp.zeros((1, 64, 64, 3))
        cond = jnp.array([0.5])
        params = comp.init(jax.random.PRNGKey(0), x, cond)
        out = comp.apply(params, x, cond)
        assert out["output"][0].shape == (1, 64, 64, 3)


@pytest.mark.golden
class TestGoldenNetworks:
    def test_resnet_block_matches(self, reference_modules):
        ref = reference_modules
        torch = ref.torch
        torch.manual_seed(0)
        rb = ref.nc.ResnetBlock(6, 12, time_emb_dim=16, large=True).eval()

        from cdc_compression_tpu.utils import convert

        sd = convert._SD(rb.state_dict())
        params = convert._to_jnp(
            convert.convert_resnet_block(sd, has_time=True, has_res_conv=True)
        )
        m = models.ResnetBlock(12, time_emb_dim=16, large=True)
        rng = np.random.RandomState(1)
        x = rng.randn(2, 6, 16, 16).astype(np.float32)
        t = rng.randn(2, 16).astype(np.float32)
        with torch.no_grad():
            want = rb(torch.tensor(x), torch.tensor(t)).numpy()
        got = np.asarray(m.apply({"params": params}, jnp.array(nhwc(x)), jnp.array(t)))
        np.testing.assert_allclose(nchw(got), want, rtol=1e-3, atol=1e-4)

    def test_linear_attention_matches(self, reference_modules):
        ref = reference_modules
        torch = ref.torch
        torch.manual_seed(0)
        la = ref.nc.Residual(ref.nc.PreNorm(12, ref.nc.LinearAttention(12))).eval()

        from cdc_compression_tpu.utils import convert

        params = convert._to_jnp(convert.convert_attention(convert._SD(la.state_dict())))
        m = models.PreNormLinearAttention()
        rng = np.random.RandomState(2)
        x = rng.randn(2, 12, 8, 8).astype(np.float32)
        with torch.no_grad():
            want = la(torch.tensor(x)).numpy()
        got = np.asarray(m.apply({"params": params}, jnp.array(nhwc(x))))
        np.testing.assert_allclose(nchw(got), want, rtol=1e-3, atol=1e-4)

    def test_unet_matches(self, reference_modules):
        ref = reference_modules
        torch = ref.torch
        torch.manual_seed(0)
        runet = ref.unet.Unet(
            dim=8, channels=3, context_channels=3, dim_mults=(1, 2, 3, 4), context_dim_mults=(1, 2)
        ).eval()

        from cdc_compression_tpu.utils import convert

        params = convert._to_jnp(
            convert.convert_unet(convert._SD(runet.state_dict()), n_levels=4)
        )
        m = models.Unet(dim=8, dim_mults=(1, 2, 3, 4), context_dim_mults=(1, 2),
                        channels=3, context_channels=3)
        rng = np.random.RandomState(3)
        x = rng.randn(1, 3, 32, 32).astype(np.float32)
        t = rng.rand(1, 1).astype(np.float32)
        ctx = [rng.randn(1, 3, 32, 32).astype(np.float32), rng.randn(1, 8, 16, 16).astype(np.float32)]
        with torch.no_grad():
            want = runet(torch.tensor(x), torch.tensor(t), [torch.tensor(c) for c in ctx]).numpy()
        got = np.asarray(
            m.apply({"params": params}, jnp.array(nhwc(x)), jnp.array(t), [jnp.array(nhwc(c)) for c in ctx])
        )
        np.testing.assert_allclose(nchw(got), want, rtol=1e-3, atol=1e-3)

    def test_compressor_matches(self, reference_modules):
        ref = reference_modules
        torch = ref.torch
        torch.manual_seed(0)
        rcomp = ref.cm.BigCompressor(
            dim=8, dim_mults=(1, 2, 3, 4), hyper_dims_mults=(4, 4, 4), channels=3, out_channels=3
        ).eval()

        from cdc_compression_tpu.utils import convert

        params = convert._to_jnp(convert.convert_compressor(convert._SD(rcomp.state_dict())))
        m = models.BigCompressor(dim=8, dim_mults=(1, 2, 3, 4), hyper_dims_mults=(4, 4, 4),
                                 channels=3, out_channels=3)
        rng = np.random.RandomState(4)
        x = rng.randn(1, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            want = rcomp(torch.tensor(x))
        got = m.apply({"params": params}, jnp.array(nhwc(x)))
        for i, (g, w) in enumerate(zip(got["output"], want["output"])):
            np.testing.assert_allclose(
                nchw(np.asarray(g)), w.numpy(), rtol=1e-3, atol=1e-4, err_msg=f"pyramid level {i}"
            )
        np.testing.assert_allclose(
            np.asarray(got["bpp"]), want["bpp"].numpy(), rtol=1e-3, atol=1e-4
        )


class TestAuxLayers:
    def test_sinusoidal_pos_emb_golden(self, reference_modules):
        import torch
        from cdc_compression_tpu.models.layers import SinusoidalPosEmb

        t = np.array([0.0, 1.0, 17.0, 400.0], np.float32)
        got = np.asarray(SinusoidalPosEmb(dim=16).apply({}, jnp.asarray(t)))
        want = reference_modules.nc.SinusoidalPosEmb(16)(torch.tensor(t)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_conv_lstm_cell_scan(self):
        from cdc_compression_tpu.models.layers import ConvLSTMCell

        cell = ConvLSTMCell(hidden=8)
        x = jnp.zeros((2, 6, 6, 4))
        state = ConvLSTMCell.init_state(2, 6, 6, 8)
        params = cell.init(jax.random.PRNGKey(0), x, state)
        seq = jax.random.normal(jax.random.PRNGKey(1), (5, 2, 6, 6, 4))

        def step(carry, xt):
            h, carry = cell.apply(params, xt, carry)
            return carry, h

        _, hs = jax.lax.scan(step, state, seq)
        assert hs.shape == (5, 2, 6, 6, 8)
        assert bool(jnp.isfinite(hs).all())

    def test_conv_gru_cell(self):
        from cdc_compression_tpu.models.layers import ConvGRUCell

        cell = ConvGRUCell(hidden=8)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 6, 4))
        h0 = ConvGRUCell.init_state(2, 6, 6, 8)
        params = cell.init(jax.random.PRNGKey(1), x, h0)
        h, new = cell.apply(params, x, h0)
        assert h.shape == (2, 6, 6, 8) and np.shares_memory is not None
        assert bool(jnp.isfinite(h).all())


class TestShiftAddConv:
    def test_matches_direct_bf16_lowering(self):
        """The bf16 tiny-output-channel decomposition equals XLA's direct
        conv up to bf16 summation order."""
        from cdc_compression_tpu.models.layers import Conv2d

        rng = jax.random.PRNGKey(0)
        for cin, cout, k, p in [(64, 3, 7, 3), (32, 4, 3, 1), (128, 16, 5, 2)]:
            mod = Conv2d(cout, k, padding=p)
            x = jax.random.normal(rng, (2, 32, 40, cin), jnp.bfloat16)
            prm = jax.tree.map(lambda a: a.astype(jnp.bfloat16), mod.init(rng, x))
            y_fast = mod.apply(prm, x)
            kern, bias = prm["params"]["kernel"], prm["params"]["bias"]
            y_ref = jax.lax.conv_general_dilated(
                x, kern, (1, 1), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
            d = np.abs(np.asarray(y_fast, np.float32) - np.asarray(y_ref, np.float32)).max()
            assert d / np.abs(np.asarray(y_ref, np.float32)).max() < 0.02

    def test_fp32_path_unchanged(self):
        """fp32 keeps the direct lowering (bit-exact golden parity)."""
        from cdc_compression_tpu.models.layers import Conv2d

        rng = jax.random.PRNGKey(1)
        mod = Conv2d(3, 7, padding=3)
        x = jax.random.normal(rng, (1, 16, 24, 64), jnp.float32)
        prm = mod.init(rng, x)
        y = mod.apply(prm, x)
        y_ref = jax.lax.conv_general_dilated(
            x, prm["params"]["kernel"], (1, 1), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + prm["params"]["bias"]
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))


class TestCompressorBf16:
    def test_bf16_forward_tracks_fp32(self):
        """compute_dtype=bf16 runs only the synthesis stages in bf16: the
        rate path (q_latent, bpp) is bit-identical to fp32, and the
        context pyramid deviates only by bf16 rounding."""
        from cdc_compression_tpu.utils.presets import epsilon_family, init_params

        engine = epsilon_family(dim=16, aux_loss_weight=0.0)
        params = init_params(engine, 0, image_hw=(64, 64))
        x = jnp.asarray(
            np.random.RandomState(0).rand(1, 64, 64, 3) * 2 - 1, jnp.float32
        )

        out32 = jax.jit(engine.compressor.apply)(params["compressor"], x)
        cvp = params["compressor"]["params"]
        cvp = {
            k: (jax.tree.map(lambda a: a.astype(jnp.bfloat16), v) if k.startswith("dec_") else v)
            for k, v in cvp.items()
        }
        out16 = jax.jit(
            lambda v, im: engine.compressor.apply(v, im, compute_dtype=jnp.bfloat16)
        )({"params": cvp}, x)

        # rate path bit-identical: same symbols, same bpp
        np.testing.assert_array_equal(
            np.asarray(out32["q_latent"]), np.asarray(out16["q_latent"])
        )
        np.testing.assert_array_equal(np.asarray(out32["bpp"]), np.asarray(out16["bpp"]))
        for a, b in zip(out32["output"], out16["output"]):
            assert b.dtype == jnp.bfloat16
            rms = float(jnp.sqrt(jnp.mean(a.astype(jnp.float32) ** 2)))
            d = float(jnp.abs(a - b.astype(jnp.float32)).max())
            # bf16 rounding only — no quantization flips
            assert d < 0.1 * max(1.0, rms)

    def test_engine_compress_bf16_compressor(self):
        """GaussianDiffusion.compress(compute_dtype=bf16) now covers the
        compressor too and still returns finite decode + sane bpp."""
        from cdc_compression_tpu.utils.presets import epsilon_family, init_params

        engine = epsilon_family(dim=16, num_timesteps=32, aux_loss_weight=0.0)
        params = init_params(engine, 0, image_hw=(64, 64))
        x = jnp.asarray(
            np.random.RandomState(1).rand(1, 64, 64, 3) * 2 - 1, jnp.float32
        )
        rng = jax.random.PRNGKey(0)
        dec16, bpp16 = jax.jit(
            lambda p, im: engine.compress(
                p, im, sample_steps=4, rng=rng, compute_dtype=jnp.bfloat16
            )
        )(params, x)
        dec32, bpp32 = jax.jit(
            lambda p, im: engine.compress(p, im, sample_steps=4, rng=rng)
        )(params, x)
        assert bool(jnp.isfinite(dec16).all())
        np.testing.assert_array_equal(np.asarray(bpp16), np.asarray(bpp32))
