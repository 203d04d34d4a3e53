"""Width-folded level-0 path (ops/folding.py): exactness vs the direct
NHWC lowering, on CPU in fp32 (tight tolerances) and bf16 (loose)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cdc_compression_tpu.ops import folding


def _conv(x, k, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class TestKernelFolding:
    @pytest.mark.parametrize("k,p,cin,cout", [(3, 1, 8, 8), (7, 3, 6, 16), (3, 1, 5, 4), (5, 2, 8, 8)])
    def test_stride1_exact(self, k, p, cin, cout):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 12, cin), jnp.float32)
        kern = jnp.asarray(rng.randn(k, k, cin, cout) * 0.1, jnp.float32)
        want = folding.fold2(_conv(x, kern, pad=p))
        kf, (pl_, pr) = folding.fold_conv_kernel(kern, p)
        got = jax.lax.conv_general_dilated(
            folding.fold2(x), kf, (1, 1), ((p, p), (pl_, pr)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-5)

    def test_downsample_exact(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(1, 8, 12, 8), jnp.float32)
        kern = jnp.asarray(rng.randn(3, 3, 8, 16) * 0.1, jnp.float32)
        want = _conv(x, kern, stride=2, pad=1)
        kf = folding.fold_downsample_kernel(kern)
        got = jax.lax.conv_general_dilated(
            folding.fold2(x), kf, (2, 1), ((1, 1), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-5)

    @pytest.mark.parametrize("k,p,op", [(4, 1, 0), (2, 0, 0), (6, 2, 0)])
    def test_convT_folded_output_exact(self, k, p, op):
        """fold_convT_kernel: folded output of a stride-2 transposed conv
        from unfolded input equals fold2 of the direct lowering."""
        rng = np.random.RandomState(7)
        cin, cout = 8, 8
        x = jnp.asarray(rng.randn(1, 6, 9, cin), jnp.float32)
        kern = jnp.asarray(rng.randn(k, k, cin, cout) * 0.1, jnp.float32)
        direct = jax.lax.conv_general_dilated(
            x, jnp.flip(kern, (0, 1)), (1, 1),
            ((k - 1 - p, k - 1 - p + op), (k - 1 - p, k - 1 - p + op)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        kf, (pl_, pr) = folding.fold_convT_kernel(kern, p, op)
        got = jax.lax.conv_general_dilated(
            x, kf, (1, 1), ((k - 1 - p, k - 1 - p + op), (pl_, pr)),
            lhs_dilation=(2, 1), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(folding.fold2(direct)), rtol=1e-6, atol=1e-5
        )

    def test_folded_shift_add_head(self):
        """Small-cout folded conv (the 7x7 head) runs the fat-GEMM
        shift-add path and matches the direct lowering."""
        from cdc_compression_tpu.models.layers import Conv2d

        rng = np.random.RandomState(8)
        x = jnp.asarray(rng.randn(1, 8, 12, 16), jnp.float32)
        mod = Conv2d(3, 7, padding=3)
        params = mod.init(jax.random.PRNGKey(0), x)
        want = folding.fold2(mod.apply(params, x))
        got = mod.apply(params, folding.fold2(x), folded=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    def test_fold_unfold_roundtrip(self):
        x = jnp.arange(2 * 4 * 6 * 3, dtype=jnp.float32).reshape(2, 4, 6, 3)
        np.testing.assert_array_equal(np.asarray(folding.unfold2(folding.fold2(x))), np.asarray(x))
        # folded pairs pack adjacent columns
        f = folding.fold2(x)
        np.testing.assert_array_equal(np.asarray(f[0, 0, 0, :3]), np.asarray(x[0, 0, 0]))
        np.testing.assert_array_equal(np.asarray(f[0, 0, 0, 3:]), np.asarray(x[0, 0, 1]))


class TestFoldedLayerNorm:
    def test_matches_channel_layer_norm(self):
        from cdc_compression_tpu.models.layers import ChannelLayerNorm

        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 6, 8, 16) * 3 + 1.5, jnp.float32)
        mod = ChannelLayerNorm()
        params = mod.init(jax.random.PRNGKey(0), x)
        # non-trivial affine
        params = {"params": {"g": jnp.asarray(rng.rand(16), jnp.float32),
                             "b": jnp.asarray(rng.randn(16), jnp.float32)}}
        want = folding.fold2(mod.apply(params, x))
        got = mod.apply(params, folding.fold2(x), folded=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


class TestFoldedModules:
    def test_resnet_block(self):
        from cdc_compression_tpu.models.layers import ResnetBlock

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 8, 12, 6), jnp.float32)
        t = jnp.asarray(rng.randn(2, 32), jnp.float32)
        mod = ResnetBlock(16, time_emb_dim=32, large=True)
        params = mod.init(jax.random.PRNGKey(0), x, t)
        want = folding.fold2(mod.apply(params, x, t))
        got = mod.apply(params, folding.fold2(x), t, folded=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=1e-4)

    def test_pre_norm_linear_attention(self):
        from cdc_compression_tpu.models.layers import PreNormLinearAttention

        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(2, 8, 12, 16), jnp.float32)
        mod = PreNormLinearAttention()
        params = mod.init(jax.random.PRNGKey(0), x)
        want = folding.fold2(mod.apply(params, x))
        got = mod.apply(params, folding.fold2(x), folded=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=1e-4)

    def test_downsample_module(self):
        from cdc_compression_tpu.models.layers import Downsample

        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(1, 8, 12, 8), jnp.float32)
        mod = Downsample(16)
        params = mod.init(jax.random.PRNGKey(0), x)
        want = mod.apply(params, x)
        got = mod.apply(params, folding.fold2(x), folded=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    def test_upsample_module_folded_out(self):
        from cdc_compression_tpu.models.layers import Upsample

        rng = np.random.RandomState(9)
        x = jnp.asarray(rng.randn(1, 4, 6, 8), jnp.float32)
        mod = Upsample(8)
        params = mod.init(jax.random.PRNGKey(0), x)
        want = folding.fold2(mod.apply(params, x))
        got = mod.apply(params, x, folded_out=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


class TestFoldedUnet:
    def _setup(self):
        from cdc_compression_tpu.models.unet import Unet

        unet = Unet(dim=8, dim_mults=(1, 2, 3), context_dim_mults=(1, 2),
                    channels=3, context_channels=3)
        rng = np.random.RandomState(6)
        x = jnp.asarray(rng.randn(1, 16, 24, 3), jnp.float32)
        t = jnp.asarray(rng.rand(1, 1), jnp.float32)
        ctx = [jnp.asarray(rng.randn(1, 16, 24, 3), jnp.float32),
               jnp.asarray(rng.randn(1, 8, 12, 8), jnp.float32)]
        params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
        return unet, params, x, t, ctx

    @staticmethod
    def _set_all(on: bool):
        folding.enable_fold_l0(on)
        folding.enable_fold_up(on)
        folding.enable_fold_head(on)

    @staticmethod
    def _restore_defaults():
        folding.enable_fold_l0(None)  # auto by level-0 input width
        folding.enable_fold_up(None)  # auto by resolution
        folding.enable_fold_head(True)

    def test_bf16_folded_close_to_unfolded(self):
        unet, params, x, t, ctx = self._setup()
        p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
        args16 = (x.astype(jnp.bfloat16), t.astype(jnp.bfloat16),
                  [c.astype(jnp.bfloat16) for c in ctx])
        try:
            self._set_all(True)
            y_fold = unet.apply(p16, *args16)
            self._set_all(False)
            y_ref = unet.apply(p16, *args16)
        finally:
            self._restore_defaults()
        d = np.abs(np.asarray(y_fold, np.float32) - np.asarray(y_ref, np.float32)).max()
        scale = np.abs(np.asarray(y_ref, np.float32)).max()
        assert d < 0.05 * max(1.0, scale), (d, scale)

    def test_bf16_folded_downsample_close_to_unfolded(self):
        """Input-only Downsample folding (fold2 before the stride-2 conv,
        unfolded exit — no folded LN anywhere) matches the direct path."""
        unet, params, x, t, ctx = self._setup()
        p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
        args16 = (x.astype(jnp.bfloat16), t.astype(jnp.bfloat16),
                  [c.astype(jnp.bfloat16) for c in ctx])
        try:
            self._set_all(False)
            folding.enable_fold_downsample(False)
            y_ref = unet.apply(p16, *args16)
            folding.enable_fold_downsample(True)
            y_fold = unet.apply(p16, *args16)
        finally:
            folding.enable_fold_downsample(True)  # measured-win default
            self._restore_defaults()
        d = np.abs(np.asarray(y_fold, np.float32) - np.asarray(y_ref, np.float32)).max()
        scale = np.abs(np.asarray(y_ref, np.float32)).max()
        assert d < 0.05 * max(1.0, scale), (d, scale)

    def test_fp32_path_not_folded(self):
        """fp32 keeps the direct lowering (golden parity) whatever the toggles."""
        unet, params, x, t, ctx = self._setup()
        try:
            self._set_all(True)
            y1 = unet.apply(params, x, t, ctx)
            self._set_all(False)
            y2 = unet.apply(params, x, t, ctx)
        finally:
            self._restore_defaults()
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def test_auto_rule_by_context_width(self):
        """fold_l0 default is auto: off for the ε-family's 6-channel
        level-0 input, on for the x-family's 67-channel one."""
        assert not folding.fold_l0_active(6)
        assert folding.fold_l0_active(67)
        # high-res second rule: narrow-cin level 0 folds once the map is
        # >= ~2 Mpx (the windowing-copy cost grows super-linearly there)
        assert not folding.fold_l0_active(6, 768 * 512)
        assert folding.fold_l0_active(6, 2048 * 1536)
        folding.enable_fold_l0(False)
        try:
            assert not folding.fold_l0_active(67)
        finally:
            folding.enable_fold_l0(None)
        assert folding.fold_l0_active(67)
        # fold_up auto rule (round 3): folds the last up stage only at
        # high resolution (−6.7 ms/step at 2K, +0.8 at 768x512 — PERF.md)
        assert not folding.fold_up_active(768 * 512)
        assert folding.fold_up_active(2048 * 1536)
        folding.enable_fold_up(True)
        try:
            assert folding.fold_up_active(0)
        finally:
            folding.enable_fold_up(None)

    def test_x_family_bf16_decode_with_auto_fold(self):
        """x-family bf16 decode exercises the auto-folded level 0 end to
        end (finite output, rate path bit-identical to fp32)."""
        from cdc_compression_tpu.utils.presets import init_params, x_family

        engine = x_family(dim=16, num_timesteps=32, aux_loss_weight=0.0)
        params = init_params(engine, 0, image_hw=(64, 64))
        x = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3) * 2 - 1, jnp.float32)
        rng = jax.random.PRNGKey(0)
        dec16, bpp16 = engine.compress(params, x, sample_steps=2, rng=rng,
                                       compute_dtype=jnp.bfloat16)
        dec32, bpp32 = engine.compress(params, x, sample_steps=2, rng=rng)
        assert bool(jnp.isfinite(dec16.astype(jnp.float32)).all())
        np.testing.assert_array_equal(np.asarray(bpp16), np.asarray(bpp32))

    def _setup_wide_ctx(self):
        """Hoist-eligible topology: context >= folding.CTX_HOIST_MIN_CH
        channels per level (the x-family regime where the split wins)."""
        from cdc_compression_tpu.models.unet import Unet

        unet = Unet(dim=8, dim_mults=(1, 2, 3), context_dim_mults=(1, 2),
                    channels=3, context_channels=32)
        rng = np.random.RandomState(6)
        x = jnp.asarray(rng.randn(1, 16, 24, 3), jnp.float32)
        t = jnp.asarray(rng.rand(1, 1), jnp.float32)
        ctx = [jnp.asarray(rng.randn(1, 16, 24, 32), jnp.float32),
               jnp.asarray(rng.randn(1, 8, 12, 64), jnp.float32)]
        params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
        return unet, params, x, t, ctx

    def test_ctx_hoist_fp32_exact(self):
        """precompute_ctx + ctx_contrib consume computes the SAME function
        as the concat path: conv(concat(x,ctx),K) = conv(x,K_x)+conv(ctx,K_ctx)
        (fp32, unfolded — only float reassociation separates them)."""
        unet, params, x, t, ctx = self._setup_wide_ctx()
        want = unet.apply(params, x, t, ctx)
        contrib = unet.apply(params, None, None, ctx, precompute_ctx=True)
        # both levels are wide enough to hoist
        assert all(c is not None for c in contrib)
        got = unet.apply(params, x, t, ctx, ctx_contrib=contrib)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_ctx_hoist_narrow_ctx_not_hoisted(self):
        """Levels with a context narrower than CTX_HOIST_MIN_CH keep the
        concat path (the split loses there — measured, ops.folding)."""
        unet, params, x, t, ctx = self._setup()  # 3/8-channel contexts
        contrib = unet.apply(params, None, None, ctx, precompute_ctx=True)
        assert all(c is None for c in contrib)
        got = unet.apply(params, x, t, ctx, ctx_contrib=contrib)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(unet.apply(params, x, t, ctx)))

    def test_ctx_hoist_folded_bf16_close(self):
        """Hoisting under the folded level-0 layout (contributions computed
        folded, consumed folded) stays bf16-close to the concat path."""
        unet, params, x, t, ctx = self._setup_wide_ctx()
        p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
        x16, t16 = x.astype(jnp.bfloat16), t.astype(jnp.bfloat16)
        c16 = [c.astype(jnp.bfloat16) for c in ctx]
        try:
            self._set_all(True)
            want = unet.apply(p16, x16, t16, c16)
            contrib = unet.apply(p16, None, None, c16, precompute_ctx=True)
            # level-0 contribution must be in the folded layout
            assert contrib[0][0].shape[2] == x.shape[2] // 2
            got = unet.apply(p16, x16, t16, c16, ctx_contrib=contrib)
        finally:
            self._restore_defaults()
        d = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32)).max()
        scale = np.abs(np.asarray(want, np.float32)).max()
        assert d < 0.05 * max(1.0, scale), (d, scale)

    def test_ctx_hoist_bf16_decode_end_to_end(self):
        """compress() auto-hoists on the bf16 DDIM path; result stays
        bf16-close to the unhoisted bf16 decode and fp32 rate math is
        bit-identical (symbols don't touch the hoist)."""
        from cdc_compression_tpu.utils.presets import init_params, x_family

        engine = x_family(dim=16, num_timesteps=32, aux_loss_weight=0.0)
        params = init_params(engine, 0, image_hw=(64, 64))
        x = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3) * 2 - 1, jnp.float32)
        rng = jax.random.PRNGKey(0)
        init = jnp.zeros_like(x)
        try:
            folding.enable_ctx_hoist(True)
            dec_h, bpp_h = engine.compress(params, x, sample_steps=2, rng=rng,
                                           init=init, compute_dtype=jnp.bfloat16)
            folding.enable_ctx_hoist(False)
            dec_n, bpp_n = engine.compress(params, x, sample_steps=2, rng=rng,
                                           init=init, compute_dtype=jnp.bfloat16)
        finally:
            folding.enable_ctx_hoist(True)
        np.testing.assert_array_equal(np.asarray(bpp_h), np.asarray(bpp_n))
        d = np.abs(np.asarray(dec_h, np.float32) - np.asarray(dec_n, np.float32)).max()
        assert d < 0.1, d

    def test_folded_grads_flow(self):
        unet, params, x, t, ctx = self._setup()
        p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

        def loss(p):
            y = unet.apply(p, x.astype(jnp.bfloat16), t.astype(jnp.bfloat16),
                           [c.astype(jnp.bfloat16) for c in ctx])
            return jnp.mean(jnp.square(y.astype(jnp.float32)))

        try:
            self._set_all(True)
            g = jax.grad(loss)(p16)
        finally:
            self._restore_defaults()
        leaves = jax.tree.leaves(g)
        assert all(bool(jnp.isfinite(a.astype(jnp.float32)).all()) for a in leaves)
        # the level-0 conv grads are nonzero through the kernel-fold scatter
        g0 = g["params"]["down_0_res1"]["block1"]["conv"]["kernel"]
        assert float(jnp.abs(g0.astype(jnp.float32)).max()) > 0
