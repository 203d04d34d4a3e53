"""Pallas fused-block kernel vs the XLA reference path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cdc_compression_tpu.ops.pallas_kernels import fused_block


def xla_reference(x, w, bias, gamma, beta, in_bias=None, residual=None, relu=True, eps=1e-5):
    if in_bias is not None:
        x = x + in_bias[:, None, None, :]
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, -1, keepdims=True)
    var = jnp.mean(jnp.square(y32 - mean), -1, keepdims=True)
    out = (y32 - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
    if relu:
        out = jnp.maximum(out, 0.0)
    out = out.astype(x.dtype)
    if residual is not None:
        out = out + residual
    return out


class TestFusedBlock:
    @pytest.mark.parametrize("cin,cout,h,w", [(8, 16, 16, 24), (16, 8, 8, 8)])
    def test_matches_xla_basic(self, cin, cout, h, w):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, h, w, cin), jnp.float32)
        wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
        g = jnp.asarray(rng.rand(cout) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
        want = xla_reference(x, wk, bias, g, b)
        got = fused_block(x, wk, bias, g, b, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

    def test_matches_with_bias_and_residual(self):
        rng = np.random.RandomState(1)
        B, h, w, cin, cout = 2, 8, 16, 8, 8
        x = jnp.asarray(rng.randn(B, h, w, cin), jnp.float32)
        wk = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
        g = jnp.asarray(rng.rand(cout) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
        inb = jnp.asarray(rng.randn(B, cin) * 0.2, jnp.float32)
        res = jnp.asarray(rng.randn(B, h, w, cout) * 0.3, jnp.float32)
        want = xla_reference(x, wk, bias, g, b, in_bias=inb, residual=res)
        got = fused_block(x, wk, bias, g, b, in_bias=inb, residual=res, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

    def test_no_relu(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 8, 8, 8), jnp.float32)
        wk = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)
        bias = jnp.zeros(8)
        g, b = jnp.ones(8), jnp.zeros(8)
        want = xla_reference(x, wk, bias, g, b, relu=False)
        got = fused_block(x, wk, bias, g, b, relu=False, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

    def test_bf16_inputs(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(1, 16, 16, 8), jnp.bfloat16)
        wk = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.bfloat16)
        bias = jnp.zeros(8, jnp.float32)
        g, b = jnp.ones(8, jnp.float32), jnp.zeros(8, jnp.float32)
        want = xla_reference(x, wk, bias, g, b)
        got = fused_block(x, wk, bias, g, b, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=5e-2, atol=5e-2
        )


class TestBlockIntegration:
    """`models.layers.Block` routes through fused_block only on TPU with
    the flag on; param tree and numerics are unchanged."""

    def test_flag_on_cpu_falls_back_and_matches(self):
        from cdc_compression_tpu.models.layers import ResnetBlock
        from cdc_compression_tpu.ops import pallas_kernels

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 8, 8), jnp.float32)
        t = jnp.asarray(rng.randn(2, 16), jnp.float32)
        mod = ResnetBlock(16, time_emb_dim=16)
        params = mod.init(jax.random.PRNGKey(0), x, t)
        want = mod.apply(params, x, t)
        pallas_kernels.enable_fused_blocks(True)
        try:
            assert not pallas_kernels.fused_blocks_active()  # CPU backend
            got = mod.apply(params, x, t)
        finally:
            pallas_kernels.enable_fused_blocks(False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_fused_param_tree_matches_xla_tree(self):
        """Initializing under the fused path must create the identical
        param tree (checkpoint compatibility)."""
        from cdc_compression_tpu.models.layers import Block
        from cdc_compression_tpu.ops import pallas_kernels

        x = jnp.zeros((1, 8, 8, 4))
        base = jax.tree.structure(Block(8).init(jax.random.PRNGKey(0), x))
        # simulate the fused trace by monkeypatching the activity check
        orig = pallas_kernels.fused_blocks_active
        orig_ln = pallas_kernels.fused_layernorm
        pallas_kernels.fused_blocks_active = lambda: True
        pallas_kernels.fused_layernorm = lambda *a, **k: orig_ln(*a, **k, interpret=True)
        try:
            fused_init = Block(8).init(jax.random.PRNGKey(0), x)
        finally:
            pallas_kernels.fused_blocks_active = orig
            pallas_kernels.fused_layernorm = orig_ln
        assert jax.tree.structure(fused_init) == base

    def test_fused_path_via_interpret_matches_model(self):
        """Force the fused path (interpret mode on CPU) through the Block
        module and compare against the XLA path."""
        from cdc_compression_tpu.models.layers import Block
        from cdc_compression_tpu.ops import pallas_kernels

        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(1, 8, 16, 8), jnp.float32)
        inb = jnp.asarray(rng.randn(1, 8) * 0.3, jnp.float32)
        res = jnp.asarray(rng.randn(1, 8, 16, 8) * 0.3, jnp.float32)
        mod = Block(8)
        params = mod.init(jax.random.PRNGKey(1), x)
        want = mod.apply(params, x, inb, res)
        orig_ln = pallas_kernels.fused_layernorm
        orig_act = pallas_kernels.fused_blocks_active
        pallas_kernels.fused_blocks_active = lambda: True
        pallas_kernels.fused_layernorm = lambda *a, **k: orig_ln(*a, **k, interpret=True)
        try:
            got = mod.apply(params, x, inb, res)
        finally:
            pallas_kernels.fused_layernorm = orig_ln
            pallas_kernels.fused_blocks_active = orig_act
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


class TestFusedLayerNorm:
    @pytest.mark.parametrize("c,h,w,relu", [(8, 16, 24, True), (16, 8, 8, False)])
    def test_matches_xla(self, c, h, w, relu):
        from cdc_compression_tpu.ops.pallas_kernels import fused_layernorm

        rng = np.random.RandomState(0)
        y = jnp.asarray(rng.randn(2, h, w, c), jnp.float32)
        g = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        res = jnp.asarray(rng.randn(2, h, w, c) * 0.3, jnp.float32)
        y32 = y.astype(jnp.float32)
        mean = jnp.mean(y32, -1, keepdims=True)
        var = jnp.mean(jnp.square(y32 - mean), -1, keepdims=True)
        want = (y32 - mean) * jax.lax.rsqrt(var + 1e-5) * g + b
        if relu:
            want = jnp.maximum(want, 0.0)
        want = want + res
        got = fused_layernorm(y, g, b, residual=res, relu=relu, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    def test_bf16(self):
        from cdc_compression_tpu.ops.pallas_kernels import fused_layernorm

        rng = np.random.RandomState(1)
        y = jnp.asarray(rng.randn(1, 16, 16, 8), jnp.bfloat16)
        g, b = jnp.ones(8), jnp.zeros(8)
        got = fused_layernorm(y, g, b, interpret=True)
        y32 = y.astype(jnp.float32)
        mean = jnp.mean(y32, -1, keepdims=True)
        var = jnp.mean(jnp.square(y32 - mean), -1, keepdims=True)
        want = jnp.maximum((y32 - mean) * jax.lax.rsqrt(var + 1e-5), 0.0)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), rtol=5e-2, atol=5e-2
        )


class TestFusedHead:
    """fused_head (LN + KxK small-cout conv, one pass) vs the XLA path."""

    @staticmethod
    def reference(x, g, b, w, bias, eps=1e-5):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, -1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), -1, keepdims=True)
        ln = ((x32 - mean) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)
        p = w.shape[0] // 2
        y = jax.lax.conv_general_dilated(
            ln, w.astype(x.dtype), (1, 1), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(y.dtype)

    @pytest.mark.parametrize("k,cin,cout,h,w", [(7, 16, 3, 16, 24), (3, 8, 4, 8, 16)])
    def test_matches_xla(self, k, cin, cout, h, w):
        from cdc_compression_tpu.ops.pallas_kernels import fused_head

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, h, w, cin), jnp.float32)
        wk = jnp.asarray(rng.randn(k, k, cin, cout) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
        g = jnp.asarray(rng.rand(cin) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(cin) * 0.1, jnp.float32)
        want = self.reference(x, g, b, wk, bias)
        got = fused_head(x, g, b, wk, bias, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    def test_bf16_batch2(self):
        from cdc_compression_tpu.ops.pallas_kernels import fused_head

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.bfloat16)
        wk = jnp.asarray(rng.randn(7, 7, 8, 3) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.randn(3) * 0.1, jnp.float32)
        g = jnp.asarray(rng.rand(8) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(8) * 0.1, jnp.float32)
        want = self.reference(x, g, b, wk.astype(jnp.bfloat16), bias)
        got = fused_head(x, g, b, wk, bias, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=5e-2, atol=5e-2
        )

    def test_unet_head_param_tree_unchanged(self):
        """Tracing the unet with the fused head active must produce the
        identical param tree (checkpoint compatibility)."""
        from cdc_compression_tpu.models.unet import Unet
        from cdc_compression_tpu.ops import pallas_kernels

        model = Unet(dim=8, dim_mults=(1, 2), context_dim_mults=(), channels=3,
                     context_channels=0)
        x = jnp.zeros((1, 8, 8, 3))
        t = jnp.zeros((1, 1))
        base = jax.tree.structure(model.init(jax.random.PRNGKey(0), x, t))
        orig_act = pallas_kernels.fused_head_active
        orig_fh = pallas_kernels.fused_head
        pallas_kernels.fused_head_active = lambda: True
        pallas_kernels.fused_head = lambda *a, **kw: orig_fh(*a, **kw, interpret=True)
        try:
            fused = jax.tree.structure(
                model.init(jax.random.PRNGKey(0), x.astype(jnp.bfloat16),
                           t.astype(jnp.bfloat16))
            )
        finally:
            pallas_kernels.fused_head_active = orig_act
            pallas_kernels.fused_head = orig_fh
        assert fused == base

    def test_unet_fused_head_matches_model(self):
        """Full unet forward with the fused head (interpret) vs XLA path."""
        from cdc_compression_tpu.models.unet import Unet
        from cdc_compression_tpu.ops import pallas_kernels

        model = Unet(dim=8, dim_mults=(1, 2), context_dim_mults=(1,), channels=3,
                     context_channels=2)
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.bfloat16)
        t = jnp.asarray(rng.rand(1, 1), jnp.bfloat16)
        ctx = [jnp.asarray(rng.randn(1, 8, 8, 2), jnp.bfloat16)]
        params = model.init(jax.random.PRNGKey(0), x, t, ctx)
        want = model.apply(params, x, t, ctx)
        orig_act = pallas_kernels.fused_head_active
        orig_fh = pallas_kernels.fused_head
        pallas_kernels.fused_head_active = lambda: True
        pallas_kernels.fused_head = lambda *a, **kw: orig_fh(*a, **kw, interpret=True)
        try:
            got = model.apply(params, x, t, ctx)
        finally:
            pallas_kernels.fused_head_active = orig_act
            pallas_kernels.fused_head = orig_fh
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=5e-2, atol=5e-2,
        )


class TestFusedFoldedLayerNorm:
    """One-pass folded-LN kernel vs `folding.folded_layer_norm` (+ReLU)."""

    @pytest.mark.parametrize("c,h,w,relu", [(8, 8, 16, False), (16, 16, 8, True)])
    def test_matches_folding_math(self, c, h, w, relu):
        from cdc_compression_tpu.ops import folding
        from cdc_compression_tpu.ops.pallas_kernels import fused_folded_layernorm

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, h, w, 2 * c), jnp.float32)
        g = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        want = folding.folded_layer_norm(x, g, b)
        if relu:
            want = jnp.maximum(want, 0.0)
        got = fused_folded_layernorm(x, g, b, relu=relu, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    def test_bf16_matches_and_halves_match_unfolded_ln(self):
        """bf16 kernel output == the folded-XLA path, and both equal the
        plain per-pixel LN of the unfolded tensor (the fold invariant)."""
        from cdc_compression_tpu.ops import folding
        from cdc_compression_tpu.ops.pallas_kernels import fused_folded_layernorm

        rng = np.random.RandomState(1)
        c, h, w = 16, 8, 8
        xu = rng.randn(1, h, 2 * w, c).astype(np.float32)
        x = jnp.asarray(xu.reshape(1, h, w, 2 * c), jnp.bfloat16)
        g = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        want = folding.folded_layer_norm(x, g, b)
        got = fused_folded_layernorm(x, g, b, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    def test_vjp_matches_xla_path(self):
        """The custom VJP (pure-XLA twin) must match grads of the folding
        math so the folded bf16 train path stays correct when enabled."""
        from cdc_compression_tpu.ops import folding
        from cdc_compression_tpu.ops.pallas_kernels import fused_folded_layernorm

        rng = np.random.RandomState(2)
        c, h, w = 8, 4, 8
        x = jnp.asarray(rng.randn(1, h, w, 2 * c), jnp.float32)
        g = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)

        def loss_ref(x, g, b):
            y = jnp.maximum(folding.folded_layer_norm(x, g, b), 0.0)
            return jnp.sum(y * y)

        def loss_pallas(x, g, b):
            y = fused_folded_layernorm(x, g, b, relu=True, interpret=True)
            return jnp.sum(y * y)

        gw = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, g, b)
        for a, bb in zip(gw, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-5)
