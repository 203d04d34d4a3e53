"""Range-coder round-trip and rate-accuracy tests."""

import numpy as np
import pytest

from cdc_compression_tpu.entropy import coder


@pytest.fixture(scope="module")
def lib():
    from cdc_compression_tpu.entropy.build import build

    return build()


class TestQuantizedCdf:
    def test_cdf_valid(self):
        pmf = np.array([0.1, 0.5, 0.3, 0.1])
        cdf = coder.pmf_to_quantized_cdf(pmf)
        assert cdf[0] == 0 and cdf[-1] == 1 << 16
        assert (np.diff(cdf.astype(np.int64)) >= 1).all()

    def test_degenerate_pmf(self):
        pmf = np.array([1.0, 0.0, 0.0])
        cdf = coder.pmf_to_quantized_cdf(pmf)
        assert (np.diff(cdf.astype(np.int64)) >= 1).all()
        assert cdf[-1] == 1 << 16


class TestRoundTrip:
    def test_random_symbols(self, lib):
        rng = np.random.RandomState(0)
        pmfs = [rng.dirichlet(np.ones(17)) for _ in range(4)]
        table = coder.CdfTable.from_pmfs(pmfs, offsets=[-8] * 4)
        symbols = rng.randint(-8, 9, size=10000).astype(np.int32)
        indexes = rng.randint(0, 4, size=10000).astype(np.int32)
        data = coder.encode_symbols(symbols, indexes, table)
        out = coder.decode_symbols(data, indexes, table)
        np.testing.assert_array_equal(out, symbols)

    def test_escape_path(self, lib):
        """Symbols far outside the table range must survive via escapes."""
        pmfs = [np.array([0.25, 0.5, 0.25])]
        table = coder.CdfTable.from_pmfs(pmfs, offsets=[-1])
        symbols = np.array([-1, 0, 1, 500, -70000, 0, 1 << 20], np.int32)
        indexes = np.zeros_like(symbols)
        data = coder.encode_symbols(symbols, indexes, table)
        out = coder.decode_symbols(data, indexes, table)
        np.testing.assert_array_equal(out, symbols)

    def test_gaussian_rate_close_to_entropy(self, lib):
        """Coded size must be within ~2% of the analytic entropy."""
        rng = np.random.RandomState(1)
        n = 200_000
        scale = 3.7
        x = np.round(rng.randn(n) * scale).astype(np.int32)
        table = coder.build_gaussian_tables()
        idx = coder.scale_indexes(np.full(n, scale))
        data = coder.encode_symbols(x, idx, table)
        out = coder.decode_symbols(data, idx, table)
        np.testing.assert_array_equal(out, x)
        # analytic bits with the table's chosen scale
        ts = coder.scale_table()[idx[0]]
        from scipy.stats import norm

        p = norm.cdf((x + 0.5) / ts) - norm.cdf((x - 0.5) / ts)
        bits = -np.log2(np.maximum(p, 1e-9)).sum()
        coded_bits = len(data) * 8
        assert coded_bits < bits * 1.02 + 64 * 8
        assert coded_bits > bits * 0.98

    def test_scale_table_floor_matches_compressor_clamp(self, lib):
        """The table floor must equal the compressor's conditional-scale
        clamp (`models/compressor.py` scale >= 0.1, matching the
        reference's clamp(min=0.1), compress_modules.py:65): a 0.11
        floor would code scales in [0.1, 0.11) against a wider CDF."""
        t = coder.scale_table()
        assert abs(t[0] - 0.1) < 1e-12
        # every clamped scale maps to a table scale >= it (compressai
        # convention) and round-trips at the boundary band
        rng = np.random.RandomState(0)
        for s in (0.1, 0.105, 0.11):
            scales = np.full(2000, s)
            idx = coder.scale_indexes(scales)
            assert (t[idx] >= scales - 1e-12).all()
            x = np.round(rng.randn(2000) * s).astype(np.int32)
            table = coder.build_gaussian_tables()
            data = coder.encode_symbols(x, idx, table)
            np.testing.assert_array_equal(coder.decode_symbols(data, idx, table), x)

    def test_empty_and_single(self, lib):
        table = coder.CdfTable.from_pmfs([np.array([0.5, 0.5])], offsets=[0])
        symbols = np.array([1], np.int32)
        indexes = np.zeros(1, np.int32)
        data = coder.encode_symbols(symbols, indexes, table)
        out = coder.decode_symbols(data, indexes, table)
        np.testing.assert_array_equal(out, symbols)


class TestPriorTables:
    def test_prior_roundtrip_with_flexible_prior(self, lib):
        import jax
        import jax.numpy as jnp

        from cdc_compression_tpu import ops

        C = 4
        prior = ops.FlexiblePrior(channels=C)
        params = prior.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, 1, C)), method=ops.FlexiblePrior.likelihood
        )
        medians = np.asarray(
            prior.apply(params, method=lambda m: m.medians)
        ).reshape(C)

        def cdf_fn(x):  # x: (N, C)
            v = jnp.asarray(x, jnp.float32).reshape(1, -1, 1, C)
            return np.asarray(prior.apply(params, v, method=ops.FlexiblePrior.cdf)).reshape(x.shape)

        table = coder.build_prior_tables(cdf_fn, medians, half_range=32)
        rng = np.random.RandomState(2)
        symbols = np.round(rng.randn(5000, C) * 4).astype(np.int32)
        indexes = np.tile(np.arange(C, dtype=np.int32), (5000, 1))
        data = coder.encode_symbols(symbols, indexes, table)
        out = coder.decode_symbols(data, indexes, table).reshape(5000, C)
        np.testing.assert_array_equal(out, symbols)
