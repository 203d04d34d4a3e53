"""Unit + golden tests for the core math layer (ops/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cdc_compression_tpu import ops


class TestBounds:
    def test_ste_round_forward_and_grad(self):
        x = jnp.array([0.4, 0.6, -1.2, 2.5])
        assert np.allclose(ops.ste_round(x), np.round(np.asarray(x)))
        g = jax.grad(lambda v: (ops.ste_round(v) * jnp.array([1.0, 2.0, 3.0, 4.0])).sum())(x)
        assert np.allclose(g, [1, 2, 3, 4])

    def test_lower_bound_grad_semantics(self):
        x = jnp.array([0.5, 2.0, 0.5, 2.0])
        bound = jnp.ones_like(x)
        cotangent = jnp.array([1.0, 1.0, -1.0, -1.0])
        y, vjp = jax.vjp(lambda v: ops.lower_bound(v, bound), x)
        assert np.allclose(y, [1.0, 2.0, 1.0, 2.0])
        (gx,) = vjp(cotangent)
        # below bound & positive g -> blocked; negative g always passes
        assert np.allclose(gx, [0.0, 1.0, -1.0, -1.0])

    def test_upper_bound_grad_semantics(self):
        x = jnp.array([0.5, 2.0, 0.5, 2.0])
        bound = jnp.ones_like(x)
        cotangent = jnp.array([1.0, 1.0, -1.0, -1.0])
        y, vjp = jax.vjp(lambda v: ops.upper_bound(v, bound), x)
        assert np.allclose(y, [0.5, 1.0, 0.5, 1.0])
        (gx,) = vjp(cotangent)
        # above bound & negative g -> blocked; positive g always passes
        assert np.allclose(gx, [1.0, 1.0, -1.0, 0.0])


class TestQuantize:
    def test_round_with_offset_value_and_grads(self):
        x = jnp.array([1.3, -0.4, 2.7])
        o = jnp.array([0.25, 0.25, 0.25])
        q = ops.round_with_offset(x, o)
        assert np.allclose(q, np.round(np.asarray(x) - 0.25) + 0.25)
        gx = jax.grad(lambda v: ops.round_with_offset(v, o).sum())(x)
        go = jax.grad(lambda v: ops.round_with_offset(x, v).sum())(o)
        assert np.allclose(gx, 1.0)
        assert np.allclose(go, 0.0)  # -1 (inner) + 1 (outer) cancel under STE

    def test_noise_quantize_range(self):
        key = jax.random.PRNGKey(0)
        x = jnp.zeros((1000,))
        q = ops.quantize(x, "noise", key=key)
        assert float(jnp.max(jnp.abs(q))) <= 0.5
        assert float(jnp.std(q)) > 0.2


class TestSchedules:
    def test_linear_schedule_values(self):
        b = ops.linear_beta_schedule(1000)
        assert b[0] == pytest.approx(1e-4)
        assert b[-1] == pytest.approx(0.02)

    def test_cosine_schedule_bounds(self):
        b = ops.cosine_beta_schedule(100)
        assert (b >= 0).all() and (b <= 0.999).all()

    def test_sample_schedule_subsampling(self):
        tr = ops.make_train_schedule("linear", 1000)
        ss = ops.make_sample_schedule(tr, 17)
        assert ss.sample_steps == 17
        assert int(ss.index[0]) == 0 and int(ss.index[-1]) == 999
        assert float(ss.alphas_cumprod_prev[0]) == 1.0
        assert np.allclose(np.asarray(ss.alphas_cumprod_prev[1:]), np.asarray(ss.alphas_cumprod[:-1]))
        # sigma matches the DDPM posterior sigma formula
        ac, acp = np.asarray(ss.alphas_cumprod, np.float64), np.asarray(ss.alphas_cumprod_prev, np.float64)
        sig = np.sqrt((1 - acp) / (1 - ac)) * np.sqrt(1 - ac / acp)
        assert np.allclose(np.asarray(ss.sigma), sig, atol=1e-6)

    def test_one_step_schedule(self):
        tr = ops.make_train_schedule("cosine", 8193)
        ss = ops.make_sample_schedule(tr, 1)
        assert ss.sample_steps == 1
        assert int(ss.index[0]) == 8192

    def test_extract(self):
        a = jnp.arange(10.0)
        t = jnp.array([2, 5])
        out = ops.extract(a, t, 4)
        assert out.shape == (2, 1, 1, 1)
        assert np.allclose(out.ravel(), [2.0, 5.0])


class TestGaussianLikelihood:
    def test_matches_closed_form(self):
        from scipy.stats import norm

        rng = np.random.RandomState(0)
        x = rng.randn(4, 8, 8, 16).astype(np.float32) * 3
        loc = rng.randn(4, 8, 8, 16).astype(np.float32)
        scale = rng.rand(4, 8, 8, 16).astype(np.float32) + 0.1
        got = np.asarray(ops.gaussian_interval_likelihood(jnp.array(x), jnp.array(loc), jnp.array(scale)))
        d = np.abs(x - loc)
        want = norm.cdf((0.5 - d) / scale) - norm.cdf((-0.5 - d) / scale)
        want = np.maximum(want, 1e-9)
        assert np.allclose(got, want, rtol=1e-4, atol=1e-7)


class TestFlexiblePrior:
    def _init(self, channels=8):
        prior = ops.FlexiblePrior(channels=channels)
        params = prior.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, channels)), method=ops.FlexiblePrior.likelihood)
        return prior, params

    def test_cdf_monotone_in_x(self):
        prior, params = self._init()
        xs = jnp.linspace(-30, 30, 101).reshape(1, 101, 1, 1) * jnp.ones((1, 1, 1, 8))
        cdf = prior.apply(params, xs, method=ops.FlexiblePrior.cdf)
        assert np.all(np.diff(np.asarray(cdf), axis=1) >= -1e-7)
        # at Ballé init (init_scale=10) the CDF saturates over roughly +-10
        assert float(cdf.min()) < 0.05 and float(cdf.max()) > 0.95

    def test_likelihood_positive_and_sums_near_one(self):
        prior, params = self._init()
        # total mass over integer grid should be ~1 per channel (the
        # init-time flow has logistic tails, so leave a little slack)
        grid = jnp.arange(-200, 201).astype(jnp.float32).reshape(1, 401, 1, 1) * jnp.ones((1, 1, 1, 8))
        lik = prior.apply(params, grid, method=ops.FlexiblePrior.likelihood)
        total = np.asarray(lik).sum(axis=1)
        assert np.all(total > 0.98) and np.all(total < 1.01)

    def test_median_loss_grad_only_medians(self):
        prior, params = self._init()

        def loss(p):
            return prior.apply(p, method=ops.FlexiblePrior.median_loss)

        g = jax.grad(loss)(params)
        flat = jax.tree_util.tree_flatten_with_path(g)[0]
        for path, leaf in flat:
            name = jax.tree_util.keystr(path)
            if "medians" in name:
                assert float(jnp.abs(leaf).sum()) > 0
            else:
                assert float(jnp.abs(leaf).sum()) == 0.0


@pytest.mark.golden
class TestGoldenVsReference:
    """Bit-level comparisons against the PyTorch reference (read-only import)."""

    def test_beta_schedules_match(self, reference_modules):
        ref = reference_modules
        for T in (100, 1000):
            np.testing.assert_allclose(
                ops.linear_beta_schedule(T), ref.utils.linear_beta_schedule(T), rtol=1e-12
            )
            np.testing.assert_allclose(
                ops.cosine_beta_schedule(T), ref.utils.cosine_beta_schedule(T), rtol=1e-10
            )

    def test_gaussian_likelihood_matches(self, reference_modules):
        ref = reference_modules
        torch = ref.torch
        rng = np.random.RandomState(1)
        x = rng.randn(2, 4, 4, 8).astype(np.float32) * 2
        loc = rng.randn(2, 4, 4, 8).astype(np.float32)
        scale = (rng.rand(2, 4, 4, 8) + 0.1).astype(np.float32)
        got = np.asarray(ops.gaussian_interval_likelihood(jnp.array(x), jnp.array(loc), jnp.array(scale)))
        # reference works in NCHW
        t = lambda a: torch.tensor(np.transpose(a, (0, 3, 1, 2)))
        dist = ref.utils.NormalDistribution(t(loc), t(scale))
        want = dist.likelihood(t(x)).numpy()
        np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)), rtol=1e-5, atol=1e-8)

    def test_flexible_prior_matches(self, reference_modules):
        ref = reference_modules
        torch = ref.torch
        C = 8
        torch.manual_seed(0)
        ref_prior = ref.nc.FlexiblePrior(channels=C)

        prior = ops.FlexiblePrior(channels=C)
        params = prior.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, C)), method=ops.FlexiblePrior.likelihood
        )
        # copy reference weights into our layout
        p = dict(params["params"])
        sd = ref_prior.state_dict()
        for i in range(4):
            w = sd[f"affine.{i}.weight"].numpy()  # (C,1,1,in,out)
            b = sd[f"affine.{i}.bias"].numpy()  # (C,1,1,1,out)
            p[f"affine_{i}_w"] = jnp.array(w[:, 0, 0])
            p[f"affine_{i}_b"] = jnp.array(b[:, 0, 0, 0])
            if i < 3:
                a = sd[f"a.{i}"].numpy()
                p[f"gate_{i}_a"] = jnp.array(a[:, 0, 0, 0])
        p["medians"] = jnp.array(sd["_medians"].numpy().ravel())
        params = {"params": p}

        rng = np.random.RandomState(2)
        x = (rng.randn(2, 4, 4, C) * 5).astype(np.float32)
        got_lik = np.asarray(prior.apply(params, jnp.array(x), method=ops.FlexiblePrior.likelihood))
        want_lik = (
            ref_prior.likelihood(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).detach().numpy()
        )
        np.testing.assert_allclose(got_lik, np.transpose(want_lik, (0, 2, 3, 1)), rtol=1e-4, atol=1e-7)

        got_ml = float(prior.apply(params, method=ops.FlexiblePrior.median_loss))
        want_ml = float(ref_prior.get_extraloss().detach())
        assert got_ml == pytest.approx(want_ml, rel=1e-5)


class TestPriorSampling:
    def _prior(self, C=4):
        prior = ops.FlexiblePrior(channels=C)
        params = prior.init(
            jax.random.PRNGKey(3), jnp.zeros((1, 2, 2, C)), method=ops.FlexiblePrior.likelihood
        )
        return prior, params

    def test_icdf_inverts_cdf(self):
        prior, params = self._prior()
        x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 3, 4).astype(np.float32) * 3)
        p = prior.apply(params, x, method=ops.FlexiblePrior.cdf)
        x_rec = prior.apply(params, p, method=ops.FlexiblePrior.icdf)
        np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-3)

    def test_pdf_nonnegative_matches_fd(self):
        prior, params = self._prior()
        x = jnp.asarray(np.linspace(-4, 4, 8, dtype=np.float32).reshape(1, 2, 1, 4))
        pdf = np.asarray(prior.apply(params, x, method=ops.FlexiblePrior.pdf))
        assert (pdf >= 0).all()
        eps = 1e-3
        hi = np.asarray(prior.apply(params, x + eps, method=ops.FlexiblePrior.cdf))
        lo = np.asarray(prior.apply(params, x - eps, method=ops.FlexiblePrior.cdf))
        np.testing.assert_allclose(pdf, (hi - lo) / (2 * eps), atol=1e-3)

    def test_sample_median_matches_icdf_half(self):
        prior, params = self._prior()
        s = prior.apply(
            params, jax.random.PRNGKey(7), (4096, 1, 1, 4), method=ops.FlexiblePrior.sample
        )
        med = np.median(np.asarray(s).reshape(-1, 4), axis=0)
        want = np.asarray(
            prior.apply(params, jnp.full((1, 1, 1, 4), 0.5), method=ops.FlexiblePrior.icdf)
        ).ravel()
        np.testing.assert_allclose(med, want, atol=0.25)
