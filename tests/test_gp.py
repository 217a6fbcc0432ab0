"""GP solve vs dense Cholesky oracle (SURVEY.md §4 "GP tests")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfit_python_tpu.ops.gp import (
    matern32_cov,
    matern32_gp_ln_like,
    segmented_matern32_ln_like,
)


def dense_ln_like(t, y, yerr, sigma, rho):
    K = np.asarray(matern32_cov(jnp.asarray(t), sigma, rho))
    K = K + np.diag(np.asarray(yerr) ** 2)
    n = len(t)
    L = np.linalg.cholesky(K)
    z = np.linalg.solve(L, y)
    return float(
        -0.5 * z @ z - np.log(np.diag(L)).sum() - 0.5 * n * np.log(2 * np.pi))


@pytest.fixture
def series():
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 1, 120))
    y = np.sin(8 * t) * 0.1 + 0.02 * rng.standard_normal(120)
    yerr = np.full(120, 0.02)
    return t, y, yerr


class TestMatern32:
    def test_matches_dense_cholesky(self, series):
        t, y, yerr = series
        for sigma, rho in [(0.1, 0.2), (0.03, 0.05), (1.0, 1.0)]:
            fast = float(matern32_gp_ln_like(
                jnp.asarray(t), jnp.asarray(y), jnp.asarray(yerr),
                sigma, rho))
            dense = dense_ln_like(t, y, yerr, sigma, rho)
            assert fast == pytest.approx(dense, rel=1e-8)

    def test_mask_ignores_padding(self, series):
        t, y, yerr = series
        tp = np.concatenate([t, t[-1] + np.arange(1, 11) * 0.01])
        yp = np.concatenate([y, np.zeros(10)])
        ep = np.concatenate([yerr, np.ones(10)])
        mask = np.concatenate([np.ones(120, bool), np.zeros(10, bool)])
        full = float(matern32_gp_ln_like(
            jnp.asarray(t), jnp.asarray(y), jnp.asarray(yerr), 0.1, 0.2))
        padded = float(matern32_gp_ln_like(
            jnp.asarray(tp), jnp.asarray(yp), jnp.asarray(ep), 0.1, 0.2,
            mask=jnp.asarray(mask)))
        assert padded == pytest.approx(full, rel=1e-10)

    def test_segmented_equals_independent_gps(self, series):
        t, y, yerr = series
        # three segments with different amplitudes (out / in / out)
        seg = (t > 0.4) & (t < 0.6)
        s_out, s_in = 0.1, 0.02
        rho = 0.15
        sigma2 = np.where(seg, s_in**2, s_out**2)
        reset = np.zeros(len(t), bool)
        reset[1:] = seg[1:] != seg[:-1]
        c = np.sqrt(3.0) / rho
        fast = float(segmented_matern32_ln_like(
            jnp.asarray(t), jnp.asarray(y), jnp.asarray(yerr),
            jnp.asarray(sigma2), c, reset=jnp.asarray(reset)))
        # oracle: three independent dense GPs
        bounds = [0] + list(np.nonzero(reset)[0]) + [len(t)]
        dense = 0.0
        for a, b in zip(bounds[:-1], bounds[1:]):
            s = np.sqrt(sigma2[a])
            dense += dense_ln_like(t[a:b], y[a:b], yerr[a:b], s, rho)
        assert fast == pytest.approx(dense, rel=1e-8)

    def test_vmappable_over_walkers(self, series):
        t, y, yerr = series
        sigmas = jnp.asarray([0.05, 0.1, 0.2])
        lls = jax.vmap(
            lambda s: matern32_gp_ln_like(
                jnp.asarray(t), jnp.asarray(y), jnp.asarray(yerr), s, 0.2)
        )(sigmas)
        assert lls.shape == (3,)
        assert np.isfinite(np.asarray(lls)).all()

    def test_prefers_true_hyperparams(self):
        # data drawn from the GP: likelihood should peak near the truth
        rng = np.random.default_rng(1)
        t = np.linspace(0, 1, 200)
        K = np.asarray(matern32_cov(jnp.asarray(t), 0.1, 0.1))
        y = np.linalg.cholesky(K + 1e-12 * np.eye(200)) @ rng.standard_normal(200)
        yerr = np.full(200, 1e-3)
        ll_true = float(matern32_gp_ln_like(
            jnp.asarray(t), jnp.asarray(y), jnp.asarray(yerr), 0.1, 0.1))
        for s, r in [(0.5, 0.1), (0.02, 0.1), (0.1, 0.9), (0.1, 0.01)]:
            ll = float(matern32_gp_ln_like(
                jnp.asarray(t), jnp.asarray(y), jnp.asarray(yerr), s, r))
            assert ll_true > ll


class TestGPEclipseLikelihood:
    def test_gp_model_posterior_finite_and_sensitive(self):
        from lfit_python_tpu.examples import build_model
        from lfit_python_tpu.models.likelihood import make_ln_prob

        m = build_model(n_eclipses=1, use_gp=True, n_points=60).compile()
        ln_prob = make_ln_prob(m)
        v0 = jnp.asarray(m.var_start())
        lp0 = float(ln_prob(v0))
        assert np.isfinite(lp0)
        # cranking the out-of-eclipse amplitude way up must cost likelihood
        names = m.var_names()
        v1 = np.asarray(v0).copy()
        v1[names.index("ln_ampout_gp_ecl0")] = -1.0
        lp1 = float(ln_prob(jnp.asarray(v1)))
        assert lp0 > lp1
