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


class TestChangepoints:
    def test_extension_matches_contact_bisection(self):
        """The GP changepoints sit at the WD limb's first/last contacts:
        dphi/2 + ext must solve d(phi) = rwd (the phase where the limb
        clears the terminator), verified against a direct bisection of the
        f64 origin shadow distance (SURVEY.md §2 "GP eclipse nodes")."""
        from lfit_python_tpu.models.likelihood import wd_contact_extension
        from lfit_python_tpu.roche.geometry import (
            findi, l1_potential, origin_shadow_distance, xl1)

        for q, dphi, rwd in [(0.15, 0.04, 0.01), (0.35, 0.07, 0.02),
                             (0.08, 0.025, 0.005)]:
            x1 = xl1(q)
            pl1 = l1_potential(q, x1)
            incl = findi(q, dphi, x1, pl1)
            ext = float(wd_contact_extension(
                q, incl, dphi, rwd, x1, pl1, jnp.float64))
            assert ext > 0.0

            def d_of(phi):
                d, _ = origin_shadow_distance(
                    q, incl, jnp.asarray([phi]), x1, pl1)
                return float(d[0])

            lo, hi = 0.5 * dphi, 0.5 * dphi + 0.05
            for _ in range(60):
                mid = 0.5 * (lo + hi)
                if d_of(mid) < rwd:
                    lo = mid
                else:
                    hi = mid
            phi_last_contact = 0.5 * (lo + hi)
            # two Newton iterations vs exact root: agree to ~0.3% of ext
            assert 0.5 * dphi + ext == pytest.approx(
                phi_last_contact, abs=0.003 * ext)

    def test_gp_segments_widen_with_rwd(self):
        """A bigger WD widens the in-eclipse GP segment (ingress/egress
        last longer): likelihood must differ between rwd values through
        the changepoints alone."""
        from lfit_python_tpu.models.likelihood import wd_contact_extension
        from lfit_python_tpu.roche.geometry import findi, l1_potential, xl1

        q, dphi = 0.15, 0.04
        x1 = xl1(q)
        pl1 = l1_potential(q, x1)
        incl = findi(q, dphi, x1, pl1)
        e1 = float(wd_contact_extension(q, incl, dphi, 0.005, x1, pl1,
                                        jnp.float64))
        e2 = float(wd_contact_extension(q, incl, dphi, 0.02, x1, pl1,
                                        jnp.float64))
        assert e2 > e1 > 0.0
        # roughly proportional to rwd (sublinear: the terminator speeds up
        # away from the centre crossing, so 4x rwd gives a bit under 4x ext)
        assert 2.0 * e1 < e2 < 4.5 * e1


class TestGPEclipseLikelihood:
    @pytest.mark.slow
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
