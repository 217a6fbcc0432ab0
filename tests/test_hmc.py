"""HMC sampler: correctness on analytic targets + flagship-posterior smoke.

The reference family has no HMC counterpart (emcee stretch move only —
its posterior is not differentiable); these tests certify the capability
the IFT-differentiable posterior adds.  Statistical checks follow the
test strategy of tests/test_sampler.py (moments on a Gaussian target,
determinism given a key).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfit_python_tpu.sampling.hmc import (
    hmc_step, init_hmc, run_hmc, warmup_hmc)


class TestGaussianTarget:
    COV = np.array([[1.0, 0.8], [0.8, 2.0]])

    def ln_prob(self, x):
        prec = jnp.asarray(np.linalg.inv(self.COV))
        return -0.5 * x @ prec @ x

    def _tuned_state(self, key=0, n_chains=64, n_warmup=200):
        state = init_hmc(jax.random.PRNGKey(key), jnp.zeros(2),
                         0.5 * jnp.ones(2), self.ln_prob, n_chains)
        return warmup_hmc(state, self.ln_prob, n_warmup, n_leapfrog=8)

    def test_moments_and_acceptance(self):
        state = self._tuned_state()
        state, chain, chain_lp, acc, div = run_hmc(
            state, self.ln_prob, 300, n_leapfrog=8)
        assert chain.shape == (300, 64, 2)
        flat = chain[50:].reshape(-1, 2)
        np.testing.assert_allclose(flat.mean(axis=0), [0.0, 0.0], atol=0.1)
        np.testing.assert_allclose(np.cov(flat.T), self.COV,
                                   rtol=0.25, atol=0.15)
        # dual averaging targets 0.8 acceptance; allow a generous band
        assert 0.5 < acc.mean() <= 1.0
        assert div.mean() < 0.05
        assert np.isfinite(chain_lp).all()

    def test_warmup_adapts_metric(self):
        # anisotropic target: the adapted diagonal metric must pick up the
        # factor-2 variance ratio between the axes (within sampling noise)
        state = self._tuned_state()
        ratio = float(state.inv_mass[1] / state.inv_mass[0])
        assert 1.2 < ratio < 3.5
        assert float(state.step_size) > 1e-3

    def test_deterministic_given_key(self):
        s1 = self._tuned_state(key=3, n_chains=16, n_warmup=50)
        s2 = self._tuned_state(key=3, n_chains=16, n_warmup=50)
        _, c1, _, _, _ = run_hmc(s1, self.ln_prob, 20, n_leapfrog=8)
        _, c2, _, _, _ = run_hmc(s2, self.ln_prob, 20, n_leapfrog=8)
        np.testing.assert_array_equal(c1, c2)

    def test_step_counter_and_thin(self):
        state = self._tuned_state(n_chains=16, n_warmup=50)
        assert int(state.step) == 0          # warmup resets the counter
        state, chain, _, _, _ = run_hmc(state, self.ln_prob, 25,
                                        n_leapfrog=4, thin=10, chunk_size=8)
        assert chain.shape[0] == 2           # keeps at global steps 10, 20
        assert int(state.step) == 25


class TestConstrainedTarget:
    """Hard support boundary (uniform prior): leapfrog steps that leave
    the box are divergences — rejected, never NaN."""

    def ln_prob(self, x):
        inside = jnp.all((x > -1.0) & (x < 1.0))
        return jnp.where(inside, -0.5 * jnp.sum(x * x), -jnp.inf)

    def test_stays_finite_inside_support(self):
        state = init_hmc(jax.random.PRNGKey(1), jnp.zeros(3),
                         0.1 * jnp.ones(3), self.ln_prob, 32,
                         step_size=0.2)
        state, chain, chain_lp, acc, div = run_hmc(
            state, self.ln_prob, 100, n_leapfrog=8)
        assert np.isfinite(chain).all()
        assert np.isfinite(chain_lp).all()
        assert (np.abs(chain) < 1.0).all()
        assert acc.mean() > 0.2              # still moves despite the walls


@pytest.mark.slow
class TestFlagshipPosterior:
    def test_hmc_on_cv_posterior(self):
        """HMC steps the real hierarchical CV posterior: finite, moves,
        accepts — the capability test (grad-driven sampling of the
        flagship model)."""
        from lfit_python_tpu.examples import build_model
        from lfit_python_tpu.models.cv import CVConfig
        from lfit_python_tpu.models.likelihood import make_ln_prob

        model = build_model(n_eclipses=2, complex_spot=[False, True],
                            n_points=16, bands=("g",)).compile()
        tiny = CVConfig(n_disc_rad=5, n_disc_az=8, n_spot=8,
                        n_donor_lat=6, n_donor_lon=8)
        ln_prob = make_ln_prob(model, config=tiny, dtype=jnp.float64)
        start = jnp.asarray(model.var_start())
        scatter = 0.001 * jnp.maximum(jnp.abs(start), 0.01)
        state = init_hmc(jax.random.PRNGKey(0), start, scatter, ln_prob,
                         n_chains=4, step_size=1e-4)
        state, chain, chain_lp, acc, div = run_hmc(
            state, ln_prob, 5, n_leapfrog=4, chunk_size=5)
        assert np.isfinite(chain).all()
        assert np.isfinite(chain_lp).all()
        assert not np.array_equal(chain[0], chain[-1])   # chains move
        assert acc.mean() > 0.0
