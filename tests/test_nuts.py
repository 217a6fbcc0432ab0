"""NUTS sampler: correctness on analytic targets + flagship smoke.

Same test strategy as tests/test_hmc.py (moments on a Gaussian target,
determinism, divergence accounting); plus NUTS-specific properties —
trajectory depth adapts to the target scale, and the iterative
sub-U-turn bookkeeping (checkpoint index bit tricks) is exercised
directly against a reference implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfit_python_tpu.sampling.nuts import (
    init_nuts, nuts_step, run_nuts, warmup_nuts)


def _ref_ckpt_idxs(n):
    """Readable oracle for _leaf_to_ckpt: popcount of n>>1 and the count
    of trailing one bits of n."""
    idx_max = bin(n >> 1).count("1")
    trail = len(bin(n)[2:]) - len(bin(n)[2:].rstrip("1"))
    return idx_max - trail + 1, idx_max


class TestCheckpointIndexing:
    def test_leaf_to_ckpt_matches_bit_oracle(self):
        from lfit_python_tpu.sampling.nuts import _leaf_to_ckpt

        f = jax.jit(_leaf_to_ckpt)
        for n in range(64):
            lo, hi = f(jnp.int32(n))
            rlo, rhi = _ref_ckpt_idxs(n)
            assert (int(lo), int(hi)) == (rlo, rhi), f"leaf {n}"


class TestGaussianTarget:
    COV = np.array([[1.0, 0.8], [0.8, 2.0]])

    def ln_prob(self, x):
        prec = jnp.asarray(np.linalg.inv(self.COV))
        return -0.5 * x @ prec @ x

    def _tuned_state(self, key=0, n_chains=64, n_warmup=200):
        state = init_nuts(jax.random.PRNGKey(key), jnp.zeros(2),
                          0.5 * jnp.ones(2), self.ln_prob, n_chains)
        return warmup_nuts(state, self.ln_prob, n_warmup, max_depth=6)

    def test_moments_and_depth(self):
        state = self._tuned_state()
        state, chain, chain_lp, astat, div, depth = run_nuts(
            state, self.ln_prob, 300, max_depth=6)
        assert chain.shape == (300, 64, 2)
        flat = chain[50:].reshape(-1, 2)
        np.testing.assert_allclose(flat.mean(axis=0), [0.0, 0.0], atol=0.1)
        np.testing.assert_allclose(np.cov(flat.T), self.COV,
                                   rtol=0.25, atol=0.15)
        # dual averaging targets 0.8 mean leaf accept probability
        assert 0.6 < astat.mean() <= 1.0
        assert div.mean() < 0.05
        # a well-tuned 2-D Gaussian needs short trajectories, far from
        # the max_depth=6 budget, but more than a single doubling overall
        assert 0.5 < depth.mean() < 5.5
        assert np.isfinite(chain_lp).all()

    def test_warmup_adapts_metric(self):
        state = self._tuned_state()
        ratio = float(state.inv_mass[1] / state.inv_mass[0])
        assert 1.2 < ratio < 3.5
        assert float(state.step_size) > 1e-3

    def test_deterministic_given_key(self):
        s1 = self._tuned_state(key=3, n_chains=16, n_warmup=50)
        s2 = self._tuned_state(key=3, n_chains=16, n_warmup=50)
        _, c1, _, _, _, _ = run_nuts(s1, self.ln_prob, 20, max_depth=6)
        _, c2, _, _, _, _ = run_nuts(s2, self.ln_prob, 20, max_depth=6)
        np.testing.assert_array_equal(c1, c2)


class TestAnisotropicDepth:
    """NUTS' point: trajectory length adapts.  With a unit metric on a
    badly scaled Gaussian the step size is forced small by the stiff
    axis, so exploring the wide axis needs many doublings — mean depth
    must exceed what the well-conditioned target above used."""

    def ln_prob(self, x):
        scales = jnp.asarray([0.01, 1.0])
        return -0.5 * jnp.sum((x / scales) ** 2)

    def test_depth_grows_with_condition_number(self):
        state = init_nuts(jax.random.PRNGKey(0), jnp.zeros(2),
                          jnp.asarray([0.01, 1.0]), self.ln_prob, 32,
                          step_size=5e-3)
        # keep the unit-ish metric: no warmup; fixed small step
        state = state._replace(inv_mass=jnp.ones(2))
        state, chain, _, astat, div, depth = run_nuts(
            state, self.ln_prob, 50, max_depth=8)
        assert depth.mean() > 3.0
        assert np.isfinite(chain).all()


class TestConstrainedTarget:
    """Hard support boundary: leapfrog steps that leave the box are
    divergences — the trajectory stops, positions never go NaN."""

    def ln_prob(self, x):
        inside = jnp.all((x > -1.0) & (x < 1.0))
        return jnp.where(inside, -0.5 * jnp.sum(x * x), -jnp.inf)

    def test_stays_finite_inside_support(self):
        state = init_nuts(jax.random.PRNGKey(1), jnp.zeros(3),
                          0.1 * jnp.ones(3), self.ln_prob, 32,
                          step_size=0.2)
        state, chain, chain_lp, astat, div, depth = run_nuts(
            state, self.ln_prob, 100, max_depth=6)
        assert np.isfinite(chain).all()
        assert np.isfinite(chain_lp).all()
        assert (np.abs(chain) < 1.0).all()
        assert astat.mean() > 0.2             # still moves despite walls


@pytest.mark.slow
class TestFlagshipPosterior:
    def test_nuts_on_cv_posterior(self):
        """NUTS steps the real hierarchical CV posterior: finite, moves
        — gradient-driven adaptive-trajectory sampling of the flagship
        model, a capability the reference structurally cannot have."""
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
        state = init_nuts(jax.random.PRNGKey(0), start, scatter, ln_prob,
                          n_chains=4, step_size=1e-4)
        state, chain, chain_lp, astat, div, depth = run_nuts(
            state, ln_prob, 5, max_depth=4, chunk_size=5)
        assert np.isfinite(chain).all()
        assert np.isfinite(chain_lp).all()
        assert not np.array_equal(chain[0], chain[-1])   # chains move
