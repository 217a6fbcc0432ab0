"""Parallel-tempering sampler tests: multimodal target the plain ensemble
struggles with; cold chain must find both modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfit_python_tpu.sampling.pt import (
    default_beta_ladder,
    init_pt,
    pt_step,
    run_pt,
)


def _prior(x):
    inside = jnp.all(jnp.abs(x) < 10.0)
    return jnp.where(inside, 0.0, -jnp.inf)


def _bimodal_like(x):
    # two well-separated modes at +-4
    a = -0.5 * jnp.sum((x - 4.0) ** 2) / 0.25
    b = -0.5 * jnp.sum((x + 4.0) ** 2) / 0.25
    return jnp.logaddexp(a, b)


class TestPT:
    def test_ladder(self):
        betas = np.asarray(default_beta_ladder(4))
        assert betas[0] == 1.0
        assert np.all(np.diff(betas) < 0)

    def test_state_shapes_and_step(self):
        state = init_pt(jax.random.PRNGKey(0), jnp.zeros(2),
                        0.5 * jnp.ones(2), _prior, _bimodal_like,
                        n_walkers=16, n_temps=3)
        assert state.positions.shape == (3, 16, 2)
        s2 = pt_step(state, _prior, _bimodal_like)
        assert int(s2.step) == 1
        assert bool(jnp.all(jnp.isfinite(s2.ln_like)))
        # ln_prior/ln_like bookkeeping stays consistent with positions
        ll = jax.vmap(jax.vmap(_bimodal_like))(s2.positions)
        np.testing.assert_allclose(np.asarray(ll), np.asarray(s2.ln_like),
                                   rtol=1e-6)

    def test_cold_chain_visits_both_modes(self):
        # start all walkers in ONE mode; swaps with hot rungs must carry
        # the cold chain across the barrier
        state = init_pt(jax.random.PRNGKey(1),
                        jnp.asarray([4.0]), jnp.asarray([0.3]),
                        _prior, _bimodal_like,
                        n_walkers=32, n_temps=5,
                        betas=jnp.asarray([1.0, 0.3, 0.1, 0.03, 0.01]))
        state, chain, lp = run_pt(state, _prior, _bimodal_like, 600)
        flat = chain[200:].reshape(-1)
        frac_neg = float(np.mean(flat < 0))
        assert 0.15 < frac_neg < 0.85   # both modes populated
