"""The five BASELINE.json benchmark configurations as (tiny) integration
tests (SURVEY.md §4 "End-to-end"), each exercising the full stack:
synthetic data -> hierarchical tree -> posterior -> on-device sampler.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# the five BASELINE configs are the slow integration tier (60-160s each)
pytestmark = pytest.mark.slow

from lfit_python_tpu.examples import build_model
from lfit_python_tpu.models.cv import CVConfig
from lfit_python_tpu.models.likelihood import make_ln_prob
from lfit_python_tpu.sampling.ensemble import init_walkers, run_sampler

# tiny element grids: these tests exercise wiring, not model fidelity
_TINY = CVConfig(n_disc_rad=5, n_disc_az=8, n_spot=8,
                 n_donor_lat=6, n_donor_lon=8)


def _short_fit(model, n_walkers=16, n_steps=6, batch_fn=None, state_tf=None):
    cm = model.compile()
    ln_prob = make_ln_prob(cm, config=_TINY)
    start = jnp.asarray(cm.var_start())
    scatter = 0.002 * jnp.maximum(jnp.abs(start), 0.01)
    state = init_walkers(
        jax.random.PRNGKey(0), start, scatter, ln_prob, n_walkers)
    if state_tf is not None:
        state, batch_fn = state_tf(state, ln_prob)
    state, chain, lp, acc = run_sampler(
        state, ln_prob, n_steps, batch_fn=batch_fn)
    assert np.isfinite(lp).all()
    assert chain.shape == (n_steps, n_walkers, cm.n_var)
    assert acc.mean() > 0.02
    return cm, chain, lp


class TestBaselineConfigs:
    def test_config1_single_simple_chi2(self):
        """Single eclipse, simple spot, chi^2 (BASELINE config 1)."""
        m = build_model(n_eclipses=1, complex_spot=False, n_points=40)
        _short_fit(m)

    def test_config2_complex_spot(self):
        """Complex bright-spot parameterisation (BASELINE config 2)."""
        m = build_model(n_eclipses=1, complex_spot=True, n_points=40)
        cm, chain, lp = _short_fit(m)
        assert "tilt_ecl0" in cm.var_names()

    def test_config3_hierarchical_five_eclipses(self):
        """Core (q, dphi, rwd) shared across 5 eclipses, 2 bands
        (BASELINE config 3)."""
        m = build_model(n_eclipses=5, complex_spot=False, n_points=24,
                        bands=("g", "r"))
        cm, chain, lp = _short_fit(m, n_walkers=16, n_steps=4)
        # exactly one shared q across all eclipses
        assert sum(1 for n in cm.var_names() if n.startswith("q_")) == 1
        assert cm.n_eclipses == 5

    def test_config4_gp_flickering(self):
        """Celerite-style GP flickering likelihood (BASELINE config 4)."""
        m = build_model(n_eclipses=1, use_gp=True, n_points=40)
        cm, chain, lp = _short_fit(m, n_walkers=16, n_steps=4)
        assert "ln_tau_gp_ecl0" in cm.var_names()

    def test_config5_production_shape_sharded(self):
        """10 eclipses x complex x GP, walkers sharded over the 8-device
        mesh (BASELINE config 5, tiny shapes)."""
        from lfit_python_tpu.parallel.mesh import (
            shard_state,
            sharded_batch_ln_prob,
            walker_mesh,
        )

        m = build_model(n_eclipses=10, complex_spot=True, use_gp=True,
                        n_points=12, bands=("g", "r", "i"))

        def tf(state, ln_prob):
            mesh = walker_mesh()
            return (shard_state(state, mesh),
                    sharded_batch_ln_prob(ln_prob, mesh))

        cm, chain, lp = _short_fit(m, n_walkers=16, n_steps=2, state_tf=tf)
        assert cm.n_eclipses == 10
        assert cm.any_complex and cm.any_gp
