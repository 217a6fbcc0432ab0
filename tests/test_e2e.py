"""End-to-end integration: synthetic single-eclipse fit (BASELINE config 1).

Generates a light curve from known parameters, builds the hierarchical
model, and runs a short on-device MCMC — the miniature of the five
BASELINE.json configs (SURVEY.md §4 "End-to-end")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfit_python_tpu.models.cv import CVConfig, cv_fluxes

_CFG = CVConfig(n_disc_rad=8, n_disc_az=12, n_spot=12,
                n_donor_lat=8, n_donor_lon=12)
from lfit_python_tpu.models.likelihood import make_ln_prob_parts
from lfit_python_tpu.models.tree import Lightcurve
from lfit_python_tpu.sampling.ensemble import init_walkers, run_sampler

from test_priors_tree import make_tiny_model


TRUE = {
    "wdFlux": 0.1, "dFlux": 0.05, "sFlux": 0.08, "rsFlux": 0.03,
    "q": 0.15, "dphi": 0.04, "rdisc": 0.44, "ulimb": 0.3, "rwd": 0.01,
    "scale": 0.02, "az": 160.0, "fis": 0.2, "dexp": 1.5, "phi0": 0.0,
}


def synth_lightcurve(seed=0, n=80, noise=0.002):
    pars = jnp.asarray([
        TRUE["wdFlux"], TRUE["dFlux"], TRUE["sFlux"], TRUE["rsFlux"],
        TRUE["q"], TRUE["dphi"], TRUE["rdisc"], TRUE["ulimb"], TRUE["rwd"],
        TRUE["scale"], TRUE["az"], TRUE["fis"], TRUE["dexp"], TRUE["phi0"],
    ])
    ph = np.linspace(-0.12, 0.12, n)
    flux = np.asarray(cv_fluxes(pars, jnp.asarray(ph), config=_CFG).total)
    rng = np.random.default_rng(seed)
    return Lightcurve(ph, flux + noise * rng.standard_normal(n),
                      np.full(n, noise), name="synth")


@pytest.fixture(scope="module")
def model_and_fns():
    m = make_tiny_model(n_ecl=1, complex_flags=(False,), gp_flags=(False,))
    m.eclipses[0].lightcurve = synth_lightcurve()
    cm = m.compile()
    ln_prior, ln_like, ln_prob = make_ln_prob_parts(cm, config=_CFG)
    return cm, ln_prior, ln_like, jax.jit(ln_prob)


class TestPosterior:
    def test_finite_at_truth(self, model_and_fns):
        cm, _, _, ln_prob = model_and_fns
        lp = float(ln_prob(jnp.asarray(cm.var_start())))
        assert np.isfinite(lp)

    def test_truth_beats_perturbed(self, model_and_fns):
        cm, _, _, ln_prob = model_and_fns
        v0 = cm.var_start()
        lp0 = float(ln_prob(jnp.asarray(v0)))
        v1 = v0.copy()
        names = cm.var_names()
        v1[names.index("q_core")] = 0.3          # wrong q
        v1[names.index("dphi_core")] = 0.06      # wrong width
        lp1 = float(ln_prob(jnp.asarray(v1)))
        assert lp0 > lp1 + 100.0

    def test_prior_rejects_unphysical(self, model_and_fns):
        cm, ln_prior, _, _ = model_and_fns
        names = cm.var_names()
        # (q, dphi) pair no inclination <= 90 deg can produce: physical -inf
        v = cm.var_start()
        v[names.index("q_core")] = 0.031
        v[names.index("dphi_core")] = 0.19
        assert float(ln_prior(jnp.asarray(v))) == -np.inf
        # white dwarf bigger than the disc: physical -inf.  q = 2.9 pulls
        # xl1 down to ~0.38 so rdisc = 0.2001*xl1 ~ 0.077 < rwd = 0.099,
        # while every box prior is still satisfied.
        v2 = cm.var_start()
        v2[names.index("q_core")] = 2.9
        v2[names.index("rwd_core")] = 0.099
        v2[names.index("rdisc_ecl0")] = 0.2001
        assert float(ln_prior(jnp.asarray(v2))) == -np.inf

    def test_gradient_exists(self, model_and_fns):
        # not used by the stretch move, but the posterior is differentiable
        # (implicit-function-theorem tangents on every geometry root-find)
        # so HMC/NUTS-class samplers are possible — a capability the
        # scalar-C++ reference cannot offer
        cm, _, _, ln_prob = model_and_fns
        g = np.asarray(jax.grad(lambda v: ln_prob(v))(
            jnp.asarray(cm.var_start())))
        assert np.isfinite(g).all()
        # gradient is not trivially zero: data pulls on the flux params
        assert np.max(np.abs(g)) > 1e-3

    def test_gradient_matches_finite_differences(self, model_and_fns):
        """IFT tangents vs central finite differences (f64) on a spread of
        parameter types: flux scales, geometry roots (q, dphi, rwd), and
        the smeared-phase offset phi0."""
        cm, _, _, ln_prob = model_and_fns
        v0 = jnp.asarray(cm.var_start())
        g = np.asarray(jax.grad(lambda v: ln_prob(v))(v0))
        names = cm.var_names()
        f = lambda v: float(ln_prob(v))
        for pname in ["wdFlux_g", "q_core", "dphi_core", "rwd_core",
                      "rdisc_ecl0", "phi0_ecl0"]:
            i = names.index(pname)
            h = 1e-6 * max(abs(float(v0[i])), 1e-3)
            e = jnp.zeros_like(v0).at[i].set(h)
            fd = (f(v0 + e) - f(v0 - e)) / (2.0 * h)
            scale = max(abs(fd), abs(g[i]), 1e-6)
            assert abs(g[i] - fd) / scale < 5e-3, (
                f"{pname}: grad {g[i]:.6g} vs FD {fd:.6g}")


@pytest.fixture(scope="module")
def gp_model_and_fns():
    """GP twin of ``model_and_fns`` (round-4 VERDICT #1c): the NaN-grad
    prior bug shipped invisibly because no test took jax.grad through a
    GP-flagged ln_prob — every gradient test pinned gp_flags=(False,)."""
    m = make_tiny_model(n_ecl=1, complex_flags=(False,), gp_flags=(True,))
    m.eclipses[0].lightcurve = synth_lightcurve()
    cm = m.compile()
    ln_prior, ln_like, ln_prob = make_ln_prob_parts(cm, config=_CFG)
    return cm, ln_prior, ln_like, jax.jit(ln_prob)


class TestGPPosteriorGradient:
    def test_finite_at_truth(self, gp_model_and_fns):
        cm, _, _, ln_prob = gp_model_and_fns
        assert np.isfinite(float(ln_prob(jnp.asarray(cm.var_start()))))

    def test_gradient_exists_including_gp_hypers(self, gp_model_and_fns):
        cm, _, _, ln_prob = gp_model_and_fns
        g = np.asarray(jax.grad(lambda v: ln_prob(v))(
            jnp.asarray(cm.var_start())))
        assert np.isfinite(g).all(), dict(
            zip(cm.var_names(), g))
        # the GP hyperparameters really pull (non-zero gradient)
        names = cm.var_names()
        for pname in ["ln_ampin_gp_ecl0", "ln_ampout_gp_ecl0",
                      "ln_tau_gp_ecl0"]:
            assert abs(g[names.index(pname)]) > 1e-8, pname

    def test_gradient_matches_finite_differences_gp(self, gp_model_and_fns):
        """FD-vs-IFT through the segmented Matern-3/2 scan AND the WD
        contact-extension Newton, covering the three GP hyperparameters
        plus the geometry roots they depend on (dphi, rwd)."""
        cm, _, _, ln_prob = gp_model_and_fns
        v0 = jnp.asarray(cm.var_start())
        g = np.asarray(jax.grad(lambda v: ln_prob(v))(v0))
        names = cm.var_names()
        f = lambda v: float(ln_prob(v))
        for pname in ["ln_ampin_gp_ecl0", "ln_ampout_gp_ecl0",
                      "ln_tau_gp_ecl0", "q_core", "dphi_core", "rwd_core",
                      "wdFlux_g"]:
            i = names.index(pname)
            h = 1e-6 * max(abs(float(v0[i])), 1e-3)
            e = jnp.zeros_like(v0).at[i].set(h)
            fd = (f(v0 + e) - f(v0 - e)) / (2.0 * h)
            scale = max(abs(fd), abs(g[i]), 1e-6)
            assert abs(g[i] - fd) / scale < 5e-3, (
                f"{pname}: grad {g[i]:.6g} vs FD {fd:.6g}")


class TestShortMCMC:
    @pytest.mark.slow
    def test_sampler_moves_and_improves(self, model_and_fns):
        cm, _, _, ln_prob = model_and_fns
        start = jnp.asarray(cm.var_start())
        scatter = 0.003 * jnp.maximum(jnp.abs(start), 0.01)
        state = init_walkers(
            jax.random.PRNGKey(42), start, scatter, ln_prob, 32)
        lp_init_max = float(jnp.max(state.log_prob))
        state, chain, chain_lp, acc = run_sampler(
            state, ln_prob, 30, chunk_size=15)
        assert chain.shape == (30, 32, cm.n_var)
        assert np.isfinite(chain_lp).all()
        assert 0.05 < acc.mean() <= 1.0
        # walkers actually move, and the ensemble stays near the posterior
        # mode (downhill accepts are legal, so no monotonicity assertion)
        assert not np.array_equal(chain[0], chain[-1])
        assert float(np.max(chain_lp)) > lp_init_max - 50.0
