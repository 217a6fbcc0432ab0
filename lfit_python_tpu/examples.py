"""Canonical example models (the five BASELINE.json benchmark configs).

Synthetic data is generated from the forward model itself at known
parameters, so fits have a known ground truth.
"""

from __future__ import annotations

import numpy as np

from .models.cv import CVConfig, cv_fluxes
from .models.priors import Param, Prior
from .models.tree import EclipseSpec, HierarchicalModel, Lightcurve

__all__ = ["TRUE_PARAMS", "make_synthetic_lightcurve", "build_model"]

TRUE_PARAMS = {
    "wdFlux": 0.1, "dFlux": 0.05, "sFlux": 0.08, "rsFlux": 0.03,
    "q": 0.15, "dphi": 0.04, "rdisc": 0.44, "ulimb": 0.3, "rwd": 0.01,
    "scale": 0.02, "az": 160.0, "fis": 0.2, "dexp": 1.5, "phi0": 0.0,
    "exp1": 2.0, "exp2": 1.0, "tilt": 90.0, "yaw": 0.0,
}


def _p(name, start, prior, is_var=True):
    return Param(name, start, prior, is_var)


def _fixture_fluxes(pars, phases, complex_spot):
    """jit-cached CPU forward model for fixture generation (one compile
    per (complex_spot, n_points) shape per process)."""
    import functools

    import jax

    @functools.lru_cache(maxsize=None)
    def fn(cs):
        return jax.jit(lambda p, ph: cv_fluxes(
            p, ph, config=CVConfig(complex_spot=cs)).total)

    return fn(bool(complex_spot))(pars, phases)


def make_synthetic_lightcurve(n_points=100, noise=0.002, seed=0,
                              complex_spot=False, name="synth",
                              jitter=None):
    """Generate a light curve from TRUE_PARAMS (+ optional per-eclipse
    parameter jitter dict) with white noise.

    The forward-model evaluation is pinned to the host CPU backend:
    fixture generation must never touch the accelerator (in an x64
    process the parameter arrays are f64, and evaluating emulated-f64 on
    a TPU just to make throwaway synthetic data is both slow and the
    exact line a transient TPU-worker crash killed the round-2 bench
    artifact on).  CPU f64 is also the parity oracle, so fixtures are
    oracle-grade.
    """
    import jax
    import jax.numpy as jnp

    t = dict(TRUE_PARAMS)
    if jitter:
        t.update(jitter)
    order = ["wdFlux", "dFlux", "sFlux", "rsFlux", "q", "dphi", "rdisc",
             "ulimb", "rwd", "scale", "az", "fis", "dexp", "phi0"]
    if complex_spot:
        order += ["exp1", "exp2", "tilt", "yaw"]
    ph = np.linspace(-0.15, 0.15, n_points)
    cpu = jax.devices("cpu")[0]
    # committed-CPU inputs make the jitted evaluation run on the CPU
    # backend; jit (vs eager) matters because the forward model contains a
    # 4352-step stream scan that is minutes of op-by-op dispatch eagerly.
    # The inputs MUST go numpy -> CPU directly: jnp.asarray would place
    # them on the default (TPU) device and the TPU->CPU device_put then
    # blocks on an accelerator transfer (observed stalling >2 min through
    # the axon tunnel on this box).
    pars = jax.device_put(np.asarray([t[k] for k in order]), cpu)
    phj = jax.device_put(ph, cpu)
    flux = np.asarray(_fixture_fluxes(pars, phj, complex_spot))
    rng = np.random.default_rng(seed)
    return Lightcurve(ph, flux + noise * rng.standard_normal(n_points),
                      np.full(n_points, noise), name=name)


def default_eclipse_params(complex_spot=False, use_gp=False):
    t = TRUE_PARAMS
    params = {
        "dFlux": _p("dFlux", t["dFlux"], Prior("uniform", 0, 1)),
        "sFlux": _p("sFlux", t["sFlux"], Prior("uniform", 0, 1)),
        "rdisc": _p("rdisc", t["rdisc"], Prior("uniform", 0.2, 0.9)),
        "scale": _p("scale", t["scale"], Prior("log_uniform", 1e-4, 0.5)),
        "az": _p("az", t["az"], Prior("uniform", 50, 175)),
        "fis": _p("fis", t["fis"], Prior("uniform", 0, 1)),
        "dexp": _p("dexp", t["dexp"], Prior("uniform", 0, 3)),
        "phi0": _p("phi0", t["phi0"], Prior("uniform", -0.05, 0.05)),
    }
    if complex_spot:
        params.update({
            "exp1": _p("exp1", t["exp1"], Prior("uniform", 0.01, 5)),
            "exp2": _p("exp2", t["exp2"], Prior("uniform", 0.01, 5)),
            "tilt": _p("tilt", t["tilt"], Prior("uniform", 0, 180)),
            "yaw": _p("yaw", t["yaw"], Prior("uniform", -90, 90)),
        })
    if use_gp:
        params.update({
            "ln_ampin_gp": _p("ln_ampin_gp", -9.0, Prior("uniform", -25, 0)),
            "ln_ampout_gp": _p("ln_ampout_gp", -10.0, Prior("uniform", -25, 0)),
            "ln_tau_gp": _p("ln_tau_gp", -4.0, Prior("uniform", -12, 2)),
        })
    return params


def build_model(n_eclipses=1, complex_spot=False, use_gp=False,
                n_points=100, bands=("g",), noise=0.002):
    """Build a hierarchical model with synthetic data.

    ``complex_spot``/``use_gp`` may be bools or per-eclipse sequences.
    Eclipses are assigned round-robin to ``bands``.
    """
    t = TRUE_PARAMS
    if isinstance(complex_spot, bool):
        complex_spot = [complex_spot] * n_eclipses
    if isinstance(use_gp, bool):
        use_gp = [use_gp] * n_eclipses

    core = {
        "q": _p("q", t["q"], Prior("uniform", 0.03, 3.0)),
        "dphi": _p("dphi", t["dphi"], Prior("uniform", 0.01, 0.2)),
        "rwd": _p("rwd", t["rwd"], Prior("uniform", 0.0005, 0.1)),
    }
    band_params = {
        b: {
            "wdFlux": _p("wdFlux", t["wdFlux"], Prior("uniform", 0, 1)),
            "rsFlux": _p("rsFlux", t["rsFlux"], Prior("uniform", 0, 1)),
            "ulimb": _p("ulimb", t["ulimb"], Prior("gauss", 0.3, 0.05),
                        is_var=False),
        }
        for b in bands
    }
    eclipses = []
    for k in range(n_eclipses):
        lc = make_synthetic_lightcurve(
            n_points, noise=noise, seed=k, complex_spot=complex_spot[k],
            name=f"ecl{k}")
        eclipses.append(EclipseSpec(
            f"ecl{k}", bands[k % len(bands)], lc,
            default_eclipse_params(complex_spot[k], use_gp[k]),
            complex_spot=complex_spot[k], use_gp=use_gp[k]))
    return HierarchicalModel(core, band_params, eclipses)
