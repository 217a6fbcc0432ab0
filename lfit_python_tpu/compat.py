"""Reference-API compatibility layer.

Drop-in equivalents of the surfaces a ``lfit_python`` user touches
directly (SURVEY.md §1 public interfaces), mapped onto this framework:

  * ``lfit.CV`` / ``cv.calcFlux(pars, phase, width)`` with the component
    curves ``cv.ywd / cv.ydisc / cv.yspot / cv.ysec`` (the Cython binding
    ``lfit.pyx`` [R]);
  * ``mcmc_utils``-style helpers: ``readchain``, ``readflatchain``,
    ``flatchain``, ``thumbPlot``, ``rebin``, ``Param``, ``Prior``;
  * ``dynasty_par_vals`` / ``dynasty_par_names`` flat-vector access on the
    compiled model tree (``Model`` base class [R]).

These are thin wrappers: new code should use the native APIs.
"""

from __future__ import annotations

import numpy as np

from .models.cv import CVConfig, cv_fluxes
from .models.priors import Param, Prior  # noqa: F401  (re-exports)
from .utils import chains as _chains

__all__ = [
    "CV", "Param", "Prior",
    "readchain", "readflatchain", "flatchain", "thumbPlot", "rebin",
    "dynasty_par_vals", "dynasty_par_names",
]


class CV:
    """Reference-compatible CV model object (``lfit.CV`` [R]).

    >>> cv = CV(pars)                     # 14 or 18 parameters
    >>> total = cv.calcFlux(pars, phase)  # or (pars, phase, width)
    >>> cv.ywd, cv.ydisc, cv.yspot, cv.ysec   # component curves

    The reference object caches geometry between calls; here each
    ``calcFlux`` is one fused JAX evaluation (geometry recomputed on
    device — see models/cv.py docstring), so the object only stores the
    latest component curves.  The jitted evaluator is cached per
    (config, phase-count, has-width) so the reference's looped access
    pattern (one ``calcFlux`` per walker per step) pays tracing exactly
    once instead of re-tracing every call.
    """

    _jit_cache: dict = {}

    def __init__(self, pars, config: CVConfig | None = None):
        pars = np.asarray(pars, float)
        if config is None:
            config = CVConfig(complex_spot=pars.size >= 18)
        self.config = config
        self.ywd = self.ydisc = self.yspot = self.ysec = None

    def _evaluator(self, n_phase, has_width):
        import jax

        key = (self.config, n_phase, has_width)
        fn = CV._jit_cache.get(key)
        if fn is None:
            cfg = self.config
            if has_width:
                fn = jax.jit(lambda p, ph, w: cv_fluxes(p, ph, w, cfg))
            else:
                fn = jax.jit(lambda p, ph: cv_fluxes(p, ph, None, cfg))
            CV._jit_cache[key] = fn
        return fn

    def calcFlux(self, pars, phase, width=None):
        import jax.numpy as jnp

        pars = jnp.asarray(np.asarray(pars, float))
        phase = jnp.asarray(np.asarray(phase, float))
        fn = self._evaluator(phase.shape[0], width is not None)
        if width is None:
            out = fn(pars, phase)
        else:
            out = fn(pars, phase, jnp.asarray(np.asarray(width, float)))
        self.ywd = np.asarray(out.ywd)
        self.ydisc = np.asarray(out.ydisc)
        self.yspot = np.asarray(out.yspot)
        self.ysec = np.asarray(out.ysec)
        return np.asarray(out.total)


def readchain(path):
    """(chain (n_steps, W, D), lnp, names) — reference ``readchain`` [R]."""
    return _chains.read_chain(path)


def readflatchain(path, discard=0, thin=1):
    chain, _, names = _chains.read_chain(path)
    return _chains.flatchain(chain, discard, thin), names


flatchain = _chains.flatchain
rebin = _chains.rebin


def thumbPlot(flat, names, path=None, **kw):
    """Corner plot (reference ``thumbPlot`` [R])."""
    from .utils.plotting import corner_plot

    return corner_plot(np.asarray(flat), list(names), path, **kw)


def dynasty_par_vals(model):
    """Flat parameter vector of a compiled model (variable subset), in the
    reference's depth-first order (``Model.dynasty_par_vals`` [R])."""
    return model.var_start()


def dynasty_par_names(model):
    """Label-suffixed names matching :func:`dynasty_par_vals`
    (``Model.dynasty_par_names`` [R])."""
    return model.var_names()
