"""Posterior evaluation: priors + physical validity + per-eclipse likelihood.

Reference call stack: ``Model.ln_prob -> ln_prior -> ln_like`` walking the
node tree per walker per step across a multiprocessing Pool (SURVEY.md §3.1).
Here the whole thing is one pure function of the sampled vector, vmapped
over walkers — the entire ensemble's posterior evaluates as a single XLA
program on device (BASELINE.json north_star).

Physical-validity priors (reference ``CVModel.py`` via ``trm.roche`` [R]):
  * (q, dphi) must admit an eclipse at some inclination <= 90 deg;
  * the white dwarf must fit inside the disc: rwd < rdisc;
  * the gas stream must actually reach the disc rim so the bright spot
    lies on the disc (rwd < r_spot <= rdisc).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..roche.geometry import findi, l1_potential, xl1
from .cv import CVConfig, cv_total_flux
from .priors import ln_prior_table
from .tree import CompiledModel

__all__ = ["PosteriorData", "make_ln_prob", "make_ln_prob_parts",
           "gp_flicker_ln_like", "wd_contact_extension"]


class PosteriorData(NamedTuple):
    """Device-resident stacked data for all eclipses."""
    phase: jax.Array   # (E, P)
    flux: jax.Array    # (E, P)
    err: jax.Array     # (E, P)
    width: jax.Array   # (E, P)
    mask: jax.Array    # (E, P) bool
    cv_idx: jax.Array  # (E, 18)
    cv_const: jax.Array
    gp_idx: jax.Array  # (E, 3)
    gp_mask: jax.Array  # (E,)


def _to_device_data(model: CompiledModel, dtype) -> PosteriorData:
    return PosteriorData(
        phase=jnp.asarray(model.data_phase, dtype),
        flux=jnp.asarray(model.data_flux, dtype),
        err=jnp.asarray(model.data_err, dtype),
        width=jnp.asarray(model.data_width, dtype),
        mask=jnp.asarray(model.data_mask),
        cv_idx=jnp.asarray(model.cv_idx),
        cv_const=jnp.asarray(model.cv_const, dtype),
        gp_idx=jnp.asarray(model.gp_idx),
        gp_mask=jnp.asarray(model.gp_mask),
    )


def wd_contact_extension(q, incl, dphi, rwd, x1, pl1, dtype):
    """Phase half-duration of the WD limb's ingress/egress crossing.

    The WD *centre* crosses the shadow terminator at phase +/- dphi/2 by
    definition of dphi; the limb's first/last contacts solve
    d(phi) = rwd, where d(phi) is the signed sky-plane distance of the
    centre from the terminator (``origin_shadow_distance``).  Two damped
    Newton iterations on that root (secant slope) give ~1e-4 relative
    accuracy; rwd << 1 keeps the iteration well inside the smooth region.
    Reference: the GP changepoints derive from (dphi, rwd) via the WD
    contact phases, ``GPEclipse.calc_changepoints`` [R] (SURVEY.md §2
    "GP eclipse nodes").
    """
    from ..roche.geometry import origin_shadow_distance

    eps = jnp.asarray(1e-4, dtype)
    phi = 0.5 * dphi
    ext = jnp.asarray(0.0, dtype)
    good = jnp.asarray(True)
    for _ in range(2):
        ph = jnp.stack([phi + ext, phi + ext + eps])
        d, _ = origin_shadow_distance(q, incl, ph, x1, pl1)
        slope = (d[1] - d[0]) / eps
        good = good & jnp.isfinite(slope) & (slope > 1e-9)
        step = (rwd - d[0]) / jnp.where(good, slope, 1.0)
        ext = jnp.clip(ext + jnp.where(good, step, 0.0), 0.0, 0.1)
    return jnp.where(good, ext, 0.0)


def gp_flicker_ln_like(cv_pars, model_flux, gp_pars, data: PosteriorData, k,
                       geometry=None):
    """GP "flickering" likelihood for one eclipse (reference
    ``GPEclipse.ln_like`` [R], SURVEY.md §3.3).

    Residuals (data - model) are modelled by a Matern-3/2 GP whose
    amplitude switches between exp(ln_ampin_gp) inside the white-dwarf
    eclipse and exp(ln_ampout_gp) outside, with common timescale
    exp(ln_tau_gp) in phase units.  The changepoints are the WD limb's
    first/last contact phases, +/-(dphi/2 + ext) with ext the ingress/
    egress half-duration from (rwd, terminator sky speed) — reference
    ``GPEclipse.calc_changepoints`` derives them from dphi AND rwd [R].
    Segment boundaries reset the O(n) recursion, which is exactly the
    reference's independent per-segment celerite GPs.

    ``geometry``: optional precomputed :class:`~.cv.CVGeometry` (the fused
    posterior shares its single per-walker geometry solve here too).
    """
    from ..ops.gp import segmented_matern32_ln_like

    ln_ampin, ln_ampout, ln_tau = gp_pars[0], gp_pars[1], gp_pars[2]
    q, dphi, rwd, phi0 = cv_pars[4], cv_pars[5], cv_pars[8], cv_pars[13]
    t = data.phase[k]
    if geometry is None:
        x1 = xl1(q)
        pl1 = l1_potential(q, x1)
        incl = findi(q, dphi, x1, pl1)
    else:
        x1, pl1, incl = geometry.x1, geometry.pl1, geometry.incl
    ext = wd_contact_extension(q, incl, dphi, rwd, x1, pl1, t.dtype)
    resid = data.flux[k] - model_flux
    wrapped = jnp.mod(t - phi0 + 0.5, 1.0) - 0.5
    in_ecl = jnp.abs(wrapped) <= 0.5 * dphi + ext
    sigma2 = jnp.where(in_ecl, jnp.exp(2.0 * ln_ampin),
                       jnp.exp(2.0 * ln_ampout))
    reset = jnp.concatenate(
        [jnp.zeros(1, bool), in_ecl[1:] != in_ecl[:-1]])
    c = jnp.sqrt(3.0) / jnp.exp(ln_tau)
    return segmented_matern32_ln_like(
        t, resid, data.err[k], sigma2, c, reset=reset, mask=data.mask[k])


def _chi2_ln_like(model_flux, data: PosteriorData, k):
    """Masked Gaussian ln-likelihood for eclipse k (chi^2 branch)."""
    r = (data.flux[k] - model_flux) / data.err[k]
    per = -0.5 * (r * r + jnp.log(2.0 * jnp.pi * data.err[k] ** 2))
    return jnp.sum(jnp.where(data.mask[k], per, 0.0))


def _q_prior_floor(model: CompiledModel) -> float:
    """Host-side support floor of the q prior, for sizing the stream
    scan (:func:`~..roche.stream.stream_steps_for`).

    Per family: uniform/log_uniform -> p1; gauss -> mean - 6 sigma
    (proposals beyond 6 sigma are astronomically rare AND mostly
    prior-rejected); gaussPos/mod_jeff -> 0 (supports touch zero, so
    the conservative scan tier applies).  Unknown q param (no
    ``q_core`` row, e.g. a custom tree) -> 0.0, also conservative.
    """
    try:
        i = model.param_names.index("q_core")
    except ValueError:
        return 0.0
    code = int(model.prior_table.codes[i])
    p1 = float(model.prior_table.p1[i])
    p2 = float(model.prior_table.p2[i])
    if code in (0, 1):                      # uniform, log_uniform
        return max(p1, 0.0)
    if code == 2:                           # gauss
        return max(p1 - 6.0 * p2, 0.0)
    return 0.0                              # gaussPos, mod_jeff


def make_ln_prob_parts(model: CompiledModel, config: CVConfig | None = None,
                       dtype=jnp.float64, gp_ln_like=None):
    """Build (ln_prior_fn, ln_like_fn, ln_prob_fn), each pure in the sampled
    vector.  ``gp_ln_like(cv_pars, model_flux, gp_pars, data, k)`` overrides
    the chi^2 branch for eclipses flagged use_gp (wired in ops/gp.py).
    """
    if config is None:
        config = CVConfig(complex_spot=model.any_complex)
    # the tree always emits 18-slot vectors -> evaluate the complex path
    config = config._replace(complex_spot=True)
    if gp_ln_like is None and model.any_gp:
        gp_ln_like = gp_flicker_ln_like
    data = _to_device_data(model, dtype)
    prior_table = model.prior_table
    use_gp = jnp.asarray(model.gp_mask)
    # Static (host-known) fact: 3-column data has no exposure widths —
    # the stacked width array is all zeros.  Passing widths=None lets
    # cv_fluxes skip the n_exposure_sub phase subdivision entirely
    # (identical results: zero-width subsamples coincide with the bin
    # centre), a ~3x saving on every smooth per-phase component.
    import numpy as _np
    _no_widths = not _np.any(model.data_width)

    def _width_of(k):
        return None if _no_widths else data.width[k]

    # scan trip count sized to the MODEL'S q prior at trace time: the
    # periapsis-bounded default covers q >= 0.02; a user prior admitting
    # smaller mass ratios extends the scan instead of silently handing
    # those walkers the closest-approach fallback (roche/stream.py)
    from ..roche.stream import stream_steps_for
    _stream_steps = stream_steps_for(_q_prior_floor(model))

    def ln_prior(var_vec):
        """Prior table + physical-validity checks, with the SAME hoisted
        geometry as ``ln_prob``: one xl1/findi solve for the shared core
        node and ONE carry-only ``stream_impacts`` integration resolving
        every eclipse's disc radius (the tempered sampler evaluates this
        for all rungs every half-step — a per-eclipse stacked-trajectory
        ``spot_position`` here used to cost several times the fused
        posterior for identical answers).  The validity logic itself is
        ``cv_physical_ok`` — one definition, no drift."""
        from ..roche.stream import stream_impacts
        from .cv import cv_geometry, cv_physical_ok

        full = model.full_from_var(var_vec.astype(dtype))
        lp = ln_prior_table(full, prior_table)
        cvp = model.cv_params(full)                      # (E, 18)
        q, dphi = cvp[0, 4], cvp[0, 5]
        x1 = xl1(q)
        pl1 = l1_potential(q, x1)
        incl = findi(q, dphi, x1, pl1)
        impacts = stream_impacts(q, cvp[:, 6] * x1, x1,
                                 n_steps=_stream_steps)
        # the validity check needs no mixed-precision refinement and no
        # donor grid/curve — core=(x1, pl1, incl, no traj, no precise)
        core = (x1, pl1, incl, None, None)

        def one_ecl(k, pars):
            geom = cv_geometry(pars, config, core=core, impact=impacts[k])
            return jnp.where(cv_physical_ok(pars, geom), 0.0, -jnp.inf)

        phys = jax.vmap(one_ecl)(jnp.arange(model.n_eclipses), cvp)
        return lp + jnp.sum(phys)

    def ln_like(var_vec):
        from ..roche.stream import stream_impacts
        from .components import donor_curve_nodes, donor_grid
        from .cv import cv_geometry, core_precise, resolve_donor_quad

        full = model.full_from_var(var_vec.astype(dtype))
        cvp = model.cv_params(full)                      # (E, 18)

        # hoisted core-node geometry (see ln_prob below)
        q, dphi = cvp[0, 4], cvp[0, 5]
        x1 = xl1(q)
        pl1 = l1_potential(q, x1)
        incl = findi(q, dphi, x1, pl1)
        impacts = stream_impacts(q, cvp[:, 6] * x1, x1,
                                 n_steps=_stream_steps)
        dgrid = donor_grid(q, x1, pl1, config.n_donor_lat,
                           config.n_donor_lon, dtype)
        n_dq = resolve_donor_quad(config)
        dcurve = (donor_curve_nodes(incl, dgrid, config.ulimb_donor, n_dq)
                  if n_dq else None)
        core = (x1, pl1, incl, None, core_precise(q, dphi, config, dtype))

        def one_ecl(k, pars):
            geom = cv_geometry(pars, config, core=core, impact=impacts[k])
            mflux = cv_total_flux(pars, data.phase[k], _width_of(k),
                                  config, geometry=geom, donor=dgrid,
                                  donor_curve=dcurve)
            if gp_ln_like is None:
                return _chi2_ln_like(mflux, data, k)
            gp_pars = full[data.gp_idx[k]]
            chi2_val = _chi2_ln_like(mflux, data, k)
            gp_val = gp_ln_like(pars, mflux, gp_pars, data, k,
                                geometry=geom)
            return jnp.where(use_gp[k], gp_val, chi2_val)

        lls = jax.vmap(one_ecl)(jnp.arange(model.n_eclipses), cvp)
        return jnp.sum(lls)

    def ln_prob(var_vec):
        """Fused posterior: each eclipse's geometry (L1, inclination,
        stream) is solved ONCE and shared between the physical-validity
        check and the flux model — the reference solves these twice, once
        in the tree's prior walk via trm.roche and again inside
        ``CV::set_parameters`` (SURVEY.md §3.1).  NaNs from invalid
        geometry are discarded by the final where, never propagated.

        Geometry that depends only on the *core* node (q, dphi) — L1,
        inclination, the gas-stream integration, and the donor surface
        grid — is hoisted OUT of the per-eclipse vmap: the tree shares the
        core across all eclipses, so solving it per eclipse would multiply
        the work E-fold for identical answers (the TPU analogue of the
        reference's geometry cache, SURVEY.md §2 "CV orchestrator").  The
        stream is integrated ONCE with all eclipses' disc radii resolved
        in the carry (``stream_impacts``): the stacked-trajectory path is
        ~11 ms of the north-star posterior, the carry-only one ~1 ms.
        """
        from ..roche.stream import stream_impacts
        from .components import donor_curve_nodes, donor_grid
        from .cv import cv_geometry, cv_physical_ok, core_precise, \
            resolve_donor_quad

        full = model.full_from_var(var_vec.astype(dtype))
        lp = ln_prior_table(full, prior_table)
        cvp = model.cv_params(full)                      # (E, 18)

        q, dphi = cvp[0, 4], cvp[0, 5]
        x1 = xl1(q)
        pl1 = l1_potential(q, x1)
        incl = findi(q, dphi, x1, pl1)
        impacts = stream_impacts(q, cvp[:, 6] * x1, x1,
                                 n_steps=_stream_steps)
        dgrid = donor_grid(q, x1, pl1, config.n_donor_lat,
                           config.n_donor_lon, dtype)
        # donor curve hoisted out of the per-eclipse vmap: it depends only
        # on core-node quantities (incl, the lobe grid), so the element
        # sum runs once per walker on the quadrature nodes and each
        # eclipse interpolates (components.donor_curve_nodes docstring)
        n_dq = resolve_donor_quad(config)
        dcurve = (donor_curve_nodes(incl, dgrid, config.ulimb_donor, n_dq)
                  if n_dq else None)
        core = (x1, pl1, incl, None, core_precise(q, dphi, config, dtype))

        def one_ecl(k, pars):
            geom = cv_geometry(pars, config, core=core, impact=impacts[k])
            ok = cv_physical_ok(pars, geom)
            mflux = cv_total_flux(pars, data.phase[k], _width_of(k),
                                  config, geometry=geom, donor=dgrid,
                                  donor_curve=dcurve)
            if gp_ln_like is None:
                ll = _chi2_ln_like(mflux, data, k)
            else:
                gp_pars = full[data.gp_idx[k]]
                ll = jnp.where(
                    use_gp[k],
                    gp_ln_like(pars, mflux, gp_pars, data, k,
                               geometry=geom),
                    _chi2_ln_like(mflux, data, k))
            return jnp.where(ok, ll, -jnp.inf)

        lls = jax.vmap(one_ecl)(jnp.arange(model.n_eclipses), cvp)
        total = lp + jnp.sum(lls)
        return jnp.where(jnp.isfinite(total), total, -jnp.inf)

    return ln_prior, ln_like, ln_prob


def make_ln_prob(model: CompiledModel, config: CVConfig | None = None,
                 dtype=jnp.float64, gp_ln_like=None):
    """The posterior ln-probability function of the sampled vector."""
    return make_ln_prob_parts(model, config, dtype, gp_ln_like)[2]
