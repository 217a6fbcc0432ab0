"""White-dwarf atmosphere fitting (L6 post-processing).

Reference: ``wdparams.py`` [R] (SURVEY.md §2 "WD atmosphere fitter", §3.4):
interpolate a Bergeron DA model grid (T_eff x log g -> absolute magnitude
per band), then fit (T_eff, log g, parallax) to the per-band white-dwarf
fluxes measured by the eclipse fit, with its own emcee run.

The published Bergeron tables cannot be redistributed/downloaded here, so
this module accepts a user-supplied grid file (``--grid``; whitespace
table: Teff logg mag_<band>... with a ``# Teff logg <band names>`` header)
and otherwise falls back to a built-in synthetic DA grid computed from
blackbody photospheres + the Nauenberg (1972) mass-radius relation —
clearly labelled in the output, numerically sane (AB zero points, correct
radius scaling), and drop-in replaceable by the real tables.

Input file format (reference-compatible Param lines + flux lines):

    teff = 15000 uniform 6000 90000 1
    logg = 8.0 uniform 6.5 9.5 1
    plax = 5.0 gauss 5.0 0.5 1          # parallax, mas
    flux_g = 0.12 0.01 4770             # mJy, err, lambda_eff [Angstrom]
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import numpy as np

__all__ = ["synthetic_da_grid", "GridInterpolator", "run_wdparams",
           "extinction_coefficients"]

# physical constants (SI)
_H = 6.62607015e-34
_C = 2.99792458e8
_KB = 1.380649e-23
_G = 6.674e-11
_MSUN = 1.98892e30
_RSUN = 6.957e8
_PC = 3.0856775814913673e16
_MCH = 1.44


def nauenberg_radius(mass_msun):
    """Nauenberg (1972) zero-temperature WD mass-radius relation (R_sun)."""
    x = (mass_msun / _MCH)
    return 0.0112 * np.sqrt(x ** (-2.0 / 3.0) - x ** (2.0 / 3.0))


def mass_radius_from_logg(logg):
    """Solve (M, R) from log g [cgs] under the Nauenberg relation."""
    g_si = 10.0 ** np.asarray(logg) * 1e-2  # cgs -> m/s^2

    def g_of_m(m):
        r = nauenberg_radius(m) * _RSUN
        return _G * m * _MSUN / r**2

    lo = np.full_like(g_si, 0.15)
    hi = np.full_like(g_si, 1.42)
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        too_light = g_of_m(mid) < g_si
        lo = np.where(too_light, mid, lo)
        hi = np.where(too_light, hi, mid)
    m = 0.5 * (lo + hi)
    return m, nauenberg_radius(m)


def synthetic_da_grid(bands_angstrom, teffs=None, loggs=None):
    """Blackbody + Nauenberg synthetic DA grid: absolute AB magnitudes.

    Returns (teffs (NT,), loggs (NG,), mags (NT, NG, NB)).  A stand-in for
    the Bergeron tables with the same interface; replace with real tables
    via the --grid flag for publication-grade results.
    """
    if teffs is None:
        teffs = np.linspace(6000.0, 90000.0, 85)
    if loggs is None:
        loggs = np.linspace(6.5, 9.5, 31)
    lam = np.asarray(bands_angstrom, float) * 1e-10
    nu = _C / lam
    _, r_sun = mass_radius_from_logg(loggs)
    r = r_sun * _RSUN                                     # (NG,)
    T = np.asarray(teffs)[:, None, None]                  # (NT,1,1)
    nu_ = nu[None, None, :]
    b_nu = (2.0 * _H * nu_**3 / _C**2
            / np.expm1(_H * nu_ / (_KB * T)))             # (NT,1,NB)
    # observed flux at 10 pc from a disc of radius R: pi B_nu (R/d)^2
    fnu = np.pi * b_nu * (r[None, :, None] / (10.0 * _PC)) ** 2
    fnu_jy = fnu / 1e-26
    return np.asarray(teffs), np.asarray(loggs), \
        -2.5 * np.log10(fnu_jy / 3631.0)


def extinction_coefficients(lams_angstrom, r_v=3.1):
    """Per-band A_lambda / E(B-V) from the CCM (Cardelli, Clayton & Mathis
    1989) mean extinction law, optical/NIR branches.

    Reference ``wdparams.py`` optionally corrects the synthetic magnitudes
    for interstellar extinction with per-band coefficients [R-med,
    SURVEY.md §2 "WD atmosphere fitter"]; CCM with R_V = 3.1 is the
    standard source of those coefficients.
    """
    lam_um = np.asarray(lams_angstrom, float) * 1e-4
    x = 1.0 / lam_um
    # optical/UV-edge branch (1.1 <= x <= 3.3), CCM89 eq. (3a, 3b)
    y = x - 1.82
    a_opt = (1.0 + 0.17699 * y - 0.50447 * y**2 - 0.02427 * y**3
             + 0.72085 * y**4 + 0.01979 * y**5 - 0.77530 * y**6
             + 0.32999 * y**7)
    b_opt = (1.41338 * y + 2.28305 * y**2 + 1.07233 * y**3
             - 5.38434 * y**4 - 0.62251 * y**5 + 5.30260 * y**6
             - 2.09002 * y**7)
    # IR branch (0.3 <= x < 1.1), CCM89 eq. (2a, 2b)
    a_ir = 0.574 * x**1.61
    b_ir = -0.527 * x**1.61
    a = np.where(x < 1.1, a_ir, a_opt)
    b = np.where(x < 1.1, b_ir, b_opt)
    # A_lambda = A_V (a + b/R_V), A_V = R_V E(B-V)
    return r_v * a + b


class GridInterpolator:
    """Bilinear (Teff, logg) -> absolute magnitude per band (the reference
    uses scipy 2-D interpolation over the Bergeron tables [R])."""

    def __init__(self, teffs, loggs, mags, source="synthetic-blackbody"):
        self.teffs = np.asarray(teffs)
        self.loggs = np.asarray(loggs)
        self.mags = np.asarray(mags)
        self.source = source

    @classmethod
    def from_file(cls, path, band_names):
        """Load a ``Teff logg <band>...`` whitespace table.

        The first line is the column header (with or without a leading
        ``#`` — the published Bergeron DA tables use a bare header line);
        remaining rows must form a complete rectangular (Teff, logg) grid.
        Band columns are matched by name, so extra columns (Mass, Mbol,
        other filters) are ignored.
        """
        path = Path(path)
        first = path.read_text().splitlines()[0]
        header = first.lstrip("#").split()
        cols = {n: i for i, n in enumerate(header)}
        for required in ("Teff", "logg", *band_names):
            if required not in cols:
                raise ValueError(
                    f"{path}: header is missing column {required!r} "
                    f"(found: {header})")
        raw = np.loadtxt(
            path, skiprows=0 if first.lstrip().startswith("#") else 1)
        if raw.ndim == 1:
            raw = raw[None]
        teffs = np.unique(raw[:, cols["Teff"]])
        loggs = np.unique(raw[:, cols["logg"]])
        mags = np.full((len(teffs), len(loggs), len(band_names)), np.nan)
        ti = np.searchsorted(teffs, raw[:, cols["Teff"]])
        gi = np.searchsorted(loggs, raw[:, cols["logg"]])
        for b, name in enumerate(band_names):
            mags[ti, gi, b] = raw[:, cols[name]]
        if np.isnan(mags).any():
            raise ValueError(f"{path}: grid is not complete/rectangular")
        return cls(teffs, loggs, mags, source=str(path))

    def __call__(self, teff, logg):
        import jax.numpy as jnp

        t = jnp.clip(teff, self.teffs[0], self.teffs[-1])
        g = jnp.clip(logg, self.loggs[0], self.loggs[-1])
        ts = jnp.asarray(self.teffs)
        gs = jnp.asarray(self.loggs)
        mg = jnp.asarray(self.mags)
        i = jnp.clip(jnp.searchsorted(ts, t) - 1, 0, len(self.teffs) - 2)
        j = jnp.clip(jnp.searchsorted(gs, g) - 1, 0, len(self.loggs) - 2)
        ft = (t - ts[i]) / (ts[i + 1] - ts[i])
        fg = (g - gs[j]) / (gs[j + 1] - gs[j])
        return ((1 - ft) * (1 - fg) * mg[i, j]
                + ft * (1 - fg) * mg[i + 1, j]
                + (1 - ft) * fg * mg[i, j + 1]
                + ft * fg * mg[i + 1, j + 1])


_FLUX_RE = re.compile(
    r"^\s*flux_(\w+)\s*=\s*([\d.eE+\-]+)\s+([\d.eE+\-]+)\s+([\d.eE+\-]+)\s*$")


def run_wdparams(args):
    """CLI entry: fit (Teff, logg, parallax) to measured WD fluxes."""
    import jax
    import jax.numpy as jnp

    from ..models.priors import Param, Prior, ln_prior_table, make_prior_table
    from ..sampling.ensemble import init_walkers, run_sampler
    from ..utils.chains import summarize
    from ..utils.config import _PARAM_RE
    from ..utils.plotting import corner_plot

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    bands, fluxes, errs, lams = [], [], [], []
    params = {}
    for raw in Path(args.input).read_text().splitlines():
        line = raw.split("#", 1)[0].rstrip()
        if not line.strip():
            continue
        fm = _FLUX_RE.match(line)
        if fm:
            bands.append(fm.group(1))
            fluxes.append(float(fm.group(2)))
            errs.append(float(fm.group(3)))
            lams.append(float(fm.group(4)))
            continue
        pm = _PARAM_RE.match(line)
        if pm:
            name, start, ptype, p1, p2, isvar = pm.groups()
            params[name] = Param(name, float(start),
                                 Prior(ptype, float(p1), float(p2)),
                                 bool(int(isvar)))
    for required in ("teff", "logg", "plax"):
        if required not in params:
            raise KeyError(f"{args.input}: missing parameter line {required}")
    if not bands:
        raise ValueError(f"{args.input}: no flux_<band> lines")

    if args.grid:
        interp = GridInterpolator.from_file(args.grid, bands)
    else:
        interp = GridInterpolator(*synthetic_da_grid(lams))
        print("NOTE: using the built-in synthetic (blackbody+Nauenberg) DA "
              "grid; supply --grid for Bergeron-table results")

    # optional E(B-V) extinction parameter (reference optional fitted
    # extinction [R-med]); coefficients from the CCM89 law per band
    fit_ebv = "ebv" in params
    plist = [params["teff"], params["logg"], params["plax"]]
    if fit_ebv:
        plist.append(params["ebv"])
    table = make_prior_table(plist)
    fx = jnp.asarray(fluxes)
    fe = jnp.asarray(errs)
    ext_coeff = jnp.asarray(extinction_coefficients(lams))

    def ln_prob(v):
        teff, logg, plax = v[0], v[1], v[2]
        ebv = v[3] if fit_ebv else 0.0
        lp = ln_prior_table(v, table)
        mags = interp(teff, logg)          # absolute AB mags
        # apparent flux in mJy at distance d = 1000/plax[mas] pc
        dist_pc = 1000.0 / jnp.maximum(plax, 1e-3)
        m_app = mags + 5.0 * jnp.log10(dist_pc / 10.0) + ext_coeff * ebv
        f_mjy = 3631e3 * 10 ** (-0.4 * m_app)
        chi2 = jnp.sum(((fx - f_mjy) / fe) ** 2)
        val = lp - 0.5 * chi2
        return jnp.where(jnp.isfinite(val), val, -jnp.inf)

    start = jnp.asarray([p.start for p in plist])
    scatter = jnp.asarray([abs(p.start) * 0.01 + 1e-3 for p in plist])
    state = init_walkers(jax.random.PRNGKey(args.seed), start, scatter,
                         ln_prob, args.nwalkers)
    state, _, _, _ = run_sampler(state, ln_prob, args.nburn)
    state, chain, lp, acc = run_sampler(state, ln_prob, args.nprod)

    names = ["teff", "logg", "plax"] + (["ebv"] if fit_ebv else [])
    ndim = len(names)
    tab = summarize(chain, names, discard=len(chain) // 4)
    best = chain.reshape(-1, ndim)[np.argmax(lp.reshape(-1))]
    m, r = mass_radius_from_logg(best[1])
    report = {
        "grid": interp.source,
        "params": tab,
        "best": dict(zip(names, map(float, best))),
        "derived": {"mass_msun": float(m), "radius_rsun": float(r),
                    "distance_pc": float(1000.0 / best[2])},
        "mean_acceptance": float(np.mean(acc)),
    }
    with (outdir / "wdparams.json").open("w") as fh:
        json.dump(report, fh, indent=1)
    corner_plot(chain[len(chain) // 4:].reshape(-1, ndim), names,
                outdir / "wd_corner.png")
    print(json.dumps(report["params"], indent=1))
    print("derived:", report["derived"])
    return 0
