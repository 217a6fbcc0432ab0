"""Hierarchical (tree-structured) parameter model (L3).

Reference: ``CVModel.py`` — ``Model`` node base, ``LCModel`` root, ``Band``,
``SimpleEclipse``/``ComplexEclipse`` leaves, with label-suffixed parameter
addressing (``q_core``, ``wdFlux_<band>``, ``rdisc_<ecl>``) and depth-first
flat-vector get/set ``dynasty_par_vals``/``dynasty_par_names`` (SURVEY.md §2
"Model tree framework", "CV model nodes" [R]).

The reference walks a Python object tree per likelihood call; that is
poison for a traced program.  Here the tree is *declarative*: it compiles
once into numpy index maps (flat sampled vector -> full parameter vector ->
per-eclipse 18-slot CV vectors), after which every likelihood evaluation is
pure gathers — XLA-friendly and vmappable over walkers.

Core params (shared by every eclipse):  q, dphi, rwd.
Band params (shared per filter):        wdFlux, rsFlux, ulimb.
Eclipse params:                         dFlux, sFlux, rdisc, scale, az,
                                        fis, dexp, phi0
                                        [+ exp1, exp2, tilt, yaw if complex]
                                        [+ ln_ampin_gp, ln_ampout_gp,
                                           ln_tau_gp if GP].

Simple eclipses are evaluated through the same 18-slot CV vector with the
neutral complex values (exp1 = 1, exp2 = 1, tilt = 90, yaw = 0) pinned as
constants, so mixed simple/complex trees still evaluate as one uniform
vmap over eclipses.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from .priors import Param, Prior, PriorTable, make_prior_table

__all__ = [
    "Lightcurve",
    "EclipseSpec",
    "HierarchicalModel",
    "CompiledModel",
    "CORE_NAMES",
    "BAND_NAMES",
    "ECLIPSE_NAMES",
    "ECLIPSE_COMPLEX_NAMES",
    "GP_NAMES",
]

CORE_NAMES = ("q", "dphi", "rwd")
BAND_NAMES = ("wdFlux", "rsFlux", "ulimb")
ECLIPSE_NAMES = ("dFlux", "sFlux", "rdisc", "scale", "az", "fis", "dexp", "phi0")
ECLIPSE_COMPLEX_NAMES = ("exp1", "exp2", "tilt", "yaw")
GP_NAMES = ("ln_ampin_gp", "ln_ampout_gp", "ln_tau_gp")

# canonical CV 18-vector slot order (models/cv.py docstring)
_CV_SLOTS = (
    "wdFlux", "dFlux", "sFlux", "rsFlux", "q", "dphi", "rdisc", "ulimb",
    "rwd", "scale", "az", "fis", "dexp", "phi0", "exp1", "exp2", "tilt", "yaw",
)
_NEUTRAL_COMPLEX = {"exp1": 1.0, "exp2": 1.0, "tilt": 90.0, "yaw": 0.0}


@dataclass
class Lightcurve:
    """Observed eclipse light curve (reference ``Lightcurve`` container [R]).

    Columns: phase, flux, flux error, and optionally exposure phase width.
    """
    phase: np.ndarray
    flux: np.ndarray
    err: np.ndarray
    width: Optional[np.ndarray] = None
    name: str = ""

    @classmethod
    def from_file(cls, path, name=None, trim=None):
        """Load a 3- or 4-column whitespace text file (phase flux err
        [width]); ``trim=(lo, hi)`` masks to a phase range (reference
        ``Lightcurve.trim`` [R-med])."""
        arr = np.loadtxt(path, dtype=np.float64)
        if arr.ndim != 2 or arr.shape[1] < 3:
            raise ValueError(f"{path}: expected >=3 columns (phase flux err)")
        width = arr[:, 3] if arr.shape[1] > 3 else None
        lc = cls(arr[:, 0], arr[:, 1], arr[:, 2], width,
                 name or str(path))
        return lc.trimmed(trim)

    @classmethod
    def from_calib(cls, path, name=None, trim=None, t0=None, period=None):
        """Load calibrated photometry (reference ``Lightcurve.from_calib``
        [R-med], SURVEY.md §2 "Lightcurve container").

        Calib files carry 3 columns (phase-or-time, flux [mJy], err) and
        no exposure-width column; the finite-exposure width the smearing
        model needs is reconstructed as the median sample spacing — the
        published .calib light curves are contiguous exposures, so the
        cadence IS the exposure time.  If an ephemeris ``(t0, period)``
        is given, column 0 is absolute time (e.g. BJD) and is folded to
        orbital phase in [-0.5, 0.5) and sorted.

        NOTE [R-med]: the reference mount is empty (SURVEY.md provenance
        warning), so the exact reference calib semantics could not be
        read; this reconstruction is definitional for the framework and
        flagged for re-verification if the mount populates.
        """
        arr = np.loadtxt(path, dtype=np.float64)
        if arr.ndim == 1:
            arr = arr[None]
        if arr.shape[1] < 3:
            raise ValueError(
                f"{path}: expected >=3 columns (phase-or-time flux err)")
        x, flux, err = arr[:, 0], arr[:, 1], arr[:, 2]
        if (t0 is None) != (period is None):
            raise ValueError("from_calib: give both t0 and period or neither")
        if t0 is not None:
            x = ((x - t0) / period + 0.5) % 1.0 - 0.5
            order = np.argsort(x)
            x, flux, err = x[order], flux[order], err[order]
        if len(x) > 1:
            width = np.full_like(x, np.median(np.abs(np.diff(x))))
        else:
            width = None
        lc = cls(x, flux, err, width, name or str(path))
        return lc.trimmed(trim)

    def trimmed(self, trim):
        """Mask to a phase range (reference ``Lightcurve.trim`` [R-med]);
        ``trim=None`` returns self unchanged."""
        if trim is None:
            return self
        m = (self.phase >= trim[0]) & (self.phase <= trim[1])
        return type(self)(
            self.phase[m], self.flux[m], self.err[m],
            None if self.width is None else self.width[m], self.name)

    def __len__(self):
        return len(self.phase)


@dataclass
class EclipseSpec:
    """One eclipse leaf: its data, band, model flavour, and parameters."""
    name: str
    band: str
    lightcurve: Lightcurve
    params: Dict[str, Param]
    complex_spot: bool = False
    use_gp: bool = False
    plot: bool = True   # reference plot_<i> flag [R-med]


@dataclass
class HierarchicalModel:
    """Declarative model tree; compile() produces the index maps."""
    core: Dict[str, Param]
    bands: Dict[str, Dict[str, Param]]
    eclipses: List[EclipseSpec]

    def compile(self) -> "CompiledModel":
        return CompiledModel(self)


@dataclass
class CompiledModel:
    """Flat-vector layout + gather maps for one hierarchical model.

    Layout of the *full* vector (depth-first, reference
    ``dynasty_par_vals`` order [R]): core, then each band, then each
    eclipse (base + complex + gp params as applicable).

    The *sampled* vector covers only is_var parameters;
    ``full_from_var(v)`` scatters it into the full start template.
    """
    spec: HierarchicalModel = field(repr=False)

    def __post_init__(self):
        spec = self.spec
        names: List[str] = []
        params: List[Param] = []

        labels: List[str] = []

        def add(p: Param, label: str):
            names.append(f"{p.name}_{label}")
            params.append(p)
            labels.append(label)

        for n in CORE_NAMES:
            add(spec.core[n], "core")
        for bname, bp in spec.bands.items():
            for n in BAND_NAMES:
                add(bp[n], bname)
        for ecl in spec.eclipses:
            enames = ECLIPSE_NAMES + (
                ECLIPSE_COMPLEX_NAMES if ecl.complex_spot else ()
            ) + (GP_NAMES if ecl.use_gp else ())
            for n in enames:
                add(ecl.params[n], ecl.name)

        self.param_names = names
        self.param_labels = labels
        self.params = params
        self.full_start = np.asarray([p.start for p in params], np.float64)
        self.var_mask = np.asarray([p.is_var for p in params], bool)
        self.var_idx = np.nonzero(self.var_mask)[0].astype(np.int32)
        # inverse map for gather-based assembly (scatter has ambiguous
        # output sharding under a walker-sharded vmap): full slot i takes
        # var element var_pos[i] if >= 0, else its fixed start value
        self.var_pos = np.full(len(params), -1, np.int32)
        self.var_pos[self.var_idx] = np.arange(len(self.var_idx), dtype=np.int32)
        self.n_var = int(self.var_mask.sum())
        self.n_full = len(params)
        self.scatter = np.asarray([p.scatter for p in params], np.float64)
        self.prior_table: PriorTable = make_prior_table(params)

        index = {n: i for i, n in enumerate(names)}

        # per-eclipse CV gather: full[cv_idx] with constants where idx < 0
        cv_idx = np.zeros((len(spec.eclipses), 18), np.int32)
        cv_const = np.zeros((len(spec.eclipses), 18), np.float64)
        gp_idx = np.zeros((len(spec.eclipses), 3), np.int32)
        gp_mask = np.zeros(len(spec.eclipses), bool)
        for k, ecl in enumerate(spec.eclipses):
            for s, slot in enumerate(_CV_SLOTS):
                if slot in CORE_NAMES:
                    cv_idx[k, s] = index[f"{slot}_core"]
                elif slot in BAND_NAMES:
                    cv_idx[k, s] = index[f"{slot}_{ecl.band}"]
                elif slot in _NEUTRAL_COMPLEX and not ecl.complex_spot:
                    cv_idx[k, s] = -1
                    cv_const[k, s] = _NEUTRAL_COMPLEX[slot]
                else:
                    cv_idx[k, s] = index[f"{slot}_{ecl.name}"]
            if ecl.use_gp:
                gp_mask[k] = True
                for s, n in enumerate(GP_NAMES):
                    gp_idx[k, s] = index[f"{n}_{ecl.name}"]
        self.cv_idx = cv_idx
        self.cv_const = cv_const
        self.gp_idx = gp_idx
        self.gp_mask = gp_mask

        # stacked, padded data arrays (E, P_max) + mask
        n_ecl = len(spec.eclipses)
        pmax = max((len(e.lightcurve) for e in spec.eclipses), default=0)
        self.n_eclipses = n_ecl
        self.n_points_max = pmax
        self.data_phase = np.zeros((n_ecl, pmax))
        self.data_flux = np.zeros((n_ecl, pmax))
        self.data_err = np.ones((n_ecl, pmax))
        self.data_width = np.zeros((n_ecl, pmax))
        self.data_mask = np.zeros((n_ecl, pmax), bool)
        for k, ecl in enumerate(spec.eclipses):
            lc = ecl.lightcurve
            n = len(lc)
            self.data_phase[k, :n] = lc.phase
            # pad slot phases at a harmless out-of-eclipse value
            self.data_phase[k, n:] = 0.25
            self.data_flux[k, :n] = lc.flux
            self.data_err[k, :n] = lc.err
            if lc.width is not None:
                self.data_width[k, :n] = lc.width
            self.data_mask[k, :n] = True
        self.any_complex = any(e.complex_spot for e in spec.eclipses)
        self.any_gp = any(e.use_gp for e in spec.eclipses)
        self.plot_mask = np.asarray([e.plot for e in spec.eclipses], bool)

    # ------------------------------------------------------------------
    def full_from_var(self, var_vec):
        """Scatter a sampled (n_var,) vector into the full template.
        Works on numpy or jax arrays (returns the same flavour)."""
        import jax.numpy as jnp

        if isinstance(var_vec, np.ndarray):
            full = self.full_start.copy()
            full[self.var_idx] = var_vec
            return full
        # gather form (see var_pos above): sharding-friendly
        pos = jnp.asarray(self.var_pos)
        gathered = var_vec[jnp.clip(pos, 0, None)]
        return jnp.where(pos >= 0,
                         gathered,
                         jnp.asarray(self.full_start, var_vec.dtype))

    def var_start(self):
        return self.full_start[self.var_idx].copy()

    def var_scatter(self):
        """Per-sampled-parameter scatter fraction (reference ``comp_scat``
        [R-med]; populated from COMP_SCAT_FRACTIONS by the config reader)."""
        return self.scatter[self.var_idx].copy()

    def var_names(self):
        return [self.param_names[i] for i in self.var_idx]

    def var_groups(self):
        """Variable-parameter indices grouped by tree node (core, each
        band, each eclipse), in tree order: [(label, [var positions])].

        Backs the reference's per-node corner plots [R-med] — a 10-eclipse
        production fit has ~50 variable params, unreadable as one global
        corner; the per-node split is the usable form.
        """
        order: List[str] = []
        groups: Dict[str, List[int]] = {}
        for pos, i in enumerate(self.var_idx):
            label = self.param_labels[i]
            if label not in groups:
                groups[label] = []
                order.append(label)
            groups[label].append(pos)
        return [(label, groups[label]) for label in order]

    def cv_params(self, full_vec):
        """Per-eclipse 18-slot CV parameter matrix (E, 18) from a full
        vector (gathers + pinned constants)."""
        import jax.numpy as jnp

        idx = jnp.asarray(self.cv_idx)
        const = jnp.asarray(self.cv_const, full_vec.dtype)
        gathered = full_vec[jnp.clip(idx, 0, None)]
        return jnp.where(idx >= 0, gathered, const)
