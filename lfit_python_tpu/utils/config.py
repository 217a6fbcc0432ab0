"""Reference-compatible configuration reader (SURVEY.md §5.6).

The reference drives fits from a flat ``mcmc_input.dat`` of ``key = value``
lines parsed ad hoc in ``mcmcfit.py`` [R]: meta keys (nwalkers, nburn,
nprod, neclipses, complex, useGP, scatter_1/2, double_burnin, file_<i>,
band_<i>, ...) and parameter lines

    <name>_<label> = <start> <prior_type> <p1> <p2> <isVar>

with labels ``core``, a band name, or an eclipse index.  This module reads
that format unchanged (so published reference inputs run here) into a
:class:`FitConfig`, and builds the hierarchical model from it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

from ..models.priors import Param, Prior
from ..models.tree import (
    BAND_NAMES,
    CORE_NAMES,
    ECLIPSE_COMPLEX_NAMES,
    ECLIPSE_NAMES,
    GP_NAMES,
    EclipseSpec,
    HierarchicalModel,
    Lightcurve,
)

__all__ = ["FitConfig", "parse_input_dat", "build_model_from_config"]

_META_INT = {"nwalkers", "nburn", "nprod", "nthreads", "neclipses", "ntemps",
             "nsub", "thin"}
_META_FLOAT = {"scatter_1", "scatter_2"}
_META_BOOL = {"complex", "useGP", "usePT", "double_burnin", "comp_scat",
              "notify", "useGP_default"}

_PARAM_RE = re.compile(
    r"^\s*(\S+)\s*=\s*([\-\d.eE+]+)\s+(\w+)\s+([\-\d.eE+]+)\s+"
    r"([\-\d.eE+]+)\s+(\d)\s*$")
_META_RE = re.compile(r"^\s*(\S+)\s*=\s*(.+?)\s*$")


@dataclass
class FitConfig:
    """Parsed fit configuration (meta + raw parameter table)."""
    meta: Dict[str, object] = field(default_factory=dict)
    params: Dict[str, Param] = field(default_factory=dict)
    files: Dict[int, str] = field(default_factory=dict)
    bands: Dict[int, str] = field(default_factory=dict)
    complex_flags: Dict[int, bool] = field(default_factory=dict)
    gp_flags: Dict[int, bool] = field(default_factory=dict)
    source: Optional[Path] = None

    @property
    def n_eclipses(self) -> int:
        return int(self.meta.get("neclipses", len(self.files) or 1))

    def get(self, key, default=None):
        return self.meta.get(key, default)


def _parse_bool(s: str) -> bool:
    return str(s).strip().lower() in ("1", "true", "yes", "y")


def parse_input_dat(path) -> FitConfig:
    """Parse a reference-format input file (``mcmc_input.dat``)."""
    path = Path(path)
    cfg = FitConfig(source=path)
    for raw in path.read_text().splitlines():
        line = raw.split("#", 1)[0].rstrip()
        if not line.strip():
            continue
        m = _PARAM_RE.match(line)
        if m:
            name, start, ptype, p1, p2, isvar = m.groups()
            cfg.params[name] = Param(
                name=name.rsplit("_", 1)[0],
                start=float(start),
                prior=Prior(ptype, float(p1), float(p2)),
                is_var=bool(int(isvar)),
            )
            continue
        m = _META_RE.match(line)
        if not m:
            raise ValueError(f"{path}: cannot parse line: {raw!r}")
        key, val = m.groups()
        fm = re.match(r"^(file|band|plot|complex|useGP)_(\d+)$", key)
        if fm:
            kind, idx = fm.group(1), int(fm.group(2))
            if kind == "file":
                cfg.files[idx] = val
            elif kind == "band":
                cfg.bands[idx] = val
            elif kind == "complex":
                cfg.complex_flags[idx] = _parse_bool(val)
            elif kind == "useGP":
                cfg.gp_flags[idx] = _parse_bool(val)
            continue
        if key in _META_INT:
            cfg.meta[key] = int(float(val))
        elif key in _META_FLOAT:
            cfg.meta[key] = float(val)
        elif key in _META_BOOL:
            cfg.meta[key] = _parse_bool(val)
        else:
            cfg.meta[key] = val
    return cfg


def _lookup(cfg: FitConfig, base: str, label: str) -> Param:
    key = f"{base}_{label}"
    if key not in cfg.params:
        raise KeyError(
            f"{cfg.source}: missing parameter line for {key!r}")
    return cfg.params[key]


def build_model_from_config(cfg: FitConfig, data_dir=None) -> HierarchicalModel:
    """Assemble the hierarchical model tree from a parsed config.

    Light-curve files are resolved relative to ``data_dir`` (default: the
    input file's directory, as the reference does [R]).
    """
    if data_dir is None:
        data_dir = cfg.source.parent if cfg.source else Path(".")
    data_dir = Path(data_dir)

    n_ecl = cfg.n_eclipses
    default_complex = bool(cfg.meta.get("complex", False))
    default_gp = bool(cfg.meta.get("useGP", False))

    core = {n: _lookup(cfg, n, "core") for n in CORE_NAMES}

    bands: Dict[str, Dict[str, Param]] = {}
    eclipses: List[EclipseSpec] = []
    for k in range(n_ecl):
        band = cfg.bands.get(k, cfg.bands.get(0, "g"))
        if band not in bands:
            bands[band] = {n: _lookup(cfg, n, band) for n in BAND_NAMES}
        cplx = cfg.complex_flags.get(k, default_complex)
        gp = cfg.gp_flags.get(k, default_gp)
        names = ECLIPSE_NAMES + (ECLIPSE_COMPLEX_NAMES if cplx else ()) \
            + (GP_NAMES if gp else ())
        params = {n: _lookup(cfg, n, str(k)) for n in names}
        fname = cfg.files.get(k)
        if fname is None:
            raise KeyError(f"{cfg.source}: missing file_{k} entry")
        lc = Lightcurve.from_file(data_dir / fname, name=f"ecl{k}")
        eclipses.append(EclipseSpec(
            str(k), band, lc, params, complex_spot=cplx, use_gp=gp))
    return HierarchicalModel(core, bands, eclipses)
