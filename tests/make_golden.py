"""Regenerate the golden regression values (run from repo root):

    python tests/make_golden.py

Only regenerate when a numerical convention changes INTENTIONALLY —
the golden test exists to catch silent drift across refactors.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from lfit_python_tpu.models.cv import CVConfig, cv_fluxes
from lfit_python_tpu.models import components as comp
from lfit_python_tpu.roche.geometry import (
    xl1, l1_potential, findi, contact_interval)
from lfit_python_tpu.ops.gp import matern32_gp_ln_like

CFG = CVConfig(n_disc_rad=8, n_disc_az=12, n_spot=12,
               n_donor_lat=8, n_donor_lon=12)
SIMPLE = np.array([0.1, 0.05, 0.08, 0.03, 0.15, 0.04, 0.44, 0.3, 0.01,
                   0.02, 160.0, 0.2, 1.5, 0.0])
COMPLEX = np.concatenate([SIMPLE, [2.0, 1.3, 80.0, 15.0]])
PHASES = np.linspace(-0.15, 0.15, 61)

out = {}
for tag, pars, cplx in [("simple", SIMPLE, False), ("complex", COMPLEX, True)]:
    f = cv_fluxes(jnp.asarray(pars), jnp.asarray(PHASES),
                  config=CFG._replace(complex_spot=cplx))
    for name in ("total", "ywd", "ydisc", "yspot", "ysec"):
        out[f"{tag}_{name}"] = np.asarray(getattr(f, name))

# geometry golden values
for q in (0.08, 0.15, 0.5, 1.5):
    out[f"xl1_{q}"] = np.asarray(xl1(q))
    out[f"findi_{q}"] = np.asarray(findi(q, 0.04))

# one contact interval
q = 0.15
x1 = xl1(q); pl1 = l1_potential(q, x1); incl = findi(q, 0.04, x1, pl1)
p = jnp.array([0.25, -0.1, 0.0])
pi_, po_, ec = contact_interval(q, incl, p, x1, pl1)
out["contact"] = np.array([float(pi_), float(po_), float(ec)])

# GP log-likelihood
rng = np.random.default_rng(7)
t = np.sort(rng.uniform(0, 1, 64))
y = 0.05 * np.sin(13 * t) + 0.01 * rng.standard_normal(64)
out["gp_lnlike"] = np.asarray(matern32_gp_ln_like(
    jnp.asarray(t), jnp.asarray(y), jnp.full(64, 0.01), 0.05, 0.15))
out["gp_t"] = t
out["gp_y"] = y

np.savez(os.path.join(os.path.dirname(__file__), "golden", "golden_v1.npz"),
         **out)
print("wrote", len(out), "golden arrays")
