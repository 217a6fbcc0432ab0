"""Generate the demo dataset: a synthetic single-eclipse light curve from
known parameters (lfit_python_tpu.examples.TRUE_PARAMS) plus a
reference-format mcmc_input.dat, into this directory.

    python examples/make_demo.py
    python -m lfit_python_tpu.cli fit examples/demo_input.dat --outdir out
"""
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from lfit_python_tpu.examples import make_synthetic_lightcurve  # noqa: E402

lc = make_synthetic_lightcurve(n_points=150, noise=0.0025, seed=42)
np.savetxt(os.path.join(HERE, "demo_ecl0.txt"),
           np.column_stack([lc.phase, lc.flux, lc.err]),
           header="phase flux flux_err (synthetic, TRUE_PARAMS, noise=0.0025)")

with open(os.path.join(HERE, "demo_input.dat"), "w") as fh:
    fh.write("""# demo: single simple eclipse (BASELINE config 1), synthetic data
nwalkers = 1024
nburn = 300
nprod = 300
neclipses = 1
complex = 0
useGP = 0
scatter_1 = 0.002

file_0 = demo_ecl0.txt
band_0 = g

q_core    = 0.16  uniform 0.03 3.0  1
dphi_core = 0.041 uniform 0.01 0.2  1
rwd_core  = 0.011 uniform 0.0005 0.1 1
wdFlux_g = 0.11 uniform 0 1 1
rsFlux_g = 0.028 uniform 0 1 1
ulimb_g  = 0.3  gauss 0.3 0.05 0
dFlux_0 = 0.045 uniform 0 1 1
sFlux_0 = 0.085 uniform 0 1 1
rdisc_0 = 0.42 uniform 0.2 0.9 1
scale_0 = 0.022 log_uniform 1e-4 0.5 1
az_0    = 157  uniform 50 175 1
fis_0   = 0.22 uniform 0 1 1
dexp_0  = 1.4  uniform 0 3 1
phi0_0  = 0.001 uniform -0.05 0.05 1
""")
print("wrote demo_ecl0.txt and demo_input.dat")
