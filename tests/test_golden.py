"""Golden regression values: pinned f64 CPU outputs of the forward model,
geometry solves, and GP likelihood (tests/golden/golden_v1.npz, regenerated
only on INTENTIONAL convention changes via tests/make_golden.py).

Guards against silent numerical drift across refactors and rounds — the
reference itself is unavailable (SURVEY.md provenance warning), so these
values plus the oracle cross-checks ARE the parity baseline.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from lfit_python_tpu.models.cv import CVConfig, cv_fluxes
from lfit_python_tpu.ops.gp import matern32_gp_ln_like
from lfit_python_tpu.roche.geometry import (
    contact_interval,
    findi,
    l1_potential,
    xl1,
)

GOLDEN = Path(__file__).parent / "golden" / "golden_v1.npz"
CFG = CVConfig(n_disc_rad=8, n_disc_az=12, n_spot=12,
               n_donor_lat=8, n_donor_lon=12)
SIMPLE = np.array([0.1, 0.05, 0.08, 0.03, 0.15, 0.04, 0.44, 0.3, 0.01,
                   0.02, 160.0, 0.2, 1.5, 0.0])
COMPLEX = np.concatenate([SIMPLE, [2.0, 1.3, 80.0, 15.0]])
PHASES = np.linspace(-0.15, 0.15, 61)


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


class TestGolden:
    @pytest.mark.parametrize("tag,pars,cplx", [
        ("simple", SIMPLE, False), ("complex", COMPLEX, True)])
    def test_model_fluxes(self, golden, tag, pars, cplx):
        f = cv_fluxes(jnp.asarray(pars), jnp.asarray(PHASES),
                      config=CFG._replace(complex_spot=cplx))
        for name in ("total", "ywd", "ydisc", "yspot", "ysec"):
            np.testing.assert_allclose(
                np.asarray(getattr(f, name)), golden[f"{tag}_{name}"],
                rtol=1e-9, atol=1e-12,
                err_msg=f"{tag}.{name} drifted from golden")

    def test_geometry(self, golden):
        for q in (0.08, 0.15, 0.5, 1.5):
            assert float(xl1(q)) == pytest.approx(
                float(golden[f"xl1_{q}"]), rel=1e-12)
            assert float(findi(q, 0.04)) == pytest.approx(
                float(golden[f"findi_{q}"]), rel=1e-10)

    def test_contact_interval(self, golden):
        q = 0.15
        x1 = xl1(q)
        pl1 = l1_potential(q, x1)
        incl = findi(q, 0.04, x1, pl1)
        p = jnp.array([0.25, -0.1, 0.0])
        pi_, po_, ec = contact_interval(q, incl, p, x1, pl1)
        exp = golden["contact"]
        assert float(ec) == exp[2]
        assert float(pi_) == pytest.approx(exp[0], abs=1e-10)
        assert float(po_) == pytest.approx(exp[1], abs=1e-10)

    def test_gp_lnlike(self, golden):
        val = matern32_gp_ln_like(
            jnp.asarray(golden["gp_t"]), jnp.asarray(golden["gp_y"]),
            jnp.full(64, 0.01), 0.05, 0.15)
        assert float(val) == pytest.approx(float(golden["gp_lnlike"]),
                                           rel=1e-10)


class TestMixedPrecision:
    """The f32 + mixed-precision path against the f64 golden values
    (SURVEY.md §7 hard-part 2; BASELINE.json 1e-6 relative-flux gate).
    Typical error must sit well under the gate; the golden vectors here
    avoid pathological tangential grazes, which are quantified separately
    in BASELINE.md from random-draw sweeps (tools/parity.py)."""

    @pytest.mark.parametrize("tag,pars,cplx", [
        ("simple", SIMPLE, False), ("complex", COMPLEX, True)])
    def test_f32_precise_meets_gate(self, golden, tag, pars, cplx):
        cfg = CFG._replace(complex_spot=cplx, mixed_precision=True)
        f = cv_fluxes(jnp.asarray(pars, jnp.float32),
                      jnp.asarray(PHASES, jnp.float32), config=cfg)
        scale = float(np.max(np.abs(golden[f"{tag}_total"])))
        for name in ("total", "ywd", "ydisc", "yspot", "ysec"):
            err = np.abs(np.asarray(getattr(f, name), np.float64)
                         - golden[f"{tag}_{name}"]) / scale
            assert err.max() < 1e-6, (
                f"{tag}.{name} mixed-precision parity {err.max():.2e}"
                f" exceeds the 1e-6 gate")

    @pytest.mark.parametrize("tag,pars,cplx", [
        ("simple", SIMPLE, False), ("complex", COMPLEX, True)])
    def test_f32_fast_typical_parity(self, golden, tag, pars, cplx):
        """The fast (pure f32) path: median well under the gate, max
        bounded by the documented graze tail."""
        cfg = CFG._replace(complex_spot=cplx, mixed_precision=False)
        f = cv_fluxes(jnp.asarray(pars, jnp.float32),
                      jnp.asarray(PHASES, jnp.float32), config=cfg)
        scale = float(np.max(np.abs(golden[f"{tag}_total"])))
        err = np.abs(np.asarray(f.total, np.float64)
                     - golden[f"{tag}_total"]) / scale
        assert np.median(err) < 1e-6
        assert err.max() < 1e-3
