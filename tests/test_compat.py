"""Reference-API compatibility layer tests."""

import numpy as np
import pytest

from lfit_python_tpu.compat import (
    CV,
    Prior,
    dynasty_par_names,
    dynasty_par_vals,
    flatchain,
    readchain,
    readflatchain,
    rebin,
)
from lfit_python_tpu.models.cv import CVConfig


class TestCVCompat:
    PARS = np.array([0.1, 0.05, 0.08, 0.03, 0.15, 0.04, 0.44, 0.3, 0.01,
                     0.02, 160.0, 0.2, 1.5, 0.0])

    def test_calcflux_and_components(self):
        cv = CV(self.PARS, config=CVConfig(
            n_disc_rad=6, n_disc_az=8, n_spot=8,
            n_donor_lat=6, n_donor_lon=8))
        phase = np.linspace(-0.1, 0.1, 21)
        total = cv.calcFlux(self.PARS, phase)
        assert total.shape == (21,)
        np.testing.assert_allclose(
            total, cv.ywd + cv.ydisc + cv.yspot + cv.ysec, rtol=1e-6)
        # out of eclipse the WD curve sits at wdFlux
        assert cv.ywd[0] == pytest.approx(0.1, rel=1e-5)

    def test_complex_pars_autodetect(self):
        pars = np.concatenate([self.PARS, [2.0, 1.0, 90.0, 0.0]])
        cv = CV(pars, config=None)
        assert cv.config.complex_spot


class TestChainCompat:
    def test_readchain_and_flat(self, tmp_path):
        from lfit_python_tpu.utils.chains import ChainWriter

        rng = np.random.default_rng(0)
        ch = rng.standard_normal((6, 4, 2))
        lp = rng.standard_normal((6, 4))
        with ChainWriter(tmp_path / "c.txt", ["a", "b"]) as w:
            w.append(ch, lp)
        chain, lnp, names = readchain(tmp_path / "c.txt")
        assert names == ["a", "b"]
        flat, names2 = readflatchain(tmp_path / "c.txt", discard=2)
        assert flat.shape == (16, 2)
        np.testing.assert_allclose(flat, flatchain(chain, 2), rtol=1e-9)


class TestTreeCompat:
    def test_dynasty_accessors(self):
        from lfit_python_tpu.examples import build_model

        m = build_model(n_eclipses=1, n_points=8).compile()
        vals = dynasty_par_vals(m)
        names = dynasty_par_names(m)
        assert len(vals) == len(names) == m.n_var
        assert names[0] == "q_core"
