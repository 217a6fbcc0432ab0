"""Prior-family and hierarchical-tree tests (SURVEY.md §2 L3/L4 layers)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lfit_python_tpu.models.priors import (
    Param,
    Prior,
    ln_prior_table,
    make_prior_table,
)
from lfit_python_tpu.models.tree import (
    EclipseSpec,
    HierarchicalModel,
    Lightcurve,
    CORE_NAMES,
    BAND_NAMES,
    ECLIPSE_NAMES,
    GP_NAMES,
)


def _p(name, start, prior, is_var=True):
    return Param(name, start, prior, is_var)


class TestPriors:
    def test_uniform(self):
        pr = Prior("uniform", 0.0, 2.0)
        assert float(pr.ln_prob(1.0)) == pytest.approx(np.log(0.5))
        assert float(pr.ln_prob(3.0)) == -np.inf
        assert float(pr.ln_prob(-0.1)) == -np.inf

    def test_log_uniform(self):
        pr = Prior("log_uniform", 0.1, 10.0)
        # p(x) = 1/(x ln(hi/lo))
        assert float(pr.ln_prob(1.0)) == pytest.approx(-np.log(np.log(100.0)))
        assert float(pr.ln_prob(0.05)) == -np.inf

    def test_gauss(self):
        pr = Prior("gauss", 2.0, 0.5)
        expected = -0.5 * np.log(2 * np.pi * 0.25)
        assert float(pr.ln_prob(2.0)) == pytest.approx(expected)

    def test_gauss_pos_truncates(self):
        pr = Prior("gaussPos", 1.0, 2.0)
        assert float(pr.ln_prob(-0.5)) == -np.inf
        assert np.isfinite(float(pr.ln_prob(0.5)))
        # integrates to 1 over [0, inf): check by coarse quadrature
        xs = np.linspace(0, 30, 30001)
        lp = np.array([float(pr.ln_prob(x)) for x in xs[:: 100]])
        # just sanity: normalisation constant larger than untruncated
        pr0 = Prior("gauss", 1.0, 2.0)
        assert float(pr.ln_prob(1.0)) > float(pr0.ln_prob(1.0))

    def test_mod_jeff(self):
        pr = Prior("mod_jeff", 0.1, 10.0)
        assert np.isfinite(float(pr.ln_prob(0.0)))
        assert float(pr.ln_prob(10.5)) == -np.inf
        # p ~ 1/(x+knee): ratio check
        r = float(pr.ln_prob(0.0)) - float(pr.ln_prob(0.9))
        assert r == pytest.approx(np.log((0.9 + 0.1) / 0.1))

    def test_vectorised_sum(self):
        params = [
            _p("a", 1.0, Prior("uniform", 0, 2)),
            _p("b", 2.0, Prior("gauss", 2.0, 0.5)),
        ]
        table = make_prior_table(params)
        total = float(ln_prior_table(jnp.asarray([1.0, 2.0]), table))
        expected = float(params[0].prior.ln_prob(1.0)) + float(
            params[1].prior.ln_prob(2.0))
        assert total == pytest.approx(expected)

    def test_unknown_type_rejected(self):
        with pytest.raises(ValueError):
            Prior("lorentz", 0, 1)


class TestPriorGradients:
    """Every family's grad must be finite for EVERY (p1, p2) that can
    appear in ANY row of a mixed table — unselected rows still evaluate
    all five formulas, and a v-dependent inf there meets its zero
    cotangent as 0*inf = NaN in the VJP.  Regression for the round-4
    confirmed bug: grad of a uniform(lo, 0) prior was NaN because the
    gauss row divided by p2 = 0 (this poisoned jax.grad of every
    GP-flagged posterior, whose hyperparameter priors are uniform(lo, 0))."""

    EDGE_HYPERS = [(-20.0, 0.0), (0.0, 1.0), (0.0, 0.0), (1.0, 0.0),
                   (-1.0, -0.5), (0.5, 10.0)]
    EDGE_VALS = [-5.0, 0.0, 0.5, 100.0]

    @staticmethod
    def _grad(ty, p1, p2, v):
        import jax
        t = make_prior_table([_p("x", v, Prior(ty, p1, p2))])
        return np.asarray(
            jax.grad(lambda x: ln_prior_table(x, t))(jnp.asarray([v])))

    def test_minimal_repro_uniform_hi_zero(self):
        g = self._grad("uniform", -20.0, 0.0, -5.0)
        assert np.isfinite(g).all()

    @pytest.mark.parametrize(
        "ty", ["uniform", "log_uniform", "gauss", "gaussPos", "mod_jeff"])
    def test_grad_finite_at_edge_hypers(self, ty):
        for p1, p2 in self.EDGE_HYPERS:
            for v in self.EDGE_VALS:
                g = self._grad(ty, p1, p2, v)
                assert np.isfinite(g).all(), (ty, p1, p2, v, g)

    def test_grad_matches_analytic_in_support(self):
        # d/dv checks where the analytic derivative is simple
        assert self._grad("uniform", 0.0, 2.0, 1.0)[0] == 0.0
        assert self._grad("gauss", 2.0, 0.5, 3.0)[0] == pytest.approx(
            -(3.0 - 2.0) / 0.25)
        assert self._grad("log_uniform", 0.1, 10.0, 2.0)[0] == pytest.approx(
            -1.0 / 2.0)
        assert self._grad("mod_jeff", 0.1, 10.0, 0.9)[0] == pytest.approx(
            -1.0 / (0.9 + 0.1))

    def test_mixed_table_grad_finite(self):
        """The exact shipped failure: a gauss row NEXT TO uniform(lo, 0)
        rows (GP hyperparameter priors) in one table."""
        import jax
        t = make_prior_table([
            _p("ln_amp", -8.0, Prior("uniform", -20.0, 0.0)),
            _p("flux", 0.1, Prior("gauss", 0.1, 0.01)),
            _p("tau", -5.0, Prior("uniform", -10.0, 0.0)),
        ])
        g = np.asarray(jax.grad(lambda x: ln_prior_table(x, t))(
            jnp.asarray([-8.0, 0.1, -5.0])))
        assert np.isfinite(g).all()

    def test_degenerate_selected_hypers_give_neg_inf(self):
        # a SELECTED family with degenerate hyperparameters is -inf, not NaN
        for ty, p1, p2, v in [("uniform", 1.0, 1.0, 1.0),
                              ("gauss", 0.0, 0.0, 0.0),
                              ("log_uniform", -1.0, 2.0, 1.0),
                              ("mod_jeff", -0.1, 10.0, 1.0)]:
            t = make_prior_table([_p("x", v, Prior(ty, p1, p2))])
            assert float(ln_prior_table(jnp.asarray([v]), t)) == -np.inf


def make_tiny_model(n_ecl=2, complex_flags=(False, True), gp_flags=(False, False)):
    rng = np.random.default_rng(0)
    core = {
        "q": _p("q", 0.15, Prior("uniform", 0.03, 3.0)),
        "dphi": _p("dphi", 0.04, Prior("uniform", 0.01, 0.2)),
        "rwd": _p("rwd", 0.01, Prior("uniform", 0.0005, 0.1)),
    }
    bands = {
        "g": {
            "wdFlux": _p("wdFlux", 0.1, Prior("uniform", 0, 1)),
            "rsFlux": _p("rsFlux", 0.03, Prior("uniform", 0, 1)),
            "ulimb": _p("ulimb", 0.3, Prior("gauss", 0.3, 0.05), is_var=False),
        }
    }
    eclipses = []
    for k in range(n_ecl):
        ph = np.linspace(-0.1, 0.1, 50)
        lc = Lightcurve(ph, 0.1 + 0.01 * rng.standard_normal(50),
                        np.full(50, 0.01), name=f"ecl{k}")
        params = {
            "dFlux": _p("dFlux", 0.05, Prior("uniform", 0, 1)),
            "sFlux": _p("sFlux", 0.08, Prior("uniform", 0, 1)),
            "rdisc": _p("rdisc", 0.44, Prior("uniform", 0.2, 0.9)),
            "scale": _p("scale", 0.02, Prior("log_uniform", 1e-4, 0.5)),
            "az": _p("az", 160.0, Prior("uniform", 50, 180)),
            "fis": _p("fis", 0.2, Prior("uniform", 0, 1)),
            "dexp": _p("dexp", 1.5, Prior("uniform", 0, 3)),
            "phi0": _p("phi0", 0.0, Prior("uniform", -0.05, 0.05)),
        }
        if complex_flags[k]:
            params.update({
                "exp1": _p("exp1", 2.0, Prior("uniform", 0.01, 5)),
                "exp2": _p("exp2", 1.0, Prior("uniform", 0.01, 5)),
                "tilt": _p("tilt", 90.0, Prior("uniform", 0, 180)),
                "yaw": _p("yaw", 0.0, Prior("uniform", -90, 90)),
            })
        if gp_flags[k]:
            params.update({
                "ln_ampin_gp": _p("ln_ampin_gp", -8.0, Prior("uniform", -20, 0)),
                "ln_ampout_gp": _p("ln_ampout_gp", -9.0, Prior("uniform", -20, 0)),
                "ln_tau_gp": _p("ln_tau_gp", -5.0, Prior("uniform", -10, 0)),
            })
        eclipses.append(EclipseSpec(
            f"ecl{k}", "g", lc, params,
            complex_spot=complex_flags[k], use_gp=gp_flags[k]))
    return HierarchicalModel(core, bands, eclipses)


class TestTree:
    def test_layout_depth_first(self):
        m = make_tiny_model().compile()
        # core first, then band, then eclipse params in declaration order
        assert m.param_names[:3] == ["q_core", "dphi_core", "rwd_core"]
        assert m.param_names[3:6] == ["wdFlux_g", "rsFlux_g", "ulimb_g"]
        assert m.param_names[6].endswith("_ecl0")
        # complex eclipse has 4 extra params
        n0 = sum(1 for n in m.param_names if n.endswith("_ecl0"))
        n1 = sum(1 for n in m.param_names if n.endswith("_ecl1"))
        assert n1 == n0 + 4

    def test_var_subset_excludes_fixed(self):
        m = make_tiny_model().compile()
        assert "ulimb_g" not in m.var_names()
        assert m.n_var == m.n_full - 1

    def test_var_groups_by_node(self):
        """Per-node grouping for corner plots: core, band, then eclipses,
        covering every variable param exactly once."""
        m = make_tiny_model().compile()
        groups = dict(m.var_groups())
        assert list(dict(m.var_groups())) == ["core", "g", "ecl0", "ecl1"]
        names = m.var_names()
        assert [names[i] for i in groups["core"]] == \
            ["q_core", "dphi_core", "rwd_core"]
        # ulimb_g is fixed -> the band group holds only the two flux params
        assert [names[i] for i in groups["g"]] == ["wdFlux_g", "rsFlux_g"]
        covered = sorted(i for idx in groups.values() for i in idx)
        assert covered == list(range(m.n_var))

    def test_full_from_var_roundtrip(self):
        m = make_tiny_model().compile()
        v = m.var_start() + 0.001
        full = m.full_from_var(jnp.asarray(v))
        np.testing.assert_allclose(
            np.asarray(full)[m.var_idx], v)
        # fixed param keeps its start value
        fixed_i = m.param_names.index("ulimb_g")
        assert float(full[fixed_i]) == 0.3

    def test_cv_params_shared_and_private(self):
        m = make_tiny_model().compile()
        full = jnp.asarray(m.full_start)
        cvp = np.asarray(m.cv_params(full))
        assert cvp.shape == (2, 18)
        # q, dphi, rwd shared across eclipses (slots 4, 5, 8)
        assert cvp[0, 4] == cvp[1, 4] == 0.15
        assert cvp[0, 5] == cvp[1, 5] == 0.04
        # simple eclipse gets neutral complex constants
        np.testing.assert_allclose(cvp[0, 14:], [1.0, 1.0, 90.0, 0.0])
        # complex eclipse gets its own values
        np.testing.assert_allclose(cvp[1, 14:], [2.0, 1.0, 90.0, 0.0])

    def test_padding_and_masks(self):
        m = make_tiny_model().compile()
        m.spec.eclipses[0].lightcurve = Lightcurve(
            np.linspace(-0.1, 0.1, 30), np.zeros(30), np.ones(30))
        m2 = m.spec.compile()
        assert m2.data_mask.shape == (2, 50)
        assert m2.data_mask[0].sum() == 30
        assert m2.data_mask[1].sum() == 50

    def test_lightcurve_loader(self, tmp_path):
        f = tmp_path / "lc.txt"
        arr = np.column_stack([
            np.linspace(-0.2, 0.2, 40), np.ones(40), np.full(40, 0.1)])
        np.savetxt(f, arr)
        lc = Lightcurve.from_file(f, trim=(-0.1, 0.1))
        assert len(lc) == 20
        assert lc.width is None

    def test_from_calib_width_from_cadence(self, tmp_path):
        """Calib files (phase flux err, no width column) get their
        exposure width reconstructed as the median sample spacing
        (reference from_calib [R-med])."""
        f = tmp_path / "lc.calib"
        ph = np.linspace(-0.2, 0.2, 41)          # spacing 0.01
        np.savetxt(f, np.column_stack([ph, np.ones(41), np.full(41, 0.1)]))
        lc = Lightcurve.from_calib(f)
        assert lc.width is not None
        np.testing.assert_allclose(lc.width, 0.01, rtol=1e-9)
        # trim applies to the calib path too
        lc2 = Lightcurve.from_calib(f, trim=(-0.1, 0.1))
        assert len(lc2) == 21

    def test_from_calib_ephemeris_folding(self, tmp_path):
        f = tmp_path / "lc_time.calib"
        t0, period = 55000.0, 0.07
        # 2.5 orbits of contiguous exposures
        t = t0 + np.linspace(0, 2.5 * period, 100, endpoint=False)
        np.savetxt(f, np.column_stack([t, np.ones(100), np.full(100, 0.1)]))
        lc = Lightcurve.from_calib(f, t0=t0, period=period)
        assert (-0.5 <= lc.phase).all() and (lc.phase < 0.5).all()
        assert (np.diff(lc.phase) >= 0).all()      # sorted after folding
        # phase of the first sample: t = t0 -> phase 0
        assert np.min(np.abs(lc.phase)) < 1e-9
        with pytest.raises(ValueError, match="both t0 and period"):
            Lightcurve.from_calib(f, t0=t0)

    def test_config_routes_calib_files(self, tmp_path):
        """.calib extension (or calib_<i> = 1) routes through from_calib;
        the global ephemeris folds time-domain data."""
        from lfit_python_tpu.utils.config import (
            build_model_from_config, parse_input_dat)

        ph = np.linspace(-0.15, 0.15, 30)
        np.savetxt(tmp_path / "e0.calib",
                   np.column_stack([ph, np.ones(30), np.full(30, 0.1)]))
        param_lines = "\n".join([
            "q_core    = 0.15  uniform 0.03 3.0  1",
            "dphi_core = 0.04  uniform 0.01 0.2  1",
            "rwd_core  = 0.01  uniform 0.0005 0.1 1",
            "wdFlux_g = 0.1  uniform 0 1 1",
            "rsFlux_g = 0.03 uniform 0 1 1",
            "ulimb_g  = 0.3  gauss 0.3 0.05 0",
            "dFlux_0 = 0.05 uniform 0 1 1",
            "sFlux_0 = 0.08 uniform 0 1 1",
            "rdisc_0 = 0.44 uniform 0.2 0.9 1",
            "scale_0 = 0.02 log_uniform 1e-4 0.5 1",
            "az_0    = 160  uniform 50 175 1",
            "fis_0   = 0.2  uniform 0 1 1",
            "dexp_0  = 1.5  uniform 0 3 1",
            "phi0_0  = 0.0  uniform -0.05 0.05 1",
        ])
        inp = tmp_path / "in.dat"
        inp.write_text(
            "neclipses = 1\nfile_0 = e0.calib\nband_0 = g\n" + param_lines
            + "\n")
        model = build_model_from_config(parse_input_dat(inp))
        lc = model.eclipses[0].lightcurve
        assert lc.width is not None           # came through from_calib
        np.testing.assert_allclose(lc.width, ph[1] - ph[0], rtol=1e-9)
