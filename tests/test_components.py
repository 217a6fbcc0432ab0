"""Component-level analytic tests (SURVEY.md §4 "Component tests")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfit_python_tpu.models import components as comp
from lfit_python_tpu.models.cv import CVConfig, cv_fluxes
from lfit_python_tpu.roche.geometry import eclipse_half_width, findi, l1_potential, xl1

Q = 0.15
DPHI = 0.04

# moderate element grids for orchestrator-level tests: every assertion here
# is resolution-independent (normalisations, symmetries, component sums)
_CFG = CVConfig(n_disc_rad=8, n_disc_az=12, n_spot=12,
                n_donor_lat=8, n_donor_lon=12)


@pytest.fixture(scope="module")
def geom():
    x1 = xl1(Q)
    pl1 = l1_potential(Q, x1)
    incl = findi(Q, DPHI, x1, pl1)
    return x1, pl1, incl


class TestWhiteDwarf:
    def test_edge_fraction_limits(self):
        for u in (0.0, 0.3, 0.9):
            assert float(comp._edge_visible_fraction(1.0, u)) == pytest.approx(1.0)
            assert float(comp._edge_visible_fraction(-1.0, u)) == pytest.approx(0.0)
            # edge through the centre: exactly half the flux (symmetry)
            assert float(comp._edge_visible_fraction(0.0, u)) == pytest.approx(0.5)

    def test_uniform_disc_chord_area(self):
        # u = 0: fraction must equal the circular-segment area formula
        x = 0.37
        a = -x
        seg = (np.arccos(a) - a * np.sqrt(1 - a * a)) / np.pi
        assert float(comp._edge_visible_fraction(x, 0.0)) == pytest.approx(seg)

    def test_lightcurve_shape(self, geom):
        x1, pl1, incl = geom
        phases = jnp.linspace(-0.1, 0.1, 201)
        y = comp.wd_flux(Q, incl, phases, 0.01, 0.3, x1, pl1)
        y = np.asarray(y)
        assert y[0] == pytest.approx(1.0)
        assert y[-1] == pytest.approx(1.0)
        assert y[100] == pytest.approx(0.0, abs=1e-12)  # mid-eclipse: total
        # half flux exactly when the centre crosses the edge (+- dphi/2)
        mid = float(
            comp.wd_visible_fraction(Q, incl, DPHI / 2, 0.01, 0.3, x1, pl1)
        )
        assert mid == pytest.approx(0.5, abs=0.01)
        # smooth monotone ingress
        ing = y[80:100]
        assert np.all(np.diff(ing) <= 1e-12)

    def test_edge_on_mid_eclipse_fully_dark(self):
        # regression (round 3): for near-edge-on systems the mid-eclipse
        # ray passes close to the donor CENTRE; the shadow-distance
        # linearisation d = clear/|grad| collapses (d ~ -r2 < rwd) and,
        # before the inscribed-sphere certain-occultation guard, reported
        # up to 39% of the WD visible at mid-eclipse (i=89.9, q=0.05)
        for q, incl in [(0.05, 89.9), (0.1, 89.5), (0.12, 90.0)]:
            x1 = xl1(q)
            pl1 = l1_potential(q, x1)
            phases = jnp.linspace(-0.005, 0.005, 101)
            y = np.asarray(comp.wd_flux(q, incl, phases, 0.01, 0.3,
                                        x1, pl1))
            np.testing.assert_allclose(y, 0.0, atol=1e-12)
            # scalar oracle agrees
            mid = float(comp.wd_visible_fraction(q, incl, 0.0, 0.01, 0.3,
                                                 x1, pl1))
            assert mid == 0.0

    def test_ingress_duration_scales_with_rwd(self, geom):
        # contact-to-contact duration ~ 2*rwd / sweep speed: doubling rwd
        # should roughly double the ingress duration
        x1, pl1, incl = geom
        phases = jnp.linspace(-0.04, 0.0, 400)

        def duration(rwd):
            y = np.asarray(comp.wd_flux(Q, incl, phases, rwd, 0.3, x1, pl1))
            inside = (y < 0.999) & (y > 0.001)
            return inside.sum()

        d1, d2 = duration(0.005), duration(0.01)
        assert d2 == pytest.approx(2 * d1, rel=0.15)


class TestDisc:
    def test_weights_normalised_and_powerlaw(self):
        pos, w = comp.disc_elements(0.01, 0.3, dexp=1.0)
        assert float(jnp.sum(w)) == pytest.approx(1.0)
        r = np.linalg.norm(np.asarray(pos), axis=1)
        assert r.min() > 0.01 and r.max() < 0.3

    def test_unocculted_sums_to_one(self, geom):
        x1, pl1, incl = geom
        pos, w = comp.disc_elements(0.01, 0.3, 1.5)
        y = comp.disc_flux(Q, incl, jnp.asarray([0.25, 0.6]), pos, w, x1, pl1)
        np.testing.assert_allclose(np.asarray(y), 1.0)

    def test_fully_eclipsed_at_conjunction(self, geom):
        x1, pl1, incl = geom
        # a small disc is completely inside the shadow at phase 0
        pos, w = comp.disc_elements(0.01, 0.1, 1.5)
        y = comp.disc_flux(Q, incl, jnp.asarray([0.0]), pos, w, x1, pl1)
        assert float(y[0]) == pytest.approx(0.0, abs=1e-12)


class TestSpot:
    def test_profile_peak_and_normalisation(self):
        pos, w = comp.spot_elements(Q, 0.3, 0.02, 120.0, 1.0, 1.0)
        assert float(jnp.sum(w)) == pytest.approx(1.0)
        # spot strip starts at the stream impact point at |r| = rdisc
        assert float(jnp.linalg.norm(pos[0])) == pytest.approx(0.3, abs=0.01)

    def test_hump_precedes_eclipse(self, geom):
        x1, pl1, incl = geom
        pos, w = comp.spot_elements(Q, 0.3, 0.02, 160.0, 1.0, 1.0)
        nrm = comp.spot_normal(160.0, 90.0, 0.0)
        phases = jnp.linspace(-0.5, 0.5, 101)
        y = np.asarray(
            comp.spot_flux(Q, incl, phases, pos, w, 0.2, nrm, x1, pl1)
        )
        peak_phase = float(phases[np.argmax(y)])
        assert -0.35 < peak_phase < 0.0    # orbital hump before eclipse
        assert y[50] < 0.3                 # spot eclipsed near phase 0


class TestDonor:
    def test_quadrature_symmetry_and_ellipsoidal(self, geom):
        x1, pl1, incl = geom
        grid = comp.donor_grid(Q, x1, pl1)
        ph = jnp.asarray([0.0, 0.25, 0.5, 0.75])
        y = np.asarray(comp.donor_flux(incl, ph, grid))
        assert y[1] == pytest.approx(y[3], rel=1e-10)   # quadrature symmetry
        assert y[1] > y[0] and y[1] > y[2]              # ellipsoidal maxima

    def test_areas_positive_total_reasonable(self, geom):
        x1, pl1, incl = geom
        grid = comp.donor_grid(Q, x1, pl1)
        a = np.asarray(grid.areas)
        assert (a > 0).all()
        # total lobe area within a factor ~2 of the Eggleton-sphere area
        from numpy import log
        q = Q
        r_egg = 0.49 * q ** (2 / 3) / (0.6 * q ** (2 / 3) + log(1 + q ** (1 / 3)))
        sphere = 4 * np.pi * r_egg ** 2
        assert 0.5 * sphere < a.sum() < 2.0 * sphere


class TestDonorQuadrature:
    """The fused posterior's donor-curve quadrature + Catmull-Rom
    interpolation (components.donor_curve_nodes/donor_curve_eval) against
    exact per-phase element sums — interp error must sit an order under
    the 1e-6 relative-flux parity gate at the default n_quad."""

    @pytest.mark.parametrize("q,incl_off", [(0.08, 0.0), (0.15, 0.0),
                                            (0.5, -3.0), (1.5, 2.0)])
    def test_interp_matches_exact(self, q, incl_off):
        # The donor curve has a derivative kink at every element's
        # terminator crossing, so interpolation converges ~h^1.5, not
        # h^4; at the default n_quad = 256 the error must stay ~1e-5 of
        # the donor flux (=> ~3e-7 of a typical total flux, under the
        # 1e-6 parity gate; see CVConfig.n_donor_quad).
        x1 = xl1(q)
        pl1 = l1_potential(q, x1)
        incl = findi(q, DPHI, x1, pl1) + incl_off
        grid = comp.donor_grid(q, x1, pl1)          # full default resolution
        ph = jnp.asarray(np.linspace(-0.7, 1.3, 1501))   # incl. wraps
        exact = np.asarray(comp.donor_flux(incl, ph, grid))
        nodes = comp.donor_curve_nodes(incl, grid, 0.9, 256)
        approx = np.asarray(comp.donor_curve_eval(nodes, ph))
        err = np.abs(approx - exact) / exact.max()
        assert err.max() < 1.2e-5, f"donor interp error {err.max():.2e}"
        # and it must keep converging with node count (kink-limited rate)
        nodes2 = comp.donor_curve_nodes(incl, grid, 0.9, 1024)
        err2 = np.abs(np.asarray(comp.donor_curve_eval(nodes2, ph))
                      - exact) / exact.max()
        assert err2.max() < 0.4 * err.max()

    def test_symmetry_fold(self, geom):
        x1, pl1, incl = geom
        grid = comp.donor_grid(Q, x1, pl1)
        # the half-period quadrature assumes F is even and periodic
        ph = jnp.asarray([0.1, -0.1, 0.9, 1.1, 0.37, -0.37])
        exact = np.asarray(comp.donor_flux(incl, ph, grid))
        assert exact[0] == pytest.approx(exact[1], rel=1e-12)
        assert exact[0] == pytest.approx(exact[2], rel=1e-12)
        assert exact[0] == pytest.approx(exact[3], rel=1e-12)
        assert exact[4] == pytest.approx(exact[5], rel=1e-12)

    def test_gradient_flows(self, geom):
        x1, pl1, incl = geom

        def f(qv, ph):
            x1v = xl1(qv)
            pl1v = l1_potential(qv, x1v)
            grid = comp.donor_grid(qv, x1v, pl1v, 8, 12)
            nodes = comp.donor_curve_nodes(incl, grid, 0.9, 32)
            return comp.donor_curve_eval(nodes, ph)

        g = jax.grad(lambda qv: f(qv, jnp.asarray(0.03)))(jnp.asarray(Q))
        assert np.isfinite(float(g))
        eps = 1e-6
        fd = (float(f(jnp.asarray(Q + eps), jnp.asarray(0.03)))
              - float(f(jnp.asarray(Q - eps), jnp.asarray(0.03)))) / (2 * eps)
        assert float(g) == pytest.approx(fd, rel=1e-4, abs=1e-8)


class TestIntervalFastPath:
    """Cross-validation: interval-based visibility (fast path) must agree
    with the direct per-phase blink sweep (oracle path)."""

    def test_disc_intervals_match_blink(self, geom):
        x1, pl1, incl = geom
        pos, w = comp.disc_elements(0.01, 0.3, 1.5, n_rad=8, n_az=12)
        phases = jnp.linspace(-0.2, 0.2, 101)
        slow = np.asarray(comp.disc_flux(Q, incl, phases, pos, w, x1, pl1))
        iv = comp.element_intervals(Q, incl, pos, x1, pl1)
        fast = np.asarray(comp.element_flux_curve(phases, None, iv, w))
        # agreement everywhere except possibly phases landing exactly on a
        # contact (measure zero): compare elementwise with a tiny tolerance
        np.testing.assert_allclose(fast, slow, atol=1e-9)

    def test_spot_intervals_match_blink(self, geom):
        x1, pl1, incl = geom
        pos, w = comp.spot_elements(Q, 0.3, 0.02, 160.0, 1.0, 1.0)
        nrm = comp.spot_normal(160.0, 90.0, 0.0)
        phases = jnp.linspace(-0.3, 0.3, 121)
        slow = np.asarray(
            comp.spot_flux(Q, incl, phases, pos, w, 0.2, nrm, x1, pl1))
        iv = comp.element_intervals(Q, incl, pos, x1, pl1)
        e = comp.earth_vector(phases, incl)
        factor = np.asarray(0.2 + 0.8 * jnp.maximum(e @ nrm, 0.0))
        fast = np.asarray(
            comp.element_flux_curve(phases, None, iv, w)) * factor
        np.testing.assert_allclose(fast, slow, atol=1e-9)

    def test_analytic_smearing_matches_subsampling(self, geom):
        x1, pl1, incl = geom
        pos, w = comp.disc_elements(0.01, 0.3, 1.5, n_rad=8, n_az=12)
        phases = jnp.linspace(-0.05, 0.05, 41)
        width = jnp.full_like(phases, 0.003)
        iv = comp.element_intervals(Q, incl, pos, x1, pl1)
        exact = np.asarray(comp.element_flux_curve(phases, width, iv, w))
        # oracle: dense subsampling of the exposure with the same intervals
        K = 64
        offs = (jnp.arange(K) + 0.5) / K - 0.5
        sub = (phases[:, None] + width[:, None] * offs[None, :]).reshape(-1)
        dense = np.asarray(
            comp.element_flux_curve(sub, None, iv, w)).reshape(-1, K).mean(1)
        np.testing.assert_allclose(exact, dense, atol=2e-3)


class TestCVOrchestrator:
    PARS = np.array(
        [0.1, 0.05, 0.08, 0.03, Q, DPHI, 0.44, 0.3, 0.01,
         0.02, 160.0, 0.2, 1.5, 0.0]
    )

    def test_total_is_sum_of_components(self):
        phases = jnp.linspace(-0.2, 0.2, 81)
        out = cv_fluxes(jnp.asarray(self.PARS), phases, config=_CFG)
        np.testing.assert_allclose(
            np.asarray(out.total),
            np.asarray(out.ywd + out.ydisc + out.yspot + out.ysec),
            rtol=1e-12,
        )
        assert np.isfinite(np.asarray(out.total)).all()

    def test_out_of_eclipse_levels(self):
        out = cv_fluxes(jnp.asarray(self.PARS), jnp.asarray([0.25]), config=_CFG)
        assert float(out.ywd[0]) == pytest.approx(self.PARS[0])
        assert float(out.ydisc[0]) == pytest.approx(self.PARS[1])
        assert float(out.ysec[0]) == pytest.approx(self.PARS[3])

    def test_eclipse_depth(self):
        out = cv_fluxes(jnp.asarray(self.PARS), jnp.asarray([0.0, 0.25]), config=_CFG)
        assert float(out.total[0]) < float(out.total[1])
        assert float(out.ywd[0]) == pytest.approx(0.0, abs=1e-12)

    @pytest.mark.slow
    def test_phi0_shifts_curve(self):
        p2 = self.PARS.copy()
        p2[13] = 0.01
        ph = jnp.linspace(-0.05, 0.05, 41)
        a = cv_fluxes(jnp.asarray(self.PARS), ph, config=_CFG).total
        b = cv_fluxes(jnp.asarray(p2), ph + 0.01, config=_CFG).total
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9)

    @pytest.mark.slow
    def test_exposure_smearing_softens(self):
        ph = jnp.linspace(-0.03, 0.03, 61)
        w = jnp.full_like(ph, 0.002)
        sharp = cv_fluxes(jnp.asarray(self.PARS), ph, config=_CFG).total
        smear = cv_fluxes(jnp.asarray(self.PARS), ph, w,
                          _CFG._replace(n_exposure_sub=5)).total
        # smearing reduces the max |gradient| of the curve
        g1 = np.abs(np.diff(np.asarray(sharp))).max()
        g2 = np.abs(np.diff(np.asarray(smear))).max()
        assert g2 < g1

    @pytest.mark.slow
    def test_vmap_over_walkers(self):
        pars = jnp.asarray(np.stack([self.PARS, self.PARS * 1.01]))
        ph = jnp.linspace(-0.1, 0.1, 21)
        tot = jax.vmap(lambda p: cv_fluxes(p, ph, config=_CFG).total)(pars)
        assert tot.shape == (2, 21)
        assert np.isfinite(np.asarray(tot)).all()

    def test_complex_spot_runs(self):
        pars = np.concatenate([self.PARS, [2.0, 1.5, 80.0, 10.0]])
        out = cv_fluxes(jnp.asarray(pars), jnp.linspace(-0.1, 0.1, 21),
                        config=_CFG._replace(complex_spot=True))
        assert np.isfinite(np.asarray(out.total)).all()


class TestWDFastPath:
    def test_batched_wd_matches_scalar_oracle(self, geom):
        x1, pl1, incl = geom
        phases = jnp.linspace(-0.06, 0.06, 121)
        fast = np.asarray(comp.wd_flux(Q, incl, phases, 0.012, 0.35, x1, pl1))
        slow = np.asarray(jax.vmap(
            lambda ph: comp.wd_visible_fraction(
                Q, incl, ph, 0.012, 0.35, x1, pl1))(phases))
        np.testing.assert_allclose(fast, slow, atol=1e-9)


class TestMirrorContacts:
    """The mirror identity behind cv_fluxes's halved contact solve: the
    Roche geometry is symmetric under (y, phase) -> (-y, -phase), so an
    orbital-plane element at (px, -py) has eclipse interval
    (-phi_out, -phi_in) of its partner at (px, py) — and the solver's
    arithmetic commutes EXACTLY with the y negation, so the identity is
    bitwise, not just analytic.  cv_fluxes reconstructs the sin(az) < 0
    disc half by negation instead of solving it (models/cv.py); the
    golden tests (1e-9 pins on full cv_fluxes output computed before the
    change) are the end-to-end guard."""

    def test_reflection_bitwise(self, geom):
        from lfit_python_tpu.roche.geometry import contact_interval

        x1, pl1, incl = geom
        rng = np.random.default_rng(7)
        r = rng.uniform(0.02, 0.55, 256)
        a = rng.uniform(0.0, np.pi, 256)          # sin(az) > 0 half
        px = jnp.asarray(r * np.cos(a))
        py = jnp.asarray(r * np.sin(a))

        def solve(pxx, pyy):
            p = jnp.stack([pxx, pyy, jnp.zeros_like(pxx)], axis=-1)
            return jax.vmap(
                lambda pp: contact_interval(Q, incl, pp, x1, pl1))(p)

        pin, pout, ecl = solve(px, py)
        min_, mout_, mecl_ = solve(px, -py)
        assert np.array_equal(np.asarray(ecl), np.asarray(mecl_))
        assert np.asarray(ecl).sum() > 50       # the draw actually eclipses
        m = np.asarray(ecl)
        np.testing.assert_array_equal(
            np.asarray(min_)[m], -np.asarray(pout)[m])
        np.testing.assert_array_equal(
            np.asarray(mout_)[m], -np.asarray(pin)[m])

    def test_cv_fluxes_matches_full_solve(self, geom):
        """cv_fluxes with the mirror reconstruction (even n_az) agrees
        with an odd-n_az neighbouring-resolution run only statistically —
        so instead compare against a direct full-set interval solve wired
        through element_flux_curve, which is exactly what the pre-mirror
        cv_fluxes computed."""
        x1, pl1, incl = geom
        pars = jnp.asarray(
            [0.1, 0.3, 0.2, 0.1, Q, DPHI, 0.6, 0.35, 0.012, 0.02,
             160.0, 0.2, 1.5, 0.0])
        phases = jnp.linspace(-0.12, 0.12, 41)
        cfg = _CFG
        out = cv_fluxes(pars, phases, config=cfg)

        # full-set solve (the pre-mirror path), assembled by hand
        from lfit_python_tpu.models.cv import cv_geometry
        geo = cv_geometry(pars, cfg)
        disc_pos, disc_w = comp.disc_elements(
            pars[8], geo.rdisc, pars[12], cfg.n_disc_rad, cfg.n_disc_az,
            pars.dtype)
        iv = comp.element_intervals(Q, geo.incl, disc_pos, x1, pl1)
        ydisc_full = pars[1] * comp.element_flux_curve(
            phases, None, iv, disc_w)
        np.testing.assert_array_equal(
            np.asarray(out.ydisc), np.asarray(ydisc_full))
