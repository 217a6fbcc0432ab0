"""Golden-value and consistency tests for the Roche geometry core.

Strategy per SURVEY.md §4: analytic limits (q -> 0 point-mass donor,
q = 1 symmetry), roundtrip identities (findi <-> eclipse_half_width),
and physical sanity for blink/stream.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfit_python_tpu.roche import (
    blink,
    earth_vector,
    eclipse_half_width,
    findi,
    l1_potential,
    lobe_radius,
    ray_clearance,
    roche_potential,
    spot_position,
    stream_trajectory,
    xl1,
)


class TestXL1:
    def test_symmetric_binary(self):
        # q = 1: L1 is exactly midway by symmetry.
        assert float(xl1(1.0)) == pytest.approx(0.5, abs=1e-12)

    def test_small_q_limit(self):
        # q -> 0: Hill-sphere limit, 1 - xl1 ~ (q/3)^(1/3).
        q = 1e-4
        got = 1.0 - float(xl1(q))
        hill = (q / 3.0) ** (1.0 / 3.0)
        assert got == pytest.approx(hill, rel=0.05)

    def test_gradient_zero_at_l1(self):
        for q in (0.05, 0.3, 1.5):
            x = xl1(q)
            p = jnp.array([x, 0.0, 0.0])
            g = jax.grad(lambda r: roche_potential(q, r))(p)
            assert abs(float(g[0])) < 1e-8

    def test_monotone_in_q(self):
        qs = jnp.array([0.05, 0.1, 0.3, 0.5, 1.0, 2.0])
        xs = jax.vmap(xl1)(qs)
        assert bool(jnp.all(jnp.diff(xs) < 0))  # heavier donor pulls L1 in


class TestBlink:
    def setup_method(self):
        self.q = 0.15
        self.x1 = xl1(self.q)
        self.pl1 = l1_potential(self.q, self.x1)

    def _vis(self, p, phase, incl):
        return bool(
            blink(self.q, jnp.asarray(p, jnp.float64),
                  earth_vector(phase, incl), self.x1, self.pl1)
        )

    def test_wd_eclipsed_at_phase_zero_high_incl(self):
        assert not self._vis([0.0, 0.0, 0.0], 0.0, 87.0)

    def test_wd_visible_at_quadrature(self):
        assert self._vis([0.0, 0.0, 0.0], 0.25, 87.0)

    def test_wd_visible_low_inclination(self):
        assert self._vis([0.0, 0.0, 0.0], 0.0, 30.0)

    def test_point_behind_donor_never_occulted(self):
        # a point on the far side of the donor, observer towards it
        assert self._vis([2.0, 0.0, 0.0], 0.0, 90.0)

    def test_clearance_continuous_across_ingress(self):
        # Window chosen inside the donor-sphere intersection regime, where
        # the WD partial-eclipse fraction relies on smooth clearance.
        phases = jnp.linspace(-0.045, 0.045, 91)
        e = earth_vector(phases, 85.0)
        c = jax.vmap(
            lambda ee: ray_clearance(
                self.q, jnp.zeros(3), ee, self.x1, self.pl1
            )
        )(e)
        # eclipsed in the middle, visible at the ends, no jumps
        assert float(c[0]) > 0 and float(c[-1]) > 0 and float(c[45]) < 0
        assert float(jnp.max(jnp.abs(jnp.diff(c)))) < 0.05

    def test_symmetry_in_phase(self):
        for ph in (0.01, 0.03):
            e_p = earth_vector(ph, 85.0)
            e_m = earth_vector(-ph, 85.0)
            c_p = ray_clearance(self.q, jnp.zeros(3), e_p, self.x1, self.pl1)
            c_m = ray_clearance(self.q, jnp.zeros(3), e_m, self.x1, self.pl1)
            assert float(c_p) == pytest.approx(float(c_m), abs=1e-10)


class TestFindI:
    @pytest.mark.parametrize("q,incl", [(0.1, 85.0), (0.2, 81.0), (0.5, 78.0)])
    def test_roundtrip_with_half_width(self, q, incl):
        half = eclipse_half_width(q, incl)
        assert np.isfinite(float(half))
        i_back = findi(q, 2.0 * float(half))
        assert float(i_back) == pytest.approx(incl, abs=1e-6)

    def test_infeasible_width_gives_nan(self):
        # an absurdly wide eclipse no inclination can produce
        assert not np.isfinite(float(findi(0.05, 0.45)))

    def test_no_eclipse_low_inclination(self):
        assert not np.isfinite(float(eclipse_half_width(0.1, 20.0)))

    def test_width_increases_with_inclination(self):
        widths = [float(eclipse_half_width(0.2, i)) for i in (80.0, 84.0, 88.0)]
        assert widths[0] < widths[1] < widths[2]


class TestLobeRadius:
    def test_towards_l1(self):
        q = 0.3
        x1 = xl1(q)
        d = jnp.array([-1.0, 0.0, 0.0])  # from donor centre towards primary
        r = lobe_radius(q, d, x1)
        assert float(r) == pytest.approx(float(1.0 - x1), rel=1e-6)

    def test_on_surface_potential(self):
        q = 0.3
        x1 = xl1(q)
        pl1 = l1_potential(q, x1)
        th = jnp.linspace(0.3, jnp.pi - 0.3, 7)
        for t in th:
            d = jnp.array([jnp.cos(t), 0.3 * jnp.sin(t), jnp.sin(t)])
            d = d / jnp.linalg.norm(d)
            r = lobe_radius(q, d, x1, pl1)
            p = jnp.array([1.0, 0.0, 0.0]) + r * d
            assert float(roche_potential(q, p)) == pytest.approx(
                float(pl1), abs=1e-9
            )

    def test_polar_smaller_than_l1(self):
        q = 0.3
        rp = lobe_radius(q, jnp.array([0.0, 0.0, 1.0]))
        assert float(rp) < float(1.0 - xl1(q))


class TestStream:
    def test_starts_at_l1_and_falls_in(self):
        q = 0.15
        traj = stream_trajectory(q)
        r = jnp.linalg.norm(traj, axis=-1)
        assert float(r[0]) == pytest.approx(float(xl1(q)), abs=1e-4)
        assert float(jnp.min(r)) < 0.3  # stream falls well inside

    def test_spot_on_requested_radius(self):
        q = 0.15
        rdisc = 0.35
        sp = spot_position(q, rdisc)
        assert float(jnp.linalg.norm(sp)) == pytest.approx(rdisc, abs=1e-3)
        # Coriolis (-2 w x v with w = +z) deflects the stream to +y; with
        # e(phi) = (sin i cos 2pi*phi, -sin i sin 2pi*phi, cos i) the observer
        # is on the +y side at negative phase, so the bright-spot "orbital
        # hump" correctly precedes the eclipse.
        assert float(sp[1]) > 0.0

    def test_vmappable_over_walkers(self):
        qs = jnp.array([0.1, 0.2, 0.3])
        rd = jnp.array([0.3, 0.35, 0.4])
        sps = jax.vmap(lambda q, r: spot_position(q, r))(qs, rd)
        radii = jnp.linalg.norm(sps, axis=-1)
        np.testing.assert_allclose(np.asarray(radii), np.asarray(rd), atol=2e-3)

    def test_trip_count_covers_prior_range(self):
        """The scan trip count (_N_STEPS, cut to the first radial
        periapsis in round 5) must leave margin at the EXTREMES of the
        q prior (examples: uniform(0.03, 3.0)): the stream must still
        reach a typical disc rim — and pass its periapsis — well before
        the scan ends, for the smallest and largest q the prior admits.
        Guards the step-count bound against future dt / prior changes
        (steps-to-periapsis grows as q falls: 3759 at q = 0.03 vs 2639
        at 3.5, measured at dt = 8e-4)."""
        from lfit_python_tpu.roche.stream import (_N_STEPS,
                                                  stream_trajectory)

        for q in (0.03, 3.5):
            qd = jnp.asarray(q, jnp.float64)
            traj = stream_trajectory(qd)        # length _N_STEPS + 1
            r = np.linalg.norm(np.asarray(traj), axis=-1)
            dr = np.diff(r)
            inc = np.where(dr > 0)[0]
            assert inc.size, f"q={q}: periapsis not reached in {_N_STEPS}"
            peri = int(inc[0])
            assert peri < _N_STEPS - 256, (
                f"q={q}: periapsis at step {peri} leaves <256-step margin"
                f" of the {_N_STEPS}-step scan")
            # every radius above the periapsis minimum is crossed
            assert r.min() == pytest.approx(r[peri], rel=1e-6)

    def test_step_tiers_cover_their_claimed_floors(self):
        """stream_steps_for's tiers must each cover first periapsis with
        >= 256-step margin AT the tier's own q floor (the worst case of
        the range it claims).  Run at the floors of the first two tiers;
        the q < 0.002 ceiling tier is below any physical CV donor and
        covered by the monotone-growth argument in the docstring."""
        from lfit_python_tpu.roche.stream import (stream_steps_for,
                                                  stream_trajectory)

        assert stream_steps_for(0.03) == stream_steps_for(0.02)
        assert stream_steps_for(0.01) > stream_steps_for(0.02)
        for q_floor in (0.02, 0.002):
            n = stream_steps_for(q_floor)
            traj = stream_trajectory(jnp.asarray(q_floor, jnp.float64),
                                     n_steps=n)
            r = np.linalg.norm(np.asarray(traj), axis=-1)
            inc = np.where(np.diff(r) > 0)[0]
            assert inc.size and int(inc[0]) < n - 256, (
                f"tier for q >= {q_floor} ({n} steps) does not cover "
                f"its own floor with margin")

    def test_likelihood_sizes_scan_from_q_prior(self):
        """The fused posterior must pick the scan tier from the model's
        actual q prior (round-5 review finding: a user prior below the
        default tier's floor must extend the scan, not silently hand
        low-q walkers the closest-approach fallback)."""
        from lfit_python_tpu.examples import build_model
        from lfit_python_tpu.models.likelihood import _q_prior_floor
        from lfit_python_tpu.models.priors import Prior
        from lfit_python_tpu.roche.stream import stream_steps_for

        m = build_model(n_eclipses=1, n_points=8)
        assert _q_prior_floor(m.compile()) == pytest.approx(0.03)
        assert stream_steps_for(0.03) == 4352
        # rebuild with a prior reaching extreme mass ratios
        m.core["q"] = type(m.core["q"])(
            "q", 0.15, Prior("uniform", 0.005, 3.0))
        assert _q_prior_floor(m.compile()) == pytest.approx(0.005)
        assert stream_steps_for(0.005) == 5120
        # gauss floor = mean - 6 sigma; gaussPos conservative
        m.core["q"] = type(m.core["q"])(
            "q", 0.15, Prior("gauss", 0.15, 0.01))
        assert _q_prior_floor(m.compile()) == pytest.approx(0.09)
        m.core["q"] = type(m.core["q"])(
            "q", 0.15, Prior("gaussPos", 0.15, 0.05))
        assert _q_prior_floor(m.compile()) == 0.0
        assert stream_steps_for(0.0) == 6144

    def test_stream_impacts_matches_spot_position(self):
        """The carry-only multi-radius integration (the fused posterior's
        hot path) must reproduce the stacked-trajectory oracle, incl. the
        closest-approach fallback for a disc the stream never reaches."""
        from lfit_python_tpu.roche.stream import stream_impacts

        for q in (0.08, 0.15, 0.6):
            qd = jnp.asarray(q, jnp.float64)
            x1 = xl1(qd)
            # last radius is tiny: stream never reaches it -> fallback
            rds = jnp.asarray([0.25, 0.35, 0.45, 0.02], jnp.float64) * x1
            got = stream_impacts(qd, rds, x1)
            want = jnp.stack([spot_position(qd, rd) for rd in rds])
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-10)

    def test_stream_impacts_jacobian_matches_ad_oracle(self):
        """The custom forward-sensitivity JVP (Jacobian columns integrated
        in the carry) must equal plain forward-mode AD through the raw
        scan — the exact derivative of the discrete RK4 map — including
        the closest-approach fallback row (rd-derivative exactly zero)."""
        from lfit_python_tpu.roche.stream import (
            _DT, _N_STEPS, _stream_impacts_impl, stream_impacts)

        q = jnp.asarray(0.12, jnp.float64)
        x1 = xl1(q)
        # last radius is tiny: fallback branch (never crossed)
        rds = jnp.asarray([0.5, 0.35, 0.02], jnp.float64) * x1

        def f(qq, rr, xx):
            return stream_impacts(qq, rr, xx)

        def oracle(qq, rr, xx):
            return _stream_impacts_impl(qq, rr, xx, _N_STEPS, _DT, 1,
                                        with_sens=False)[0]

        for argnum in (0, 1, 2):
            jf = jax.jacfwd(f, argnum)(q, rds, x1)
            jo = jax.jacfwd(oracle, argnum)(q, rds, x1)
            np.testing.assert_allclose(
                np.asarray(jf), np.asarray(jo), rtol=1e-8, atol=1e-10,
                err_msg=f"Jacobian argnum {argnum} diverges from AD oracle")
        # reverse mode works through the custom JVP (linear tangents)
        g = jax.grad(lambda qq: jnp.sum(f(qq, rds, x1)))(q)
        assert np.isfinite(float(g))

    def test_stream_impacts_vmappable(self):
        from lfit_python_tpu.roche.stream import stream_impacts

        qs = jnp.array([0.1, 0.2, 0.3])
        rd = jnp.array([[0.3, 0.35], [0.35, 0.3], [0.4, 0.25]])
        out = jax.vmap(stream_impacts)(qs, rd)
        radii = jnp.linalg.norm(out, axis=-1)
        np.testing.assert_allclose(np.asarray(radii), np.asarray(rd),
                                   atol=2e-3)
