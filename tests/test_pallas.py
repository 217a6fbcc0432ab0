"""Pallas contact kernel vs the XLA oracle, in interpreter mode.

Interpreter-mode Pallas doubles as the out-of-bounds/indexing sanitizer
for the kernel (SURVEY.md §5.2); the real-chip benchmark lives in
tools/bench_contacts.py.  The kernel implements the SAME algorithm as
``contact_interval`` — this lockstep test keeps the two implementations
from drifting.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfit_python_tpu.models import components as comp
from lfit_python_tpu.ops.pallas_contacts import element_intervals_pallas
from lfit_python_tpu.roche.geometry import findi, l1_potential, xl1


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(7)
    W, N = 5, 200
    q = 0.15 + 0.01 * rng.standard_normal(W)
    dphi = np.full(W, 0.04)
    x1 = np.asarray(jax.vmap(xl1)(jnp.asarray(q)))
    pl1 = np.asarray(jax.vmap(l1_potential)(jnp.asarray(q)))
    incl = np.asarray(jax.vmap(findi)(jnp.asarray(q), jnp.asarray(dphi)))
    r = rng.uniform(0.05, 0.4, (W, N))
    th = rng.uniform(0, 2 * np.pi, (W, N))
    pos = np.stack([r * np.cos(th), r * np.sin(th), np.zeros((W, N))], -1)
    return q, incl, x1, pl1, pos


class TestPallasContacts:
    def test_matches_jax_oracle(self, batch):
        q, incl, x1, pl1, pos = batch
        f32 = jnp.float32
        pin, pout, ecl = element_intervals_pallas(
            q, incl, pos[..., 0], pos[..., 1], x1, pl1, interpret=True)

        def one_walker(k):
            return comp.element_intervals(
                jnp.asarray(q[k], f32), jnp.asarray(incl[k], f32),
                jnp.asarray(pos[k], f32), jnp.asarray(x1[k], f32),
                jnp.asarray(pl1[k], f32))

        for k in range(len(q)):
            pi_o, po_o, ec_o = one_walker(k)
            np.testing.assert_array_equal(
                np.asarray(ecl[k]), np.asarray(ec_o),
                err_msg=f"walker {k}: eclipsed flags diverge")
            m = np.asarray(ec_o)
            # same algorithm, same dtype — but the two programs compile
            # separately (jit-of-vmap vs interpret-mode pallas), so FMA
            # contraction / fusion differences inject ulp-level noise
            # that an occasional graze element amplifies through the
            # safeguarded bracket decisions to a few 1e-6 cycles (the
            # same amplification bounds the f32-vs-f64 accuracy tail,
            # tools/accuracy_contacts.py); the posterior-level gate
            # below (test_posterior_integration_bitwise) is exact
            np.testing.assert_allclose(
                np.asarray(pin[k])[m], np.asarray(pi_o)[m], atol=1e-5,
                err_msg=f"walker {k}: phi_in diverges")
            np.testing.assert_allclose(
                np.asarray(pout[k])[m], np.asarray(po_o)[m], atol=1e-5,
                err_msg=f"walker {k}: phi_out diverges")

    def test_posterior_integration_bitwise(self):
        """The full vmapped hierarchical posterior with the Pallas path
        (via the custom-vmap contacts_op) must match the XLA path bitwise
        — nested walker/eclipse vmaps collapse into one kernel launch."""
        from lfit_python_tpu.examples import build_model
        from lfit_python_tpu.models.cv import CVConfig
        from lfit_python_tpu.models.likelihood import make_ln_prob

        tiny = CVConfig(n_disc_rad=5, n_disc_az=8, n_spot=8,
                        n_donor_lat=6, n_donor_lon=8)
        m = build_model(n_eclipses=2, complex_spot=[False, True],
                        n_points=16, bands=("g",)).compile()
        lp_on = make_ln_prob(
            m, config=tiny._replace(pallas_contacts=True),
            dtype=jnp.float32)
        lp_off = make_ln_prob(
            m, config=tiny._replace(pallas_contacts=False),
            dtype=jnp.float32)
        start = jnp.asarray(m.var_start(), jnp.float32)
        rng = np.random.default_rng(0)
        pos = jnp.asarray(
            start[None, :] + 0.001 * np.abs(start)[None, :]
            * rng.standard_normal((8, start.size)), jnp.float32)
        a = jax.jit(jax.vmap(lp_on))(pos)
        b = jax.jit(jax.vmap(lp_off))(pos)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_grad_matches_xla_path(self, batch):
        """contacts_op_diff carries IFT tangents at the kernel-computed
        roots: jax.grad through the Pallas path must match jax.grad of the
        XLA contact_interval (whose custom_jvp uses the same residual)."""
        from lfit_python_tpu.ops.pallas_contacts import contacts_op_diff
        from lfit_python_tpu.roche.geometry import contact_interval

        q, incl, x1, pl1, pos = batch
        f32 = jnp.float32
        k = 1
        qk = jnp.asarray(q[k], f32)
        ik = jnp.asarray(incl[k], f32)
        xk = jnp.asarray(x1[k], f32)
        lk = jnp.asarray(pl1[k], f32)
        px = jnp.asarray(pos[k, :, 0], f32)
        py = jnp.asarray(pos[k, :, 1], f32)

        def width_pallas(qq, ii):
            # vmap over a dummy axis so the custom-vmap (kernel) path runs
            pin, pout, ecl = jax.vmap(contacts_op_diff,
                                      in_axes=(0, 0, None, None, 0, 0))(
                qq[None], ii[None], px, py, xk[None], lk[None])
            return jnp.sum(jnp.where(ecl[0], pout[0] - pin[0], 0.0))

        def width_xla(qq, ii):
            def one(pxx, pyy):
                pp = jnp.stack([pxx, pyy, jnp.zeros_like(pxx)])
                return contact_interval(qq, ii, pp, xk, lk)

            pin, pout, ecl = jax.vmap(one)(px, py)
            return jnp.sum(jnp.where(ecl, pout - pin, 0.0))

        gp = jax.grad(width_pallas, argnums=(0, 1))(qk, ik)
        gx = jax.grad(width_xla, argnums=(0, 1))(qk, ik)
        for a, b, name in zip(gp, gx, ("q", "incl")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4,
                err_msg=f"d(width)/d{name} diverges between paths")
            assert np.isfinite(np.asarray(a)).all()

    @pytest.mark.slow
    def test_posterior_grad_pallas(self):
        """jax.grad of the full Pallas-path posterior is finite and matches
        the XLA-path gradient — the property that lets HMC/NUTS run on the
        production kernel.  Slow tier: reverse-mode AD through the
        interpret-mode kernel compiles for tens of minutes on a 1-CPU box
        (the tangent math itself is certified fast by
        test_grad_matches_xla_path)."""
        from lfit_python_tpu.examples import build_model
        from lfit_python_tpu.models.cv import CVConfig
        from lfit_python_tpu.models.likelihood import make_ln_prob

        tiny = CVConfig(n_disc_rad=5, n_disc_az=8, n_spot=8,
                        n_donor_lat=6, n_donor_lon=8)
        m = build_model(n_eclipses=2, complex_spot=[False, True],
                        n_points=16, bands=("g",)).compile()
        lp_on = make_ln_prob(
            m, config=tiny._replace(pallas_contacts=True),
            dtype=jnp.float32)
        lp_off = make_ln_prob(
            m, config=tiny._replace(pallas_contacts=False),
            dtype=jnp.float32)
        start = jnp.asarray(m.var_start(), jnp.float32)
        rng = np.random.default_rng(3)
        pos = jnp.asarray(
            start[None, :] + 0.001 * np.abs(start)[None, :]
            * rng.standard_normal((4, start.size)), jnp.float32)
        g_on = jax.jit(jax.vmap(jax.grad(lp_on)))(pos)
        g_off = jax.jit(jax.vmap(jax.grad(lp_off)))(pos)
        assert np.isfinite(np.asarray(g_on)).all()
        np.testing.assert_allclose(np.asarray(g_on), np.asarray(g_off),
                                   rtol=2e-3, atol=1e-5)

    def test_padding_is_inert(self, batch):
        """Padded element slots (x = 2, behind the donor) and padded walker
        rows must not corrupt real outputs: run with N and N-7 elements."""
        q, incl, x1, pl1, pos = batch
        full = element_intervals_pallas(q, incl, pos[..., 0], pos[..., 1],
                                        x1, pl1, interpret=True)
        trim = element_intervals_pallas(q, incl, pos[:, :-7, 0],
                                        pos[:, :-7, 1], x1, pl1,
                                        interpret=True)
        for a, b in zip(full, trim):
            np.testing.assert_array_equal(
                np.asarray(a)[:, :pos.shape[1] - 7], np.asarray(b))
