"""Pallas contact-interval kernel vs the JAX oracle.

On CPU the kernel runs in Mosaic interpreter mode (SURVEY.md §5.2: the
interpreter doubles as the out-of-bounds/race sanitizer for kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfit_python_tpu.models import components as comp
from lfit_python_tpu.ops.pallas_contacts import contact_intervals_pallas
from lfit_python_tpu.roche.geometry import (
    contact_interval,
    findi,
    l1_potential,
    xl1,
)


@pytest.fixture(scope="module")
def batch():
    W = 8
    qs = jnp.linspace(0.1, 0.4, W)
    x1 = jax.vmap(xl1)(qs)
    pl1 = jax.vmap(l1_potential)(qs, x1)
    incl = jax.vmap(lambda q, a, b: findi(q, 0.04, a, b))(qs, x1, pl1)
    # per-walker element clouds (as in production: geometry varies)
    def elements(q):
        pos, _ = comp.disc_elements(0.01, 0.25 + 0.3 * q, 1.5,
                                    n_rad=8, n_az=16, dtype=jnp.float64)
        return pos
    pos = jax.vmap(elements)(qs)          # (W, 128, 3)
    return qs, incl, x1, pl1, pos


class TestPallasContacts:
    def test_matches_jax_oracle(self, batch):
        qs, incl, x1, pl1, pos = batch
        px, py = pos[..., 0], pos[..., 1]
        pi_p, po_p, ec_p = contact_intervals_pallas(
            qs, incl, x1, pl1, px, py, interpret=True)

        def one(q, i, a, b, p):
            return jax.vmap(lambda pp: contact_interval(q, i, pp, a, b))(p)

        pi_j, po_j, ec_j = jax.vmap(one)(qs, incl, x1, pl1, pos)
        np.testing.assert_array_equal(np.asarray(ec_p), np.asarray(ec_j))
        m = np.asarray(ec_j)
        # Hard (bisection-dominated) lanes may converge along slightly
        # different FP paths in the two compiled programs; the residual
        # bracket after 18 safeguarded iterations is ~1e-5 cycles — far
        # below any flux-visible effect (exposure widths are ~1e-3 cycles).
        np.testing.assert_allclose(
            np.asarray(pi_p)[m], np.asarray(pi_j)[m], atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(po_p)[m], np.asarray(po_j)[m], atol=2e-5)
        # and the bulk of lanes agree to near machine precision
        frac_tight = np.mean(
            np.abs(np.asarray(pi_p)[m] - np.asarray(pi_j)[m]) < 1e-12)
        assert frac_tight > 0.95

    def test_shape_validation(self, batch):
        qs, incl, x1, pl1, pos = batch
        with pytest.raises(ValueError, match="multiple"):
            contact_intervals_pallas(
                qs[:6], incl[:6], x1[:6], pl1[:6],
                pos[:6, :, 0], pos[:6, :, 1], interpret=True)
