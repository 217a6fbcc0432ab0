"""Pallas/Mosaic TPU kernel for the contact-interval solver (the hot op).

SURVEY.md §2 native-component checklist item 2: the per-element eclipse
contact solve fused as a hand-scheduled TPU kernel.  This implements the
SAME redesigned algorithm as ``roche.geometry.contact_interval`` (analytic
sphere bracket + chord-midpoint-warm-started Newton for the ray minimum +
safeguarded envelope Newton on phi, returning the best evaluated point) —
the two implementations are held in lockstep by an oracle test
(tests/test_pallas.py).

Design notes (vs the retired round-1 kernel, which implemented the old
grid-rescan algorithm and lost to XLA fusion, 34.5 vs 26.8 ms):
  * the inverse-trig setup (conjunction phase arctan2, sphere half-angle
    arccos) is precomputed OUTSIDE the kernel in plain XLA — it is cheap,
    elementwise, and keeps the Mosaic body to sin/cos/rsqrt only;
  * the kernel processes (8 walkers x LANE elements) blocks so every array
    sits on native (8, 128) vregs; the entire 12-iteration edge loop runs
    out of VMEM/registers with no HBM carry round-trips (the XLA while-loop
    path spills its 5-array carry to HBM every iteration);
  * f32 fast path only — the mixed-precision (--precise) mode stays on the
    XLA path, where the f64 tail is emulated.

Use ``element_intervals_pallas`` as a drop-in for the plain (non-precise)
``components.element_intervals`` batched over walkers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["element_intervals_pallas", "contacts_op", "contacts_op_diff",
           "LANE"]

LANE = 1024          # max elements per row; actual pad is ceil(N/128)*128
_W_BLOCK = 8         # walkers per program (sublane dimension)

_EDGE_ITERS = 8          # kept in lockstep with geometry._EDGE_ITERS
_T_NEWTON = 3            # seed solve (conjunction test) only
_T_WARM = 1              # lockstep with geometry._EDGE_T_WARM
_CLEAR_VISIBLE = 10.0


def _kernel(scal_ref, px_ref, py_ref, wins_ref, wmax_ref,
            win_ref, wout_ref, ecl_ref):
    # per-walker scalars, broadcast down the lane axis
    mu = scal_ref[:, 0:1]
    si = scal_ref[:, 1:2]
    ci = scal_ref[:, 2:3]
    rad = scal_ref[:, 3:4]
    pl1 = scal_ref[:, 4:5]

    px = px_ref[...]
    py = py_ref[...]
    w_inscr = wins_ref[...]
    w_sphere = wmax_ref[...]

    wx = 1.0 - px
    wy = -py
    ww = wx * wx + wy * wy
    c1 = px * px + py * py
    two_pi = 6.283185307179586
    # hoisted for the edge loop's cheap endpoint insurance (lockstep
    # with geometry.contact_interval)
    inv_rad = 1.0 / rad
    i2_p = jax.lax.rsqrt(ww)
    # conjunction direction without trig: (cos, sin)(theta_c) =
    # (wx, py)/|w|, so e(phi_c) = (e_A, -e_B, ci)
    iw = jax.lax.rsqrt(ww)
    e_A = si * wx * iw
    e_B = si * py * iw

    def t_minimum(ex, ey):
        tstar = wx * ex + wy * ey
        disc = rad * rad - (ww - tstar * tstar)
        half = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_lo = jnp.maximum(tstar - half, 0.0)
        t_hi = jnp.maximum(tstar + half, 0.0)
        no_occ = disc <= 0.0
        b1 = px * ex + py * ey
        b2 = b1 - ex

        def g_val(t):
            i1 = jax.lax.rsqrt(t * t + 2.0 * b1 * t + c1)
            i2 = jax.lax.rsqrt(t * t + 2.0 * b2 * t + ww)
            cx = px - mu + t * ex
            cy = py + t * ey
            return -(1.0 - mu) * i1 - mu * i2 - 0.5 * (cx * cx + cy * cy)

        t = jnp.clip(tstar, t_lo, t_hi)
        for _ in range(_T_NEWTON):
            i1 = jax.lax.rsqrt(t * t + 2.0 * b1 * t + c1)
            i2 = jax.lax.rsqrt(t * t + 2.0 * b2 * t + ww)
            u1, u2 = t + b1, t + b2
            i13, i23 = i1 * i1 * i1, i2 * i2 * i2
            cx = px - mu + t * ex
            cy = py + t * ey
            g1 = ((1.0 - mu) * u1 * i13 + mu * u2 * i23
                  - (cx * ex + cy * ey))
            g2 = ((1.0 - mu) * (i13 - 3.0 * u1 * u1 * i13 * i1 * i1)
                  + mu * (i23 - 3.0 * u2 * u2 * i23 * i2 * i2)
                  - (ex * ex + ey * ey))
            step = jnp.where(g2 > 1e-12, g1 / jnp.maximum(g2, 1e-12), 0.0)
            t = jnp.clip(t - step, t_lo, t_hi)
        val = g_val(t)
        v_lo = g_val(t_lo)
        v_hi = g_val(t_hi)
        t = jnp.where(v_lo < val, t_lo, t)
        val = jnp.minimum(val, v_lo)
        t = jnp.where(v_hi < val, t_hi, t)
        val = jnp.minimum(val, v_hi)
        c = jnp.where(no_occ, _CLEAR_VISIBLE, val - pl1)
        return t, c, no_occ

    _, c_mid, _ = t_minimum(e_A, -e_B)
    eclipsed = c_mid < 0.0

    def e_of(w, sign):
        den = 1.0 / (1.0 + w * w)
        cd = (1.0 - w * w) * den
        sd = (2.0 * w) * den
        ex = e_A * cd - sign * e_B * sd
        ey = -(e_B * cd + sign * e_A * sd)
        return ex, ey, den

    def edges():
        # two-sided sphere bracket in the omega = tan(theta/2)
        # half-angle domain, lockstep with geometry.contact_interval:
        # inscribed-sphere hit = certified eclipsed end,
        # enclosing-sphere miss = visible end.  The Weierstrass
        # parametrization makes the per-iterate observer direction
        # rational in omega — the edge iterations spend no sin/cos;
        # the wrapper converts the returned omega roots to phases with
        # one arctan per edge (outside the kernel).
        #
        # BOTH edges (ingress sign = -1, egress sign = +1) iterate in
        # ONE fori_loop (round 5): the edge Newton is a serial chain of
        # dependent rsqrt/divides, so the loop is LATENCY-bound, not
        # throughput-bound (removing one warm Newton step — ~25% of the
        # ops — saved ~2 ms of a 13.6 ms posterior).  Interleaving the
        # two independent edge chains in the same iteration gives the
        # VPU a second in-flight dependency chain to hide that latency;
        # each edge's arithmetic is UNCHANGED (no reassociation), so
        # results stay bitwise identical to the sequential form and to
        # the XLA path (tests/test_pallas.py).
        lo = w_inscr
        hi = w_sphere
        w0 = 0.5 * (lo + hi)

        def edge_step(sign, carry):
            # warm-started edge iteration, lockstep with
            # geometry.contact_interval's body: the ray-minimum t is
            # carried across omega iterates, clipped into the new sphere
            # chord, polished with _T_WARM well-guarded clamped Newton
            # steps; one fused i1/i2 pair then serves the clearance
            # value, the endpoint insurance, and the envelope derivative
            w, lo, hi, w_best, c_best, t = carry
            ex, ey, den = e_of(w, sign)
            tstar = wx * ex + wy * ey
            disc = rad * rad - (ww - tstar * tstar)
            half = jnp.sqrt(jnp.maximum(disc, 0.0))
            t_lo = jnp.maximum(tstar - half, 0.0)
            t_hi = jnp.maximum(tstar + half, 0.0)
            no_occ = disc <= 0.0
            b1 = px * ex + py * ey
            b2 = b1 - ex
            t = jnp.clip(t, t_lo, t_hi)
            t_mid = jnp.clip(tstar, t_lo, t_hi)

            def newton(t, fallback):
                i1 = jax.lax.rsqrt(t * t + 2.0 * b1 * t + c1)
                i2 = jax.lax.rsqrt(t * t + 2.0 * b2 * t + ww)
                u1, u2 = t + b1, t + b2
                i13, i23 = i1 * i1 * i1, i2 * i2 * i2
                cx = px - mu + t * ex
                cy = py + t * ey
                g1 = ((1.0 - mu) * u1 * i13 + mu * u2 * i23
                      - (cx * ex + cy * ey))
                g2 = ((1.0 - mu) * (i13 - 3.0 * u1 * u1 * i13 * i1 * i1)
                      + mu * (i23 - 3.0 * u2 * u2 * i23 * i2 * i2)
                      - (ex * ex + ey * ey))
                t_new = jnp.clip(
                    t - g1 / jnp.maximum(g2, 1e-12), t_lo, t_hi)
                return jnp.where(g2 > 1e-12, t_new, fallback)

            # first step well-guarded: a stale carried t in a concave
            # region (g2 <= 0) restarts from the chord midpoint
            t = newton(t, t_mid)
            for _ in range(_T_WARM - 1):
                t = newton(t, t)
            i1 = jax.lax.rsqrt(t * t + 2.0 * b1 * t + c1)
            i2 = jax.lax.rsqrt(t * t + 2.0 * b2 * t + ww)
            cx = px - mu + t * ex
            cy = py + t * ey
            val = -(1.0 - mu) * i1 - mu * i2 - 0.5 * (cx * cx + cy * cy)
            # endpoint insurance via the on-sphere identity (donor term
            # at an unclipped chord endpoint is exactly -mu/rad)
            i1_lo = jax.lax.rsqrt(t_lo * t_lo + 2.0 * b1 * t_lo + c1)
            i2_lo = jnp.where(tstar - half > 0.0, inv_rad, i2_p)
            cx_lo = px - mu + t_lo * ex
            cy_lo = py + t_lo * ey
            v_lo = (-(1.0 - mu) * i1_lo - mu * i2_lo
                    - 0.5 * (cx_lo * cx_lo + cy_lo * cy_lo))
            i1_hi = jax.lax.rsqrt(t_hi * t_hi + 2.0 * b1 * t_hi + c1)
            i2_hi = jnp.where(tstar + half > 0.0, inv_rad, i2_p)
            cx_hi = px - mu + t_hi * ex
            cy_hi = py + t_hi * ey
            v_hi = (-(1.0 - mu) * i1_hi - mu * i2_hi
                    - 0.5 * (cx_hi * cx_hi + cy_hi * cy_hi))
            pick_lo = v_lo < val
            t = jnp.where(pick_lo, t_lo, t)
            i1 = jnp.where(pick_lo, i1_lo, i1)
            i2 = jnp.where(pick_lo, i2_lo, i2)
            val = jnp.minimum(val, v_lo)
            pick_hi = v_hi < val
            t = jnp.where(pick_hi, t_hi, t)
            i1 = jnp.where(pick_hi, i1_hi, i1)
            i2 = jnp.where(pick_hi, i2_hi, i2)
            val = jnp.minimum(val, v_hi)
            c = jnp.where(no_occ, _CLEAR_VISIBLE, val - pl1)
            better = jnp.abs(c) < c_best
            w_best = jnp.where(better, w, w_best)
            c_best = jnp.where(better, jnp.abs(c), c_best)
            lo = jnp.where(c < 0.0, w, lo)
            hi = jnp.where(c < 0.0, hi, w)
            # envelope derivative dc/dphi, converted to dc/dw by
            # sign * den / pi
            rx = px + t * ex
            ry = py + t * ey
            i13, i23 = i1 * i1 * i1, i2 * i2 * i2
            gx = ((1.0 - mu) * rx * i13 + mu * (rx - 1.0) * i23
                  - (rx - mu))
            gy = ry * ((1.0 - mu) * i13 + mu * i23 - 1.0)
            d = t * two_pi * (gx * ey - gy * ex)
            w_newton = w - (c * jnp.pi) / jnp.where(
                jnp.abs(d) > 1e-12, sign * den * d, jnp.inf)
            inside = (w_newton - lo) * (w_newton - hi) < 0.0
            ok = inside & jnp.isfinite(w_newton) & ~no_occ
            w = jnp.where(ok, w_newton, 0.5 * (lo + hi))
            return w, lo, hi, w_best, c_best, t

        def body(_, carry):
            return (edge_step(-1.0, carry[:6])
                    + edge_step(+1.0, carry[6:]))

        big = jnp.full_like(w0, jnp.inf)
        exA, eyA, _ = e_of(w0, -1.0)
        exB, eyB, _ = e_of(w0, +1.0)
        # i32 bounds: under x64 a Python-int fori_loop counter becomes
        # i64, which Mosaic cannot legalize
        carry = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(_EDGE_ITERS), body,
            (w0, lo, hi, w0, big, wx * exA + wy * eyA,
             w0, lo, hi, w0, big, wx * exB + wy * eyB))
        return carry[3], carry[9]

    w_in, w_out = edges()
    win_ref[...] = jnp.where(eclipsed, w_in, 0.0)
    wout_ref[...] = jnp.where(eclipsed, w_out, 0.0)
    ecl_ref[...] = eclipsed.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def element_intervals_pallas(q, incl_deg, px_in, py_in, xl1_val, phi_l1,
                             interpret=False):
    """Batched contact intervals on the Pallas kernel.

    ``q, incl_deg, xl1_val, phi_l1``: (W,) per-walker scalars;
    ``px_in, py_in``: (W, N) element coordinates (orbital plane),
    COMPONENTWISE — an (W, N, 3) positions array must never cross this
    boundary: at a kernel/custom-vmap boundary XLA materialises its
    operands in HBM with the minor dim tile-padded 3 -> 128 lanes (~40x
    bloat; measured +14 ms on the 5-eclipse posterior), whereas the
    componentwise slices fuse into clean (W, N) layouts.
    Returns (phi_in, phi_out, eclipsed) of shape (W, N).
    N is padded to the next multiple of 128 lanes (so a mirror-halved
    512-element solve set costs exactly half the 992-element one — a
    fixed LANE pad would erase the saving) and W to a multiple of 8.
    """
    f32 = jnp.float32
    q = jnp.asarray(q, f32)
    incl = jnp.asarray(incl_deg, f32)
    x1 = jnp.asarray(xl1_val, f32)
    pl1 = jnp.asarray(phi_l1, f32)
    px_in = jnp.asarray(px_in, f32)
    py_in = jnp.asarray(py_in, f32)
    W, N = px_in.shape
    Wp = ((W + _W_BLOCK - 1) // _W_BLOCK) * _W_BLOCK
    lane = max(128, ((N + 127) // 128) * 128)

    # pad slots at a harmless never-eclipsed point far behind the observer
    px = jnp.full((Wp, lane), 2.0, f32)
    py = jnp.zeros((Wp, lane), f32)
    px = px.at[:W, :N].set(px_in)
    py = py.at[:W, :N].set(py_in)

    mu = q / (1.0 + q)
    i_rad = jnp.deg2rad(incl)
    si, ci = jnp.sin(i_rad), jnp.cos(i_rad)
    rad = 1.0 - x1
    scal = jnp.zeros((Wp, 8), f32)
    scal = scal.at[:W, 0].set(mu)
    scal = scal.at[:W, 1].set(si)
    scal = scal.at[:W, 2].set(ci)
    scal = scal.at[:W, 3].set(rad)
    scal = scal.at[:W, 4].set(pl1)
    # padded walker rows: benign geometry (si = 1 avoids div-by-zero)
    if Wp > W:
        scal = scal.at[W:, 1].set(1.0)
        scal = scal.at[W:, 3].set(0.4)

    # setup outside the kernel (XLA): conjunction phase (the only
    # arctan2) and the two-sided sphere bracket in the
    # omega = tan(theta/2) half-angle domain — tan(theta/2) =
    # sqrt((1 - cos)/(1 + cos)) directly from the closed-form cosines,
    # no arccos (enclosing sphere -> certain-visible end; inscribed
    # sphere -> certain-eclipsed end, lockstep with
    # geometry.contact_interval's bracket)
    from ..roche.geometry import inscribed_radius

    r_ins = jax.vmap(inscribed_radius)(q, x1, pl1)
    r_ins = jnp.concatenate(
        [r_ins, jnp.zeros((Wp - W,), f32)])[:, None]
    wx = 1.0 - px
    wy = -py
    ww = wx * wx + wy * wy
    phi_c = jnp.arctan2(py, wx) / (2.0 * jnp.pi)
    si_b = scal[:, 1:2]
    rad_b = scal[:, 3:4]
    inv_den = 1.0 / jnp.maximum(si_b * jnp.sqrt(ww), 1e-12)
    c_eff = jnp.clip(
        jnp.sqrt(jnp.maximum(ww - rad_b * rad_b, 0.0)) * inv_den,
        0.0, 1.0)
    w_sphere = jnp.sqrt((1.0 - c_eff) / (1.0 + c_eff))
    c_ins = jnp.clip(
        jnp.sqrt(jnp.maximum(ww - r_ins * r_ins, 0.0)) * inv_den,
        0.0, 1.0)
    w_inscr = jnp.sqrt((1.0 - c_ins) / (1.0 + c_ins))

    grid = (Wp // _W_BLOCK,)
    row_spec = pl.BlockSpec((_W_BLOCK, lane), lambda w: (w, 0))
    scal_spec = pl.BlockSpec((_W_BLOCK, 8), lambda w: (w, 0))
    out_shape = [jax.ShapeDtypeStruct((Wp, lane), f32)] * 3
    # trace the kernel with x64 disabled: the body is pure f32, but under
    # an x64-enabled caller (the --precise/--x64 CLI modes enable it
    # globally) pallas/fori internals pick up i64 scalars that Mosaic
    # cannot legalize ("failed to legalize operation 'func.return'")
    with jax.enable_x64(False):
        w_in, w_out, ecl = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[scal_spec] + [row_spec] * 4,
            out_specs=[row_spec] * 3,
            out_shape=out_shape,
            interpret=interpret,
        )(scal, px, py, w_inscr, w_sphere)
    # one arctan per edge converts the omega roots back to phases
    # (lockstep with geometry.contact_interval's conversion)
    eclb = ecl > 0.5
    pin = jnp.where(eclb, phi_c - (jnp.arctan(w_in) / jnp.pi), phi_c)
    pout = jnp.where(eclb, phi_c + (jnp.arctan(w_out) / jnp.pi), phi_c)
    return (pin[:W, :N], pout[:W, :N], eclb[:W, :N])


# ---------------------------------------------------------------------------
# Production integration: a custom-vmap op that presents the SCALAR
# (per-walker) signature of components.element_intervals but collapses any
# stack of vmaps (eclipses inside, walkers outside, shard_map blocks...)
# into ONE batched Pallas kernel launch.  This is how the kernel becomes
# the production hot path without restructuring the posterior: cv_fluxes
# keeps calling a scalar-shaped function; jax.vmap batching is intercepted.
# ---------------------------------------------------------------------------

def _bcast(x, batched, axis_size):
    x = jnp.asarray(x)
    return x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape)


@jax.custom_batching.custom_vmap
def _contacts_batched(q, incl, px, py, x1, pl1):
    """(W,)-batched contact intervals -> one Pallas launch."""
    interp = jax.default_backend() != "tpu"
    return element_intervals_pallas(q, incl, px, py, x1, pl1,
                                    interpret=interp)


@_contacts_batched.def_vmap
def _contacts_batched_vmap(axis_size, in_batched, q, incl, px, py, x1, pl1):
    # flatten the new leading batch dim into the walker dim and recurse:
    # arbitrarily nested vmaps collapse into a single kernel launch
    qb = _bcast(q, in_batched[0], axis_size)
    ib = _bcast(incl, in_batched[1], axis_size)
    pxb = _bcast(px, in_batched[2], axis_size)
    pyb = _bcast(py, in_batched[3], axis_size)
    xb = _bcast(x1, in_batched[4], axis_size)
    lb = _bcast(pl1, in_batched[5], axis_size)
    B, W = pxb.shape[0], pxb.shape[1]
    out = _contacts_batched(
        qb.reshape(-1), ib.reshape(-1),
        pxb.reshape((-1,) + pxb.shape[2:]),
        pyb.reshape((-1,) + pyb.shape[2:]),
        xb.reshape(-1), lb.reshape(-1))
    pin, pout, ecl = (o.reshape((B, W) + o.shape[1:]) for o in out)
    return (pin, pout, ecl), (True, True, True)


@jax.custom_batching.custom_vmap
def contacts_op(q, incl, px, py, x1, pl1):
    """Scalar-walker contact intervals with a Pallas-batched vmap rule.

    ``px, py``: (N,) element coordinates, componentwise (see
    ``element_intervals_pallas`` for why no (N, 3) array may cross this
    boundary).  Unbatched (rare: a single posterior evaluation) falls
    back to the XLA solver; any vmap over walkers/eclipses routes to the
    fused kernel.
    """
    from ..models.components import element_intervals

    pos = jnp.stack([px, py, jnp.zeros_like(px)], axis=-1)
    return element_intervals(q, incl, pos, x1, pl1)


@contacts_op.def_vmap
def _contacts_op_vmap(axis_size, in_batched, q, incl, px, py, x1, pl1):
    out = _contacts_batched(
        _bcast(q, in_batched[0], axis_size),
        _bcast(incl, in_batched[1], axis_size),
        _bcast(px, in_batched[2], axis_size),
        _bcast(py, in_batched[3], axis_size),
        _bcast(x1, in_batched[4], axis_size),
        _bcast(pl1, in_batched[5], axis_size))
    return out, (True, True, True)


# ---------------------------------------------------------------------------
# Differentiable wrapper: the Mosaic kernel is primal-only (custom_vmap has
# no AD rule), but the contact phases are roots of the envelope clearance
# c(phi; theta) = 0, so their tangents come from the implicit-function
# theorem at the kernel-computed roots — the SAME formula as the XLA path's
# _contact_interval_jvp (roche/geometry.py), with the residual evaluated
# once per edge in plain XLA.  This makes jax.grad of a Pallas-path
# posterior exact, unblocking HMC/NUTS on the production kernel.
# ---------------------------------------------------------------------------

@jax.custom_jvp
def contacts_op_diff(q, incl, px, py, x1, pl1):
    """:func:`contacts_op` with implicit-function-theorem tangents.

    Same signature and primal program (zero primal cost: the JVP only
    materialises under differentiation).  Use this in the forward model so
    one code path serves both the ensemble sampler and gradient samplers.
    """
    return contacts_op(q, incl, px, py, x1, pl1)


@contacts_op_diff.defjvp
def _contacts_op_diff_jvp(primals, tangents):
    import numpy as _np

    from ..roche.geometry import _edge_residual

    q, incl, px, py, x1, pl1 = primals
    qd, inld, pxd, pyd, xvd, pld = tangents
    out = contacts_op(q, incl, px, py, x1, pl1)
    phi_in, phi_out, eclipsed = out

    def edge_tangent(phi_e):
        phi0 = jax.lax.stop_gradient(phi_e)

        def c_of(qq, ii, pxx, pyy, xv, pll):
            return _edge_residual(phi0, qq, ii, pxx, pyy, xv, pll)[0]

        _, cdot = jax.jvp(c_of, (q, incl, px, py, x1, pl1),
                          (qd, inld, pxd, pyd, xvd, pld))
        _, dcdphi = _edge_residual(phi0, q, incl, px, py, x1, pl1)
        # guard on the PRIMAL coefficient only — the result must stay
        # linear in ``cdot`` or reverse-mode transposition fails
        coeff = -1.0 / dcdphi
        coeff = jnp.where(jnp.isfinite(coeff), coeff, jnp.zeros_like(coeff))
        return coeff * cdot

    def phic(pxx, pyy):
        return jnp.arctan2(pyy, 1.0 - pxx) / (2.0 * jnp.pi)

    _, phicd = jax.jvp(phic, (px, py), (pxd, pyd))

    din = jnp.where(eclipsed, edge_tangent(phi_in), phicd)
    dout = jnp.where(eclipsed, edge_tangent(phi_out), phicd)
    ecl_dot = _np.zeros(eclipsed.shape, dtype=jax.dtypes.float0)
    return out, (din.astype(phi_in.dtype), dout.astype(phi_out.dtype),
                 ecl_dot)
