"""Ballistic gas-stream trajectory from L1 (bright-spot position).

Reference: trm-roche ``Roche::stream`` / ``Roche::strmnx`` [R] — scalar C++
adaptive integration. Here: a fixed-step RK4 integration under ``lax.scan``
(static trip count, vmappable over walkers) of the restricted three-body
equations in the corotating frame (w = 1, z = 0 plane):

    x'' = -dPhi/dx + 2 y'
    y'' = -dPhi/dy - 2 x'

started just inside L1 with a tiny velocity towards the primary.  The
bright-spot position is the first crossing of the stream with the disc rim
radius ``rdisc`` (linear interpolation between integration steps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import roche_potential, xl1

__all__ = ["stream_trajectory", "spot_position", "stream_impacts"]

# Trip count sized to the FIRST radial periapsis of the stream — the
# reference integrates only to the first radial minimum (Roche::strmnx
# [R]), and every physically meaningful rim crossing happens on the
# first approach.  Measured steps-to-first-periapsis at dt = 8e-4 is
# monotone decreasing in q: 4738 (q = 0.002), 4443 (0.005), 4190
# (0.01), 3921 (0.02), 3759 (0.03), 2639 (3.5).  The default 4352
# (= 272 * unroll 16) covers q >= 0.02 with a 431-step margin — every
# physical CV and the in-repo priors (examples: uniform(0.03, 3.0)).
# The fused posterior picks its trip count from the MODEL'S q-prior
# support at trace time via :func:`stream_steps_for`, so a user prior
# admitting extreme mass ratios extends the scan instead of silently
# truncating it.  Was 6000 through round 4: the extra steps only ever
# tracked the stream PAST periapsis, where a second-orbit rim crossing
# would be unphysical (the stream has punched through the disc) — and
# cost ~0.44 ms of every north-star posterior eval.
_N_STEPS = 4352
_DT = 8e-4
_V0 = 1e-3  # initial speed towards the primary, in units of a*w


def stream_steps_for(q_lo):
    """Scan trip count covering first periapsis for all q >= ``q_lo``.

    Tiers from the measured steps-to-periapsis table above, each with
    >= 256 steps of margin and 16-step (unroll) alignment: 4352 covers
    q >= 0.02, 5120 covers q >= 0.002 (periapsis 4738), and 6144 is
    the conservative ceiling for priors admitting even smaller q
    (below any physical CV donor; growth toward q -> 0 is slow — the
    q = 0.002 -> 0.005 delta is only 295 steps).  Host-side (trace
    time): call with the PRIOR's support floor, not a traced value.
    """
    if q_lo >= 0.02:
        return _N_STEPS
    if q_lo >= 0.002:
        return 5120
    return 6144


def _accel(q, pos, vel):
    grad = jax.grad(lambda p: roche_potential(q, p))(pos)
    # Coriolis for w = +z_hat: -2 w x v = (2 vy, -2 vx, 0)
    cor = jnp.array([2.0 * vel[1], -2.0 * vel[0], 0.0], dtype=pos.dtype)
    return -grad + cor


def stream_trajectory(q, xl1_val=None, n_steps=_N_STEPS, dt=_DT):
    """Integrate the stream; returns positions of shape (n_steps + 1, 3)."""
    if xl1_val is None:
        xl1_val = xl1(q)
    dtype = jnp.result_type(q, float)
    pos0 = jnp.array([1.0, 0.0, 0.0], dtype) * 0.0
    pos0 = pos0.at[0].set(xl1_val - 1e-5)
    vel0 = jnp.array([-_V0, 0.0, 0.0], dtype)

    def rk4(carry, _):
        pos, vel = carry

        def deriv(p, v):
            return v, _accel(q, p, v)

        k1p, k1v = deriv(pos, vel)
        k2p, k2v = deriv(pos + 0.5 * dt * k1p, vel + 0.5 * dt * k1v)
        k3p, k3v = deriv(pos + 0.5 * dt * k2p, vel + 0.5 * dt * k2v)
        k4p, k4v = deriv(pos + dt * k3p, vel + dt * k3v)
        pos = pos + dt / 6.0 * (k1p + 2 * k2p + 2 * k3p + k4p)
        vel = vel + dt / 6.0 * (k1v + 2 * k2v + 2 * k3v + k4v)
        return (pos, vel), pos

    (_, _), traj = jax.lax.scan(rk4, (pos0, vel0), None, length=n_steps)
    return jnp.concatenate([pos0[None], traj], axis=0)


def stream_impacts(q, rdiscs, xl1_val=None, n_steps=_N_STEPS, dt=_DT,
                   unroll=16):
    """First stream/disc-rim crossings for E disc radii in ONE carry-only
    integration — the fused posterior's hot path.

    :func:`spot_position` over a stacked :func:`stream_trajectory` is the
    readable oracle, but on TPU it is pathological: the (n_steps, 3)
    stacked output forces an HBM write per scan iteration, the (.., 3)
    carry tile-pads 3 -> 128 lanes, and the norm/argmax over the stacked
    trajectory re-reads it all (measured 44 ms at 1024 walkers; the scan
    alone ~11 ms of the north-star posterior).  Here the integration
    state is componentwise planar scalars (x, y, vx, vy — the stream
    never leaves z = 0), the first crossing of each radius is recorded
    IN THE CARRY as it happens (same linear interpolation between steps
    as spot_position), nothing is stacked, and the loop is unrolled so
    the carry round-trips VMEM every ``unroll`` RK4 steps.

    Differentiable via a ``custom_jvp`` that integrates the FORWARD
    SENSITIVITY columns (d/dq, d/dx0, d/drdisc) in the same carry-only
    scan: reverse-mode AD through the raw multi-thousand-step scan would stash a
    residual set per step in HBM (re-creating exactly the traffic this
    redesign removed) and multiplies compile time; the sensitivity
    integration is forward-only, stores nothing, and the JVP is linear
    in the tangents with primal-coefficient Jacobians, so ``jax.grad``
    transposes it for free.

    Closest-approach fallback (stream never reaches ``rdiscs[e]``): the
    step-start point of the minimising step, matching spot_position's
    ``traj[argmin - 1]`` placeholder (only ever seen by walkers the
    physical-validity prior rejects).

    Returns (E, 3) impact points (z = 0).  Scalar in ``q``: vmap over
    walkers.
    """
    if xl1_val is None:
        xl1_val = xl1(q)
    dtype = jnp.result_type(q, float)
    rd = jnp.asarray(rdiscs, dtype)
    return _stream_impacts_diff(jnp.asarray(q, dtype), rd,
                                jnp.asarray(xl1_val, dtype),
                                int(n_steps), float(dt), int(unroll))


def _stream_impacts_impl(q, rd, xl1_val, n_steps, dt, unroll, with_sens):
    """Shared carry-only integration.  ``with_sens=True`` additionally
    integrates two first-variation columns (d/dq at fixed x0, d/dx0) via
    ``jax.linearize`` of the SAME componentwise RK4 step — primal results
    are bitwise identical between modes — and records d(impact)/d
    {q, x0, rdisc_e} at each first crossing.  Returns
    (impacts, Jq, Jx0, Jrd) each (E, 3) (sens outputs are zeros when
    ``with_sens`` is False)."""
    dtype = q.dtype
    E = rd.shape[0]

    def rk4(x, y, vx, vy, qq):
        mu = qq / (1.0 + qq)

        def accel(x, y, vx, vy):
            i1 = jax.lax.rsqrt(x * x + y * y)
            dx2 = x - 1.0
            i2 = jax.lax.rsqrt(dx2 * dx2 + y * y)
            i13, i23 = i1 * i1 * i1, i2 * i2 * i2
            gx = (1.0 - mu) * x * i13 + mu * dx2 * i23 - (x - mu)
            gy = y * ((1.0 - mu) * i13 + mu * i23 - 1.0)
            return -gx + 2.0 * vy, -gy - 2.0 * vx

        ax1, ay1 = accel(x, y, vx, vy)
        h = 0.5 * dt
        ax2, ay2 = accel(x + h * vx, y + h * vy,
                         vx + h * ax1, vy + h * ay1)
        ax3, ay3 = accel(x + h * (vx + h * ax1), y + h * (vy + h * ay1),
                         vx + h * ax2, vy + h * ay2)
        ax4, ay4 = accel(x + dt * (vx + h * ax2), y + dt * (vy + h * ay2),
                         vx + dt * ax3, vy + dt * ay3)
        xn = x + dt / 6.0 * (vx + 2 * (vx + h * ax1) + 2 * (vx + h * ax2)
                             + (vx + dt * ax3))
        yn = y + dt / 6.0 * (vy + 2 * (vy + h * ay1) + 2 * (vy + h * ay2)
                             + (vy + dt * ay3))
        vxn = vx + dt / 6.0 * (ax1 + 2 * ax2 + 2 * ax3 + ax4)
        vyn = vy + dt / 6.0 * (ay1 + 2 * ay2 + 2 * ay3 + ay4)
        return xn, yn, vxn, vyn

    x0 = xl1_val - jnp.asarray(1e-5, dtype)
    y0 = jnp.zeros((), dtype)
    vx0 = jnp.asarray(-_V0, dtype)
    vy0 = jnp.zeros((), dtype)
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    big = jnp.asarray(jnp.inf, dtype)
    tiny = jnp.asarray(1e-30, dtype)

    def body(carry, _):
        st = dict(carry)
        x, y, vx, vy, r = st["x"], st["y"], st["vx"], st["vy"], st["r"]
        if with_sens:
            (xn, yn, vxn, vyn), lin = jax.linearize(
                rk4, x, y, vx, vy, q)
            # d/dq at fixed x0 (q tangent 1) and d/dx0 (x tangent 1 at t=0)
            sq = lin(st["sq"][0], st["sq"][1], st["sq"][2], st["sq"][3],
                     one)
            sx = lin(st["sx"][0], st["sx"][1], st["sx"][2], st["sx"][3],
                     zero)
        else:
            xn, yn, vxn, vyn = rk4(x, y, vx, vy, q)
            sq = sx = None
        rn = jnp.sqrt(xn * xn + yn * yn)

        def r_dot(px, py, rr, tpx, tpy):
            return (px * tpx + py * tpy) / jnp.maximum(rr, tiny)

        # first-crossing bookkeeping, one scalar lane per eclipse
        found, hx, hy = list(st["found"]), list(st["hx"]), list(st["hy"])
        if with_sens:
            hq = list(st["hq"])     # per-e (dx/dq, dy/dq) at impact
            hxs = list(st["hxs"])   # per-e (dx/dx0, dy/dx0)
            hr = list(st["hr"])     # per-e (dx/drd_e, dy/drd_e)
        den = jnp.maximum(r - rn, tiny)
        for e in range(E):
            take = (rn <= rd[e]) & ~found[e]
            frac_raw = (r - rd[e]) / den
            frac = jnp.clip(frac_raw, 0.0, 1.0)
            hx_new = x + frac * (xn - x)
            hy_new = y + frac * (yn - y)
            if with_sens:
                in_rng = (frac_raw > 0.0) & (frac_raw < 1.0)

                def d_impact(tx, ty, txn, tyn, dnum):
                    # d frac = (d(r - rd)·den - (r - rd)·d(r - rn)) / den²
                    dr = r_dot(x, y, r, tx, ty)
                    drn = r_dot(xn, yn, rn, txn, tyn)
                    dfrac = ((dr - dnum) * den
                             - (r - rd[e]) * (dr - drn)) / (den * den)
                    dfrac = jnp.where(in_rng, dfrac, zero)
                    return (tx + dfrac * (xn - x) + frac * (txn - tx),
                            ty + dfrac * (yn - y) + frac * (tyn - ty))
                dq_xy = d_impact(st["sq"][0], st["sq"][1], sq[0], sq[1],
                                 zero)
                dx_xy = d_impact(st["sx"][0], st["sx"][1], sx[0], sx[1],
                                 zero)
                # d/drd: only frac moves — d frac = -1/den
                dfr = jnp.where(in_rng, -1.0 / den, zero)
                dr_xy = (dfr * (xn - x), dfr * (yn - y))
                hq[e] = (jnp.where(take, dq_xy[0], hq[e][0]),
                         jnp.where(take, dq_xy[1], hq[e][1]))
                hxs[e] = (jnp.where(take, dx_xy[0], hxs[e][0]),
                          jnp.where(take, dx_xy[1], hxs[e][1]))
                hr[e] = (jnp.where(take, dr_xy[0], hr[e][0]),
                         jnp.where(take, dr_xy[1], hr[e][1]))
            hx[e] = jnp.where(take, hx_new, hx[e])
            hy[e] = jnp.where(take, hy_new, hy[e])
            found[e] = found[e] | take
        closer = rn < st["minr"]
        new = dict(x=xn, y=yn, vx=vxn, vy=vyn, r=rn,
                   found=tuple(found), hx=tuple(hx), hy=tuple(hy),
                   minr=jnp.where(closer, rn, st["minr"]),
                   mx=jnp.where(closer, x, st["mx"]),
                   my=jnp.where(closer, y, st["my"]))
        if with_sens:
            new.update(
                sq=sq, sx=sx, hq=tuple(hq), hxs=tuple(hxs), hr=tuple(hr),
                mq=(jnp.where(closer, st["sq"][0], st["mq"][0]),
                    jnp.where(closer, st["sq"][1], st["mq"][1])),
                ms=(jnp.where(closer, st["sx"][0], st["ms"][0]),
                    jnp.where(closer, st["sx"][1], st["ms"][1])))
        return new, None

    pair0 = tuple(zero for _ in range(2))
    carry0 = dict(x=x0, y=y0, vx=vx0, vy=vy0, r=jnp.abs(x0),
                  found=tuple(jnp.zeros((), bool) for _ in range(E)),
                  hx=tuple(zero for _ in range(E)),
                  hy=tuple(zero for _ in range(E)),
                  minr=big, mx=x0, my=y0)
    if with_sens:
        carry0.update(
            sq=(zero, zero, zero, zero),
            # x0 = xl1 - 1e-5: the d/dx0 column starts as dx/dx0 = 1
            sx=(one, zero, zero, zero),
            hq=tuple(pair0 for _ in range(E)),
            hxs=tuple(pair0 for _ in range(E)),
            hr=tuple(pair0 for _ in range(E)),
            mq=pair0, ms=(one, zero))
    carry, _ = jax.lax.scan(body, carry0, None, length=n_steps,
                            unroll=unroll)

    found, hx, hy = carry["found"], carry["hx"], carry["hy"]
    mx, my = carry["mx"], carry["my"]
    out_x = jnp.stack([jnp.where(found[e], hx[e], mx) for e in range(E)])
    out_y = jnp.stack([jnp.where(found[e], hy[e], my) for e in range(E)])
    z = jnp.zeros_like(out_x)
    impacts = jnp.stack([out_x, out_y, z], axis=-1)
    if not with_sens:
        zeros = jnp.zeros_like(impacts)
        return impacts, zeros, zeros, zeros

    def stack_j(rec, fb_x, fb_y):
        jx = jnp.stack([jnp.where(found[e], rec[e][0], fb_x)
                        for e in range(E)])
        jy = jnp.stack([jnp.where(found[e], rec[e][1], fb_y)
                        for e in range(E)])
        return jnp.stack([jx, jy, z], axis=-1)

    jq = stack_j(carry["hq"], carry["mq"][0], carry["mq"][1])
    jx0 = stack_j(carry["hxs"], carry["ms"][0], carry["ms"][1])
    jrd = stack_j(carry["hr"], zero, zero)   # fallback: rd-independent
    return impacts, jq, jx0, jrd


from functools import partial as _partial


@_partial(jax.custom_jvp, nondiff_argnums=(3, 4, 5))
def _stream_impacts_diff(q, rd, xl1_val, n_steps, dt, unroll):
    return _stream_impacts_impl(q, rd, xl1_val, n_steps, dt, unroll,
                                with_sens=False)[0]


@_stream_impacts_diff.defjvp
def _stream_impacts_jvp(n_steps, dt, unroll, primals, tangents):
    q, rd, xl1_val = primals
    qd, rdd, xld = tangents
    # the sensitivity scan uses a SMALLER unroll than the primal: XLA's
    # reverse-mode partial-eval of the 16x-unrolled linearize body is
    # pathologically slow to compile (measured 604 s at unroll=16 vs
    # 4.2 s at unroll=4 on CPU, identical gradients to the last bit);
    # gradient evals tolerate one extra carry round-trip per 4 steps
    impacts, jq, jx0, jrd = _stream_impacts_impl(
        q, rd, xl1_val, n_steps, dt, min(unroll, 4), with_sens=True)
    dot = jq * qd + jx0 * xld + jrd * rdd[:, None]
    return impacts, dot


def spot_position(q, rdisc, traj=None):
    """First crossing of the stream with radius ``rdisc`` from the primary.

    Returns the (x, y, z=0) impact point. If the stream never reaches down
    to ``rdisc`` (disc smaller than the stream's minimum radius) the closest
    approach point is returned instead — the physical-validity prior
    (r_wd < r_spot <= r_disc, SURVEY.md §2 "CV model nodes") rejects such
    walkers, so this is only ever a placeholder that keeps shapes static.
    """
    if traj is None:
        traj = stream_trajectory(q)
    r = jnp.linalg.norm(traj, axis=-1)
    below = r <= rdisc
    # first index where the stream dips inside rdisc
    idx = jnp.argmax(below)
    hit = below.any()
    idx = jnp.where(hit, jnp.maximum(idx, 1), jnp.argmin(r))
    r_a, r_b = r[idx - 1], r[idx]
    frac = jnp.where(hit, (r_a - rdisc) / jnp.maximum(r_a - r_b, 1e-30), 0.0)
    frac = jnp.clip(frac, 0.0, 1.0)
    return traj[idx - 1] + frac * (traj[idx] - traj[idx - 1])
