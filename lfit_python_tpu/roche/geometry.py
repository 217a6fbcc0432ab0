"""Roche-lobe geometry core (L0).

TPU-native re-design of the geometry layer of the reference stack
(reference: trm-roche ``roche.h/.cc`` — ``Roche::xl1``, ``Roche::rpot``,
``Roche::blink``, ``Roche::findi``, ``Roche::ingress_egress`` [R]; see
SURVEY.md §2 "Roche geometry").  The reference implements these as scalar
C++ routines with data-dependent iteration counts; here every routine is a
**fixed-iteration, branch-free, vmappable** JAX function so it can be traced
once, fused by XLA, and batched over (walkers x phases x surface elements).

Conventions (dimensionless binary units):
  * separation a = 1, G*(M1+M2) = 1, orbital angular velocity w = 1;
  * the white dwarf (primary) sits at the origin, the donor (secondary) at
    (1, 0, 0); mass ratio q = M2/M1;
  * orbital phase phi: the donor is in front (WD mid-eclipse) at phi = 0;
  * the observer unit vector at inclination i is
        e(phi) = (sin i * cos 2*pi*phi, -sin i * sin 2*pi*phi, cos i).

The central primitive is :func:`ray_clearance`: the minimum over a
line-of-sight ray of (Roche potential - L1 potential) restricted to the
neighbourhood of the donor.  ``clearance < 0``  <=>  the ray dips inside the
donor's Roche lobe  <=>  the point is occulted ("blink" in the reference).
Because clearance is a smooth function of the start point, the white-dwarf
partial-eclipse fraction can be computed from it analytically (see
models/components.py) instead of by per-phase root finds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "roche_potential",
    "xl1",
    "l1_potential",
    "earth_vector",
    "ray_clearance",
    "blink",
    "findi",
    "eclipse_half_width",
    "lobe_radius",
]

# Fixed iteration budgets. Chosen so that f64 results are converged to
# ~1e-12 and f32 results to roundoff; being fixed keeps XLA control flow
# static (no data-dependent loops inside jit).
_XL1_ITERS = 64          # bisection for the L1 point
_CLEAR_GRID = 16         # coarse scan points along the occultation ray
_CLEAR_NEWTON = 8        # Newton polish iterations for the ray minimum
_FINDI_ITERS = 54        # bisection for inclination
_LOBE_ITERS = 54         # bisection for lobe surface radius
_PHASE_ITERS = 54        # bisection for eclipse phase width

# Clearance value reported for rays that cannot intersect the donor sphere
# (donor entirely behind the start point). Potentials are O(1) in binary
# units so 10.0 is "very visible".
_CLEAR_VISIBLE = 10.0


def implicit_tangent(x, residual, slope):
    """Attach the implicit-function-theorem tangent to a solved root with
    EXACTLY zero primal change.

    The fixed-iteration bisections here are (correctly) zero-derivative
    under autodiff — the midpoint sequence is locally constant in the
    parameters — so ``jax.grad`` of anything built on them silently
    returns garbage (the round-2 xfail).  For a root x* of
    F(x, theta) = 0 the IFT gives  dx*/dtheta = -F_theta / F_x;  this
    helper realises that as

        x  +  (d - stop_gradient(d)),      d = -residual / slope

    where ``residual`` is F(stop_gradient(x*), theta) *evaluated so theta
    flows through it* and ``slope`` is F_x at the root (value only — the
    caller may stop_gradient it).  The primal value of d - sg(d) is
    exactly 0.0 (same tensor subtracted from itself; non-finite d is
    zeroed), so the solver's primal output is bitwise unchanged, while
    the tangent becomes exactly the IFT derivative.  Used on the cheap
    per-walker scalar solves; the per-element hot solve
    (:func:`contact_interval`) uses a ``custom_jvp`` instead so its
    primal program carries no extra ops at all.
    """
    d = -residual / slope
    d = jnp.where(jnp.isfinite(d), d, jnp.zeros_like(d))
    return jax.lax.stop_gradient(x) + (d - jax.lax.stop_gradient(d))


def roche_potential(q, r):
    """Dimensionless synchronous Roche potential at position(s) ``r``.

    Phi = -(1-mu)/r1 - mu/r2 - 0.5*((x-mu)^2 + y^2),  mu = q/(1+q)

    ``r`` has shape (..., 3). Reference: trm-roche ``Roche::rpot`` [R].
    """
    mu = q / (1.0 + q)
    x, y, z = r[..., 0], r[..., 1], r[..., 2]
    r1 = jnp.sqrt(x * x + y * y + z * z)
    dx = x - 1.0
    r2 = jnp.sqrt(dx * dx + y * y + z * z)
    return (
        -(1.0 - mu) / r1
        - mu / r2
        - 0.5 * ((x - mu) ** 2 + y * y)
    )


def _potential_on_axis_dx(q, x):
    """d(Phi)/dx on the line of centres for 0 < x < 1."""
    mu = q / (1.0 + q)
    return (1.0 - mu) / (x * x) - mu / ((1.0 - x) ** 2) - (x - mu)


def xl1(q):
    """Distance of the inner Lagrangian point L1 from the primary.

    Fixed-iteration bisection of d(Phi)/dx on (0, 1): monotonically
    decreasing there (single root). Reference: trm-roche ``Roche::xl1`` [R].
    """
    q = jnp.asarray(q)
    lo = jnp.full_like(q, 1e-6)
    hi = jnp.full_like(q, 1.0 - 1e-6)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        f = _potential_on_axis_dx(q, mid)
        # f > 0 near the primary, f < 0 near the donor.
        lo = jnp.where(f > 0.0, mid, lo)
        hi = jnp.where(f > 0.0, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _XL1_ITERS, body, (lo, hi))
    x = 0.5 * (lo + hi)
    # IFT tangent (zero primal change): F = dPhi/dx on the axis, with
    # dF/dx and dF/dq in closed form
    x0 = jax.lax.stop_gradient(x)
    mu = q / (1.0 + q)
    resid = _potential_on_axis_dx(q, x0)
    slope = (-2.0 * (1.0 - jax.lax.stop_gradient(mu)) / x0**3
             - 2.0 * jax.lax.stop_gradient(mu) / (1.0 - x0) ** 3 - 1.0)
    return implicit_tangent(x, resid, slope)


def l1_potential(q, xl1_val=None):
    """Roche potential at the L1 point (the lobe-surface equipotential)."""
    if xl1_val is None:
        xl1_val = xl1(q)
    p = jnp.stack(
        [xl1_val, jnp.zeros_like(xl1_val), jnp.zeros_like(xl1_val)], axis=-1
    )
    return roche_potential(q, p)


def earth_vector(phase, incl_deg):
    """Unit vector from the binary towards the observer at orbital phase.

    ``phase`` in orbital cycles, ``incl_deg`` inclination in degrees.
    Broadcasts; returns shape broadcast(phase, incl).shape + (3,).
    """
    i = jnp.deg2rad(incl_deg)
    ph = 2.0 * jnp.pi * phase
    si = jnp.sin(i)
    e = jnp.stack(
        jnp.broadcast_arrays(
            si * jnp.cos(ph), -si * jnp.sin(ph), jnp.cos(i) * jnp.ones_like(ph)
        ),
        axis=-1,
    )
    return e


def ray_clearance(q, p, e, xl1_val, phi_l1, with_grad=False):
    """Minimum of (Phi - Phi_L1) along the sight-line from ``p`` towards ``e``.

    The minimisation is restricted to the segment of the ray inside the
    sphere centred on the donor (1,0,0) with radius (1 - xl1) — the smallest
    sphere enclosing the whole Roche lobe — so the primary's own potential
    well can never trigger a false occultation.  The restriction degrades
    gracefully: a ray missing the sphere collapses the segment to the point
    of closest approach, keeping clearance positive and *continuous* in
    (p, e), which the analytic white-dwarf eclipse fraction relies on.

    Negative clearance  <=>  occulted (reference ``Roche::blink`` [R]).

    Scalar in (p, e): vmap for batches.  If ``with_grad`` also returns the
    gradient of the clearance w.r.t. ``p`` (by the envelope theorem this is
    just grad(Phi) at the minimising point — no differentiation through the
    iteration is needed).
    """
    c2 = jnp.array([1.0, 0.0, 0.0], dtype=p.dtype)
    rad = 1.0 - xl1_val  # enclosing sphere radius (lobe max extent, to L1)

    w = c2 - p
    tstar = jnp.dot(w, e)                       # closest approach parameter
    d2 = jnp.dot(w, w) - tstar * tstar          # squared miss distance
    disc = rad * rad - d2
    # 1e-30 floor: finite sqrt derivative on sphere-missing rays (see
    # origin_shadow_distance)
    half = jnp.sqrt(jnp.maximum(disc, 1e-30))
    t_lo = jnp.maximum(tstar - half, 0.0)
    t_hi = jnp.maximum(tstar + half, 0.0)
    # No occultation possible if the ray misses the donor sphere entirely
    # (the potential elsewhere can sit below Phi_L1 in the *primary's* well,
    # so evaluating it there would false-trigger), or if the sphere lies
    # entirely behind the start point.
    no_occ = (disc <= 0.0) | (tstar + half <= 1e-9)

    mu = q / (1.0 + q)
    # Along the ray r(t) = p + t*e (|e| = 1):
    #   r1^2 = t^2 + 2 b1 t + c1,   b1 = p.e,        c1 = |p|^2
    #   r2^2 = t^2 + 2 b2 t + c2,   b2 = (p - c2).e, c2 = |p - c2|^2
    # so g(t) = Phi(r(t)) and its first two t-derivatives are closed-form —
    # no autodiff in the hot loop.
    b1 = jnp.dot(p, e)
    c1 = jnp.dot(p, p)
    pc = p - c2
    b2 = jnp.dot(pc, e)
    c2n = jnp.dot(pc, pc)
    ax = p[0] - mu
    ay = p[1]
    ex, ey = e[0], e[1]
    ee2 = ex * ex + ey * ey

    def g_val(t):
        r1 = jnp.sqrt(t * t + 2.0 * b1 * t + c1)
        r2 = jnp.sqrt(t * t + 2.0 * b2 * t + c2n)
        cx = ax + t * ex
        cy = ay + t * ey
        return -(1.0 - mu) / r1 - mu / r2 - 0.5 * (cx * cx + cy * cy)

    def g_derivs(t):
        i1 = jax.lax.rsqrt(t * t + 2.0 * b1 * t + c1)
        i2 = jax.lax.rsqrt(t * t + 2.0 * b2 * t + c2n)
        u1, u2 = t + b1, t + b2
        i13, i23 = i1 * i1 * i1, i2 * i2 * i2
        cx = ax + t * ex
        cy = ay + t * ey
        g1 = ((1.0 - mu) * u1 * i13 + mu * u2 * i23
              - (cx * ex + cy * ey))
        g2 = ((1.0 - mu) * (i13 - 3.0 * u1 * u1 * i13 * i1 * i1)
              + mu * (i23 - 3.0 * u2 * u2 * i23 * i2 * i2)
              - ee2)
        return g1, g2

    # --- coarse grid scan ---------------------------------------------
    frac = jnp.linspace(0.0, 1.0, _CLEAR_GRID, dtype=p.dtype)
    ts = t_lo + (t_hi - t_lo) * frac
    vals = g_val(ts)
    k = jnp.argmin(vals)
    t0 = ts[k]
    h = (t_hi - t_lo) / (_CLEAR_GRID - 1)
    lo = jnp.maximum(t0 - h, t_lo)
    hi = jnp.minimum(t0 + h, t_hi)

    # --- Newton polish (clamped to the bracket) ------------------------
    def newton(_, t):
        g1, g2 = g_derivs(t)
        step = jnp.where(g2 > 1e-12, g1 / jnp.maximum(g2, 1e-12), 0.0)
        return jnp.clip(t - step, lo, hi)

    t_min = jax.lax.fori_loop(0, _CLEAR_NEWTON, newton, t0)
    clear = jnp.where(no_occ, _CLEAR_VISIBLE, g_val(t_min) - phi_l1)
    if not with_grad:
        return clear
    grad_p = jax.grad(lambda pp: roche_potential(q, pp))(p + t_min * e)
    return clear, grad_p


def blink(q, p, e, xl1_val=None, phi_l1=None):
    """True where point ``p`` is *visible* (not occulted by the donor lobe).

    NB: the reference's ``Roche::blink`` returns "is eclipsed" [R]; we return
    visibility because that is what the flux kernels multiply by.
    """
    if xl1_val is None:
        xl1_val = xl1(q)
    if phi_l1 is None:
        phi_l1 = l1_potential(q, xl1_val)
    return ray_clearance(q, p, e, xl1_val, phi_l1) >= 0.0


def findi(q, dphi, xl1_val=None, phi_l1=None):
    """Inclination (deg) for eclipse phase full-width ``dphi`` of the origin.

    By definition the white-dwarf centre crosses the shadow edge exactly at
    phase +/- dphi/2, i.e. clearance(origin, e(dphi/2, i)) = 0. Clearance is
    monotone decreasing in i, so a single fixed-iteration bisection solves it
    (the reference's ``Roche::findi`` nests two root finds [R]; this is the
    same solution computed directly).  Returns NaN when even i = 90 deg gives
    no eclipse that wide (caller converts to a -inf prior).
    """
    if xl1_val is None:
        xl1_val = xl1(q)
    if phi_l1 is None:
        phi_l1 = l1_potential(q, xl1_val)
    dtype = jnp.result_type(q, dphi, float)

    def clear_at(i_deg):
        # componentwise origin clearance (see origin_shadow_distance)
        _, c = origin_shadow_distance(
            q, i_deg, jnp.asarray([0.5 * dphi], dtype), xl1_val, phi_l1)
        return c[0]

    lo = jnp.asarray(1.0, dtype)
    hi = jnp.asarray(90.0, dtype)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        c = clear_at(mid)
        lo = jnp.where(c > 0.0, mid, lo)   # not yet eclipsed -> need higher i
        hi = jnp.where(c > 0.0, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _FINDI_ITERS, body, (lo, hi))
    i_sol = 0.5 * (lo + hi)
    # IFT tangent (zero primal change): the root of C(i; q, dphi, pl1) = 0
    # where C is the origin clearance — C is built from explicit ops and
    # an unrolled Newton, so jax can supply C_i and C_theta directly
    i0 = jax.lax.stop_gradient(i_sol)
    slope = jax.lax.stop_gradient(jax.grad(clear_at)(i0))
    i_sol = implicit_tangent(i_sol, clear_at(i0), slope)
    feasible = clear_at(jnp.asarray(90.0, dtype)) <= 0.0
    return jnp.where(feasible, i_sol, jnp.nan)


def eclipse_half_width(q, incl_deg, p=None, xl1_val=None, phi_l1=None):
    """Phase at which point ``p`` (default: origin) crosses the shadow edge.

    Inverse companion to :func:`findi` (reference ``Roche::findphi`` /
    ``ingress_egress`` [R]). Returns NaN if ``p`` is never eclipsed at this
    inclination. Fixed-iteration bisection on phase in (0, 0.25).
    """
    if xl1_val is None:
        xl1_val = xl1(q)
    if phi_l1 is None:
        phi_l1 = l1_potential(q, xl1_val)
    if p is None:
        p = jnp.zeros(3, dtype=jnp.result_type(q, incl_deg, float))

    def clear_at(phase):
        return ray_clearance(q, p, earth_vector(phase, incl_deg), xl1_val, phi_l1)

    lo = jnp.asarray(0.0, p.dtype)
    hi = jnp.asarray(0.25, p.dtype)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        c = clear_at(mid)
        lo = jnp.where(c < 0.0, mid, lo)   # still eclipsed -> edge is later
        hi = jnp.where(c < 0.0, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _PHASE_ITERS, body, (lo, hi))
    eclipsed_at_0 = clear_at(jnp.asarray(0.0, p.dtype)) < 0.0
    return jnp.where(eclipsed_at_0, 0.5 * (lo + hi), jnp.nan)


def origin_shadow_distance(q, incl_deg, phases, xl1_val, phi_l1,
                           precise=None):
    """Signed sky-plane distance of the WD centre (origin) from the donor's
    shadow terminator, for a batch of phases — the quantity the analytic
    white-dwarf partial-eclipse fraction consumes (models/components.py).

    Positive = visible side.  Componentwise specialisation of
    :func:`ray_clearance` at p = 0 (where the ray geometry collapses:
    r1 = t, b1 = 0) — the general path's (.., 3)-vector intermediates pad
    to 128-lane tiles on TPU and cost ~8x more.

    ``precise``: optional (q64, incl64, xl1_64, pl1_64) of f64-*solved*
    scalars (mixed-precision path, SURVEY.md §7 hard-part 2): the ray
    minimum t from the working-dtype solve is reused (by the envelope
    theorem the clearance is first-order insensitive to t error) and the
    clearance/gradient are re-evaluated once in f64, removing the f32
    cancellation noise in (Phi - Phi_L1) that dominates the parity tail.
    No-op when x64 is disabled (the casts stay f32).

    Returns (distance (P,), clearance (P,)).
    """
    dtype = jnp.result_type(phases, float)
    phases = jnp.asarray(phases, dtype)
    mu = q / (1.0 + q)
    i_rad = jnp.deg2rad(jnp.asarray(incl_deg, dtype))
    si, ci = jnp.sin(i_rad), jnp.cos(i_rad)
    rad = 1.0 - xl1_val
    th = 2.0 * jnp.pi * phases
    ex = si * jnp.cos(th)
    ey = -si * jnp.sin(th)

    # ray from the origin: r1 = t; r2^2 = t^2 - 2 ex t + 1
    tstar = ex                                  # w = (1,0,0); w.e = ex
    disc = rad * rad - (1.0 - tstar * tstar)
    # the 1e-30 floor (not 0) keeps d sqrt/d disc finite where the ray
    # misses the sphere: sqrt'(0) = inf would otherwise poison gradients
    # as 0-cotangent * inf = NaN on every fully-visible phase
    half = jnp.sqrt(jnp.maximum(disc, 1e-30))
    t_lo = jnp.maximum(tstar - half, 1e-6)
    t_hi = jnp.maximum(tstar + half, 1e-6)
    no_occ = (disc <= 0.0) | (tstar + half <= 1e-9)

    def g_val(t):
        i2 = jax.lax.rsqrt(t * t - 2.0 * ex * t + 1.0)
        cx = t * ex - mu
        cy = t * ey
        return -(1.0 - mu) / t - mu * i2 - 0.5 * (cx * cx + cy * cy)

    def g_derivs(t):
        i2 = jax.lax.rsqrt(t * t - 2.0 * ex * t + 1.0)
        u2 = t - ex
        i23 = i2 * i2 * i2
        cx = t * ex - mu
        cy = t * ey
        ee2 = ex * ex + ey * ey
        g1 = (1.0 - mu) / (t * t) + mu * u2 * i23 - (cx * ex + cy * ey)
        g2 = (-2.0 * (1.0 - mu) / (t * t * t)
              + mu * (i23 - 3.0 * u2 * u2 * i23 * i2 * i2) - ee2)
        return g1, g2

    # ray-minimum t: chord-midpoint (closest approach to the donor centre)
    # warm start + clamped Newton + endpoint insurance — same scheme as
    # contact_interval's t_minimum, no grid scan needed (the donor well
    # dominates inside the enclosing sphere, so g is unimodal on the chord)
    t = jnp.clip(tstar, t_lo, t_hi)
    for _ in range(4):
        g1, g2 = g_derivs(t)
        step = jnp.where(g2 > 1e-12, g1 / jnp.maximum(g2, 1e-12), 0.0)
        t = jnp.clip(t - step, t_lo, t_hi)
    val = g_val(t)
    v_lo = g_val(t_lo)
    v_hi = g_val(t_hi)
    t = jnp.where(v_lo < val, t_lo, t)
    val = jnp.minimum(val, v_lo)
    t = jnp.where(v_hi < val, t_hi, t)
    val = jnp.minimum(val, v_hi)
    clear = jnp.where(no_occ, _CLEAR_VISIBLE, val - phi_l1)

    if precise is not None:
        # f64 re-evaluation at the converged t (see docstring).  The
        # clearance is envelope-protected against t error, but the
        # GRADIENT below is not (a first-order quantity in t), so t gets
        # two f64 Newton steps first — without them the f32 t error
        # (~1e-4) leaks ~1e-5 of flux through d = clear / |grad_perp|.
        f64 = jnp.float64
        q64, incl64, x164, pl164 = (jnp.asarray(v, f64) for v in precise)
        mu_, i_ = q64 / (1.0 + q64), jnp.deg2rad(incl64)
        si_, ci_ = jnp.sin(i_), jnp.cos(i_)
        th_ = 2.0 * jnp.pi * jnp.asarray(phases, f64)
        ex_, ey_ = si_ * jnp.cos(th_), -si_ * jnp.sin(th_)
        t_ = jnp.asarray(t, f64)
        tlo_, thi_ = jnp.asarray(t_lo, f64), jnp.asarray(t_hi, f64)
        ee2_ = ex_ * ex_ + ey_ * ey_
        for _ in range(2):
            i2_ = jax.lax.rsqrt(t_ * t_ - 2.0 * ex_ * t_ + 1.0)
            u2_ = t_ - ex_
            i23_ = i2_ * i2_ * i2_
            cx_ = t_ * ex_ - mu_
            cy_ = t_ * ey_
            g1_ = ((1.0 - mu_) / (t_ * t_) + mu_ * u2_ * i23_
                   - (cx_ * ex_ + cy_ * ey_))
            g2_ = (-2.0 * (1.0 - mu_) / (t_ * t_ * t_)
                   + mu_ * (i23_ - 3.0 * u2_ * u2_ * i23_ * i2_ * i2_)
                   - ee2_)
            step_ = jnp.where(g2_ > 1e-14,
                              g1_ / jnp.maximum(g2_, 1e-14), 0.0)
            t_ = jnp.clip(t_ - step_, tlo_, thi_)
        i2_ = jax.lax.rsqrt(t_ * t_ - 2.0 * ex_ * t_ + 1.0)
        cx_ = t_ * ex_ - mu_
        cy_ = t_ * ey_
        val_ = -(1.0 - mu_) / t_ - mu_ * i2_ - 0.5 * (cx_ * cx_ + cy_ * cy_)
        clear_ = jnp.where(no_occ, jnp.asarray(_CLEAR_VISIBLE, f64),
                           val_ - pl164)
        mu, si, ci, ex, ey, t = mu_, si_, ci_, ex_, ey_, t_
        clear = clear_
    # grad(Phi) at the minimising point, perpendicular to the line of sight
    rx, ry, rz = t * ex, t * ey, t * ci
    i1 = jax.lax.rsqrt(rx * rx + ry * ry + rz * rz)
    dx = rx - 1.0
    i2 = jax.lax.rsqrt(dx * dx + ry * ry + rz * rz)
    i13, i23 = i1 * i1 * i1, i2 * i2 * i2
    gx = (1.0 - mu) * rx * i13 + mu * dx * i23 - (rx - mu)
    gy = ry * ((1.0 - mu) * i13 + mu * i23 - 1.0)
    gz = rz * ((1.0 - mu) * i13 + mu * i23)
    gdote = gx * ex + gy * ey + gz * ci
    px_, py_, pz_ = gx - gdote * ex, gy - gdote * ey, gz - gdote * ci
    g_norm = jnp.sqrt(
        jnp.maximum(px_ * px_ + py_ * py_ + pz_ * pz_, 1e-24))
    # NB: under ``precise`` the refined values are returned in f64 — the
    # caller (wd_flux) finishes the ill-conditioned arccos edge fraction
    # in f64 before casting down
    return clear / g_norm, clear


# 8 safeguarded envelope-Newton iterations per edge: with the two-sided
# inscribed/enclosing-sphere bracket (round 3) the Newton basin is
# reached immediately — measured vs a 24-iteration f64 oracle over
# q in [0.05, 1.05] x incl in [80, 89.5] x 200-element clouds, 8 iters
# give f32 max error 7e-7 cycles (identical to 12) and f64 max 1.3e-15
_EDGE_ITERS = 8
_EDGE_T_NEWTON = 3       # clamped Newton steps for the ray minimum (seed)
# warm-started edge loop (round 3): inside the envelope-Newton iteration
# the ray-minimum t is carried across phi iterates (the minimum moves
# continuously with phi), so each iteration needs only _EDGE_T_WARM
# clamped Newton polish steps instead of the full midpoint-seeded
# _EDGE_T_NEWTON solve + 2 endpoint-insurance evaluations.  By the
# envelope theorem the clearance c is second-order insensitive to t
# error, so the cheaper inner solve does not move the root (measured vs
# the f64 oracle: error tail unchanged, tools/accuracy_contacts.py).
# Round 5: ONE polish step suffices — tools/accuracy_contacts.py
# before/after on the 131072-contact stress ensemble: median 4.99e-8
# both ways, p99.9 1.16e-6 vs 1.18e-6, flag agreement identical
# (8/131072 differ); the dropped second step's serial rsqrt chain was
# ~2 ms of the north-star posterior (13.6 -> 11.6 ms at 1024 walkers).
_EDGE_T_WARM = 1
# mixed-precision split: the first iterations run entirely in f32; the
# last _EDGE_ITERS_F64 re-evaluate the decision quantity c in f64 (f64 is
# ~30x f32 on TPU via emulation, so the budget is spent only where the
# f32 cancellation noise in c actually limits accuracy: near the root)
_EDGE_ITERS_F32 = 5
_EDGE_ITERS_F64 = 4


def _grad_potential(q, r):
    """Analytic grad(Phi) (avoids autodiff in hot loops)."""
    mu = q / (1.0 + q)
    x, y, z = r[..., 0], r[..., 1], r[..., 2]
    i1 = jax.lax.rsqrt(x * x + y * y + z * z)
    dx = x - 1.0
    i2 = jax.lax.rsqrt(dx * dx + y * y + z * z)
    i13 = i1 * i1 * i1
    i23 = i2 * i2 * i2
    gx = (1.0 - mu) * x * i13 + mu * dx * i23 - (x - mu)
    gy = (1.0 - mu) * y * i13 + mu * y * i23 - y
    gz = (1.0 - mu) * z * i13 + mu * z * i23
    return jnp.stack([gx, gy, gz], axis=-1)


def inscribed_radius(q, xl1_val=None, phi_l1=None):
    """Radius of a sphere centred on the donor that is CERTAINLY inside
    its Roche lobe: 0.995 x the polar lobe radius.

    The lobe's minimum radius over all directions sits within ~7e-4
    (relative, measured over q in [0.03, 3]) of the polar radius, a few
    degrees off-pole toward the companion — the 0.5% margin certifies
    containment with ~7x headroom.  Used by :func:`contact_interval` as
    the certain-ECLIPSED analytic bracket endpoint (a ray that hits this
    sphere is strictly inside the lobe); the enclosing sphere of radius
    1 - xl1 provides the certain-visible endpoint.  One cheap per-walker
    scalar solve — hoist it out of per-element vmaps.
    """
    dtype = jnp.result_type(q)
    pole = jnp.asarray([0.0, 0.0, 1.0], dtype)
    return 0.995 * lobe_radius(q, pole, xl1_val, phi_l1)


def contact_interval(q, incl_deg, p, xl1_val, phi_l1, precise=None,
                     p64=None, r_ins=None):
    """Eclipse interval (phi_in, phi_out) of an orbital-plane point ``p``.

    Differentiable (default mode): the contact phases carry
    implicit-function-theorem tangents via a ``custom_jvp``
    (:func:`_contact_interval_jvp`) — zero primal-program cost; the JVP
    only materialises under differentiation.  The ``precise``
    (mixed-precision) path is NOT differentiable (its purpose is parity,
    not HMC; differentiate the default f32/f64 path instead).

    ``r_ins``: optional precomputed :func:`inscribed_radius` (per-walker
    scalar; batch callers hoist it out of their element vmap — computed
    here when absent).

    See :func:`_contact_interval_impl` for the solver itself.
    """
    if r_ins is None:
        r_ins = inscribed_radius(q, xl1_val, phi_l1)
    if precise is not None:
        return _contact_interval_impl(q, incl_deg, p, xl1_val, phi_l1,
                                      r_ins, precise, p64)
    return _contact_interval_diff(q, incl_deg, p, xl1_val, phi_l1, r_ins)


@jax.custom_jvp
def _contact_interval_diff(q, incl_deg, p, xl1_val, phi_l1, r_ins):
    return _contact_interval_impl(q, incl_deg, p, xl1_val, phi_l1, r_ins,
                                  None, None)


def _contact_interval_impl(q, incl_deg, p, xl1_val, phi_l1, r_ins,
                           precise=None, p64=None):
    """Eclipse interval (phi_in, phi_out) of an orbital-plane point ``p``.

    ``precise``: optional f64-*solved* (q, incl, xl1, pl1) scalars — the
    mixed-precision mode (SURVEY.md §7 hard-part 2).  The ray-minimum t
    iteration stays in the working dtype, but the decision quantity
    c = Phi - Phi_L1 is re-evaluated in f64 at every iterate (one f64
    evaluation per iteration; by the envelope theorem c is first-order
    insensitive to the f32 t error).  f32 cancellation noise in c (~1e-7)
    otherwise caps near-tangential contacts at ~1e-4-cycle accuracy — the
    whole parity tail.  Becomes a no-op refinement when x64 is disabled.

    The TPU-batched analogue of the reference's per-element geometry cache
    (trm-roche ``Roche::ingress_egress`` [R], cached in ``CV::set_parameters``
    [R]): instead of one blink test per (element, phase), each element's
    ingress/egress phases are root-found ONCE per parameter vector and
    per-phase visibility becomes a wrapped-interval comparison.  This
    removes the (phases x elements x ray-scan) memory blow-up and most of
    the compute.

    Method (round-2 redesign, ~3x cheaper than the grid-rescan scheme):
    1. an *analytic* eclipse bracket from the enclosing sphere — the ray
       misses the sphere of radius (1 - xl1) around the donor outside
       |phi - phi_c| <= theta_max / 2 pi with
       cos(theta_max) = sqrt(ww - rad^2) / (sin i |w|), so the lobe
       contact is bracketed in a ~few-times-tighter interval than the
       naive quarter-cycle, for free;
    2. per phi iterate, the ray-minimum t needs NO grid scan: the chord
       midpoint (closest approach to the donor centre) warm-starts a
       clamped Newton — inside the enclosing sphere the donor's well
       dominates and g(t) is unimodal; the chord endpoints are taken as
       insurance against edge-of-chord minima;
    3. phi takes a safeguarded Newton step on the envelope clearance
       c(phi) = g(t_min(phi), phi) - Phi_L1 with the analytic envelope
       derivative dc/dphi = grad(Phi) . t de/dphi; bisection fallback
       inside the bracket guarantees global convergence, Newton gives
       machine precision in the common case.

    Implementation note (TPU layout): everything is computed on scalar
    component lanes — no (..., 3) vectors — because a trailing axis of 3
    pads to a 128-lane tile on TPU and inflates memory traffic ~40x in
    this, the framework's hottest loop.  The start point must lie in the
    orbital plane (p[2] == 0), true for every occultable element (disc,
    bright spot, white dwarf).

    Returns (phi_in, phi_out, eclipsed): for never-eclipsed points
    ``eclipsed`` is False and the interval is empty (phi_in == phi_out).
    The occulter (donor Roche lobe) is convex for sight lines from the
    primary's side, so the eclipse is a single contiguous interval.

    Scalar in ``p``; vmap over elements and walkers.
    """
    dtype = p.dtype
    mu = q / (1.0 + q)
    i_rad = jnp.deg2rad(jnp.asarray(incl_deg, dtype))
    si, ci = jnp.sin(i_rad), jnp.cos(i_rad)
    rad = 1.0 - xl1_val
    px, py = p[0], p[1]
    wx, wy = 1.0 - px, -py           # donor centre - p (z = 0)
    ww = wx * wx + wy * wy
    c1 = px * px + py * py           # |p|^2
    c2n = ww                         # |p - c2|^2 (same, z = 0)
    two_pi = 2.0 * jnp.pi
    # hoisted for the edge loop's cheap endpoint insurance (on-sphere
    # identity): donor term at an unclipped chord endpoint is -mu/rad,
    # at a clipped (t = 0) endpoint it is -mu * rsqrt(|p - c2|^2)
    inv_rad = 1.0 / rad
    i2_p = jax.lax.rsqrt(c2n)

    # conjunction phase of p: observer azimuth aligned with p -> donor
    phi_c = jnp.arctan2(py, 1.0 - px) / two_pi

    def earth_xy(phase):
        th = two_pi * phase
        return si * jnp.cos(th), -si * jnp.sin(th)     # ez = ci (constant)

    def ray_bracket(ex, ey):
        tstar = wx * ex + wy * ey
        disc = rad * rad - (ww - tstar * tstar)
        half = jnp.sqrt(jnp.maximum(disc, 0.0))
        return (jnp.maximum(tstar - half, 0.0),
                jnp.maximum(tstar + half, 0.0),
                disc <= 0.0)

    def g_val(t, ex, ey, b1, b2):
        i1 = jax.lax.rsqrt(t * t + 2.0 * b1 * t + c1)
        i2 = jax.lax.rsqrt(t * t + 2.0 * b2 * t + c2n)
        cx = px - mu + t * ex
        cy = py + t * ey
        return -(1.0 - mu) * i1 - mu * i2 - 0.5 * (cx * cx + cy * cy)

    def g_derivs(t, ex, ey, b1, b2):
        i1 = jax.lax.rsqrt(t * t + 2.0 * b1 * t + c1)
        i2 = jax.lax.rsqrt(t * t + 2.0 * b2 * t + c2n)
        u1, u2 = t + b1, t + b2
        i13, i23 = i1 * i1 * i1, i2 * i2 * i2
        cx = px - mu + t * ex
        cy = py + t * ey
        val = -(1.0 - mu) * i1 - mu * i2 - 0.5 * (cx * cx + cy * cy)
        g1 = ((1.0 - mu) * u1 * i13 + mu * u2 * i23
              - (cx * ex + cy * ey))
        g2 = ((1.0 - mu) * (i13 - 3.0 * u1 * u1 * i13 * i1 * i1)
              + mu * (i23 - 3.0 * u2 * u2 * i23 * i2 * i2)
              - (ex * ex + ey * ey))
        return val, g1, g2

    if precise is not None:
        f64 = jnp.float64
        q64, incl64, x164, pl164 = (jnp.asarray(v, f64) for v in precise)
        mu64 = q64 / (1.0 + q64)
        i64 = jnp.deg2rad(incl64)
        si64 = jnp.sin(i64)
        psrc = p if p64 is None else p64
        px64, py64 = jnp.asarray(psrc[0], f64), jnp.asarray(psrc[1], f64)
        c164 = px64 * px64 + py64 * py64
        wx64, wy64 = 1.0 - px64, -py64
        c2n64 = wx64 * wx64 + wy64 * wy64

        def c_refined(t, phi):
            """f64 re-evaluation of c = Phi(r(t_min)) - Phi_L1."""
            t_ = jnp.asarray(t, f64)
            th_ = 2.0 * jnp.pi * jnp.asarray(phi, f64)
            ex_, ey_ = si64 * jnp.cos(th_), -si64 * jnp.sin(th_)
            b1_ = px64 * ex_ + py64 * ey_
            b2_ = b1_ - ex_
            i1 = jax.lax.rsqrt(t_ * t_ + 2.0 * b1_ * t_ + c164)
            i2 = jax.lax.rsqrt(t_ * t_ + 2.0 * b2_ * t_ + c2n64)
            cx = px64 - mu64 + t_ * ex_
            cy = py64 + t_ * ey_
            return (-(1.0 - mu64) * i1 - mu64 * i2
                    - 0.5 * (cx * cx + cy * cy)) - pl164
    else:
        c_refined = None

    def t_minimum(ex, ey, phi=None):
        """Ray-minimum t on the sphere chord: the chord midpoint (closest
        approach to the donor centre, tstar = w . e) warm-starts a clamped
        Newton — no grid scan.  The donor term dominates g inside the
        enclosing sphere so the restriction is unimodal; the chord
        endpoints are folded in as insurance."""
        t_lo, t_hi, no_occ = ray_bracket(ex, ey)
        b1 = px * ex + py * ey
        b2 = b1 - ex                      # (p - c2) . e, z = 0
        tstar = wx * ex + wy * ey
        t = jnp.clip(tstar, t_lo, t_hi)
        for _ in range(_EDGE_T_NEWTON):
            _, g1, g2 = g_derivs(t, ex, ey, b1, b2)
            step = jnp.where(g2 > 1e-12, g1 / jnp.maximum(g2, 1e-12), 0.0)
            t = jnp.clip(t - step, t_lo, t_hi)
        val = g_val(t, ex, ey, b1, b2)
        v_lo = g_val(t_lo, ex, ey, b1, b2)
        v_hi = g_val(t_hi, ex, ey, b1, b2)
        t = jnp.where(v_lo < val, t_lo, t)
        val = jnp.minimum(val, v_lo)
        t = jnp.where(v_hi < val, t_hi, t)
        val = jnp.minimum(val, v_hi)
        if c_refined is not None and phi is not None:
            c = jnp.where(no_occ, _CLEAR_VISIBLE,
                          c_refined(t, phi).astype(dtype))
        else:
            c = jnp.where(no_occ, _CLEAR_VISIBLE, val - phi_l1)
        return t, c, no_occ

    # conjunction direction WITHOUT trig: theta_c = atan2(py, wx), so
    # cos/sin(theta_c) = (wx, py)/|w| directly; e(phi_c) = (A, -B, ci)
    iw = jax.lax.rsqrt(ww)
    e_A = si * wx * iw               # si * cos(theta_c)
    e_B = si * py * iw               # si * sin(theta_c)

    # seed at conjunction: the eclipsed? test — f32 suffices (c_mid is far
    # from 0 except for ultra-marginal grazes whose interval is ~empty;
    # measured flag agreement with f64 is 1.0000)
    _, c_mid, _ = t_minimum(e_A, -e_B)
    eclipsed = c_mid < 0.0

    # two-sided analytic bracket from concentric spheres (round-3
    # tightening).  Enclosing sphere (radius 1 - xl1 >= every lobe
    # radius): the ray misses it — certainly VISIBLE — for
    # |phi - phi_c| > theta(rad) / 2 pi.  Inscribed sphere
    # (r_ins <= every lobe radius): the ray still hits it — certainly
    # ECLIPSED (strictly inside the lobe) — for
    # |phi - phi_c| < theta(r_ins) / 2 pi.  Both from the same closed
    # form cos(theta(r)) = sqrt(ww - r^2) / (sin i sqrt(ww)).  The edge
    # iteration runs in the omega = tan(theta/2) half-angle domain
    # (Weierstrass), so the bracket endpoints convert WITHOUT arccos:
    # tan(theta/2) = sqrt((1 - cos)/(1 + cos)); theta <= pi/2 here
    # (cos >= 0), so omega is well-conditioned in [0, 1].
    inv_den = 1.0 / jnp.maximum(si * jnp.sqrt(ww), 1e-12)
    c_eff = jnp.clip(
        jnp.sqrt(jnp.maximum(ww - rad * rad, 0.0)) * inv_den, 0.0, 1.0)
    w_sphere = jnp.sqrt((1.0 - c_eff) / (1.0 + c_eff))
    c_ins = jnp.clip(
        jnp.sqrt(jnp.maximum(ww - r_ins * r_ins, 0.0)) * inv_den, 0.0, 1.0)
    w_inscr = jnp.sqrt((1.0 - c_ins) / (1.0 + c_ins))

    def dc_dphi(t, phi, ex, ey):
        """Envelope derivative: grad(Phi) . t de/dphi, with
        de/dphi = 2 pi (ey, -ex, 0)."""
        rx = px + t * ex
        ry = py + t * ey
        rz = t * ci
        i1 = jax.lax.rsqrt(rx * rx + ry * ry + rz * rz)
        dx = rx - 1.0
        i2 = jax.lax.rsqrt(dx * dx + ry * ry + rz * rz)
        i13, i23 = i1 * i1 * i1, i2 * i2 * i2
        gx = (1.0 - mu) * rx * i13 + mu * dx * i23 - (rx - mu)
        gy = ry * ((1.0 - mu) * i13 + mu * i23 - 1.0)
        return t * two_pi * (gx * ey - gy * ex)

    def edge(sign):
        """Safeguarded envelope Newton for c = 0 in the half-angle
        domain w = tan(theta/2), theta = |angle from conjunction|, on
        the two-sided sphere bracket [w_inscr, w_sphere]
        (inscribed-sphere hit = eclipsed end, enclosing-sphere miss =
        visible end).

        The Weierstrass parametrization makes the per-iterate observer
        direction RATIONAL in w — (cos, sin)(theta) =
        ((1 - w^2), 2 w) / (1 + w^2) rotated from the conjunction
        direction (e_A, -e_B) — so the 16 edge iterations (2 edges x
        8) spend no sin/cos at all (they dominated the per-iteration
        cost); ONE arctan per edge converts the root back to a phase.
        Newton steps convert via dphi/dw = sign / (pi (1 + w^2))."""
        lo = w_inscr                  # eclipsed end (certified)
        hi = w_sphere                 # visible end (sphere miss)
        w0 = 0.5 * (lo + hi)

        def e_of(w):
            """Observer direction at phi_c + sign * atan(w) / pi,
            rational in w (no trig)."""
            den = 1.0 / (1.0 + w * w)
            cd = (1.0 - w * w) * den
            sd = (2.0 * w) * den
            ex = e_A * cd - sign * e_B * sd
            ey = -(e_B * cd + sign * e_A * sd)
            return ex, ey, den

        def body(_, carry):
            w, lo, hi, w_best, c_best, t = carry
            ex, ey, den = e_of(w)
            # warm-started ray minimum: the carried t is clipped into
            # the new sphere chord and polished with _EDGE_T_WARM
            # clamped Newton steps (see the constant's comment)
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
            # first step carries a well-guard: if the carried t has
            # drifted into a concave region (g2 <= 0, outside the
            # donor's well, where a clamped Newton step stalls),
            # restart from the chord midpoint — the well's centre —
            # instead (without this, a stale t can stall on a
            # shoulder, overestimate the clearance, and poison the
            # bracket with a wrong sign: measured max error
            # 9e-3 cycles vs 6e-6 with the guard)
            _, g1, g2 = g_derivs(t, ex, ey, b1, b2)
            t = jnp.where(
                g2 > 1e-12,
                jnp.clip(t - g1 / jnp.maximum(g2, 1e-12), t_lo, t_hi),
                t_mid)
            for _ in range(_EDGE_T_WARM - 1):
                _, g1, g2 = g_derivs(t, ex, ey, b1, b2)
                step = jnp.where(
                    g2 > 1e-12, g1 / jnp.maximum(g2, 1e-12), 0.0)
                t = jnp.clip(t - step, t_lo, t_hi)
            # fused clearance + endpoint insurance + envelope
            # derivative.  One i1/i2 pair at the final t serves both
            # the value and grad(Phi) (the chord form
            # t^2 + 2 b t + |p|^2 equals |p + t e|^2).  Endpoint
            # insurance (the minimum may ride a chord end near a
            # graze) is cheap via the on-sphere identity: chord
            # endpoints lie ON the enclosing sphere, so the donor
            # term there is exactly -mu/rad — no rsqrt; clipped
            # endpoints (t = 0) fall back to the hoisted rsqrt of
            # the element's own donor distance.
            i1 = jax.lax.rsqrt(t * t + 2.0 * b1 * t + c1)
            i2 = jax.lax.rsqrt(t * t + 2.0 * b2 * t + c2n)
            cx = px - mu + t * ex
            cy = py + t * ey
            val = (-(1.0 - mu) * i1 - mu * i2
                   - 0.5 * (cx * cx + cy * cy))
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
            c = jnp.where(no_occ, _CLEAR_VISIBLE, val - phi_l1)
            # track the best EVALUATED point: |c| smallest.  Neither
            # the bracket midpoint (can sit half a bracket off under
            # one-sided Newton convergence) nor the last proposed
            # iterate (can be an unevaluated midpoint fallback) is
            # safe to return.
            better = jnp.abs(c) < c_best
            w_best = jnp.where(better, w, w_best)
            c_best = jnp.where(better, jnp.abs(c), c_best)
            # update the bracket (lo stays eclipsed, hi stays visible)
            lo = jnp.where(c < 0.0, w, lo)
            hi = jnp.where(c < 0.0, hi, w)
            # envelope derivative dc/dphi = grad(Phi) . t de/dphi from
            # the same i1/i2; converted to dc/dw by sign * den / pi
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

        # NB: measured on v5e — lax.fori_loop beats a fully unrolled body
        # here (4.5-5 vs 6.0 ms at 1024 walkers x 992 elements); the
        # unrolled straight-line version spills
        big = jnp.asarray(jnp.inf, dtype)
        # seed the warm t with the chord midpoint (closest approach to
        # the donor centre) at w0; the first body iteration clips it
        # into its bracket before polishing
        ex0, ey0, _ = e_of(w0)
        t_init = wx * ex0 + wy * ey0
        carry = (w0, lo, hi, w0, big, t_init)
        if c_refined is None:
            carry = jax.lax.fori_loop(0, _EDGE_ITERS, body, carry)
            return phi_c + sign * (jnp.arctan(carry[3]) / jnp.pi)
        # mixed precision: f32 omega-domain localisation, then an f64
        # phi-domain tail.  The tail restarts from the ORIGINAL sphere
        # bracket (f32 sign noise near a tangential contact can pin the
        # f32 bracket on the wrong side of the root — it must not be
        # inherited), and carries phi itself in f64: quantising the
        # iterate to f32 between iterations would floor the contact
        # accuracy at ~1e-7 cycles, which is enough to flip an element
        # across a coincident data phase.  Only the ray-minimum t and
        # the envelope derivative stay f32 (envelope theorem: c is
        # first-order insensitive to t error; d only steers Newton).
        carry = jax.lax.fori_loop(0, _EDGE_ITERS_F32, body, carry)
        f64 = jnp.float64
        big64 = jnp.asarray(jnp.inf, f64)
        inv_pi = 1.0 / jnp.pi
        lo_phi = phi_c + sign * (jnp.arctan(w_inscr) * inv_pi)
        hi_phi = phi_c + sign * (jnp.arctan(w_sphere) * inv_pi)

        def body64(_, carry):
            phi, lo64, hi64, phi_best, c_best = carry
            phi32 = phi.astype(dtype)
            ex, ey = earth_xy(phi32)
            t, _, no_occ = t_minimum(ex, ey)
            c = jnp.where(no_occ, big64, c_refined(t, phi))
            better = jnp.abs(c) < c_best
            phi_best = jnp.where(better, phi, phi_best)
            c_best = jnp.where(better, jnp.abs(c), c_best)
            lo64 = jnp.where(c < 0.0, phi, lo64)
            hi64 = jnp.where(c < 0.0, hi64, phi)
            d = dc_dphi(t, phi32, ex, ey).astype(f64)
            phi_newton = phi - c / jnp.where(
                jnp.abs(d) > 1e-12, d, jnp.inf)
            inside = (phi_newton - lo64) * (phi_newton - hi64) < 0.0
            ok = inside & jnp.isfinite(phi_newton) & ~no_occ
            phi = jnp.where(ok, phi_newton, 0.5 * (lo64 + hi64))
            return phi, lo64, hi64, phi_best, c_best

        seed = (phi_c + sign * (jnp.arctan(carry[0]) * inv_pi)).astype(f64)
        carry64 = (seed, jnp.asarray(lo_phi, f64),
                   jnp.asarray(hi_phi, f64), seed, big64)
        carry64 = jax.lax.fori_loop(0, _EDGE_ITERS_F64, body64, carry64)
        return carry64[3]

    # cast back to the working dtype (the downstream interval-overlap
    # visibility math must stay f32 on TPU; the ~1e-9 output quantisation
    # is the irreducible flip window of the precise mode)
    phi_out = jnp.where(eclipsed, edge(+1.0), phi_c).astype(dtype)
    phi_in = jnp.where(eclipsed, edge(-1.0), phi_c).astype(dtype)
    return phi_in, phi_out, eclipsed


def _edge_residual(phi, q, incl_deg, px, py, xl1_val, phi_l1):
    """Envelope clearance c(phi) = min_t Phi(r(t)) - Phi_L1 at fixed
    ``phi`` for the orbital-plane point (px, py), plus the envelope
    derivative dc/dphi — built from explicit ops and an unrolled clamped
    Newton so jax can differentiate it in every argument.  This is the
    residual function behind :func:`_contact_interval_jvp`; it reproduces
    the impl's ``t_minimum``/``g_val`` math componentwise.
    """
    mu = q / (1.0 + q)
    i_rad = jnp.deg2rad(incl_deg)
    si, ci = jnp.sin(i_rad), jnp.cos(i_rad)
    rad = 1.0 - xl1_val
    wx, wy = 1.0 - px, -py
    ww = wx * wx + wy * wy
    c1 = px * px + py * py
    c2n = ww
    two_pi = 2.0 * jnp.pi
    th = two_pi * phi
    ex, ey = si * jnp.cos(th), -si * jnp.sin(th)
    tstar = wx * ex + wy * ey
    disc = rad * rad - (ww - tstar * tstar)
    half = jnp.sqrt(jnp.maximum(disc, 1e-30))
    t_lo = jnp.maximum(tstar - half, 0.0)
    t_hi = jnp.maximum(tstar + half, 0.0)
    no_occ = (disc <= 0.0) | (tstar + half <= 1e-9)
    b1 = px * ex + py * ey
    b2 = b1 - ex

    def g_val(t):
        i1 = jax.lax.rsqrt(t * t + 2.0 * b1 * t + c1)
        i2 = jax.lax.rsqrt(t * t + 2.0 * b2 * t + c2n)
        cx = px - mu + t * ex
        cy = py + t * ey
        return -(1.0 - mu) * i1 - mu * i2 - 0.5 * (cx * cx + cy * cy)

    def g_derivs(t):
        i1 = jax.lax.rsqrt(t * t + 2.0 * b1 * t + c1)
        i2 = jax.lax.rsqrt(t * t + 2.0 * b2 * t + c2n)
        u1, u2 = t + b1, t + b2
        i13, i23 = i1 * i1 * i1, i2 * i2 * i2
        cx = px - mu + t * ex
        cy = py + t * ey
        g1 = ((1.0 - mu) * u1 * i13 + mu * u2 * i23
              - (cx * ex + cy * ey))
        g2 = ((1.0 - mu) * (i13 - 3.0 * u1 * u1 * i13 * i1 * i1)
              + mu * (i23 - 3.0 * u2 * u2 * i23 * i2 * i2)
              - (ex * ex + ey * ey))
        return g1, g2

    t = jnp.clip(tstar, t_lo, t_hi)
    for _ in range(_EDGE_T_NEWTON):
        g1, g2 = g_derivs(t)
        step = jnp.where(g2 > 1e-12, g1 / jnp.maximum(g2, 1e-12), 0.0)
        t = jnp.clip(t - step, t_lo, t_hi)
    val = g_val(t)
    v_lo, v_hi = g_val(t_lo), g_val(t_hi)
    t = jnp.where(v_lo < val, t_lo, t)
    val = jnp.minimum(val, v_lo)
    t = jnp.where(v_hi < val, t_hi, t)
    val = jnp.minimum(val, v_hi)
    c = jnp.where(no_occ, _CLEAR_VISIBLE, val - phi_l1)

    rx, ry, rz = px + t * ex, py + t * ey, t * ci
    i1 = jax.lax.rsqrt(rx * rx + ry * ry + rz * rz)
    dx = rx - 1.0
    i2 = jax.lax.rsqrt(dx * dx + ry * ry + rz * rz)
    i13, i23 = i1 * i1 * i1, i2 * i2 * i2
    gx = (1.0 - mu) * rx * i13 + mu * dx * i23 - (rx - mu)
    gy = ry * ((1.0 - mu) * i13 + mu * i23 - 1.0)
    dcdphi = t * two_pi * (gx * ey - gy * ex)
    return c, dcdphi


@_contact_interval_diff.defjvp
def _contact_interval_jvp(primals, tangents):
    """IFT tangents for the contact phases: at a contact root phi* of
    c(phi; theta) = 0,

        dphi*/dtheta = - (dc/dtheta) / (dc/dphi),

    with dc/dphi the analytic envelope derivative and dc/dtheta obtained
    by jax.jvp of :func:`_edge_residual` at fixed phi*.  Never-eclipsed
    points return (phi_c, phi_c) whose tangent is that of the smooth
    conjunction phase phi_c(p).  The boolean ``eclipsed`` flag gets a
    float0 tangent.  Linear in the input tangents, so reverse mode works
    by transposition (jax.grad is supported).
    """
    import numpy as _np

    # r_ins only shapes the BRACKET, never the root: the contact phase is
    # independent of it, so its tangent is correctly discarded (the
    # residual c(phi; theta) below does not involve r_ins)
    q, incl_deg, p, xl1_val, phi_l1, r_ins = primals
    qd, inld, pd, xvd, pld, _ = tangents
    out = _contact_interval_diff(q, incl_deg, p, xl1_val, phi_l1, r_ins)
    phi_in, phi_out, eclipsed = out

    px, py = p[0], p[1]
    pxd, pyd = pd[0], pd[1]

    def edge_tangent(phi_e):
        phi0 = jax.lax.stop_gradient(phi_e)

        def c_of(qq, ii, pxx, pyy, xv, pll):
            return _edge_residual(phi0, qq, ii, pxx, pyy, xv, pll)[0]

        _, cdot = jax.jvp(
            c_of, (q, incl_deg, px, py, xl1_val, phi_l1),
            (qd, inld, pxd, pyd, xvd, pld))
        _, dcdphi = _edge_residual(
            phi0, q, incl_deg, px, py, xl1_val, phi_l1)
        # guard on the PRIMAL coefficient only — the result must stay
        # linear in ``cdot`` or reverse-mode transposition fails
        coeff = -1.0 / dcdphi
        coeff = jnp.where(jnp.isfinite(coeff), coeff,
                          jnp.zeros_like(coeff))
        return coeff * cdot

    def phic(pxx, pyy):
        return jnp.arctan2(pyy, 1.0 - pxx) / (2.0 * jnp.pi)

    _, phicd = jax.jvp(phic, (px, py), (pxd, pyd))

    din = jnp.where(eclipsed, edge_tangent(phi_in), phicd)
    dout = jnp.where(eclipsed, edge_tangent(phi_out), phicd)
    ecl_dot = _np.zeros(eclipsed.shape, dtype=jax.dtypes.float0)
    return out, (din.astype(phi_in.dtype), dout.astype(phi_out.dtype),
                 ecl_dot)


def visible_fraction_interval(phase, width, phi_in, phi_out, eclipsed):
    """Fraction of the exposure [phase - width/2, phase + width/2] during
    which a point with eclipse interval (phi_in, phi_out) is VISIBLE.

    Exact finite-exposure smearing for interval-based visibility (replaces
    phase subsampling for the element components).  All quantities in
    orbital cycles; handles phase wrapping.  ``width == 0`` degrades to the
    instantaneous indicator.  Broadcasts over phases.
    """
    dur = phi_out - phi_in
    w = jnp.maximum(width, 1e-12)
    # wrapped position of the exposure start relative to eclipse start:
    # in these coordinates the eclipse occupies [0, dur] (+ integer cycles)
    rel = jnp.mod(phase - 0.5 * w - phi_in, 1.0)
    ov_this = jnp.clip(dur - rel, 0.0, w)        # overlap with [0, dur]
    ov_next = jnp.clip(rel + w - 1.0, 0.0, dur)  # overlap with [1, 1+dur]
    overlap = jnp.clip(ov_this + ov_next, 0.0, w)
    frac_occulted = jnp.where(eclipsed, overlap / w, 0.0)
    return 1.0 - frac_occulted


def lobe_radius(q, direction, xl1_val=None, phi_l1=None):
    """Roche-lobe surface radius from the *donor centre* along ``direction``.

    Solves Phi(c2 + r*d) = Phi_L1 for r in (0, 1 - xl1] by fixed-iteration
    bisection; ``direction`` is a unit 3-vector (donor-centred). Used to tile
    the donor surface (reference: trm-roche ``Roche::face``/``ref_sphere``
    [R]). Scalar in ``direction``: vmap for grids.
    """
    if xl1_val is None:
        xl1_val = xl1(q)
    if phi_l1 is None:
        phi_l1 = l1_potential(q, xl1_val)
    c2 = jnp.array([1.0, 0.0, 0.0], dtype=direction.dtype)
    rmax = 1.0 - xl1_val

    def f(r):
        return roche_potential(q, c2 + r * direction) - phi_l1

    lo = jnp.asarray(1e-6, direction.dtype) * rmax
    hi = jnp.asarray(rmax, direction.dtype)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        inside = f(mid) < 0.0           # potential below L1 -> inside lobe
        lo = jnp.where(inside, mid, lo)
        hi = jnp.where(inside, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _LOBE_ITERS, body, (lo, hi))
    r = 0.5 * (lo + hi)
    # IFT tangent (zero primal change): F(r) = Phi(c2 + r d) - Phi_L1,
    # F_r = grad(Phi) . d
    r0 = jax.lax.stop_gradient(r)
    slope = jax.lax.stop_gradient(
        jnp.dot(_grad_potential(q, c2 + r0 * direction), direction))
    return implicit_tangent(r, f(r0), slope)
