"""The four CV flux components (L1), as pure vmappable JAX functions.

Reference: the compiled ``lfit`` C++ core — ``whitedwarf.cpp``, ``disc.cpp``,
``bright_spot.cpp``, ``donor.cpp`` (SURVEY.md §2, all [R]).  The reference
iterates scalar C++ loops over surface elements per phase; here each
component is expressed as a dense (phases x elements) computation so XLA/
Pallas can batch it over walkers and fuse the element reduction.

Every ``*_flux`` function returns the *normalised* light curve of one
component (out-of-eclipse level == 1 by the conventions documented on each
function), to be scaled by its flux parameter (wdFlux, dFlux, sFlux, rsFlux)
by the CV orchestrator in ``models/cv.py``.

Geometry arguments (``xl1_val``, ``phi_l1``, inclination) are precomputed
once per parameter vector by the orchestrator — the TPU replacement for the
reference's geometry cache keyed on (q, dphi, rwd) (SURVEY.md §2 "CV
orchestrator"): instead of caching across sequential calls, the geometry is
computed once per walker and broadcast across all phases/elements inside a
single fused program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..roche.geometry import (
    contact_interval,
    earth_vector,
    origin_shadow_distance,
    ray_clearance,
    visible_fraction_interval,
)
from ..roche.stream import spot_position

__all__ = [
    "wd_visible_fraction",
    "wd_flux",
    "disc_elements",
    "disc_flux",
    "spot_elements",
    "spot_flux",
    "DonorGrid",
    "donor_grid",
    "donor_flux",
    "donor_curve_nodes",
    "donor_curve_eval",
]


# ---------------------------------------------------------------------------
# White dwarf
# ---------------------------------------------------------------------------

@jax.custom_jvp
def _edge_visible_fraction(x, ulimb):
    """Visible flux fraction of a linearly limb-darkened disc cut by a
    straight shadow edge.

    ``x`` is the signed distance of the disc centre from the edge in units
    of the disc radius (+1: fully visible, -1: fully occulted).  Closed form:
    with a = -x, the occulted region is {X < a} on the unit disc and

      V(x) = (1-u) * (acos(a) - a sqrt(1-a^2))          [uniform part]
             + u * (pi/2) * ((1-a) - (1-a^3)/3)          [sqrt(1-rho^2) part]
      total = (1-u) pi + u * 2pi/3

    Reference computes the same geometry numerically inside
    ``whitedwarf.cpp`` [R]; the straight-edge approximation is excellent
    because r_wd << lobe curvature radius.

    Carries a custom JVP: autodiff of arccos at |a| = 1 yields inf * 0 =
    NaN for every fully-visible/fully-occulted phase, but the TRUE
    derivative is smooth —  dV/da = -[2 (1-u) sqrt(1-a^2)
    + (pi/2) u (1-a^2)] / total,  which vanishes at the edges.
    """
    a = jnp.clip(-x, -1.0, 1.0)
    uni = jnp.arccos(a) - a * jnp.sqrt(jnp.maximum(1.0 - a * a, 0.0))
    sq = 0.5 * jnp.pi * ((1.0 - a) - (1.0 - a**3) / 3.0)
    total = (1.0 - ulimb) * jnp.pi + ulimb * 2.0 * jnp.pi / 3.0
    return ((1.0 - ulimb) * uni + ulimb * sq) / total


@_edge_visible_fraction.defjvp
def _edge_visible_fraction_jvp(primals, tangents):
    x, u = primals
    xd, ud = tangents
    val = _edge_visible_fraction(x, u)
    a = jnp.clip(-x, -1.0, 1.0)
    s2 = jnp.maximum(1.0 - a * a, 0.0)
    total = (1.0 - u) * jnp.pi + u * 2.0 * jnp.pi / 3.0
    # dV/da (smooth; zero at |a| = 1), dV/dx = -dV/da inside the clip
    dVda = -(2.0 * (1.0 - u) * jnp.sqrt(s2) + 0.5 * jnp.pi * u * s2) / total
    inside = (x > -1.0) & (x < 1.0)
    dVdx = jnp.where(inside, -dVda, jnp.zeros_like(dVda))
    # dV/du from the quotient rule: V = N/T with dN/du = sq - uni,
    # dT/du = -pi/3
    uni = jnp.arccos(a) - a * jnp.sqrt(s2)
    sq = 0.5 * jnp.pi * ((1.0 - a) - (1.0 - a**3) / 3.0)
    dVdu = (sq - uni) / total + val * (jnp.pi / 3.0) / total
    return val, dVdx * xd + dVdu * ud


def wd_visible_fraction(q, incl_deg, phase, rwd, ulimb, xl1_val, phi_l1):
    """Visible flux fraction of the white dwarf at one orbital phase.

    Converts the smooth ray ``clearance`` of the WD centre into a signed
    sky-plane distance from the shadow terminator (first-order: clearance /
    |grad_perp Phi| at the minimising point, exact as rwd -> 0), then applies
    the analytic straight-edge limb-darkened occultation fraction.

    Replaces the reference's cached contact-phase + per-phase edge position
    machinery (``whitedwarf.cpp`` [R]) with a per-phase closed form — no
    root-finds over phase at all.  Scalar in ``phase``: vmap for curves.
    """
    e = earth_vector(phase, incl_deg)
    p = jnp.zeros(3, dtype=e.dtype)
    clear, grad = ray_clearance(q, p, e, xl1_val, phi_l1, with_grad=True)
    # component of grad(Phi) perpendicular to the line of sight = rate of
    # change of clearance per unit sky-plane displacement of the source
    g_perp = grad - jnp.dot(grad, e) * e
    g_norm = jnp.maximum(jnp.linalg.norm(g_perp), 1e-12)
    d = clear / g_norm                      # signed sky distance to the edge
    # certain-occultation guard via the inscribed sphere (see wd_flux:
    # the linearisation breaks when the ray dives near the donor-centre
    # singularity on near-edge-on mid-eclipse phases)
    from ..roche.geometry import inscribed_radius
    r_ins = inscribed_radius(q, xl1_val, phi_l1)
    tstar = e[0]                            # (donor centre - origin) . e
    miss = jnp.sqrt(jnp.maximum(1.0 - tstar * tstar, 0.0))
    certain_occ = (tstar > 0.0) & (miss < r_ins - rwd)
    # Far from the shadow (incl. the "ray misses the donor sphere" branch,
    # where the gradient is evaluated at a meaningless point — possibly the
    # singular origin itself) the WD is trivially fully visible. 0.25 in
    # potential units is >> any r_wd * |grad|, so this never clips a real
    # partial phase.
    x = jnp.where(clear > 0.25, 1.0,
                  jnp.where(certain_occ, -1.0,
                            jnp.clip(d / rwd, -1.0, 1.0)))
    return _edge_visible_fraction(x, ulimb)


def wd_flux(q, incl_deg, phases, rwd, ulimb, xl1_val, phi_l1, precise=None,
            r_ins=None):
    """Normalised WD light curve over ``phases`` (out of eclipse == 1).

    Uses the componentwise batched shadow-distance path (fast on TPU);
    :func:`wd_visible_fraction` is the scalar oracle for it.  ``precise``:
    optional f64-solved (q, incl, xl1, pl1) for the mixed-precision
    shadow-distance refinement (see ``origin_shadow_distance``).

    ``r_ins``: optional precomputed ``inscribed_radius`` — the
    certain-occultation guard (see below; computed here when absent).
    """
    d, clear = origin_shadow_distance(q, incl_deg, phases, xl1_val, phi_l1,
                                      precise=precise)
    # Certain-occultation guard.  The linearisation d = clear/|grad_perp|
    # is only meaningful near the terminator: for near-edge-on systems
    # the mid-eclipse ray passes close to the DONOR CENTRE, the potential
    # minimum dives toward the r2 -> 0 singularity and d ~ -r2 can shrink
    # below rwd, falsely reporting a partially visible WD at mid-eclipse.
    # If the ray penetrates the inscribed sphere (radius r_ins, strictly
    # inside the lobe) with margin > rwd, the whole WD disc is certainly
    # occulted: perturbing the ray's origin by delta in the sky plane
    # changes its miss distance by at most delta, so the sky distance to
    # the lobe terminator is <= -(r_ins - miss) <= -rwd.
    if r_ins is None:
        from ..roche.geometry import inscribed_radius
        r_ins = inscribed_radius(q, xl1_val, phi_l1)
    dtype = jnp.result_type(phases, float)
    th = 2.0 * jnp.pi * jnp.asarray(phases, dtype)
    si = jnp.sin(jnp.deg2rad(jnp.asarray(incl_deg, dtype)))
    tstar = si * jnp.cos(th)                 # e . (donor centre - origin)
    miss = jnp.sqrt(jnp.maximum(1.0 - tstar * tstar, 0.0))
    certain_occ = (tstar > 0.0) & (miss < r_ins - rwd)
    if precise is not None:
        # finish in f64: the edge fraction's arccos is ill-conditioned at
        # the contact points (derivative -> inf at |x| = 1), where f32
        # rounding of x alone costs ~1e-5 of flux
        rwd = jnp.asarray(rwd, d.dtype)
        ulimb = jnp.asarray(ulimb, d.dtype)
    x = jnp.where(clear > 0.25, 1.0,
                  jnp.where(certain_occ, -1.0,
                            jnp.clip(d / rwd, -1.0, 1.0)))
    frac = _edge_visible_fraction(x, ulimb)
    return frac.astype(jnp.result_type(phases)) if precise is not None \
        else frac


# ---------------------------------------------------------------------------
# Accretion disc
# ---------------------------------------------------------------------------

def disc_elements(rwd, rdisc, dexp, n_rad=24, n_az=40, dtype=jnp.float64):
    """Tile the disc annulus [rwd, rdisc] into n_rad x n_az elements.

    Returns (positions (N,3) in the orbital plane, weights (N,) summing
    to 1).  Surface brightness ~ r^(-dexp) with the annulus area Jacobian
    r dr dphi (reference ``disc.cpp`` [R]: ~1000 elements).  The constant
    cos(i) foreshortening of a flat disc is absorbed into dFlux.
    """
    # radial midpoints
    edges = jnp.linspace(0.0, 1.0, n_rad + 1, dtype=dtype)
    rmid = rwd + (rdisc - rwd) * 0.5 * (edges[:-1] + edges[1:])
    dr = (rdisc - rwd) / n_rad
    az = (jnp.arange(n_az, dtype=dtype) + 0.5) * (2.0 * jnp.pi / n_az)
    r = jnp.repeat(rmid, n_az)
    a = jnp.tile(az, n_rad)
    pos = jnp.stack([r * jnp.cos(a), r * jnp.sin(a), jnp.zeros_like(r)], axis=-1)
    w = jnp.repeat(rmid ** (1.0 - dexp) * dr, n_az)
    w = w / jnp.sum(w)
    return pos, w


def disc_flux(q, incl_deg, phases, positions, weights, xl1_val, phi_l1):
    """Normalised disc light curve: sum of element weights visible per phase.

    ``phases`` (P,), ``positions`` (N,3), ``weights`` (N,) -> (P,).
    """
    e = earth_vector(phases, incl_deg)              # (P, 3)

    def one_pair(pos, ee):
        return ray_clearance(q, pos, ee, xl1_val, phi_l1) >= 0.0

    vis = jax.vmap(                                  # over phases
        lambda ee: jax.vmap(lambda pos: one_pair(pos, ee))(positions)
    )(e)                                             # (P, N) bool
    return jnp.dot(vis.astype(weights.dtype), weights,
                   precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Bright spot
# ---------------------------------------------------------------------------

def spot_elements(q, rdisc, scale, az_deg, exp1, exp2, n_elem=32,
                  max_extent=5.0, dtype=jnp.float64, impact=None):
    """Element positions and weights for the bright-spot strip.

    The strip starts at the gas-stream / disc-rim impact point (ballistic
    trajectory from L1, reference ``Roche::stream`` + ``bright_spot.cpp``
    [R]) and extends along the in-plane direction at angle ``az_deg``
    (degrees, measured from the line of centres towards +y).  The brightness
    profile along the strip is

        B(l) ~ (l/scale)^exp1 * exp(-(l/scale)^exp2)

    (the reference's simple model fixes exp1 = 1, exp2 = 1; the complex
    model frees both [R-med]).  Elements sample l in (0, max_extent*scale].
    Weights are normalised to sum to 1.
    """
    if impact is None:
        impact = spot_position(q, rdisc)
    azr = jnp.deg2rad(jnp.asarray(az_deg, dtype))
    tdir = jnp.array([jnp.cos(azr), jnp.sin(azr), 0.0], dtype=dtype)
    l = (jnp.arange(n_elem, dtype=dtype) + 0.5) / n_elem * max_extent * scale
    pos = impact[None, :].astype(dtype) + l[:, None] * tdir[None, :]
    x = l / scale
    w = x ** exp1 * jnp.exp(-(x ** exp2))
    w = w / jnp.maximum(jnp.sum(w), 1e-300)
    return pos, w


def spot_normal(az_deg, tilt_deg, yaw_deg, dtype=jnp.float64):
    """Outward emission normal of the beamed bright-spot component.

    Simple model: tilt = 90 (normal in the orbital plane), yaw = 0, i.e.
    the normal is the strip direction rotated -90 deg in the plane:
    n = (sin az, -cos az, 0). The complex model rotates it by ``yaw`` in the
    plane and tips it by ``tilt`` out of the plane (tilt = 0: face-on +z).
    Convention documented here is definitional for this framework (exact
    reference convention unavailable, SURVEY.md provenance warning).
    """
    azr = jnp.deg2rad(jnp.asarray(az_deg, dtype))
    tr = jnp.deg2rad(jnp.asarray(tilt_deg, dtype))
    yr = jnp.deg2rad(jnp.asarray(yaw_deg, dtype))
    psi = azr - 0.5 * jnp.pi + yr
    return jnp.array(
        [jnp.sin(tr) * jnp.cos(psi), jnp.sin(tr) * jnp.sin(psi), jnp.cos(tr)],
        dtype=dtype,
    )


def spot_flux(q, incl_deg, phases, positions, weights, fis, normal,
              xl1_val, phi_l1):
    """Normalised bright-spot light curve.

    Per element and phase: visibility (blink) times the emission factor
      fis + (1 - fis) * max(0, n . e(phase))
    so the curve peaks at 1 when the beamed lobe faces the observer and the
    spot is unocculted (sFlux == maximum possible spot flux).  Reference:
    ``bright_spot.cpp`` [R] with isotropic fraction ``fis``.
    """
    e = earth_vector(phases, incl_deg)               # (P, 3)
    beam = jnp.maximum(e @ normal, 0.0)              # (P,)
    factor = fis + (1.0 - fis) * beam                # (P,)

    vis = jax.vmap(
        lambda ee: jax.vmap(
            lambda pos: ray_clearance(q, pos, ee, xl1_val, phi_l1) >= 0.0
        )(positions)
    )(e)                                             # (P, N)
    return jnp.dot(vis.astype(weights.dtype), weights,
                   precision=jax.lax.Precision.HIGHEST) * factor


# ---------------------------------------------------------------------------
# Interval-based element visibility (the fast path)
# ---------------------------------------------------------------------------

def element_intervals(q, incl_deg, positions, xl1_val, phi_l1,
                      precise=None, positions64=None):
    """Per-element eclipse intervals: one root-find per element per walker.

    This is the TPU analogue of the reference's cached per-element contact
    phases (``CV::set_parameters`` + ``Roche::ingress_egress`` [R]): after
    this, per-phase visibility costs a comparison instead of a ray scan.
    ``precise``: optional f64-solved (q, incl, xl1, pl1) — switches the
    contact solver's decision quantity c = Phi - Phi_L1 to an in-loop f64
    evaluation, removing the f32 cancellation-noise tail on
    ill-conditioned contacts (see ``contact_interval``).
    ``positions64``: optional f64 element positions for the f64
    re-evaluation (grids are built in f64 under the precise mode).
    Returns (phi_in (N,), phi_out (N,), eclipsed (N,) bool).
    """
    # one per-walker scalar solve hoisted out of the element vmap: the
    # inscribed-sphere radius bounding the contact bracket from the
    # eclipsed side (contact_interval would otherwise recompute it per
    # element)
    from ..roche.geometry import inscribed_radius
    r_ins = inscribed_radius(q, xl1_val, phi_l1)
    if positions64 is None:
        return jax.vmap(
            lambda p: contact_interval(q, incl_deg, p, xl1_val, phi_l1,
                                       precise=precise, r_ins=r_ins)
        )(positions)
    return jax.vmap(
        lambda p, p64: contact_interval(q, incl_deg, p, xl1_val, phi_l1,
                                        precise=precise, p64=p64,
                                        r_ins=r_ins)
    )(positions, positions64)


def element_flux_curve(phases, widths, intervals, weights):
    """Weighted visible-fraction light curve for a set of elements.

    ``phases`` (P,), ``widths`` (P,) or None, ``intervals`` from
    :func:`element_intervals`, ``weights`` (N,).  Finite-exposure smearing
    is EXACT (analytic interval overlap) — no phase subsampling needed.
    Returns (P,).
    """
    phi_in, phi_out, ecl = intervals
    if widths is None:
        # no-widths fast path: the instantaneous indicator directly —
        # exact w -> 0 limit of visible_fraction_interval (occulted iff
        # mod(phase - phi_in, 1) < dur), at half its op count.  The
        # (P, N) visibility cross-product is the posterior's
        # second-hottest stage after the contact solve and is pure VPU
        # compute, so ops are the budget (measured ~0.9 ms off the
        # north-star posterior).  The `ecl &` guard is redundant here
        # and dropped from the (P, N) sweep: non-eclipsed elements carry
        # phi_in == phi_out == phi_c so dur == 0 and rel >= 0 is never
        # < 0; NaN intervals (invalid geometry) compare false either
        # way.  (The width path still needs `ecl`: its overlap formula
        # divides by dur.)
        d = phases[:, None] - phi_in[None, :]
        rel = d - jnp.floor(d)        # == mod(d, 1) in 2 ops (no rem fixup)
        occ = rel < (phi_out - phi_in)[None, :]
        vis = 1.0 - occ.astype(phases.dtype)
    else:
        vis = visible_fraction_interval(
            phases[:, None], widths[:, None],
            phi_in[None, :], phi_out[None, :], ecl[None, :])
    # precision=highest: TPU f32 matmuls otherwise round operands to
    # bfloat16 (~1e-3 relative), destroying the 1e-6 flux-parity budget
    return jnp.dot(vis, weights, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Donor star
# ---------------------------------------------------------------------------

class DonorGrid(NamedTuple):
    positions: jax.Array   # (N, 3) element centres (binary frame)
    normals: jax.Array     # (N, 3) outward surface normals
    areas: jax.Array       # (N,)  element areas


def donor_grid(q, xl1_val, phi_l1, n_lat=16, n_lon=24, dtype=jnp.float64):
    """Tile the Roche-lobe-filling donor surface (reference ``donor.cpp`` +
    trm-roche ``Roche::face`` [R], ~400 elements).

    Directions from the donor centre on a (lat x lon) spherical grid; the
    surface radius along each direction solves Phi = Phi_L1 (fixed-iteration
    bisection), the outward normal is grad(Phi)/|grad(Phi)| and the area
    element r^2 dOmega / (d_hat . n_hat).  The grid is offset off the poles
    and off the exact L1 axis (where grad(Phi) -> 0).

    Componentwise implementation (no (.., 3) intermediates in the solve
    loop — those pad to 128-lane tiles on TPU; see contact_interval's
    layout note).
    """
    th = (jnp.arange(n_lat, dtype=dtype) + 0.5) / n_lat * jnp.pi      # polar
    phl = (jnp.arange(n_lon, dtype=dtype) + 0.5) / n_lon * 2.0 * jnp.pi
    TH, PH = jnp.meshgrid(th, phl, indexing="ij")
    dx = (jnp.sin(TH) * jnp.cos(PH)).reshape(-1)
    dy = (jnp.sin(TH) * jnp.sin(PH)).reshape(-1)
    dz = jnp.cos(TH).reshape(-1)
    d_omega = (
        (jnp.pi / n_lat) * (2.0 * jnp.pi / n_lon) * jnp.sin(TH)
    ).reshape(-1)

    mu = q / (1.0 + q)
    rmax = 1.0 - xl1_val

    def lobe_f(r):
        # Phi(c2 + r*d) - Phi_L1, with r1^2 = 1 + 2 r dx + r^2, r2 = r
        i1 = jax.lax.rsqrt(1.0 + 2.0 * r * dx + r * r)
        cx = 1.0 + r * dx - mu
        cy = r * dy
        return (-(1.0 - mu) * i1 - mu / r
                - 0.5 * (cx * cx + cy * cy)) - phi_l1

    def lobe_fp(r):
        # dF/dr along the direction (same closed form as the IFT slope)
        i1 = jax.lax.rsqrt(1.0 + 2.0 * r * dx + r * r)
        cx = 1.0 + r * dx - mu
        cy = r * dy
        return ((1.0 - mu) * (r + dx) * i1 * i1 * i1 + mu / (r * r)
                - (cx * dx + cy * dy))

    lo = jnp.full_like(dx, 1e-6) * rmax
    hi = jnp.full_like(dx, rmax)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        inside = lobe_f(mid) < 0.0
        lo = jnp.where(inside, mid, lo)
        hi = jnp.where(inside, hi, mid)
        return lo, hi

    if jnp.finfo(dtype).bits >= 64:
        # f64 oracle path: bisection to machine precision
        lo, hi = jax.lax.fori_loop(0, 54, body, (lo, hi))
        r = 0.5 * (lo + hi)
    else:
        # f32 hot path (round 3): 8 bisections localise the Newton basin,
        # 4 safeguarded Newton steps finish.  12 potential evals instead
        # of 30 for the same accuracy — measured worst-case 2.0e-6
        # relative radius over q in [0.03, 3.5] vs a brentq f64 oracle
        # (the 30-iteration bisection itself sits at the same ~1e-6 f32
        # noise floor of the potential residual).  The bracket safeguard
        # must use STRICT inequalities: at convergence the Newton step
        # underflows to zero and rn == r == lo, which a `<=` test would
        # misread as out-of-bracket and reset to the loose midpoint.
        lo, hi = jax.lax.fori_loop(0, 8, body, (lo, hi))
        r = 0.5 * (lo + hi)

        def nbody(_, carry):
            r, lo, hi = carry
            fr = lobe_f(r)
            inside = fr < 0.0
            lo = jnp.where(inside, r, lo)
            hi = jnp.where(inside, hi, r)
            rn = r - fr / jnp.maximum(lobe_fp(r), 1e-12)
            bad = (rn < lo) | (rn > hi)
            r = jnp.where(bad, 0.5 * (lo + hi), rn)
            return r, lo, hi

        r, lo, hi = jax.lax.fori_loop(0, 4, nbody, (r, lo, hi))
    # IFT tangent (zero primal change; roche.geometry.implicit_tangent):
    # F(r) = Phi(c2 + r d) - Phi_L1, F_r along the direction in closed form
    from ..roche.geometry import implicit_tangent
    r0 = jax.lax.stop_gradient(r)
    i1s = jax.lax.rsqrt(1.0 + 2.0 * r0 * dx + r0 * r0)
    cxs = 1.0 + r0 * dx - jax.lax.stop_gradient(mu)
    cys = r0 * dy
    slope = ((1.0 - jax.lax.stop_gradient(mu)) * (r0 + dx) * i1s**3
             + jax.lax.stop_gradient(mu) / (r0 * r0)
             - (cxs * dx + cys * dy))
    r = implicit_tangent(r, lobe_f(r0), jax.lax.stop_gradient(slope))

    # positions and outward normals (grad Phi), componentwise
    px = 1.0 + r * dx
    py = r * dy
    pz = r * dz
    i1 = jax.lax.rsqrt(px * px + py * py + pz * pz)
    i2 = 1.0 / r
    i13 = i1 * i1 * i1
    i23 = i2 * i2 * i2
    gx = (1.0 - mu) * px * i13 + mu * (px - 1.0) * i23 - (px - mu)
    gy = py * ((1.0 - mu) * i13 + mu * i23 - 1.0)
    gz = pz * ((1.0 - mu) * i13 + mu * i23)
    gn = jnp.maximum(jnp.sqrt(gx * gx + gy * gy + gz * gz), 1e-12)
    nx, ny, nz = gx / gn, gy / gn, gz / gn

    pos = jnp.stack([px, py, pz], axis=-1)
    nrm = jnp.stack([nx, ny, nz], axis=-1)
    mu_dn = jnp.maximum(dx * nx + dy * ny + dz * nz, 1e-3)
    areas = r * r * d_omega / mu_dn
    return DonorGrid(pos, nrm, areas)


def donor_curve_nodes(incl_deg, grid: DonorGrid, ulimb_donor=0.9, n_quad=128):
    """Donor flux on a uniform phase quadrature over the half period.

    The donor curve F(theta) is an even periodic function of phase
    (the lobe grid is symmetric under y -> -y and the earth vector
    mirrors, so F(-theta) = F(theta)) that depends only on CORE-node
    quantities (inclination, the donor grid) — never on per-eclipse
    parameters.  The fused hierarchical posterior therefore evaluates the
    element sum ONCE per walker on ``n_quad + 1`` nodes spanning
    [0, 0.5] and interpolates per eclipse (:func:`donor_curve_eval`),
    instead of running the (phases x elements) sum per eclipse — the
    element work drops ~(E * P_sub / n_quad)-fold, and was measured at
    7.7 ms of the 28 ms north-star posterior (tools/ablate_posterior.py).

    Returns (n_quad + 1,) node values F(j * 0.5 / n_quad).
    """
    dtype = grid.positions.dtype
    th = jnp.linspace(0.0, 0.5, n_quad + 1, dtype=dtype)
    return donor_flux(incl_deg, th, grid, ulimb_donor)


def donor_curve_eval(nodes, phases):
    """Evaluate the quadrature donor curve at arbitrary phases.

    Catmull-Rom cubic interpolation on the uniform [0, 0.5] node grid,
    with even-reflection ghost nodes at both ends (F'(0) = F'(0.5) = 0 by
    the curve's symmetry).  C^1 in ``phases``, so gradient samplers
    (HMC/NUTS) differentiate through it; node values carry their own
    tangents from :func:`donor_curve_nodes`.

    GATHER-FREE: the four taps are evaluated as ONE-HOT MATMULS
    (sum_i w_i * onehot(j_i) @ nodes) instead of ``nodes[j_i]`` gathers.
    On this box's remote-TPU runtime, gathers whose indices are computed
    in-graph from a broadcast execute ~2000x slower than their HLO
    warrants (bisect recorded in ROADMAP.md); the one-hot contraction
    sidesteps the pathology entirely and rides the MXU — the same trick
    the ensemble sampler uses for stretch-move partner selection
    (sampling/ensemble.py).  (P, n+1) one-hot weights at P ~ 128,
    n = 256 are trivially small.  Linear in ``nodes``, so summing
    colliding taps (boundary reflections) is exactly gather semantics.

    Interpolation error is quantified in tests/test_components.py
    (TestDonorQuadrature): the donor curve carries derivative kinks at
    every element's terminator crossing, so the error decays ~h^1.5
    rather than h^4 — measured 7e-6 of the donor flux at n_quad = 256,
    which is ~2.5e-7 of a typical TOTAL flux (donor/total ~ 0.03/0.26
    for the canonical parameters), comfortably under the 1e-6 gate and
    far below the element grid's own discretisation error of the true
    lobe integral.
    """
    n_quad = nodes.shape[0] - 1
    shape = jnp.shape(phases)
    phases = jnp.reshape(phases, (-1,))
    # fold to [0, 0.5]: periodic + even
    tf = jnp.abs(jnp.mod(phases + 0.5, 1.0) - 0.5)
    x = tf * (2.0 * n_quad)                       # node units
    j = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n_quad - 1)
    s = x - j.astype(x.dtype)
    # Catmull-Rom basis weights of the four taps
    s2 = s * s
    s3 = s2 * s
    w0 = 0.5 * (-s + 2.0 * s2 - s3)
    w1 = 0.5 * (2.0 - 5.0 * s2 + 3.0 * s3)
    w2 = 0.5 * (s + 4.0 * s2 - 3.0 * s3)
    w3 = 0.5 * (-s2 + s3)
    # ONE one-hot of the base index j, not four (round 5): the other
    # three taps are coherent shifts of j, so their node values come from
    # SHIFTED COPIES of the node vector, fetched by the same one-hot in a
    # single (P, n+1) @ (n+1, 4) matmul.  The shifted columns are built
    # by slice+concat (no gathers), with the even-reflection ghosts
    # (-1 -> 1; n+1 -> n-1) baked in exactly:
    #   col0[m] = nodes[|m-1|]                 (tap j-1)
    #   col1[m] = nodes[m]                      (tap j)
    #   col2[m] = nodes[m+1]                    (tap j+1; m = n unused)
    #   col3[m] = nodes[n - |n-(m+2)|]          (tap j+2)
    # j <= n-1 always, so the m = n row of cols 2/3 is never selected —
    # padded with the last node (any finite value works).  This quarters
    # the one-hot build (the dominant cost: 4 x (P x (n+1)) compares ->
    # 1) and moves the tap fetch onto the MXU; measured ~0.8 ms off the
    # north-star posterior at n = 256.
    m = jnp.arange(n_quad + 1, dtype=jnp.int32)[None, :]   # (1, n+1)
    oh = (j[:, None] == m).astype(s.dtype)
    col0 = jnp.concatenate([nodes[1:2], nodes[:-1]])
    col2 = jnp.concatenate([nodes[1:], nodes[-1:]])
    col3 = jnp.concatenate([nodes[2:], nodes[-2:-1], nodes[-1:]])
    taps = jnp.stack([col0, nodes, col2, col3], axis=-1)   # (n+1, 4)
    g = jnp.dot(oh, taps, precision=jax.lax.Precision.HIGHEST)  # (P, 4)
    out = w0 * g[:, 0] + w1 * g[:, 1] + w2 * g[:, 2] + w3 * g[:, 3]
    return jnp.reshape(out, shape)


def donor_flux(incl_deg, phases, grid: DonorGrid, ulimb_donor=0.9):
    """Donor light curve, *unnormalised* (the CV orchestrator normalises to
    the flux at quadrature so rsFlux == donor flux at phase 0.25).

    Lambertian + linear limb darkening: per element, area * mu * I(mu) for
    mu = n . e(phase) > 0.  Self-occultation by the lobe's own horizon is
    exactly the mu > 0 cut (the lobe is star-convex from the donor centre to
    good approximation); occultation of the donor by disc/WD is negligible
    and ignored, as in the reference [R].  Ellipsoidal modulation arises
    naturally from the tile geometry.
    """
    # Componentwise broadcast FMAs + ONE fused reduction instead of two
    # dot_generals: the dots put a (P, N) intermediate between them that
    # XLA materialises in HBM (at 1024 walkers x 257 quadrature phases x
    # 384 elements that is ~400 MB of round-trip traffic for microscopic
    # compute).  As elementwise ops feeding jnp.sum, XLA input-fuses the
    # whole chain into the reduction with no materialised (P, N) tensor:
    # 2.6 -> 1.7 ms on the donor-curve stage at 1024 walkers
    # (tools/bench_donor.py; max relative delta 2e-7 = f32
    # reduction-order noise, same accumulation class as a HIGHEST dot).
    e = earth_vector(phases, incl_deg)               # (P, 3)
    nrm = grid.normals
    mu = (e[:, 0, None] * nrm[None, :, 0]
          + e[:, 1, None] * nrm[None, :, 1]
          + e[:, 2, None] * nrm[None, :, 2])         # (P, N)
    mu = jnp.maximum(mu, 0.0)
    # mu * (1 - u*(1 - mu)) expanded so the fusion is pure FMA
    w = mu * (1.0 - ulimb_donor) + ulimb_donor * mu * mu
    return jnp.sum(w * grid.areas[None, :], axis=-1)
