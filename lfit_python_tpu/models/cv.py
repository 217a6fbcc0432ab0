"""CV forward-model orchestrator (L2): parameter vector -> light curve.

Reference: ``lfit`` ``cv.cpp`` ``CV::calcFlux`` + the Cython binding
``lfit.pyx`` exposing ``cv.calcFlux(pars, phase, width)`` and the component
curves ``ywd/ydisc/yspot/ysec`` (SURVEY.md §2 "CV orchestrator", "Cython
binding" [R]).

Parameter vector convention (documented here as the framework's canonical
order; the reference's exact order is [R-med], SURVEY.md §3.2):

  simple (14):
    0 wdFlux   white-dwarf flux (out of eclipse)
    1 dFlux    disc flux (fully visible)
    2 sFlux    bright-spot peak flux
    3 rsFlux   donor flux at quadrature (phase 0.25)
    4 q        mass ratio M_donor / M_wd
    5 dphi     WD-centre eclipse phase full-width
    6 rdisc    disc outer radius, in units of xl1(q)
    7 ulimb    WD linear limb-darkening coefficient
    8 rwd      WD radius, in units of the separation a
    9 scale    bright-spot brightness-profile scale length (units of a)
   10 az       bright-spot strip azimuth (degrees from the line of centres)
   11 fis     isotropic fraction of the bright-spot emission
   12 dexp    disc surface-brightness power-law exponent (B ~ r^-dexp)
   13 phi0    phase offset of mid-eclipse

  complex (18): simple + exp1, exp2 (spot profile exponents),
    tilt, yaw (degrees; spot emission-normal orientation).

The reference's geometry *cache* (recompute i, contact phases, element
grids only when (q, dphi, rwd, ...) change — ``CV::set_parameters`` [R])
does not translate to a traced program; instead all geometry is recomputed
per call, once per walker, and amortised over all phases/elements inside
one fused XLA program — cheap relative to the (phases x elements) blink
sweep and fully batchable with vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..roche.geometry import findi, l1_potential, xl1
from . import components as comp

__all__ = [
    "SIMPLE_PARAM_NAMES",
    "COMPLEX_PARAM_NAMES",
    "CVConfig",
    "CVFluxes",
    "CVGeometry",
    "cv_geometry",
    "cv_physical_ok",
    "cv_fluxes",
    "cv_total_flux",
]

SIMPLE_PARAM_NAMES = (
    "wdFlux", "dFlux", "sFlux", "rsFlux", "q", "dphi", "rdisc",
    "ulimb", "rwd", "scale", "az", "fis", "dexp", "phi0",
)
COMPLEX_PARAM_NAMES = SIMPLE_PARAM_NAMES + ("exp1", "exp2", "tilt", "yaw")


class CVConfig(NamedTuple):
    """Static (trace-time) resolution knobs of the CV model."""
    complex_spot: bool = False
    n_disc_rad: int = 24
    n_disc_az: int = 40
    n_spot: int = 32
    n_donor_lat: int = 16
    n_donor_lon: int = 24
    n_exposure_sub: int = 3      # finite-exposure phase subsamples
    ulimb_donor: float = 0.9
    # donor-curve quadrature (fused posterior only): number of uniform
    # intervals on the half period [0, 0.5] the per-walker donor element
    # sum is evaluated on; each eclipse then interpolates (Catmull-Rom,
    # C^1) instead of re-running the (phases x elements) sum.  Interp
    # error at 256 nodes: 7e-6 of the DONOR flux (~2.5e-7 of a typical
    # total — under the 1e-6 parity gate; tests/test_components.py
    # TestDonorQuadrature).  The interpolation is GATHER-FREE (one-hot
    # matmul taps, components.donor_curve_eval): this box's remote-TPU
    # runtime executes in-graph-indexed gathers ~2000x slower than
    # their HLO warrants (bisect in ROADMAP.md), so a plain nodes[j]
    # 4-tap implementation was unusable here; the one-hot form is what
    # made quadrature shippable as the TPU default.
    # None = auto (resolve_donor_quad, keyed off jax.default_backend()
    # at trace time — see that docstring for the caveat): 256 nodes when
    # the default backend is TPU (where the exact per-eclipse sums cost
    # ~7 ms of the north-star posterior), 0 elsewhere (CPU exact sums
    # are cheap and stay the oracle; parity harnesses that want
    # bit-level comparison should pin n_donor_quad=0 explicitly).
    # 0 = exact per-phase sums (cv_fluxes called WITHOUT a precomputed
    # donor_curve always uses exact sums regardless).
    n_donor_quad: int | None = None
    # mixed precision (SURVEY.md §7 hard-part 2): solve the per-walker
    # scalar geometry (xl1, findi) in f64 and re-evaluate the contact /
    # WD-shadow decision quantity c = Phi - Phi_L1 in f64 near the roots,
    # keeping the element sums and the bulk iteration in f32.  On CPU this
    # closes the f32 parity tail to the 1e-6 gate; on TPU the benefit is
    # capped by the hardware's EMULATED f64 (~3.5e-7 absolute noise on
    # compound expressions — measured, see BASELINE.md), which bounds any
    # on-chip evaluation including full --x64.  ~1.5-2x cost on TPU, so it
    # is OPT-IN (CLI --precise); requires x64 enabled, silently inactive
    # otherwise.
    mixed_precision: bool = False
    # Pallas/Mosaic contact kernel (ops/pallas_contacts.py) for the f32
    # fast mode: bitwise-identical posteriors to the XLA path
    # (tests/test_pallas.py) and measured FASTER embedded once the kernel
    # boundary went componentwise (round 3): 5-eclipse north-star
    # posterior 42.6 vs 55.7 ms on v5e (the round-2 embedded slowdown was
    # an (N, 3) operand materialising with its minor dim tile-padded
    # 3 -> 128 in HBM at the custom-vmap boundary; it also compiles ~9x
    # faster than the XLA fori_loop program, 13 vs 118 s cold).
    # None = auto: ON when the backend is TPU, OFF elsewhere (the CPU
    # fallback is interpret-mode, for tests only).  Applies only when the
    # working dtype is f32 and mixed precision is off.  The kernel IS
    # differentiable: cv_fluxes routes through contacts_op_diff, which
    # attaches implicit-function-theorem tangents at the kernel-computed
    # roots (ops/pallas_contacts.py), so gradient samplers (HMC/NUTS)
    # run on the Pallas hot path too (grad-vs-XLA-path equality tested
    # in tests/test_pallas.py).
    pallas_contacts: bool | None = None


def resolve_donor_quad(config: "CVConfig") -> int:
    """Resolve ``CVConfig.n_donor_quad``'s auto default (None) at trace
    time: 256 quadrature intervals on TPU, 0 (exact sums) elsewhere.

    Limitation (same heuristic as the pallas_contacts auto default):
    this keys off ``jax.default_backend()`` at trace time, not the device
    the program is ultimately compiled for — a function explicitly jitted
    to a non-default backend gets the default backend's branch.  Pin
    ``n_donor_quad`` explicitly when targeting a non-default backend or
    when bit-level comparison against the exact-sum oracle is intended.
    """
    if config.n_donor_quad is None:
        return 256 if jax.default_backend() == "tpu" else 0
    return config.n_donor_quad


class CVFluxes(NamedTuple):
    """Per-component and total model fluxes over the phase grid.

    Mirrors the reference binding's ``ywd/ydisc/yspot/ysec`` attributes
    (``lfit.pyx`` [R]).
    """
    total: jax.Array
    ywd: jax.Array
    ydisc: jax.Array
    yspot: jax.Array
    ysec: jax.Array


class CVGeometry(NamedTuple):
    """Per-walker geometry solves shared by the physical-validity prior and
    the flux model — the reference's geometry cache (``CV::set_parameters``
    [R]) computed exactly once per parameter vector."""
    x1: jax.Array           # L1 distance
    pl1: jax.Array          # L1 potential
    incl: jax.Array         # inclination (deg; NaN if infeasible)
    rdisc: jax.Array        # disc radius in separation units
    spot_impact: jax.Array  # (3,) stream / disc-rim impact point
    # f64-solved (q, incl, x1, pl1) for the mixed-precision refinements,
    # or None when the working dtype is already f64
    precise: tuple | None = None


def cv_geometry(pars, config: CVConfig = CVConfig(),
                core=None, impact=None) -> CVGeometry:
    """Solve the per-parameter-vector geometry (L1, inclination, stream).

    ``core``: optional precomputed (x1, pl1, incl, trajectory) tuple for
    the parameters shared at the tree root (q, dphi) — the hierarchical
    posterior hoists these out of the per-eclipse vmap since every eclipse
    shares the core node (SURVEY.md §2 "CV model nodes"); only the
    disc-radius-dependent stream impact stays per-eclipse.

    ``impact``: optional precomputed stream/disc-rim impact point for THIS
    eclipse's disc radius (from the hoisted carry-only
    ``stream_impacts`` solve, which replaces the stacked-trajectory path
    in the fused posterior — see roche/stream.py).
    """
    from ..roche.stream import spot_position

    pars = jnp.asarray(pars)
    q, dphi, rdisc_x = pars[4], pars[5], pars[6]
    if core is None:
        x1 = xl1(q)
        pl1 = l1_potential(q, x1)
        incl = findi(q, dphi, x1, pl1)
        traj = None
        precise = core_precise(q, dphi, config, pars.dtype)
    else:
        x1, pl1, incl, traj, precise = core
    rdisc = rdisc_x * x1
    if impact is None:
        impact = spot_position(q, rdisc, traj=traj)
    return CVGeometry(x1, pl1, incl, rdisc, impact, precise)


def core_precise(q, dphi, config: CVConfig, dtype):
    """f64-solved (q, incl, x1, pl1) for the mixed-precision refinements —
    tiny per-walker scalar solves, hoisted out of the per-eclipse vmap by
    the hierarchical posterior.  None when the working dtype is already
    f64 (nothing to refine) or mixed precision is off."""
    import jax.numpy as jnp

    if not config.mixed_precision or jnp.dtype(dtype) == jnp.float64:
        return None
    if not jax.config.jax_enable_x64:
        # f64 unavailable: the "precise" solves would silently run in f32,
        # costing compute for no refinement
        return None
    f64 = jnp.float64
    q64 = jnp.asarray(q, f64)
    dphi64 = jnp.asarray(dphi, f64)
    x164 = xl1(q64)
    pl164 = l1_potential(q64, x164)
    incl64 = findi(q64, dphi64, x164, pl164)
    return (q64, incl64, x164, pl164)


def cv_physical_ok(pars, geom: CVGeometry):
    """Physical-validity conditions (reference ``CVModel.py`` priors via
    ``trm.roche`` [R]): feasible (q, dphi); WD inside the disc; the gas
    stream actually reaches the disc rim (bright spot on the disc)."""
    rwd = pars[8]
    spot_r = jnp.linalg.norm(geom.spot_impact)
    return (
        jnp.isfinite(geom.incl)
        & (rwd < geom.rdisc)
        & (spot_r <= geom.rdisc * (1.0 + 1e-3))
        & (spot_r > rwd)
    )


def _expand_exposure(phases, widths, n_sub):
    """Subdivide each exposure into n_sub sub-phases (reference: finite
    exposure smearing in ``CV::calcFlux`` [R]). (P,) -> (P*n_sub,)."""
    offs = (jnp.arange(n_sub, dtype=phases.dtype) + 0.5) / n_sub - 0.5
    sub = phases[:, None] + widths[:, None] * offs[None, :]
    return sub.reshape(-1)


def cv_fluxes(pars, phases, widths=None, config: CVConfig = CVConfig(),
              geometry: CVGeometry | None = None, donor=None,
              donor_curve=None):
    """Evaluate the four-component CV model over a phase grid.

    ``pars``: (14,) or (18,) parameter vector (see module docstring);
    ``phases``: (P,) orbital phases; ``widths``: (P,) exposure phase widths
    (None -> instantaneous). Returns :class:`CVFluxes` of (P,) arrays.
    ``geometry``: precomputed :func:`cv_geometry` (shared with the
    physical-validity check by the fused posterior).  ``donor``: optional
    precomputed :class:`~.components.DonorGrid` — it depends only on the
    core q, so the hierarchical posterior builds it once for all eclipses.
    ``donor_curve``: optional precomputed quadrature node values from
    :func:`~.components.donor_curve_nodes` — the donor curve depends only
    on core-node quantities, so the fused posterior evaluates the element
    sum once per walker and each eclipse interpolates
    (:func:`~.components.donor_curve_eval`).  None = exact per-phase
    element sums (the golden/oracle path).

    Pure and jit/vmap-safe: batch over walkers with ``jax.vmap`` on ``pars``.
    Invalid geometry (non-eclipsing dphi for any inclination) yields NaNs,
    which the prior layer screens out *before* proposals are accepted.
    """
    pars = jnp.asarray(pars)
    dtype = pars.dtype
    (wdF, dF, sF, rsF, q, dphi, rdisc_x, ulimb, rwd, scale, az, fis,
     dexp, phi0) = (pars[i] for i in range(14))
    if config.complex_spot:
        exp1, exp2, tilt, yaw = pars[14], pars[15], pars[16], pars[17]
    else:
        exp1 = jnp.asarray(1.0, dtype)
        exp2 = jnp.asarray(1.0, dtype)
        tilt = jnp.asarray(90.0, dtype)
        yaw = jnp.asarray(0.0, dtype)

    # ---- per-walker geometry (the reference's "geometry cache" work) ----
    if geometry is None:
        geometry = cv_geometry(pars, config)
    x1, pl1, incl, rdisc = (geometry.x1, geometry.pl1, geometry.incl,
                            geometry.rdisc)

    if geometry.precise is not None:
        # build the disc grid in f64 and cast down: f32 rounding of the
        # element coordinates alone shifts their contact phases by ~1e-7
        # cycles, which flips elements across data phases — a parity-tail
        # source no contact-solver precision can remove
        f64 = jnp.float64
        q64, _, x164, _ = geometry.precise
        rdisc64 = jnp.asarray(pars[6], f64) * x164
        disc_pos64, disc_w64 = comp.disc_elements(
            jnp.asarray(rwd, f64), rdisc64, jnp.asarray(dexp, f64),
            config.n_disc_rad, config.n_disc_az, f64)
        disc_pos = disc_pos64.astype(dtype)
        disc_w = disc_w64.astype(dtype)
    else:
        disc_pos64 = None
        disc_pos, disc_w = comp.disc_elements(
            rwd, rdisc, dexp, config.n_disc_rad, config.n_disc_az, dtype)
    spot_pos, spot_w = comp.spot_elements(
        q, rdisc, scale, az, exp1, exp2, config.n_spot, dtype=dtype,
        impact=geometry.spot_impact)
    normal = comp.spot_normal(az, tilt, yaw, dtype)
    dgrid = donor if donor is not None else comp.donor_grid(
        q, x1, pl1, config.n_donor_lat, config.n_donor_lon, dtype)

    # ---- phase grid with finite-exposure smearing -----------------------
    # WD and donor are smooth per-phase functions: phase subsampling.
    # Disc and spot visibility is interval-based: exact analytic smearing.
    phases = jnp.asarray(phases, dtype)
    ph = phases - phi0
    w = None if widths is None else jnp.asarray(widths, dtype)
    if w is not None:
        sub = _expand_exposure(ph, w, config.n_exposure_sub)
        n_sub = config.n_exposure_sub
    else:
        sub = ph
        n_sub = 1

    def mean_over_sub(y):
        return y.reshape(-1, n_sub).mean(axis=1) if n_sub > 1 else y

    # ---- white dwarf (smooth clearance -> analytic edge fraction) -------
    ywd = wdF * mean_over_sub(
        comp.wd_flux(q, incl, sub, rwd, ulimb, x1, pl1,
                     precise=geometry.precise))

    # ---- disc + spot via per-element contact intervals ------------------
    # MIRROR HALVING (round 4): the Roche geometry is symmetric under
    # (y, phase) -> (-y, -phase), and the disc azimuth grid is built in
    # exact mirror pairs (az_j <-> 2pi - az_j for j <-> n_az-1-j), so an
    # element at (px, -py) has eclipse interval (-phi_out, -phi_in) of
    # its partner at (px, py) — verified BITWISE against direct solves
    # (the solver's arithmetic commutes exactly with the y negation;
    # tests/test_components.py TestMirrorContacts).  The contact solve —
    # 11.5 ms of the 17 ms north-star posterior (tools/ablate_posterior)
    # — therefore runs on HALF the disc azimuths plus the (asymmetric)
    # spot strip, and the other half is reconstructed by negation.
    n_rad, n_az = config.n_disc_rad, config.n_disc_az
    mirror = n_az % 2 == 0
    if mirror:
        half_az = n_az // 2
        n_solve_disc = n_rad * half_az
        d3 = disc_pos.reshape(n_rad, n_az, 3)
        all_pos = jnp.concatenate(
            [d3[:, :half_az].reshape(-1, 3), spot_pos], axis=0)
        if disc_pos64 is not None:
            d364 = disc_pos64.reshape(n_rad, n_az, 3)
            all_pos64 = jnp.concatenate(
                [d364[:, :half_az].reshape(-1, 3),
                 spot_pos.astype(jnp.float64)], axis=0)
        else:
            all_pos64 = None
    else:
        all_pos = jnp.concatenate([disc_pos, spot_pos], axis=0)
        if disc_pos64 is not None:
            all_pos64 = jnp.concatenate(
                [disc_pos64, spot_pos.astype(jnp.float64)], axis=0)
        else:
            all_pos64 = None
    use_pallas = config.pallas_contacts
    if use_pallas is None:                 # auto: TPU only
        use_pallas = jax.default_backend() == "tpu"
    if (use_pallas and geometry.precise is None
            and dtype == jnp.float32):
        from ..ops.pallas_contacts import contacts_op_diff

        # componentwise coordinates across the kernel boundary: an
        # (N, 3) operand would materialise with its minor dim tile-padded
        # 3 -> 128 in HBM (measured +14 ms on the 5-eclipse posterior).
        # The _diff wrapper adds implicit-function-theorem tangents at the
        # kernel-computed roots, so gradient samplers (HMC/NUTS) can run
        # on the Pallas hot path too.
        intervals = contacts_op_diff(q, incl, all_pos[..., 0],
                                     all_pos[..., 1], x1, pl1)
    else:
        intervals = comp.element_intervals(q, incl, all_pos, x1, pl1,
                                           precise=geometry.precise,
                                           positions64=all_pos64)
    if mirror:
        # reconstruct the sin(az) < 0 half: column k of the second half
        # mirrors column half_az-1-k of the first (= flip along az)
        s_in, s_out, s_ecl = intervals
        di = s_in[:n_solve_disc].reshape(n_rad, half_az)
        do = s_out[:n_solve_disc].reshape(n_rad, half_az)
        de = s_ecl[:n_solve_disc].reshape(n_rad, half_az)
        disc_iv = (
            jnp.concatenate([di, -jnp.flip(do, axis=1)], axis=1).reshape(-1),
            jnp.concatenate([do, -jnp.flip(di, axis=1)], axis=1).reshape(-1),
            jnp.concatenate([de, jnp.flip(de, axis=1)], axis=1).reshape(-1))
        spot_iv = tuple(a[n_solve_disc:] for a in intervals)
    else:
        n_disc = disc_pos.shape[0]
        disc_iv = tuple(a[:n_disc] for a in intervals)
        spot_iv = tuple(a[n_disc:] for a in intervals)
    # NB: a Pallas kernel for this reduction (lane-rotation scheme: rotate
    # the element vregs against the phase lanes, accumulate in registers)
    # was built and measured in round 3 and LOST to the XLA fusion 123 vs
    # 28 ms embedded — Mosaic lane-rolls cost far more than the arithmetic
    # they feed, and XLA already fuses the visibility math into the
    # weighted reduction without materialising the (P, N) cross product.
    # Negative result recorded in ROADMAP.md; the XLA path stays.
    disc_curve = comp.element_flux_curve(ph, w, disc_iv, disc_w)
    spot_curve = comp.element_flux_curve(ph, w, spot_iv, spot_w)
    ydisc = dF * disc_curve
    beam = jnp.maximum(
        jnp.dot(comp.earth_vector(ph, incl), normal,
                precision=jax.lax.Precision.HIGHEST), 0.0)
    factor = fis + (1.0 - fis) * beam
    yspot = sF * spot_curve * factor

    # ---- donor (smooth; never occulted) ---------------------------------
    # Exposure smearing via the bin CENTRE, not subsamples: the donor
    # curve is globally smooth (harmonic content ~k<=3), so the midpoint
    # differs from the exposure mean by F'' w^2 / 24 ~ (2pi)^2 w^2 / 24
    # of the modulation amplitude — < 2e-7 relative even at w = 0.01
    # cycles, far under the 1e-6 parity gate.  Subdividing it 3x was
    # pure waste (WD keeps subsampling: its ingress is sharp at the
    # exposure scale).
    if donor_curve is not None:
        raw_sec = comp.donor_curve_eval(donor_curve, ph)
        quad = comp.donor_curve_eval(
            donor_curve, jnp.asarray([0.25], dtype))[0]
    else:
        raw_sec = comp.donor_flux(incl, ph, dgrid, config.ulimb_donor)
        quad = comp.donor_flux(
            incl, jnp.asarray([0.25], dtype), dgrid, config.ulimb_donor)[0]
    ysec = rsF * raw_sec / jnp.maximum(quad, 1e-30)

    total = ywd + ydisc + yspot + ysec
    return CVFluxes(total, ywd, ydisc, yspot, ysec)


def cv_total_flux(pars, phases, widths=None, config: CVConfig = CVConfig(),
                  geometry: CVGeometry | None = None, donor=None,
                  donor_curve=None):
    """Total model flux only (the likelihood hot path)."""
    return cv_fluxes(pars, phases, widths, config, geometry, donor,
                     donor_curve).total
