"""Pallas TPU kernel for the per-element contact-interval solver.

This is the framework's hottest op (SURVEY.md §2 native-component checklist
items 1-2): for every (walker, surface element) pair, root-find the eclipse
ingress/egress phases of the element behind the donor's Roche lobe.  The
XLA version (roche/geometry.py ``contact_interval``) runs ~36 sequential
fused kernels per call (one per safeguarded-Newton iteration), each paying
an HBM round trip for the carry; this kernel keeps the whole iteration in
VMEM/registers, reading each operand once.

Grid: (walkers / TW, elements / TN); block (TW, TN) with walker parameters
broadcast along the element axis.  Element coordinates are full (W, N)
arrays — element grids are functions of per-walker parameters (rwd, rdisc,
spot geometry), so every walker has its own element cloud.  All math is
identical (same iteration counts, same safeguards) to the reference JAX
implementation, which doubles as its CPU oracle — see tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..roche import geometry as G

__all__ = ["contact_intervals_pallas"]

_TW = 8     # walker tile (sublane)
_TN = 128   # element tile (lane)


def _kernel(q_ref, si_ref, ci_ref, xl1_ref, pl1_ref, px_ref, py_ref,
            phic_ref, phi_in_ref, phi_out_ref, ecl_ref):
    dtype = q_ref.dtype
    q = q_ref[:]            # (TW, 1)
    si = si_ref[:]
    ci = ci_ref[:]
    xl1v = xl1_ref[:]
    pl1 = pl1_ref[:]
    px = px_ref[:]          # (TW, TN): per-walker element coordinates
    py = py_ref[:]

    mu = q / (1.0 + q)
    rad = 1.0 - xl1v
    wx = 1.0 - px           # broadcast -> (TW, TN) below
    wy = -py
    ww = wx * wx + wy * wy
    c1 = px * px + py * py
    two_pi = 2.0 * jnp.pi
    # atan2 has no Mosaic lowering: the conjunction phase (element-only)
    # is precomputed host-side and passed in
    phi_c = phic_ref[:]

    def earth_xy(phase):
        th = two_pi * phase
        return si * jnp.cos(th), -si * jnp.sin(th)

    def ray_bracket(ex, ey):
        tstar = wx * ex + wy * ey
        disc = rad * rad - (ww - tstar * tstar)
        half = jnp.sqrt(jnp.maximum(disc, 0.0))
        return (jnp.maximum(tstar - half, 0.0),
                jnp.maximum(tstar + half, 0.0),
                disc <= 0.0)

    def g_val(t, ex, ey, b1, b2):
        i1 = jax.lax.rsqrt(t * t + 2.0 * b1 * t + c1)
        i2 = jax.lax.rsqrt(t * t + 2.0 * b2 * t + ww)
        cx = px - mu + t * ex
        cy = py + t * ey
        return -(1.0 - mu) * i1 - mu * i2 - 0.5 * (cx * cx + cy * cy)

    def g_derivs(t, ex, ey, b1, b2):
        i1 = jax.lax.rsqrt(t * t + 2.0 * b1 * t + c1)
        i2 = jax.lax.rsqrt(t * t + 2.0 * b2 * t + ww)
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

    def t_minimum(ex, ey, t_warm=None, use_grid=True):
        t_lo, t_hi, no_occ = ray_bracket(ex, ey)
        b1 = px * ex + py * ey
        b2 = b1 - ex
        span = t_hi - t_lo
        if use_grid:
            t_best = t_lo
            v_best = g_val(t_lo, ex, ey, b1, b2)
            for k in range(1, G._CONTACT_GRID):
                tk = t_lo + span * (k / (G._CONTACT_GRID - 1))
                vk = g_val(tk, ex, ey, b1, b2)
                take = vk < v_best
                t_best = jnp.where(take, tk, t_best)
                v_best = jnp.where(take, vk, v_best)
            if t_warm is not None:
                tw = jnp.clip(t_warm, t_lo, t_hi)
                vw = g_val(tw, ex, ey, b1, b2)
                take = vw < v_best
                t_best = jnp.where(take, tw, t_best)
                v_best = jnp.where(take, vw, v_best)
        else:
            t_best = jnp.clip(t_warm, t_lo, t_hi)
            v_best = g_val(t_best, ex, ey, b1, b2)
        spacing = span / (G._CONTACT_GRID - 1)
        n_lo = jnp.maximum(t_best - spacing, t_lo)
        n_hi = jnp.minimum(t_best + spacing, t_hi)
        t = t_best
        for _ in range(G._CONTACT_T_ITERS):
            _, g1, g2 = g_derivs(t, ex, ey, b1, b2)
            step = jnp.where(g2 > 1e-12, g1 / jnp.maximum(g2, 1e-12), 0.0)
            t = jnp.clip(t - step, n_lo, n_hi)
        val = g_val(t, ex, ey, b1, b2)
        better = val < v_best
        t = jnp.where(better, t, t_best)
        val = jnp.minimum(val, v_best)
        c = jnp.where(no_occ, G._CLEAR_VISIBLE, val - pl1)
        return t, c, no_occ

    def dc_dphi(t, ex, ey):
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

    ex_c, ey_c = earth_xy(phi_c)
    t_c, c_mid, _ = t_minimum(ex_c, ey_c)
    eclipsed = c_mid < 0.0

    def edge(sign):
        lo = phi_c + jnp.zeros_like(c_mid)
        hi = phi_c + sign * 0.25 + jnp.zeros_like(c_mid)
        phi0 = phi_c + sign * 0.125 + jnp.zeros_like(c_mid)

        def make_body(use_grid):
            def body(_, carry):
                phi, t, lo, hi = carry
                ex, ey = earth_xy(phi)
                t, c, no_occ = t_minimum(ex, ey, t_warm=t,
                                         use_grid=use_grid)
                lo = jnp.where(c < 0.0, phi, lo)
                hi = jnp.where(c < 0.0, hi, phi)
                d = dc_dphi(t, ex, ey)
                phi_newton = phi - c / jnp.where(
                    jnp.abs(d) > 1e-12, d, jnp.inf)
                inside = (phi_newton - lo) * (phi_newton - hi) < 0.0
                ok = inside & jnp.isfinite(phi_newton) & ~no_occ
                phi = jnp.where(ok, phi_newton, 0.5 * (lo + hi))
                return phi, t, lo, hi
            return body

        carry = jax.lax.fori_loop(
            0, G._CONTACT_ITERS, make_body(True),
            (phi0, t_c + jnp.zeros_like(c_mid), lo, hi))
        phi, _, lo, hi = jax.lax.fori_loop(
            0, G._CONTACT_POLISH, make_body(False), carry)
        return 0.5 * (lo + hi)

    phi_in_ref[:] = jnp.where(eclipsed, edge(-1.0), phi_c + 0.0 * c_mid)
    phi_out_ref[:] = jnp.where(eclipsed, edge(+1.0), phi_c + 0.0 * c_mid)
    ecl_ref[:] = eclipsed


@functools.partial(jax.jit, static_argnames=("interpret",))
def contact_intervals_pallas(q, incl_deg, xl1_val, phi_l1, px, py,
                             interpret=False):
    """Batched contact intervals: (W,) walker params x (W, N) element
    coords -> (phi_in, phi_out, eclipsed) each (W, N).

    Walker count W must be a multiple of 8 and element count N a multiple
    of 128 (callers pad).  ``interpret=True`` runs the Mosaic interpreter —
    the CPU/CI sanitizer path (SURVEY.md §5.2).
    """
    W = q.shape[0]
    N = px.shape[1]
    if W % _TW or N % _TN:
        raise ValueError(f"W={W} must be multiple of {_TW}, N={N} of {_TN}")
    dtype = q.dtype
    i_rad = jnp.deg2rad(incl_deg.astype(dtype))
    si, ci = jnp.sin(i_rad), jnp.cos(i_rad)

    col = lambda a: a.reshape(W, 1)
    grid = (W // _TW, N // _TN)
    wspec = pl.BlockSpec((_TW, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    espec = pl.BlockSpec((_TW, _TN), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((_TW, _TN), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)

    phi_c = jnp.arctan2(py, 1.0 - px) / (2.0 * jnp.pi)
    phi_in, phi_out, ecl = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[wspec] * 5 + [espec] * 3,
        out_specs=[ospec] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((W, N), dtype),
            jax.ShapeDtypeStruct((W, N), dtype),
            jax.ShapeDtypeStruct((W, N), jnp.bool_),
        ],
        interpret=interpret,
    )(col(q.astype(dtype)), col(si), col(ci),
      col(xl1_val.astype(dtype)), col(phi_l1.astype(dtype)),
      px.astype(dtype), py.astype(dtype),
      phi_c.astype(dtype))
    return phi_in, phi_out, ecl
