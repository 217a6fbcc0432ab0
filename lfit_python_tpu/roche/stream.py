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

__all__ = ["stream_trajectory", "spot_position"]

_N_STEPS = 6000
_DT = 8e-4
_V0 = 1e-3  # initial speed towards the primary, in units of a*w


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
