"""Celerite-style O(n) Gaussian-process likelihood (Matern-3/2).

Reference: the ``celerite`` package's C++ semi-separable Cholesky solver
used by the GP eclipse nodes (SURVEY.md §2 "celerite (external)", "GP
eclipse nodes" [R]).  Implemented here from the Foreman-Mackey et al. (2017)
recursions as a ``lax.scan`` over time — O(n) work and state of size J=2 —
batched over walkers/eclipses with vmap.  (n ~ 1e3 points per eclipse, so
walker-level parallelism dominates and a Blelloch-scan parallelisation of
the time recursion is unnecessary; SURVEY.md §5.7.)

Matern-3/2 in celerite form (celerite ``Matern32Term``): with amplitude
sigma and timescale rho,

    k(tau) = sigma^2 [ (1 + 1/eps) e^{-(1-eps) sqrt3 tau/rho}
                      - (1 - 1/eps) e^{-(1+eps) sqrt3 tau/rho} ] / 2

in the eps -> 0 limit equals sigma^2 (1 + sqrt3 tau/rho) e^{-sqrt3 tau/rho}.
We implement the exact limit form as a J=2 semi-separable kernel using the
complex-pair real embedding with d -> 0 handled analytically:

    k(tau) = e^{-c tau} (a cos(d tau) + b sin(d tau)),
    a = sigma^2, c = sqrt3/rho, d = eps*c, b = a/eps  (small fixed eps)

which matches celerite's own numerical treatment.

Non-stationary in/out-of-eclipse amplitudes (reference GP eclipse nodes
split the light curve at the WD contact phases and run one GP per segment
[R]) are implemented as *recursion resets*: the scan state is zeroed at
segment boundaries, which is exactly equivalent to independent per-segment
GPs while keeping one static-shape scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["matern32_gp_ln_like", "segmented_matern32_ln_like", "matern32_cov"]

_EPS = 0.01  # celerite Matern32Term eps


def _uv_phi(t, sigma2, c):
    """U, V, and inter-step decay P for the Matern-3/2 complex pair.

    K_{nm} = U_n . V_m * exp(-c (t_n - t_m)) for n > m, with
    U_n = [a cos(d t_n) + b sin(d t_n), a sin(d t_n) - b cos(d t_n)],
    V_m = [cos(d t_m), sin(d t_m)].
    """
    d = _EPS * c
    a = sigma2
    b = sigma2 / _EPS
    cd, sd = jnp.cos(d * t), jnp.sin(d * t)
    U = jnp.stack([a * cd + b * sd, a * sd - b * cd], axis=-1)   # (n, 2)
    V = jnp.stack([cd, sd], axis=-1)                              # (n, 2)
    dt = jnp.diff(t, prepend=t[:1])
    phi = jnp.exp(-c * dt)[:, None] * jnp.ones((1, 2), t.dtype)   # (n, 2)
    return U, V, phi


def segmented_matern32_ln_like(t, y, yerr, sigma2, c, reset=None, mask=None):
    """ln N(y | 0, K + diag(yerr^2)) with Matern-3/2 kernel, O(n).

    ``sigma2`` may be scalar or per-point (n,) — per-point amplitude with
    ``reset`` marking segment starts gives exactly independent per-segment
    GPs with segment-wise amplitudes (the GP-eclipse changepoint model).

    ``reset`` (n,) bool: True where the recursion restarts (first point of
    a segment).  ``mask`` (n,) bool: False for padded points (contribute
    nothing and do not advance the recursion).
    """
    t = jnp.asarray(t)
    n = t.shape[0]
    dtype = t.dtype
    sigma2 = jnp.broadcast_to(jnp.asarray(sigma2, dtype), (n,))
    if reset is None:
        reset = jnp.zeros(n, bool)
    if mask is None:
        mask = jnp.ones(n, bool)

    U, V, phi = _uv_phi(t, sigma2, c)
    # segment resets: no correlation across the boundary
    phi = jnp.where(reset[:, None], 0.0, phi)
    # padded points: do not advance the decay state
    phi = jnp.where(mask[:, None], phi, 1.0)
    A = yerr * yerr + sigma2                     # diag of K

    def step(carry, inp):
        S, f = carry                              # S: (2,2), f: (2,)
        Un, Vn, phin, An, yn, m = inp
        # propagate
        S = phin[:, None] * S * phin[None, :]
        f = phin * f
        D = An - Un @ S @ Un
        D = jnp.maximum(D, 1e-30)
        W = (Vn - S @ Un) / D
        z = yn - Un @ f
        ll_inc = -0.5 * (z * z / D + jnp.log(2.0 * jnp.pi * D))
        # update state for next point
        S_new = S + D * jnp.outer(W, W)
        f_new = f + W * z
        S = jnp.where(m, S_new, S)
        f = jnp.where(m, f_new, f)
        ll_inc = jnp.where(m, ll_inc, 0.0)
        return (S, f), ll_inc

    init = (jnp.zeros((2, 2), dtype), jnp.zeros(2, dtype))
    _, lls = jax.lax.scan(step, init, (U, V, phi, A, y, mask))
    return jnp.sum(lls)


def matern32_gp_ln_like(t, y, yerr, sigma, rho, mask=None):
    """Stationary Matern-3/2 GP marginal likelihood (convenience API)."""
    c = jnp.sqrt(3.0) / rho
    return segmented_matern32_ln_like(t, y, yerr, sigma * sigma, c, mask=mask)


def matern32_cov(t, sigma, rho):
    """Dense Matern-3/2 covariance (test oracle; the eps-embedded form used
    by the scan, matching celerite's Matern32Term)."""
    tau = jnp.abs(t[:, None] - t[None, :])
    c = jnp.sqrt(3.0) / rho
    d = _EPS * c
    a = sigma * sigma
    b = a / _EPS
    return jnp.exp(-c * tau) * (a * jnp.cos(d * tau) + b * jnp.sin(d * tau))
