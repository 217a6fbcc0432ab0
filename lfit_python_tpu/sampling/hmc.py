"""On-device Hamiltonian Monte Carlo with adaptive warmup.

No reference counterpart: the reference family samples exclusively with
emcee's gradient-free stretch move (SURVEY.md §2 "emcee equivalent") —
its C++/Cython posterior is not differentiable, so HMC-class samplers
are structurally impossible there.  This framework's posterior carries
implicit-function-theorem tangents through every geometry root-find
(roche/geometry.py), so ``jax.grad(ln_prob)`` is exact and HMC becomes a
capability the TPU rebuild adds over the reference.

Design for the TPU/XLA model:

- Many independent chains vmapped along the batch axis (the same walker
  data-parallelism the ensemble sampler uses; shard with the mesh).
- A trajectory is a fixed-length ``lax.scan`` of leapfrog steps — static
  control flow, one compiled program regardless of parameters.  Step
  SIZE is jittered per-trajectory (uniform in [0.8, 1.0] x eps) to break
  periodic-orbit resonances instead of jittering the step COUNT, which
  would be a dynamic shape.
- Warmup follows Stan's scheme, compiled as two scans: (1) dual
  averaging of the step size toward a target acceptance (Hoffman &
  Gelman 2014, Nesterov dual averaging) with unit metric; (2) a diagonal
  mass matrix estimated from the second half of phase-1 samples, then
  dual averaging re-run under the new metric.
- Non-finite Hamiltonians (a leapfrog step left the prior's support,
  where ln_prob = -inf) are divergences: the proposal is rejected and
  the divergence counted; positions never become NaN.

Caller contract: ``ln_prob_fn`` must be differentiable.  The Pallas
contact kernel is differentiable via implicit-function-theorem tangents
(``ops.pallas_contacts.contacts_op_diff``), so the default TPU config
works under ``jax.grad``; only ``--precise`` (primal-only refinement)
is incompatible.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["HMCState", "init_hmc", "hmc_step", "warmup_hmc", "run_hmc",
           "batch_trajectories"]

_TARGET_ACCEPT = 0.8


class HMCState(NamedTuple):
    key: jax.Array        # PRNG key
    positions: jax.Array  # (C, D)
    log_prob: jax.Array   # (C,)
    grad: jax.Array       # (C, D) cached d ln_prob / d x
    step_size: jax.Array  # () shared leapfrog step size
    inv_mass: jax.Array   # (D,) diagonal inverse mass (posterior scales^2)
    step: jax.Array       # () int32 global step counter


def _value_and_grad(ln_prob_fn):
    vg = jax.value_and_grad(ln_prob_fn)

    def safe(x):
        lp, g = vg(x)
        # outside the support lp = -inf and g may be NaN; zero it so the
        # half-step momentum update keeps the trajectory finite and the
        # divergence check (non-finite H) does the rejecting
        g = jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g))
        return lp, g

    return safe


def init_hmc(key, start, scatter, ln_prob_fn, n_chains,
             step_size=1e-3, max_rounds=100) -> HMCState:
    """Chain-ball initialisation (same bounded redraw as init_walkers);
    ``scatter`` doubles as the initial diagonal scale guess: inv_mass
    starts at scatter^2 and warmup refines it from actual samples."""
    start = jnp.asarray(start)
    scatter = jnp.asarray(scatter, start.dtype)
    D = start.shape[0]
    vg = jax.vmap(_value_and_grad(ln_prob_fn))

    # one jitted program — see init_walkers: an eager vmapped posterior
    # costs one remote-TPU round trip PER PRIMITIVE
    @jax.jit
    def _init(key, start, scatter):
        def draw(k):
            return start[None, :] + scatter[None, :] * jax.random.normal(
                k, (n_chains, D), start.dtype)

        key, k0 = jax.random.split(key)
        pos = draw(k0)
        lp, g = vg(pos)

        def cond(carry):
            _, _, lp, _, rounds = carry
            return (~jnp.all(jnp.isfinite(lp))) & (rounds < max_rounds)

        def body(carry):
            key, pos, lp, g, rounds = carry
            key, kd = jax.random.split(key)
            fresh = draw(kd)
            bad = ~jnp.isfinite(lp)
            cand = jnp.where(bad[:, None], fresh, pos)
            lp_new, g_new = vg(cand)
            lp2 = jnp.where(bad, lp_new, lp)
            g2 = jnp.where(bad[:, None], g_new, g)
            return key, cand, lp2, g2, rounds + 1

        key, pos, lp, g, _ = jax.lax.while_loop(
            cond, body, (key, pos, lp, g, jnp.asarray(0, jnp.int32)))
        return key, pos, lp, g

    key, pos, lp, g = _init(jnp.asarray(key), start, scatter)
    return HMCState(key, pos, lp, g,
                    jnp.asarray(step_size, start.dtype),
                    scatter.astype(start.dtype) ** 2,
                    jnp.asarray(0, jnp.int32))


def _trajectory(key, x0, lp0, g0, eps, inv_mass, vg_fn, n_leapfrog):
    """One HMC trajectory for one chain. Returns (x, lp, g, accept,
    accept_prob, divergent)."""
    k_mom, k_jit, k_acc = jax.random.split(key, 3)
    # jittered step size: breaks resonant periodic orbits
    eps = eps * (0.8 + 0.2 * jax.random.uniform(k_jit, (), x0.dtype))
    mass_sqrt = jax.lax.rsqrt(jnp.maximum(inv_mass, 1e-30))
    p0 = mass_sqrt * jax.random.normal(k_mom, x0.shape, x0.dtype)

    def kinetic(p):
        return 0.5 * jnp.sum(inv_mass * p * p)

    # leapfrog with fused half-steps: p half in, (L-1) full interleaved,
    # p half out — one position and one gradient eval per step
    p = p0 + 0.5 * eps * g0

    def body(carry, _):
        x, p, lp, g = carry
        x = x + eps * inv_mass * p
        lp, g = vg_fn(x)
        p = p + eps * g
        return (x, p, lp, g), None

    (x, p, lp, g), _ = jax.lax.scan(
        body, (x0, p, lp0, g0), None, length=n_leapfrog)
    p = p - 0.5 * eps * g      # undo the trailing half of the last update

    h0 = -lp0 + kinetic(p0)
    h1 = -lp + kinetic(p)
    delta_h = h0 - h1
    divergent = ~jnp.isfinite(delta_h) | (delta_h < -1000.0)
    accept_prob = jnp.where(divergent, 0.0,
                            jnp.minimum(1.0, jnp.exp(jnp.minimum(delta_h, 0.0))))
    accept = jax.random.uniform(k_acc, (), x0.dtype) < accept_prob
    x_new = jnp.where(accept, x, x0)
    lp_new = jnp.where(accept, lp, lp0)
    g_new = jnp.where(accept, g, g0)
    return x_new, lp_new, g_new, accept, accept_prob, divergent


def batch_trajectories(ln_prob_fn, n_leapfrog):
    """Default chain-batched trajectory evaluator: plain vmap.

    Signature ``(keys (C,2), x (C,D), lp (C,), g (C,D), eps (), inv_mass
    (D,)) -> (x, lp, g, accept, accept_prob, divergent)`` — chains are
    fully independent, so a mesh-sharded equivalent is shard_map of this
    same vmap (``parallel.mesh.sharded_hmc_trajectories``), zero
    collectives inside."""
    vg = _value_and_grad(ln_prob_fn)

    def run(keys, x, lp, g, eps, inv_mass):
        return jax.vmap(
            lambda k, x0, lp0, g0: _trajectory(
                k, x0, lp0, g0, eps, inv_mass, vg, n_leapfrog)
        )(keys, x, lp, g)

    return run


def hmc_step(state: HMCState, ln_prob_fn, n_leapfrog=16,
             traj_batch_fn=None):
    """One HMC step for all chains. Returns (state, accept_frac,
    mean_accept_prob, divergence_frac).  ``traj_batch_fn`` overrides the
    plain-vmap chain batch evaluator (mesh sharding hook)."""
    if traj_batch_fn is None:
        traj_batch_fn = batch_trajectories(ln_prob_fn, n_leapfrog)
    key, k_step = jax.random.split(state.key)
    C = state.positions.shape[0]
    keys = jax.random.split(k_step, C)
    x, lp, g, acc, aprob, div = traj_batch_fn(
        keys, state.positions, state.log_prob, state.grad,
        state.step_size, state.inv_mass)
    new = HMCState(key, x, lp, g, state.step_size, state.inv_mass,
                   state.step + 1)
    return new, jnp.mean(acc.astype(x.dtype)), jnp.mean(aprob), \
        jnp.mean(div.astype(x.dtype))


class _DAState(NamedTuple):
    """Nesterov dual-averaging carry (Hoffman & Gelman 2014, sec 3.2)."""
    log_eps: jax.Array
    log_eps_bar: jax.Array
    h_bar: jax.Array
    mu: jax.Array
    m: jax.Array


def _da_init(eps0):
    log_eps = jnp.log(eps0)
    return _DAState(log_eps, jnp.zeros_like(log_eps),
                    jnp.zeros_like(log_eps),
                    jnp.log(10.0) + log_eps,
                    jnp.asarray(0.0, log_eps.dtype))


def _da_update(da: _DAState, accept_prob, target=_TARGET_ACCEPT,
               gamma=0.05, t0=10.0, kappa=0.75):
    m = da.m + 1.0
    h_bar = (1.0 - 1.0 / (m + t0)) * da.h_bar \
        + (target - accept_prob) / (m + t0)
    log_eps = da.mu - jnp.sqrt(m) / gamma * h_bar
    w = m ** (-kappa)
    log_eps_bar = w * log_eps + (1.0 - w) * da.log_eps_bar
    return _DAState(log_eps, log_eps_bar, h_bar, da.mu, m)


def warmup_hmc(state: HMCState, ln_prob_fn, n_warmup, n_leapfrog=16,
               target_accept=_TARGET_ACCEPT, traj_batch_fn=None,
               chunk_size=16):
    """Stan-style two-phase warmup: dual-averaged step size, then a
    diagonal metric from phase-1 samples, then dual averaging again under
    the new metric. Returns the tuned state (positions at the warmup
    end, adapted step_size and inv_mass).

    Each warmup phase executes in ``chunk_size``-step device programs
    (exactly like run_chunked's production stepping) rather than one
    monolithic scan: a full-length warmup scan of a big posterior is a
    single multi-minute device execution, which remote-attached TPU
    runtimes kill with an UNAVAILABLE fault.  Chunking is
    semantics-preserving — the (state, dual-averaging) carry is explicit.
    """
    n1 = max(n_warmup // 2, 1)
    n2 = max(n_warmup - n1, 1)

    @partial(jax.jit, static_argnums=(2,))
    def phase_chunk(state, da, n):
        def body(carry, _):
            st, da = carry
            st, _, aprob, _ = hmc_step(st, ln_prob_fn, n_leapfrog,
                                       traj_batch_fn)
            da = _da_update(da, aprob, target_accept)
            st = st._replace(
                step_size=jnp.exp(da.log_eps).astype(st.step_size.dtype))
            return (st, da), st.positions

        return jax.lax.scan(body, (state, da), None, length=n)

    def phase(state, da, n):
        xs_parts = []
        done = 0
        while done < n:
            k = min(chunk_size, n - done)
            (state, da), xs = phase_chunk(state, da, k)
            xs_parts.append(xs)
            done += k
        # adopt the averaged (not last) step size at the phase end
        state = state._replace(
            step_size=jnp.exp(da.log_eps_bar).astype(state.step_size.dtype))
        return state, da, jnp.concatenate(xs_parts, axis=0)

    state, _, xs1 = phase(state, _da_init(state.step_size), n1)

    # diagonal metric from the second half of phase-1 draws, pooled over
    # chains (regularised toward unity like Stan: shrink for few samples)
    tail = xs1[n1 // 2:]
    # variance over (step, chain) without reshape: merging a sharded
    # chain axis into the step axis is unsupported on a mesh
    n = tail.shape[0] * tail.shape[1]
    var = jnp.var(tail, axis=(0, 1))
    var = (n / (n + 5.0)) * var + (5.0 / (n + 5.0)) * 1e-3
    state = state._replace(inv_mass=var.astype(state.inv_mass.dtype))

    state, _, _ = phase(state, _da_init(state.step_size), n2)
    return state._replace(step=jnp.asarray(0, jnp.int32))


def _hmc_step_closure(ln_prob_fn, n_leapfrog, traj_batch_fn=None):
    from .ensemble import _STEP_CACHE

    key = ("hmc", ln_prob_fn, int(n_leapfrog), traj_batch_fn)
    fn = _STEP_CACHE.get(key)
    if fn is None:
        def fn(s):
            s, acc, _, div = hmc_step(s, ln_prob_fn, n_leapfrog,
                                      traj_batch_fn)
            return s, (acc, div)

        _STEP_CACHE[key] = fn
    return fn


def run_hmc(state: HMCState, ln_prob_fn, n_steps, n_leapfrog=16, thin=1,
            chunk_size=32,
            progress: Optional[Callable[[int, float], None]] = None,
            traj_batch_fn=None):
    """Run HMC for ``n_steps``; same chunked on-device-thinned transfer
    contract as ensemble.run_sampler (see ensemble.run_chunked).
    Returns (state, chain (n_kept, C, D), chain_lp (n_kept, C),
    accept (n_steps,), divergences (n_steps,))."""
    from .ensemble import run_chunked

    step_fn = _hmc_step_closure(ln_prob_fn, n_leapfrog, traj_batch_fn)
    state, chain, chain_lp, aux = run_chunked(
        state, step_fn, n_steps, thin=thin, chunk_size=chunk_size,
        progress=progress)
    if aux is None:
        aux = (np.empty((0,)), np.empty((0,)))
    return state, chain, chain_lp, aux[0], aux[1]
