"""On-device No-U-Turn Sampler (iterative multinomial NUTS).

No reference counterpart (the reference family is emcee-only,
SURVEY.md §2 "emcee equivalent"); like sampling/hmc.py this rides the
implicit-function-theorem-differentiable posterior.  NUTS removes HMC's
one hand-tuned knob (trajectory length): each trajectory doubles until
the path makes a "U-turn", so the sampler adapts its integration length
to the local geometry per chain per step.

TPU/XLA design:

- The recursive NUTS tree (Hoffman & Gelman 2014) is rebuilt as the
  ITERATIVE algorithm (Phan & Pradhan, numpyro; Stan's current form):
  a trajectory is grown leaf-by-leaf under two nested bounded
  ``lax.while_loop``s (doubling loop x subtree loop), with the
  sub-U-turn checks done against O(max_depth) momentum checkpoints
  selected by leaf-index bit tricks — static shapes, no recursion, no
  dynamic allocation, exactly 2^max_depth gradient evals worst case.
- Multinomial (not slice) sampling over the trajectory with biased
  progressive sampling toward the new subtree (Betancourt 2017), the
  same scheme as Stan/numpyro.
- The U-turn criterion is the generalised one with the endpoint
  half-momentum correction (numpyro's ``_is_turning``); sub-U-turns are
  checked at odd leaf indices against checkpointed even-leaf momenta
  (``_leaf_to_ckpt``) so a subtree of 2^d leaves needs d checkpoints,
  not 2^d states.
- Chains are vmapped along the batch axis; under vmap the while_loops
  run in lockstep (a chain that terminated early masks out), so the
  per-step cost is the batch's deepest trajectory — the price of SIMD,
  paid knowingly (ROADMAP round-3 note).

Divergences: a leaf whose energy error exceeds ``max_delta_energy``
(or is non-finite, e.g. a leapfrog step left the prior's support where
ln_prob = -inf) gets zero multinomial weight and stops the trajectory;
positions never become NaN.

Caller contract matches sampling/hmc.py: ``ln_prob_fn`` must be
differentiable (the Pallas contact kernel now carries IFT tangents via
``contacts_op_diff``, so the default TPU config works).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .hmc import HMCState, _da_init, _da_update, _value_and_grad, init_hmc

__all__ = ["init_nuts", "nuts_step", "warmup_nuts", "run_nuts",
           "batch_nuts_trajectories"]

_TARGET_ACCEPT = 0.8
_MAX_DELTA_ENERGY = 1000.0


def init_nuts(key, start, scatter, ln_prob_fn, n_chains,
              step_size=1e-3, max_rounds=100) -> HMCState:
    """Same chain-ball initialisation as HMC (shared state layout)."""
    return init_hmc(key, start, scatter, ln_prob_fn, n_chains,
                    step_size=step_size, max_rounds=max_rounds)


def _is_turning(inv_mass, p_left, p_right, rho):
    """Generalised U-turn test with the endpoint half-momentum
    correction (numpyro ``_is_turning``; Betancourt's dynamic
    termination criterion)."""
    rho = rho - 0.5 * (p_left + p_right)
    # elementwise-sum dots: jnp.dot would round f32 operands to bf16 on TPU
    at_left = jnp.sum(inv_mass * p_left * rho) <= 0.0
    at_right = jnp.sum(inv_mass * p_right * rho) <= 0.0
    return at_left | at_right


def _leaf_to_ckpt(n):
    """Checkpoint index range for (0-based) subtree leaf index ``n``:
    idx_max = popcount(n >> 1), idx_min = idx_max - (trailing ones of n)
    + 1.  Even leaves STORE at idx_max; odd leaves CHECK U-turns against
    checkpoints idx_min..idx_max (numpyro ``_leaf_idx_to_ckpt_idxs``)."""
    def popcount_body(carry):
        v, c = carry
        return v >> 1, c + (v & 1)

    _, idx_max = jax.lax.while_loop(
        lambda carry: carry[0] > 0, popcount_body,
        (n >> 1, jnp.int32(0)))

    def trailing_body(carry):
        v, c = carry
        return v >> 1, c + 1

    _, n_trail = jax.lax.while_loop(
        lambda carry: (carry[0] & 1) != 0, trailing_body,
        (n, jnp.int32(0)))
    return idx_max - n_trail + 1, idx_max


def _iterative_turning(inv_mass, p_new, rho, p_ckpts, rho_ckpts,
                       idx_min, idx_max):
    """Check the new (odd-index) leaf against every checkpointed subtree
    right edge: subtree momentum sum = rho - rho_ckpt[i] + p_ckpt[i]."""
    def body(carry):
        i, _ = carry
        sub_rho = rho - rho_ckpts[i] + p_ckpts[i]
        return i - 1, _is_turning(inv_mass, p_ckpts[i], p_new, sub_rho)

    _, turning = jax.lax.while_loop(
        lambda carry: (carry[0] >= idx_min) & ~carry[1], body,
        (idx_max, jnp.asarray(False)))
    return turning


def _nuts_trajectory(key, x0, lp0, g0, eps, inv_mass, vg_fn, max_depth,
                     max_delta=_MAX_DELTA_ENERGY):
    """One NUTS trajectory for one chain.

    Returns (x, lp, g, accept_stat, divergent, depth) where
    ``accept_stat`` is the mean Metropolis accept probability over the
    trajectory's new leaves (the dual-averaging statistic) and ``depth``
    the number of completed doublings.
    """
    dtype = x0.dtype
    D = x0.shape[0]
    k_mom, k_jit, k_loop = jax.random.split(key, 3)
    eps = eps * (0.8 + 0.2 * jax.random.uniform(k_jit, (), dtype))
    mass_sqrt = jax.lax.rsqrt(jnp.maximum(inv_mass, 1e-30))
    p0 = mass_sqrt * jax.random.normal(k_mom, (D,), dtype)

    def kinetic(p):
        return 0.5 * jnp.sum(inv_mass * p * p)

    h0 = -lp0 + kinetic(p0)
    neg_inf = jnp.asarray(-jnp.inf, dtype)

    def leapfrog(x, p, g, direction):
        e = eps * direction
        p_half = p + 0.5 * e * g
        x_new = x + e * inv_mass * p_half
        lp_new, g_new = vg_fn(x_new)
        p_new = p_half + 0.5 * e * g_new
        return x_new, p_new, lp_new, g_new

    def build_subtree(k_sub, x_e, p_e, lp_e, g_e, depth, direction):
        """Grow 2^depth leaves from edge (x_e, ...) in ``direction``.
        Returns the subtree's trajectory-forward momentum sum, its
        last-built state (the trajectory's new outer endpoint), its
        multinomial proposal + log weight, and diagnostics."""
        n_max = jnp.int32(1) << depth
        zero_vec = jnp.zeros((D,), dtype)
        ckpt_p = jnp.zeros((max(max_depth, 1), D), dtype)
        ckpt_rho = jnp.zeros((max(max_depth, 1), D), dtype)

        def cond(carry):
            leaf, turning, diverging = carry[0], carry[1], carry[2]
            return (leaf < n_max) & ~turning & ~diverging

        def body(carry):
            (leaf, turning, diverging, key, x, p, lp, g, rho,
             xp, lpp, gp, lw_sum, sum_acc, ckpt_p, ckpt_rho) = carry
            key, k_t = jax.random.split(key)
            x, p, lp, g = leapfrog(x, p, g, direction)
            h = -lp + kinetic(p)
            delta = h0 - h                      # leaf log weight
            ok = jnp.isfinite(delta) & (delta > -max_delta)
            lw_leaf = jnp.where(ok, delta, neg_inf)
            diverging = ~ok
            sum_acc = sum_acc + jnp.where(
                ok, jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 0.0))), 0.0)
            rho = rho + p
            # multinomial proposal within the subtree
            lw_new = jnp.logaddexp(lw_sum, lw_leaf)
            take = (jnp.log(jax.random.uniform(k_t, (), dtype))
                    < lw_leaf - lw_new)
            take = take & ok
            xp = jnp.where(take, x, xp)
            lpp = jnp.where(take, lp, lpp)
            gp = jnp.where(take, g, gp)
            lw_sum = lw_new
            # sub-U-turn bookkeeping: even leaves store, odd leaves check
            idx_min, idx_max = _leaf_to_ckpt(leaf)
            even = (leaf & 1) == 0
            ckpt_p = jnp.where(even, ckpt_p.at[idx_max].set(p), ckpt_p)
            ckpt_rho = jnp.where(even, ckpt_rho.at[idx_max].set(rho),
                                 ckpt_rho)
            turning = jnp.where(
                even, turning,
                _iterative_turning(inv_mass, p, rho, ckpt_p, ckpt_rho,
                                   idx_min, idx_max))
            return (leaf + 1, turning, diverging, key, x, p, lp, g, rho,
                    xp, lpp, gp, lw_sum, sum_acc, ckpt_p, ckpt_rho)

        carry0 = (jnp.int32(0), jnp.asarray(False), jnp.asarray(False),
                  k_sub, x_e, p_e, lp_e, g_e, zero_vec,
                  x_e, lp_e, g_e, neg_inf, jnp.zeros((), dtype),
                  ckpt_p, ckpt_rho)
        (leaf, turning, diverging, _, x, p, lp, g, rho,
         xp, lpp, gp, lw_sum, sum_acc, _, _) = jax.lax.while_loop(
            cond, body, carry0)
        return dict(n_leaves=leaf, turning=turning, diverging=diverging,
                    edge=(x, p, lp, g), rho=rho,
                    prop=(xp, lpp, gp), lw=lw_sum, sum_acc=sum_acc)

    def doubling_cond(carry):
        return ((carry["depth"] < max_depth)
                & ~carry["turning"] & ~carry["diverging"])

    def doubling_body(carry):
        key, k_dir, k_sub, k_bias = jax.random.split(carry["key"], 4)
        going_right = jax.random.bernoulli(k_dir)
        direction = jnp.where(going_right, jnp.asarray(1.0, dtype),
                              jnp.asarray(-1.0, dtype))
        xl, pl, lpl, gl = carry["left"]
        xr, pr, lpr, gr = carry["right"]
        x_e = jnp.where(going_right, xr, xl)
        p_e = jnp.where(going_right, pr, pl)
        lp_e = jnp.where(going_right, lpr, lpl)
        g_e = jnp.where(going_right, gr, gl)
        sub = build_subtree(k_sub, x_e, p_e, lp_e, g_e, carry["depth"],
                            direction)
        sub_ok = ~sub["turning"] & ~sub["diverging"]
        # biased progressive sampling: prefer the new subtree
        take = (jnp.log(jax.random.uniform(k_bias, (), dtype))
                < sub["lw"] - carry["lw"]) & sub_ok
        xp, lpp, gp = sub["prop"]
        prop = (jnp.where(take, xp, carry["prop"][0]),
                jnp.where(take, lpp, carry["prop"][1]),
                jnp.where(take, gp, carry["prop"][2]))
        lw = jnp.where(sub_ok, jnp.logaddexp(carry["lw"], sub["lw"]),
                       carry["lw"])
        # merge endpoints + momentum sum, full-trajectory U-turn check
        xs, ps, lps, gs = sub["edge"]
        left = (jnp.where(going_right, xl, xs),
                jnp.where(going_right, pl, ps),
                jnp.where(going_right, lpl, lps),
                jnp.where(going_right, gl, gs))
        right = (jnp.where(going_right, xs, xr),
                 jnp.where(going_right, ps, pr),
                 jnp.where(going_right, lps, lpr),
                 jnp.where(going_right, gs, gr))
        rho = carry["rho"] + sub["rho"]
        turning = sub["turning"] | _is_turning(
            inv_mass, left[1], right[1], rho)
        # a rejected (turning/diverging) subtree still costs its leaves —
        # count them for the accept statistic like Stan does
        return dict(key=key, left=left, right=right, rho=rho, prop=prop,
                    lw=lw, sum_acc=carry["sum_acc"] + sub["sum_acc"],
                    n_leaves=carry["n_leaves"] + sub["n_leaves"],
                    depth=carry["depth"] + 1, turning=turning,
                    diverging=carry["diverging"] | sub["diverging"])

    state0 = (x0, p0, lp0, g0)
    carry = dict(key=k_loop, left=state0, right=state0, rho=p0,
                 prop=(x0, lp0, g0), lw=jnp.zeros((), dtype),
                 sum_acc=jnp.zeros((), dtype), n_leaves=jnp.int32(0),
                 depth=jnp.int32(0), turning=jnp.asarray(False),
                 diverging=jnp.asarray(False))
    carry = jax.lax.while_loop(doubling_cond, doubling_body, carry)
    x, lp, g = carry["prop"]
    accept_stat = carry["sum_acc"] / jnp.maximum(
        carry["n_leaves"].astype(dtype), 1.0)
    return x, lp, g, accept_stat, carry["diverging"], carry["depth"]


def batch_nuts_trajectories(ln_prob_fn, max_depth,
                            max_delta_energy=_MAX_DELTA_ENERGY):
    """Default chain-batched NUTS trajectory evaluator (plain vmap);
    same contract as hmc.batch_trajectories but returning
    (x, lp, g, accept_stat, divergent, depth).  Chains are independent:
    the mesh-sharded variant is shard_map of this vmap
    (``parallel.mesh.sharded_nuts_trajectories``)."""
    vg = _value_and_grad(ln_prob_fn)

    def run(keys, x, lp, g, eps, inv_mass):
        return jax.vmap(
            lambda k, x0, lp0, g0: _nuts_trajectory(
                k, x0, lp0, g0, eps, inv_mass, vg, max_depth,
                max_delta_energy)
        )(keys, x, lp, g)

    return run


def nuts_step(state: HMCState, ln_prob_fn, max_depth=8,
              max_delta_energy=_MAX_DELTA_ENERGY, traj_batch_fn=None):
    """One NUTS step for all chains.  Returns (state, accept_stat,
    mean_accept_stat, divergence_frac, mean_depth); accept_stat is the
    dual-averaging statistic (mean leaf MH probability), which is also
    what ``progress`` reports (NUTS has no reject step — the multinomial
    draw IS the transition)."""
    if traj_batch_fn is None:
        traj_batch_fn = batch_nuts_trajectories(ln_prob_fn, max_depth,
                                                max_delta_energy)
    key, k_step = jax.random.split(state.key)
    C = state.positions.shape[0]
    keys = jax.random.split(k_step, C)
    x, lp, g, astat, div, depth = traj_batch_fn(
        keys, state.positions, state.log_prob, state.grad,
        state.step_size, state.inv_mass)
    new = HMCState(key, x, lp, g, state.step_size, state.inv_mass,
                   state.step + 1)
    fdt = x.dtype
    return new, jnp.mean(astat), jnp.mean(astat), \
        jnp.mean(div.astype(fdt)), jnp.mean(depth.astype(fdt))


def warmup_nuts(state: HMCState, ln_prob_fn, n_warmup, max_depth=8,
                target_accept=_TARGET_ACCEPT, traj_batch_fn=None,
                chunk_size=8):
    """Stan-style two-phase warmup (dual-averaged step size -> diagonal
    metric from phase-1 draws -> re-averaged step size), with NUTS as the
    transition kernel.  Mirrors hmc.warmup_hmc, including its chunked
    phase execution (see that docstring: a monolithic warmup scan is a
    single multi-minute device program that remote-attached TPU runtimes
    kill; NUTS steps cost up to 2^max_depth gradients, hence the smaller
    default chunk)."""
    from functools import partial

    n1 = max(n_warmup // 2, 1)
    n2 = max(n_warmup - n1, 1)

    @partial(jax.jit, static_argnums=(2,))
    def phase_chunk(state, da, n):
        def body(carry, _):
            st, da = carry
            st, _, aprob, _, _ = nuts_step(st, ln_prob_fn, max_depth,
                                           traj_batch_fn=traj_batch_fn)
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
        state = state._replace(
            step_size=jnp.exp(da.log_eps_bar).astype(state.step_size.dtype))
        return state, da, jnp.concatenate(xs_parts, axis=0)

    state, _, xs1 = phase(state, _da_init(state.step_size), n1)

    tail = xs1[n1 // 2:]
    # variance over (step, chain) without reshape: merging a sharded
    # chain axis into the step axis is unsupported on a mesh
    n = tail.shape[0] * tail.shape[1]
    var = jnp.var(tail, axis=(0, 1))
    var = (n / (n + 5.0)) * var + (5.0 / (n + 5.0)) * 1e-3
    state = state._replace(inv_mass=var.astype(state.inv_mass.dtype))

    state, _, _ = phase(state, _da_init(state.step_size), n2)
    return state._replace(step=jnp.asarray(0, jnp.int32))


def _nuts_step_closure(ln_prob_fn, max_depth, traj_batch_fn=None):
    from .ensemble import _STEP_CACHE

    key = ("nuts", ln_prob_fn, int(max_depth), traj_batch_fn)
    fn = _STEP_CACHE.get(key)
    if fn is None:
        def fn(s):
            s, astat, _, div, depth = nuts_step(
                s, ln_prob_fn, max_depth, traj_batch_fn=traj_batch_fn)
            return s, (astat, div, depth)

        _STEP_CACHE[key] = fn
    return fn


def run_nuts(state: HMCState, ln_prob_fn, n_steps, max_depth=8, thin=1,
             chunk_size=8,
             progress: Optional[Callable[[int, float], None]] = None,
             traj_batch_fn=None):
    """Run NUTS for ``n_steps``; same chunked on-device-thinned transfer
    contract as ensemble.run_sampler / hmc.run_hmc.
    Returns (state, chain (n_kept, C, D), chain_lp (n_kept, C),
    accept_stat (n_steps,), divergences (n_steps,), depths (n_steps,)).

    ``chunk_size`` defaults smaller than the other samplers': one NUTS
    step costs up to 2^max_depth gradient evaluations, so a 32-step
    chunk of a big posterior is a single multi-minute device program —
    long enough that remote-attached TPU runtimes kill the worker with
    an UNAVAILABLE fault (observed killing a 32-step max_depth-8 chunk
    of the north-star posterior).  8 steps bounds the program to tens
    of seconds at worst-case depth."""
    from .ensemble import run_chunked

    step_fn = _nuts_step_closure(ln_prob_fn, max_depth, traj_batch_fn)
    state, chain, chain_lp, aux = run_chunked(
        state, step_fn, n_steps, thin=thin, chunk_size=chunk_size,
        progress=progress)
    if aux is None:
        aux = (np.empty((0,)), np.empty((0,)), np.empty((0,)))
    return state, chain, chain_lp, aux[0], aux[1], aux[2]
