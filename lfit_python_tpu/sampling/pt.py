"""Parallel-tempered ensemble sampler (reference ``usePT``/``ntemps``).

Reference: ``mcmcfit.py`` optionally used emcee's ``PTSampler``/ptemcee
(SURVEY.md §2 "Sampler harness" [R-low]): a ladder of inverse temperatures
beta_t, each running its own stretch-move ensemble on the tempered
posterior  ln p_t = ln prior + beta_t * ln like,  with walker swaps between
adjacent rungs.

TPU-native design: the temperature ladder is just one more batch axis —
positions (T, W, D) live on device, the stretch move vmaps over rungs, and
the swap move exchanges aligned walker pairs between adjacent rungs with
the standard acceptance  min(1, exp((beta_a - beta_b)(lnL_b - lnL_a))).
Everything stays inside one jitted step; the extra axis can also be laid
out on the mesh as a second sharding dimension.

Requires the *likelihood* and *prior* separately (tempering applies only
to the likelihood), so it takes the pair from
``models.likelihood.make_ln_prob_parts``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PTState", "default_beta_ladder", "init_pt", "pt_step", "run_pt"]


class PTState(NamedTuple):
    key: jax.Array        # PRNG key
    positions: jax.Array  # (T, W, D)
    ln_like: jax.Array    # (T, W)
    ln_prior: jax.Array   # (T, W)
    betas: jax.Array      # (T,)
    step: jax.Array


def default_beta_ladder(n_temps, ratio=jnp.sqrt(2.0)):
    """Geometric inverse-temperature ladder, beta_0 = 1 (the posterior)."""
    return jnp.asarray([1.0 / ratio**t for t in range(n_temps)])


def init_pt(key, start, scatter, ln_prior_fn, ln_like_fn, n_walkers,
            n_temps, betas=None, max_rounds=100) -> PTState:
    """Walker balls at every rung (same init distribution per rung)."""
    if betas is None:
        betas = default_beta_ladder(n_temps)
    betas = jnp.asarray(betas, start.dtype)
    key = jnp.asarray(key)

    def draw(k):
        return start[None, None, :] + scatter[None, None, :] * \
            jax.random.normal(k, (n_temps, n_walkers, start.shape[0]),
                              start.dtype)

    key, k0 = jax.random.split(key)
    pos = draw(k0)
    lp = jax.vmap(jax.vmap(ln_prior_fn))(pos)

    def cond(carry):
        _, _, lp, rounds = carry
        return (~jnp.all(jnp.isfinite(lp))) & (rounds < max_rounds)

    def body(carry):
        key, pos, lp, rounds = carry
        key, kd = jax.random.split(key)
        fresh = draw(kd)
        bad = ~jnp.isfinite(lp)
        cand = jnp.where(bad[..., None], fresh, pos)
        lp_new = jnp.where(bad, jax.vmap(jax.vmap(ln_prior_fn))(cand), lp)
        return key, cand, lp_new, rounds + 1

    key, pos, lp, _ = jax.lax.while_loop(
        cond, body, (key, pos, lp, jnp.asarray(0, jnp.int32)))
    ll = jax.vmap(jax.vmap(ln_like_fn))(pos)
    return PTState(key, pos, ll, lp, betas, jnp.asarray(0, jnp.int32))


def pt_step(state: PTState, ln_prior_fn, ln_like_fn, a=2.0):
    """One tempered stretch-move step + one adjacent-rung swap sweep."""
    T, W, D = state.positions.shape
    half = W // 2
    key, k_a, k_b, k_sw, k_su = jax.random.split(state.key, 5)

    betas = state.betas

    def tempered_batch(beta):
        def batch(pos):
            lp = jax.vmap(ln_prior_fn)(pos)
            ll = jax.vmap(ln_like_fn)(pos)
            return lp + beta * ll, lp, ll
        return batch

    # --- stretch move per rung (vmapped over T) -------------------------
    def one_rung(key2, pos, lp, ll, beta):
        state_lp = lp + beta * ll
        ka, kb = jax.random.split(key2)

        # evaluate proposals: need (prior, like) separately to keep the
        # state decomposed; wrap _half_update's batch fn to cache them
        def move(k, movers, movers_state_lp, others):
            n_half = movers.shape[0]
            k1, k2, k3 = jax.random.split(k, 3)
            j = jax.random.randint(k1, (n_half,), 0, others.shape[0])
            one_hot = jax.nn.one_hot(j, others.shape[0], dtype=movers.dtype)
            partners = jnp.dot(one_hot, others,
                               preferred_element_type=movers.dtype,
                               precision=jax.lax.Precision.HIGHEST)
            u = jax.random.uniform(k2, (n_half,), movers.dtype)
            z = ((a - 1.0) * u + 1.0) ** 2 / a
            prop = partners + z[:, None] * (movers - partners)
            p_lp = jax.vmap(ln_prior_fn)(prop)
            p_ll = jax.vmap(ln_like_fn)(prop)
            prop_state_lp = p_lp + beta * p_ll
            ln_acc = (D - 1.0) * jnp.log(z) + prop_state_lp - movers_state_lp
            acc = jnp.log(
                jax.random.uniform(k3, (n_half,), movers.dtype)) < ln_acc
            return acc, prop, p_lp, p_ll

        out_pos, out_lp, out_ll = pos, lp, ll
        sl = [slice(0, half), slice(half, W)]
        for s, k in ((0, ka), (1, kb)):
            movers = out_pos[sl[s]]
            others = out_pos[sl[1 - s]]
            m_state = (out_lp + beta * out_ll)[sl[s]]
            acc, prop, p_lp, p_ll = move(k, movers, m_state, others)
            out_pos = out_pos.at[sl[s]].set(
                jnp.where(acc[:, None], prop, movers))
            out_lp = out_lp.at[sl[s]].set(
                jnp.where(acc, p_lp, out_lp[sl[s]]))
            out_ll = out_ll.at[sl[s]].set(
                jnp.where(acc, p_ll, out_ll[sl[s]]))
        return out_pos, out_lp, out_ll

    rung_keys = jax.random.split(k_a, T)
    pos, lp, ll = jax.vmap(one_rung)(
        rung_keys, state.positions, state.ln_prior, state.ln_like, betas)

    # --- swap sweep between adjacent rungs ------------------------------
    # propose swapping aligned random walker pairs (t, t+1)
    perm_keys = jax.random.split(k_sw, T)
    perms = jax.vmap(lambda k: jax.random.permutation(k, W))(perm_keys)
    u = jax.random.uniform(k_su, (T - 1, W), pos.dtype) if T > 1 else None

    def swap_pair(t, carry):
        pos, lp, ll = carry
        ia = perms[t]
        ib = perms[t + 1]
        ll_a = ll[t][ia]
        ll_b = ll[t + 1][ib]
        ln_acc = (betas[t] - betas[t + 1]) * (ll_b - ll_a)
        acc = jnp.log(u[t]) < ln_acc
        pa, pb = pos[t][ia], pos[t + 1][ib]
        la, lb = lp[t][ia], lp[t + 1][ib]
        new_a_pos = jnp.where(acc[:, None], pb, pa)
        new_b_pos = jnp.where(acc[:, None], pa, pb)
        pos = pos.at[t, ia].set(new_a_pos)
        pos = pos.at[t + 1, ib].set(new_b_pos)
        lp = lp.at[t, ia].set(jnp.where(acc, lb, la))
        lp = lp.at[t + 1, ib].set(jnp.where(acc, la, lb))
        ll = ll.at[t, ia].set(jnp.where(acc, ll_b, ll_a))
        ll = ll.at[t + 1, ib].set(jnp.where(acc, ll_a, ll_b))
        return pos, lp, ll

    if T > 1:
        pos, lp, ll = jax.lax.fori_loop(0, T - 1, swap_pair, (pos, lp, ll))

    return PTState(key, pos, ll, lp, betas, state.step + 1)


def run_pt(state: PTState, ln_prior_fn, ln_like_fn, n_steps, a=2.0,
           chunk_size=32):
    """Run PT; returns (state, cold-chain positions (n, W, D), cold ln_post).

    Only the beta = 1 (cold) rung is returned as samples — the hotter rungs
    exist to help mode-hopping, exactly as in the reference's PT use [R].
    """
    @partial(jax.jit, static_argnums=(1,))
    def run_chunk(st, n):
        def body(s, _):
            s2 = pt_step(s, ln_prior_fn, ln_like_fn, a)
            return s2, (s2.positions[0], s2.ln_prior[0] + s2.ln_like[0])
        return jax.lax.scan(body, st, None, length=n)

    chains, lps = [], []
    done = 0
    while done < n_steps:
        n = min(chunk_size, n_steps - done)
        state, (cpos, clp) = run_chunk(state, n)
        chains.append(np.asarray(cpos))
        lps.append(np.asarray(clp))
        done += n
    return state, np.concatenate(chains), np.concatenate(lps)
