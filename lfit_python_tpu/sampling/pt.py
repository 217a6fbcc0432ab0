"""Parallel-tempered ensemble sampler (reference ``usePT``/``ntemps``).

Reference: ``mcmcfit.py`` optionally used emcee's ``PTSampler``/ptemcee
(SURVEY.md §2 "Sampler harness" [R-low]): a ladder of inverse temperatures
beta_t, each running its own stretch-move ensemble on the tempered
posterior  ln p_t = ln prior + beta_t * ln like,  with walker swaps between
adjacent rungs.

TPU-native design: the temperature ladder is just one more batch axis —
positions (T, W, D) live on device, each half-step proposes for ALL rungs
at once and evaluates them through a single ``batch_parts_fn`` (prior,
like) call on a (T, H, D) block, so the evaluation can be ``shard_map``-ped
over the walker mesh axis exactly like the untempered sampler
(parallel/mesh.py ``sharded_pt_batch_parts``).  The swap move exchanges
aligned random walker pairs between adjacent rungs with the standard
acceptance  min(1, exp((beta_a - beta_b)(lnL_b - lnL_a))).

Feature parity with the untempered path (VERDICT round-1 item 7): chunked
``lax.scan`` stepping with thinning and a progress callback for
incremental chain writing / metrics, and a checkpointable state
(utils/checkpoints.py handles PTState like EnsembleState).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["PTState", "default_beta_ladder", "init_pt", "pt_step", "run_pt",
           "log_evidence"]


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


def _default_batch_parts(ln_prior_fn, ln_like_fn):
    def batch(pos):           # (T, H, D) -> ((T, H), (T, H))
        flat = pos.reshape(-1, pos.shape[-1])
        lp = jax.vmap(ln_prior_fn)(flat)
        ll = jax.vmap(ln_like_fn)(flat)
        return lp.reshape(pos.shape[:2]), ll.reshape(pos.shape[:2])
    return batch


def init_pt(key, start, scatter, ln_prior_fn, ln_like_fn, n_walkers,
            n_temps, betas=None, max_rounds=100) -> PTState:
    """Walker balls at every rung (same init distribution per rung)."""
    if betas is None:
        betas = default_beta_ladder(n_temps)
    betas = jnp.asarray(betas, start.dtype)
    key = jnp.asarray(key)

    # one jitted program — see ensemble.init_walkers: an eager vmapped
    # posterior costs one remote-TPU round trip PER PRIMITIVE
    @jax.jit
    def _init(key, start, scatter):
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
            lp_new = jnp.where(
                bad, jax.vmap(jax.vmap(ln_prior_fn))(cand), lp)
            return key, cand, lp_new, rounds + 1

        key, pos, lp, _ = jax.lax.while_loop(
            cond, body, (key, pos, lp, jnp.asarray(0, jnp.int32)))
        ll = jax.vmap(jax.vmap(ln_like_fn))(pos)
        return key, pos, ll, lp

    key, pos, ll, lp = _init(key, jnp.asarray(start),
                             jnp.asarray(scatter, start.dtype))
    return PTState(key, pos, ll, lp, betas, jnp.asarray(0, jnp.int32))


def pt_step(state: PTState, ln_prior_fn, ln_like_fn, a=2.0,
            batch_parts_fn=None):
    """One tempered stretch-move step + one adjacent-rung swap sweep.

    Returns (state, accept_frac).  ``batch_parts_fn(pos (T, H, D)) ->
    (ln_prior (T, H), ln_like (T, H))`` overrides proposal evaluation —
    the sharded path passes the shard_map-wrapped evaluator here.
    """
    if batch_parts_fn is None:
        batch_parts_fn = _default_batch_parts(ln_prior_fn, ln_like_fn)
    T, W, D = state.positions.shape
    half = W // 2
    key, k_a, k_b, k_su = jax.random.split(state.key, 4)

    betas = state.betas
    pos, lp, ll = state.positions, state.ln_prior, state.ln_like
    n_acc = jnp.asarray(0.0, pos.dtype)

    # red-black half updates, rebuilt by concatenation (slice-assignment
    # scatters have ambiguous output sharding under the walker mesh)
    halves = [pos[:, :half], pos[:, half:]]
    lp_h = [lp[:, :half], lp[:, half:]]
    ll_h = [ll[:, :half], ll[:, half:]]
    for s, k in ((0, k_a), (1, k_b)):
        movers = halves[s]                          # (T, H, D)
        others = halves[1 - s]
        m_state_lp = lp_h[s] + betas[:, None] * ll_h[s]
        k1, k2, k3 = jax.random.split(k, 3)
        j = jax.random.randint(k1, (T, half), 0, others.shape[1])
        one_hot = jax.nn.one_hot(j, others.shape[1], dtype=movers.dtype)
        partners = jnp.einsum(
            "thw,twd->thd", one_hot, others,
            preferred_element_type=movers.dtype,
            precision=jax.lax.Precision.HIGHEST)
        u = jax.random.uniform(k2, (T, half), movers.dtype)
        z = ((a - 1.0) * u + 1.0) ** 2 / a
        prop = partners + z[..., None] * (movers - partners)
        p_lp, p_ll = batch_parts_fn(prop)
        prop_state_lp = p_lp + betas[:, None] * p_ll
        ln_acc = (D - 1.0) * jnp.log(z) + prop_state_lp - m_state_lp
        acc = jnp.log(jax.random.uniform(k3, (T, half), movers.dtype)) \
            < ln_acc
        halves[s] = jnp.where(acc[..., None], prop, movers)
        lp_h[s] = jnp.where(acc, p_lp, lp_h[s])
        ll_h[s] = jnp.where(acc, p_ll, ll_h[s])
        n_acc = n_acc + jnp.sum(acc)
    pos = jnp.concatenate(halves, axis=1)
    lp = jnp.concatenate(lp_h, axis=1)
    ll = jnp.concatenate(ll_h, axis=1)

    # --- swap sweep between adjacent rungs ------------------------------
    # Aligned walker pairs (i of rung t  <->  i of rung t+1).  The
    # reference-family PT pairs random walkers [R-low]; aligned pairing
    # has the identical stationary distribution (detailed balance holds
    # per pair) and the in-rung stretch move reshuffles walkers between
    # steps.  Crucially it is purely elementwise, so it shards over the
    # walker mesh with no scatter/permutation collectives.
    if T > 1:
        u = jnp.log(jax.random.uniform(k_su, (T - 1, W), pos.dtype))

        def swap_pair(t, carry):
            pos, lp, ll = carry
            ln_acc = (betas[t] - betas[t + 1]) * (ll[t + 1] - ll[t])
            acc = u[t] < ln_acc
            acc3 = acc[:, None]
            pa, pb = pos[t], pos[t + 1]
            pos = pos.at[t].set(jnp.where(acc3, pb, pa))
            pos = pos.at[t + 1].set(jnp.where(acc3, pa, pb))
            la, lb = lp[t], lp[t + 1]
            lp = lp.at[t].set(jnp.where(acc, lb, la))
            lp = lp.at[t + 1].set(jnp.where(acc, la, lb))
            ca, cb = ll[t], ll[t + 1]
            ll = ll.at[t].set(jnp.where(acc, cb, ca))
            ll = ll.at[t + 1].set(jnp.where(acc, ca, cb))
            return pos, lp, ll

        pos, lp, ll = jax.lax.fori_loop(0, T - 1, swap_pair, (pos, lp, ll))

    new_state = PTState(key, pos, ll, lp, betas, state.step + 1)
    # per-rung ensemble-mean ln-likelihood: the thermodynamic-integration
    # integrand <ln L>_beta, accumulated by run_pt for log_evidence
    return new_state, (n_acc / (T * W), jnp.mean(ll, axis=1))


def _extract_cold(s):
    """Kept-sample extractor for run_chunked: the beta = 1 cold rung's
    positions and ln posterior."""
    return s.positions[0], s.ln_prior[0] + s.ln_like[0]


def run_pt(state: PTState, ln_prior_fn, ln_like_fn, n_steps, a=2.0,
           thin=1, chunk_size=32,
           progress: Optional[Callable[[int, float], None]] = None,
           batch_parts_fn=None):
    """Run PT; returns (state, cold positions (n_kept, W, D), cold ln_post,
    accept_frac (n_steps,), rung_ln_like (n_steps, T)).

    Only the beta = 1 (cold) rung is returned as samples — the hotter
    rungs exist to help mode-hopping, exactly as in the reference's PT
    use [R].  ``rung_ln_like`` is the per-step ensemble-mean ln-likelihood
    at every rung: averaged over production it is the thermodynamic-
    integration integrand <ln L>_beta for :func:`log_evidence` — the
    evidence comes free with the ladder.  Chunked with ON-DEVICE thinning
    like the untempered ``run_sampler`` (see ensemble.run_chunked); after
    each device-resident chunk the kept cold chain is copied to host and
    ``progress(done, accept)`` fires (wired to incremental chain writing
    and metrics by the CLI).
    """
    from .ensemble import _STEP_CACHE, run_chunked

    key = ("pt", ln_prior_fn, ln_like_fn, float(a), batch_parts_fn)
    step_fn = _STEP_CACHE.get(key)
    if step_fn is None:
        def step_fn(s):
            return pt_step(s, ln_prior_fn, ln_like_fn, a,
                           batch_parts_fn=batch_parts_fn)

        _STEP_CACHE[key] = step_fn

    state, chain, chain_lp, aux = run_chunked(
        state, step_fn, n_steps, thin=thin, chunk_size=chunk_size,
        progress=progress, extract=_extract_cold)
    if aux is None:
        n_temps = state.betas.shape[0]
        aux = (np.empty((0,)), np.empty((0, n_temps)))
    return state, chain, chain_lp, aux[0], aux[1]


def log_evidence(betas, mean_ln_like):
    """Thermodynamic-integration evidence from the tempered ladder:
    ln Z = integral_0^1 <ln L>_beta d beta  (Goggans & Chi 2004; emcee's
    ``PTSampler.thermodynamic_integration_log_evidence`` is the
    reference-family counterpart [R-med]).

    ``mean_ln_like``: production-averaged ensemble-mean ln-likelihood per
    rung (average ``run_pt``'s ``rung_ln_like`` over steps).  Trapezoid
    over the ladder, extended to beta = 0 by constant extrapolation of
    the hottest rung.  Returns (ln_z, dln_z) with the emcee-style error
    estimate: |full-ladder - every-other-rung| integration difference.
    """
    betas = np.asarray(betas, np.float64)
    f = np.asarray(mean_ln_like, np.float64)
    order = np.argsort(betas)
    b, f = betas[order], f[order]
    if b[0] > 0.0:
        b = np.concatenate([[0.0], b])
        f = np.concatenate([f[:1], f])

    def integ(bs, fs):
        return float(np.trapezoid(fs, bs))

    ln_z = integ(b, f)
    # half-ladder comparison: drop every other interior rung
    keep = np.ones(b.size, bool)
    keep[1:-1:2] = False
    dln_z = abs(ln_z - integ(b[keep], f[keep]))
    return ln_z, dln_z
