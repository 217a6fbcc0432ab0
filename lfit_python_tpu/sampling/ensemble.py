"""On-device affine-invariant stretch-move ensemble sampler.

Reference: ``emcee.EnsembleSampler`` driven by ``mcmcfit.py`` with a
``multiprocessing.Pool`` (SURVEY.md §2 "Sampler harness", §3.1) — the
per-walker posterior crossed a process boundary with pickling every step.
Here the whole ensemble lives in device memory and a full step (both
half-ensemble updates) is one traced program under ``lax.scan``; the only
host traffic is thinned chain output.

Move: Goodman & Weare (2010) stretch move, red-black (two half-ensemble)
update exactly as emcee: for each walker k in the moving half, pick a
random partner x_j from the *other* half, propose

    y = x_j + z (x_k - x_j),    z ~ g(z) ~ 1/sqrt(z) on [1/a, a]
    (inverse CDF: z = ((a-1) u + 1)^2 / a)

and accept with probability min(1, z^(d-1) exp(ln p(y) - ln p(x_k))).

Sharding: the walker axis is the data-parallel axis. ``run_sampler`` takes
an optional sharding for the walker dimension; partner selection gathers
from the complementary half (XLA lowers the gather to an all-gather of
~W*D/2 floats over ICI — SURVEY.md §5.8).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["EnsembleState", "init_walkers", "ensemble_step", "run_sampler"]


class EnsembleState(NamedTuple):
    key: jax.Array        # PRNG key
    positions: jax.Array  # (W, D)
    log_prob: jax.Array   # (W,)
    step: jax.Array       # () int32 — global step counter (for checkpoints)


def init_walkers(key, start, scatter, ln_prob_fn, n_walkers,
                 max_rounds=100) -> EnsembleState:
    """Walker-ball initialisation with bounded rejection redraws.

    Reference: ``mcmcfit.py`` scatters walkers around the start vector with
    per-parameter relative scatter and redraws any walker whose prior is
    -inf, in an unbounded Python while-loop (SURVEY.md §3.5).  On device the
    redraw is a *bounded* ``fori_loop`` (``max_rounds``) that resamples only
    the still-invalid walkers — identical statistics (each invalid walker is
    independently redrawn until valid), but with static control flow.

    ``scatter``: per-parameter absolute scatter scale (D,).
    """
    start = jnp.asarray(start)
    scatter = jnp.asarray(scatter, start.dtype)
    D = start.shape[0]

    def draw(k):
        return start[None, :] + scatter[None, :] * jax.random.normal(
            k, (n_walkers, D), start.dtype)

    key, k0 = jax.random.split(jnp.asarray(key))
    pos = draw(k0)
    lp = jax.vmap(ln_prob_fn)(pos)

    def cond(carry):
        _, _, lp, rounds = carry
        return (~jnp.all(jnp.isfinite(lp))) & (rounds < max_rounds)

    def body(carry):
        key, pos, lp, rounds = carry
        key, kd = jax.random.split(key)
        fresh = draw(kd)
        bad = ~jnp.isfinite(lp)
        cand = jnp.where(bad[:, None], fresh, pos)
        lp_new = jnp.where(bad, jax.vmap(ln_prob_fn)(cand), lp)
        return key, cand, lp_new, rounds + 1

    key, pos, lp, _ = jax.lax.while_loop(
        cond, body, (key, pos, lp, jnp.asarray(0, jnp.int32)))
    return EnsembleState(key, pos, lp, jnp.asarray(0, jnp.int32))


def _half_update(key, movers, movers_lp, others, batch_ln_prob, a):
    """Stretch-move update of one half-ensemble against the other."""
    n_half, D = movers.shape
    k1, k2, k3 = jax.random.split(key, 3)
    j = jax.random.randint(k1, (n_half,), 0, others.shape[0])
    # Partner selection as a one-hot matmul rather than a gather: under a
    # walker-sharded mesh XLA lowers this to an all-gather of the (small)
    # complementary half over ICI with unambiguous output sharding, and the
    # selection products (1.0 * x) are exact in any dtype.
    one_hot = jax.nn.one_hot(j, others.shape[0], dtype=movers.dtype)
    # precision=highest: TPU f32 matmuls otherwise round the operands to
    # bfloat16, which would corrupt the selected partner positions
    partners = jnp.dot(one_hot, others,
                       preferred_element_type=movers.dtype,
                       precision=jax.lax.Precision.HIGHEST)
    u = jax.random.uniform(k2, (n_half,), movers.dtype)
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    prop = partners + z[:, None] * (movers - partners)
    lp_prop = batch_ln_prob(prop)
    ln_acc = (D - 1.0) * jnp.log(z) + lp_prop - movers_lp
    accept = jnp.log(jax.random.uniform(k3, (n_half,), movers.dtype)) < ln_acc
    new = jnp.where(accept[:, None], prop, movers)
    new_lp = jnp.where(accept, lp_prop, movers_lp)
    return new, new_lp, accept


def ensemble_step(state: EnsembleState, ln_prob_fn, a=2.0, batch_fn=None):
    """One full red-black stretch-move step. Returns (state, accept_frac).

    ``batch_fn`` overrides how a block of proposals is evaluated (default:
    ``vmap(ln_prob_fn)``).  The sharded path passes a ``shard_map``-wrapped
    batch evaluator here so no sharding propagation ever has to reason
    about the fixed-iteration geometry loops inside the posterior
    (parallel/mesh.py ``sharded_batch_ln_prob``)."""
    if batch_fn is None:
        batch_fn = jax.vmap(ln_prob_fn)
    key, k_a, k_b = jax.random.split(state.key, 3)
    pos, lp = state.positions, state.log_prob
    W = pos.shape[0]
    half = W // 2

    first, first_lp = pos[:half], lp[:half]
    second, second_lp = pos[half:], lp[half:]

    first, first_lp, acc1 = _half_update(
        k_a, first, first_lp, second, batch_fn, a)
    second, second_lp, acc2 = _half_update(
        k_b, second, second_lp, first, batch_fn, a)

    new_state = EnsembleState(
        key,
        jnp.concatenate([first, second]),
        jnp.concatenate([first_lp, second_lp]),
        state.step + 1,
    )
    acc_frac = (jnp.sum(acc1) + jnp.sum(acc2)) / W
    return new_state, acc_frac


def run_sampler(state: EnsembleState, ln_prob_fn, n_steps, a=2.0, thin=1,
                chunk_size=64,
                progress: Optional[Callable[[int, float], None]] = None,
                batch_fn=None):
    """Run the sampler for ``n_steps``, returning the thinned chain on host.

    The scan runs in device-resident chunks of ``chunk_size`` steps; after
    each chunk the thinned positions/log-probs are copied to host and
    appended (the TPU analogue of the reference's incremental
    ``run_mcmc_save`` chain writer [R], which is wired to this via
    ``progress`` in utils/chains.py).

    Returns (final_state, chain (n_kept, W, D), chain_lp (n_kept, W),
    accept_frac (n_steps,)).
    """
    # static-shape chunks; one short remainder chunk at the end
    chunks = [chunk_size] * (n_steps // chunk_size)
    if n_steps % chunk_size:
        chunks.append(n_steps % chunk_size)

    @partial(jax.jit, static_argnums=(1,))
    def run_chunk(state, n):
        def body(s, _):
            s, acc = ensemble_step(s, ln_prob_fn, a, batch_fn=batch_fn)
            return s, (s.positions, s.log_prob, acc)

        return jax.lax.scan(body, state, None, length=n)

    kept_pos, kept_lp, accs = [], [], []
    # thin phase is anchored to the *global* step counter so kept-sample
    # spacing stays regular across checkpoint-segment boundaries (the CLI
    # calls run_sampler once per segment; a call-local counter would
    # restart the phase each time)
    phase0 = int(state.step)
    done = 0
    for n in chunks:
        state, (cpos, clp, cacc) = run_chunk(state, n)
        idx = [k for k in range(n) if (phase0 + done + k + 1) % thin == 0]
        if idx:
            sel = np.asarray(idx)
            kept_pos.append(np.asarray(cpos)[sel])
            kept_lp.append(np.asarray(clp)[sel])
        accs.append(np.asarray(cacc))
        done += n
        if progress is not None:
            progress(done, float(np.mean(accs[-1])))

    chain = np.concatenate(kept_pos) if kept_pos else np.empty((0,) + state.positions.shape)
    chain_lp = np.concatenate(kept_lp) if kept_lp else np.empty((0,) + state.log_prob.shape)
    return state, chain, chain_lp, np.concatenate(accs)
