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

    # The WHOLE init is one jitted program.  Un-jitted, the vmapped
    # posterior evaluates eagerly — one dispatch per primitive — which on
    # a remote-attached TPU costs a tunnel round trip per op (measured:
    # 277 s for an init that runs in seconds compiled).
    @jax.jit
    def _init(key, start, scatter):
        def draw(k):
            return start[None, :] + scatter[None, :] * jax.random.normal(
                k, (n_walkers, D), start.dtype)

        key, k0 = jax.random.split(key)
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
        return key, pos, lp

    key, pos, lp = _init(jnp.asarray(key), start, scatter)
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


def _extract_samples(s):
    """Default sample extractor: (positions, log_prob) of the state."""
    return s.positions, s.log_prob


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _scan_keep_last(state, step_fn, n_groups, group_len, extract):
    """``n_groups * group_len`` steps as a nested scan that materialises
    only the LAST step of each group: positions/log-probs of the other
    ``group_len - 1`` steps never exist as stacked HBM arrays and are
    never copied to host — this IS the thinning (on device, VERDICT
    round-2 item 9).  Per-step aux stats are still kept for every step
    (they are O(1) scalars)."""
    def inner(s, _):
        s, aux = step_fn(s)
        return s, aux

    def outer(s, _):
        s, auxs = jax.lax.scan(inner, s, None, length=group_len)
        pos, lp = extract(s)
        return s, (pos, lp, auxs)

    return jax.lax.scan(outer, state, None, length=n_groups)


@partial(jax.jit, static_argnums=(1, 2))
def _scan_no_kept(state, step_fn, n):
    """``n`` steps keeping aux stats only (a thinning tail that retains
    no sample rows)."""
    def body(s, _):
        s, aux = step_fn(s)
        return s, aux

    return jax.lax.scan(body, state, None, length=n)


def run_chunked(state, step_fn, n_steps, thin=1, chunk_size=64,
                progress: Optional[Callable[[int, float], None]] = None,
                extract=_extract_samples):
    """Device-chunked driver shared by the ensemble, PT and HMC samplers.

    ``step_fn(state) -> (state, aux)`` advances one step; ``aux`` is a
    pytree of per-step scalars whose FIRST leaf is the accept fraction
    (reported through ``progress``).  ``extract(state) -> (rows, lp)``
    picks the sample rows a kept step contributes (default: the state's
    ``positions``/``log_prob``; PT extracts the cold rung) — pass a
    module-level function so jit caching works.  ``state`` needs a
    ``.step`` field.

    Thinning happens ON DEVICE: kept rows are the last step of each
    ``thin``-long group (phase anchored to the global ``state.step``
    counter, so spacing stays regular across checkpoint segments), and
    un-kept rows are never stacked in HBM nor copied to host.  The
    reference writes every emcee step to ``chain_prod.txt`` and thins in
    post [R]; here host traffic shrinks by the thin factor.

    Pass the SAME ``step_fn`` object across calls (the CLI calls this
    once per checkpoint segment) to reuse compiled scans.

    Returns (state, chain (n_kept, W, D), chain_lp (n_kept, W), aux)
    with aux leaves stacked over all ``n_steps``.
    """
    thin = max(int(thin), 1)
    phase0 = int(state.step)
    # alignment prelude: run to the next multiple of `thin` as one
    # keep-last group (its last step is exactly the next kept row)
    r = min((-phase0) % thin, n_steps)
    g_total = (n_steps - r) // thin
    tail = (n_steps - r) % thin
    groups_per_chunk = max(chunk_size // thin, 1)

    plan = []                     # (n_groups, group_len) | (n, None)
    if r:
        plan.append((1, r))
    g_done = 0
    while g_done < g_total:
        g = min(groups_per_chunk, g_total - g_done)
        plan.append((g, thin))
        g_done += g
    if tail:
        plan.append((tail, None))

    tree = jax.tree_util
    kept_pos, kept_lp, auxs = [], [], []
    done = 0

    # Software-pipelined chunk loop: JAX dispatch is async, so chunk k+1
    # is ENQUEUED on the device before chunk k's results are pulled to
    # host — the device→host copy (and the link round trip, seconds on a
    # remote-attached TPU tunnel) overlaps the next chunk's compute
    # instead of serialising with it.  The scan carry (`state`) is a
    # device future; dispatching the next chunk never needs chunk k's
    # numpy values.
    def _materialize(entry):
        nonlocal done
        cpos, clp, caux, b_, n = entry
        if b_ is not None:
            kept_pos.append(np.asarray(cpos))
            kept_lp.append(np.asarray(clp))
            aux_h = tree.tree_map(
                lambda x: np.asarray(x).reshape((-1,) + x.shape[2:]), caux)
        else:
            aux_h = tree.tree_map(np.asarray, caux)
        auxs.append(aux_h)
        done += n
        if progress is not None:
            progress(done,
                     float(np.mean(tree.tree_leaves(aux_h)[0])))

    pending = None
    for a_, b_ in plan:
        if b_ is None:            # tail: no kept rows
            state, caux = _scan_no_kept(state, step_fn, a_)
            entry = (None, None, caux, None, a_)
        else:
            state, (cpos, clp, caux) = _scan_keep_last(state, step_fn,
                                                       a_, b_, extract)
            entry = (cpos, clp, caux, b_, a_ * b_)
        if pending is not None:
            _materialize(pending)
        pending = entry
    if pending is not None:
        _materialize(pending)

    if kept_pos:
        chain, chain_lp = np.concatenate(kept_pos), np.concatenate(kept_lp)
    else:
        row_s, lp_s = jax.eval_shape(extract, state)
        chain = np.empty((0,) + row_s.shape)
        chain_lp = np.empty((0,) + lp_s.shape)
    if auxs:
        aux = tree.tree_map(lambda *xs: np.concatenate(xs), *auxs)
    else:
        aux = None
    return state, chain, chain_lp, aux


# step closures memoised per (posterior, move params) so repeated
# run_sampler calls — one per checkpoint segment in the CLI — hand the
# SAME function object to the jitted scans and reuse their traces
_STEP_CACHE: dict = {}


def _ensemble_step_closure(ln_prob_fn, a, batch_fn):
    key = ("ens", ln_prob_fn, float(a), batch_fn)
    fn = _STEP_CACHE.get(key)
    if fn is None:
        def fn(s):
            s, acc = ensemble_step(s, ln_prob_fn, a, batch_fn=batch_fn)
            return s, acc

        _STEP_CACHE[key] = fn
    return fn


def run_sampler(state: EnsembleState, ln_prob_fn, n_steps, a=2.0, thin=1,
                chunk_size=64,
                progress: Optional[Callable[[int, float], None]] = None,
                batch_fn=None):
    """Run the sampler for ``n_steps``, returning the thinned chain on host.

    Chunked, device-resident stepping with ON-DEVICE thinning — see
    :func:`run_chunked` (the TPU analogue of the reference's incremental
    ``run_mcmc_save`` chain writer [R], wired to ``progress`` in
    utils/chains.py).

    Returns (final_state, chain (n_kept, W, D), chain_lp (n_kept, W),
    accept_frac (n_steps,)).
    """
    step_fn = _ensemble_step_closure(ln_prob_fn, a, batch_fn)
    state, chain, chain_lp, acc = run_chunked(
        state, step_fn, n_steps, thin=thin, chunk_size=chunk_size,
        progress=progress)
    if acc is None:
        acc = np.empty((0,))
    return state, chain, chain_lp, acc
