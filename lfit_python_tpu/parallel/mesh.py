"""Device-mesh scale-out for the walker ensemble (SURVEY.md §5.8).

The reference's only parallelism is ``multiprocessing.Pool`` fork+pickle
over CPU cores (SURVEY.md §2 "Parallelism") — walkers are the unit of
parallel work.  The TPU-native equivalent: a 1-D ``jax.sharding.Mesh``
over the ``walkers`` axis; the posterior vmap shards embarrassingly, and
the stretch move's partner selection (each walker pairs with a random
member of the complementary half-ensemble) becomes a gather that XLA
lowers to an all-gather of the complementary half over ICI — a ~W*D/2
float transfer per half-step, negligible against the likelihood compute.

No NCCL/MPI: XLA collectives over ICI/DCN are the backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sampling.ensemble import EnsembleState

__all__ = ["walker_mesh", "shard_state", "walker_sharding",
           "shard_pt_state", "sharded_pt_batch_parts",
           "shard_hmc_state", "sharded_hmc_trajectories",
           "sharded_nuts_trajectories"]

WALKER_AXIS = "walkers"


def walker_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name ``walkers``."""
    if devices is None:
        devices = jax.devices()
    return jax.make_mesh((len(devices),), (WALKER_AXIS,), devices=devices)


def walker_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(WALKER_AXIS))


def shard_state(state: EnsembleState, mesh: Mesh) -> EnsembleState:
    """Place the ensemble on the mesh: walker-sharded positions/log-probs,
    replicated PRNG key and step counter.

    Walker count must divide the mesh size times 2 (two half-ensembles,
    each itself walker-sharded).
    """
    n_dev = mesh.devices.size
    W = state.positions.shape[0]
    if W % (2 * n_dev):
        raise ValueError(
            f"n_walkers={W} must be divisible by 2*n_devices={2 * n_dev}")
    shard = walker_sharding(mesh)
    rep = NamedSharding(mesh, P())
    return EnsembleState(
        key=jax.device_put(state.key, rep),
        positions=jax.device_put(state.positions, shard),
        log_prob=jax.device_put(state.log_prob, shard),
        step=jax.device_put(state.step, rep),
    )


def shard_pt_state(state, mesh: Mesh):
    """Place a PT state on the mesh: the walker axis (axis 1 of the
    (T, W, D) ladder) is the data-parallel axis, the temperature ladder is
    replicated (ntemps is small; the per-rung work shards with walkers)."""
    from ..sampling.pt import PTState

    n_dev = mesh.devices.size
    W = state.positions.shape[1]
    if W % (2 * n_dev):
        raise ValueError(
            f"n_walkers={W} must be divisible by 2*n_devices={2 * n_dev}")
    shard_w = NamedSharding(mesh, P(None, WALKER_AXIS))
    rep = NamedSharding(mesh, P())
    return PTState(
        key=jax.device_put(state.key, rep),
        positions=jax.device_put(state.positions, shard_w),
        ln_like=jax.device_put(state.ln_like, shard_w),
        ln_prior=jax.device_put(state.ln_prior, shard_w),
        betas=jax.device_put(state.betas, rep),
        step=jax.device_put(state.step, rep),
    )


def sharded_pt_batch_parts(ln_prior_fn, ln_like_fn, mesh: Mesh):
    """shard_map-wrapped (prior, like) evaluator for ``pt_step``: local
    (T, H_local, D) blocks evaluate with plain vmaps, results carry the
    walker sharding (mirrors ``sharded_batch_ln_prob``)."""
    def local_batch(pos):
        flat = pos.reshape(-1, pos.shape[-1])
        lp = jax.vmap(ln_prior_fn)(flat)
        ll = jax.vmap(ln_like_fn)(flat)
        return lp.reshape(pos.shape[:2]), ll.reshape(pos.shape[:2])

    return jax.shard_map(
        local_batch, mesh=mesh,
        in_specs=P(None, WALKER_AXIS),
        out_specs=(P(None, WALKER_AXIS), P(None, WALKER_AXIS)),
        check_vma=False)


def shard_hmc_state(state, mesh: Mesh):
    """Place an HMC/NUTS state on the mesh: chain-sharded positions /
    log-probs / gradients, replicated key, step size, metric and step
    counter.  Unlike the stretch move there is no half-ensemble
    constraint — chains are fully independent — so the chain count need
    only divide the mesh size."""
    from ..sampling.hmc import HMCState

    n_dev = mesh.devices.size
    C = state.positions.shape[0]
    if C % n_dev:
        raise ValueError(
            f"n_chains={C} must be divisible by n_devices={n_dev}")
    shard = walker_sharding(mesh)
    rep = NamedSharding(mesh, P())
    return HMCState(
        key=jax.device_put(state.key, rep),
        positions=jax.device_put(state.positions, shard),
        log_prob=jax.device_put(state.log_prob, shard),
        grad=jax.device_put(state.grad, shard),
        step_size=jax.device_put(state.step_size, rep),
        inv_mass=jax.device_put(state.inv_mass, rep),
        step=jax.device_put(state.step, rep),
    )


def _sharded_trajectories(batch_fn, mesh: Mesh):
    """shard_map a chain-batched trajectory evaluator (hmc/nuts contract:
    (keys, x, lp, g, eps, inv_mass) -> per-chain outputs).  Gradient-
    sampler chains never interact, so the body contains NO collectives —
    each device integrates its local chain block; only the scalar
    accept/divergence statistics reduce across the mesh (outside this
    wrapper, via plain jnp.mean on the sharded outputs)."""
    return jax.shard_map(
        batch_fn, mesh=mesh,
        in_specs=(P(WALKER_AXIS), P(WALKER_AXIS), P(WALKER_AXIS),
                  P(WALKER_AXIS), P(), P()),
        out_specs=P(WALKER_AXIS),
        check_vma=False)


def sharded_hmc_trajectories(ln_prob_fn, mesh: Mesh, n_leapfrog=16):
    """Mesh-sharded ``traj_batch_fn`` for ``hmc_step``/``run_hmc``."""
    from ..sampling.hmc import batch_trajectories

    return _sharded_trajectories(
        batch_trajectories(ln_prob_fn, n_leapfrog), mesh)


def sharded_nuts_trajectories(ln_prob_fn, mesh: Mesh, max_depth=8):
    """Mesh-sharded ``traj_batch_fn`` for ``nuts_step``/``run_nuts``.

    Under vmap the NUTS doubling loops run to the batch's deepest
    trajectory; sharding localises that lockstep to each device's chain
    block, so a single pathological chain no longer stalls the whole
    batch — only its own shard."""
    from ..sampling.nuts import batch_nuts_trajectories

    return _sharded_trajectories(
        batch_nuts_trajectories(ln_prob_fn, max_depth), mesh)


def sharded_batch_ln_prob(ln_prob_fn, mesh: Mesh):
    """shard_map-wrapped batch posterior evaluator for ``ensemble_step``.

    Each device evaluates its local walker block with plain (unsharded)
    arrays — sharding propagation never has to reason about the
    fixed-iteration geometry loops inside the posterior — and the result
    carries the walker sharding.  This is the likelihood side of the SPMD
    design; the stretch move's partner matmul is the only cross-device
    communication point (SURVEY.md §5.8).
    """
    import jax.numpy as jnp

    def local_batch(pos):
        return jax.vmap(ln_prob_fn)(pos)

    # check_vma=False: the geometry root-find loops seed their carries
    # from unvarying constants which become walker-varying on the first
    # iteration — semantically fine for an embarrassingly parallel body
    # (no collectives inside), but rejected by the strict vma checker.
    return jax.shard_map(
        local_batch, mesh=mesh,
        in_specs=P(WALKER_AXIS), out_specs=P(WALKER_AXIS),
        check_vma=False)
