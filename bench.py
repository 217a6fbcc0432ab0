"""Benchmark: posterior (ln-likelihood) evaluations/sec/chip at 1024 walkers.

Headline metric = the north-star configuration (BASELINE.json): the
5-eclipse hierarchical fit (core q/dphi/rwd shared, two bands) at 1024
walkers — the configuration the >100x target names.  The single-eclipse
number is also measured and reported as an extra key.

The reference publishes no numbers (BASELINE.json "published": {});
BASELINE.md's estimate for the reference stack (emcee + compiled LFIT
across a multiprocessing.Pool) is order 1e2-1e3 ln-like evals/sec
aggregate on a multicore CPU for a SINGLE eclipse.  A 5-eclipse
hierarchical evaluation costs the reference ~5x per walker, so the
conservative top of its band is ~200 evals/sec; ``vs_baseline`` divides
by that (conservative: the true reference rate is likely 10x lower).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""

import json
import time

import numpy as np

REFERENCE_5ECL_EVALS_PER_SEC = 200.0   # top of band / 5 eclipses
REFERENCE_1ECL_EVALS_PER_SEC = 1000.0  # BASELINE.md upper-band estimate


def _measure(model, n_walkers, dtype, reps=10, retries=1):
    import jax
    import jax.numpy as jnp

    from lfit_python_tpu.models.likelihood import make_ln_prob

    ln_prob = make_ln_prob(model, dtype=dtype)
    fn = jax.jit(jax.vmap(ln_prob))
    start = np.asarray(model.var_start(), np.float32)
    rng = np.random.default_rng(0)
    pos_host = (start[None, :] + 0.001 * np.abs(start)[None, :]
                * rng.standard_normal((n_walkers, start.size)))
    # retry once on a transient TPU-worker fault (the round-2 driver
    # artifact was lost to exactly one of these)
    for attempt in range(retries + 1):
        try:
            pos = jnp.asarray(pos_host, dtype)
            fn(pos).block_until_ready()          # compile + warmup
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(pos)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / reps
            return n_walkers / dt
        except jax.errors.JaxRuntimeError:
            if attempt >= retries:
                raise
            time.sleep(10.0)


def _time_step(step, state, reps):
    """Wall time per call of a jitted state -> state step function."""
    import jax

    state = step(state)
    jax.block_until_ready(state)                 # compile + warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        state = step(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / reps


def _start_pos(model, n, dtype, scale=0.001):
    import jax.numpy as jnp

    start = np.asarray(model.var_start(), np.float32)
    rng = np.random.default_rng(0)
    pos = (start[None, :] + scale * np.abs(start)[None, :]
           * rng.standard_normal((n, start.size)))
    return jnp.asarray(pos, dtype), jnp.asarray(start, dtype)


def _measure_pt(model, n_walkers, n_temps, dtype, reps=5):
    """Per-rung tempered-proposal evals/sec: one pt_step evaluates
    (ln_prior, ln_like) for n_temps x n_walkers proposals (two
    half-ensemble sweeps) + the swap sweep."""
    import jax
    import jax.numpy as jnp

    from lfit_python_tpu.models.likelihood import make_ln_prob_parts
    from lfit_python_tpu.sampling.pt import PTState, default_beta_ladder, \
        pt_step

    ln_prior, ln_like, _ = make_ln_prob_parts(model, dtype=dtype)
    pos, _ = _start_pos(model, n_temps * n_walkers, dtype)
    pos = pos.reshape(n_temps, n_walkers, -1)
    lp = jax.jit(jax.vmap(jax.vmap(ln_prior)))(pos)
    ll = jax.jit(jax.vmap(jax.vmap(ln_like)))(pos)
    state = PTState(jax.random.PRNGKey(0), pos, ll, lp,
                    default_beta_ladder(n_temps).astype(dtype),
                    jnp.asarray(0, jnp.int32))
    step = jax.jit(lambda s: pt_step(s, ln_prior, ln_like)[0])
    dt = _time_step(step, state, reps)
    return n_temps * n_walkers / dt


def _measure_hmc(model, n_chains, n_leapfrog, dtype, reps=5):
    """Gradient (leapfrog) evals/sec: one hmc_step costs
    n_chains x n_leapfrog value_and_grad evaluations of the posterior."""
    import jax
    import jax.numpy as jnp

    from lfit_python_tpu.models.likelihood import make_ln_prob
    from lfit_python_tpu.sampling.hmc import HMCState, hmc_step

    ln_prob = make_ln_prob(model, dtype=dtype)
    pos, start = _start_pos(model, n_chains, dtype)
    lp, g = jax.jit(jax.vmap(jax.value_and_grad(ln_prob)))(pos)
    scatter = jnp.asarray(0.001 * np.abs(np.asarray(start)) + 1e-6, dtype)
    state = HMCState(jax.random.PRNGKey(0), pos, lp, g,
                     jnp.asarray(1e-4, dtype), scatter ** 2,
                     jnp.asarray(0, jnp.int32))
    step = jax.jit(lambda s: hmc_step(s, ln_prob, n_leapfrog)[0])
    dt = _time_step(step, state, reps)
    return n_chains * n_leapfrog / dt


def _measure_nuts(model, n_chains, max_depth, dtype, reps=3):
    """NUTS trajectories/sec + realized mean tree depth.  Grad evals per
    trajectory ~ 2^depth, but chains run in vmap lockstep to the
    batch-deepest trajectory, so the honest per-chip number is
    trajectories/sec at the measured depth (BASELINE.md discusses the
    lockstep cost)."""
    import jax
    import jax.numpy as jnp

    from lfit_python_tpu.models.likelihood import make_ln_prob
    from lfit_python_tpu.sampling.hmc import HMCState
    from lfit_python_tpu.sampling.nuts import nuts_step

    ln_prob = make_ln_prob(model, dtype=dtype)
    pos, start = _start_pos(model, n_chains, dtype)
    lp, g = jax.jit(jax.vmap(jax.value_and_grad(ln_prob)))(pos)
    scatter = jnp.asarray(0.001 * np.abs(np.asarray(start)) + 1e-6, dtype)
    state = HMCState(jax.random.PRNGKey(0), pos, lp, g,
                     jnp.asarray(1e-4, dtype), scatter ** 2,
                     jnp.asarray(0, jnp.int32))
    step = jax.jit(lambda s: nuts_step(s, ln_prob, max_depth)[0::4])
    (state, depth) = step(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, depth = step(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / reps
    return n_chains / dt, float(depth)


def _probe_backend_bounded(seconds=240):
    """Probe JAX backend init in a SUBPROCESS with a hard deadline.

    The axon TPU tunnel's claim loop retries forever when the chip is
    held or the worker is down (observed: ``jax.devices()`` sleeping in
    the grant-claim loop for 25+ minutes), and it blocks the main thread
    in C, so an in-process ``signal.alarm`` never fires (measured).  A
    subprocess can be killed from outside regardless; a hung bench would
    otherwise block the driver's whole round-end pipeline.
    """
    import subprocess
    import sys

    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; jax.devices(); "
             "jnp.ones((8, 8)).sum().block_until_ready()"],
            timeout=seconds, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except subprocess.TimeoutExpired:
        raise SystemExit(
            f"bench.py: JAX backend probe exceeded {seconds}s — the TPU "
            "tunnel is not answering (chip held by another session or "
            "worker down).  Transient on this box; rerun bench.py.")
    except subprocess.CalledProcessError as e:
        raise SystemExit(
            f"bench.py: JAX backend probe failed (rc={e.returncode}); "
            "see stderr of a bare `python -c 'import jax; jax.devices()'`.")


def main():
    import jax
    import jax.numpy as jnp

    _probe_backend_bounded()
    from lfit_python_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    # x64-enabled process: XLA compiles a ~30% faster executable for the
    # identical f32 posterior (measured 68 vs 91 ms; see cli.py note)
    jax.config.update("jax_enable_x64", True)

    from lfit_python_tpu.examples import build_model

    n_walkers = 1024
    dtype = jnp.float32

    north = build_model(
        n_eclipses=5, complex_spot=[False] * 5, n_points=128,
        bands=("g", "r")).compile()
    rate5 = _measure(north, n_walkers, dtype)

    single = build_model(
        n_eclipses=1, complex_spot=False, n_points=128).compile()
    rate1 = _measure(single, n_walkers, dtype)

    # ---- per-sampler-path throughput (VERDICT r3 #1: a measured number
    # for EVERY path, not just the easiest chi^2 ensemble posterior).
    # Each extra is guarded two ways: a transient failure in one records
    # an error key instead of killing the headline artifact, and a global
    # wall-clock deadline skips remaining extras once the budget is spent
    # (cold remote-TPU compiles of the five extra programs can exceed the
    # driver's bench timeout; the persistent compile cache makes them
    # cheap on every later run, so skipped extras fill in across runs).
    extras = {}
    deadline = time.monotonic() + float(
        __import__("os").environ.get("BENCH_EXTRAS_BUDGET_S", "300"))

    def _try(fn, **keys):
        if time.monotonic() > deadline:
            extras[next(iter(keys)) + "_skipped"] = "extras deadline"
            return
        try:
            fn()
        except Exception as e:                          # noqa: BLE001
            for k in keys:
                extras[k] = None
            extras[next(iter(keys)) + "_error"] = repr(e)[:200]

    def _gp():
        # BASELINE config 4: GP flickering likelihood (north-star shape)
        gp_model = build_model(
            n_eclipses=5, complex_spot=[False] * 5, use_gp=True,
            n_points=128, bands=("g", "r")).compile()
        extras["gp_evals_per_sec"] = round(
            _measure(gp_model, n_walkers, dtype), 1)

    def _config5():
        # BASELINE config 5, single-chip slice: 10 eclipses x complex x
        # GP at 4096 walkers (HBM-resident; the v5e-8 run shards this
        # same program over the walker mesh)
        c5 = build_model(
            n_eclipses=10, complex_spot=True, use_gp=True,
            n_points=128, bands=("g", "r")).compile()
        extras["config5_evals_per_sec"] = round(
            _measure(c5, 4096, dtype, reps=5), 1)

    def _pt():
        r = _measure_pt(north, 256, 4, dtype)
        extras["pt_evals_per_sec"] = round(r, 1)
        # tempered-proposal cost vs the fused posterior (target <= ~1.5x:
        # each PT proposal evaluates ln_prior + ln_like with ONE hoisted
        # geometry solve each, mirroring ln_prob)
        extras["pt_cost_vs_fused"] = round(rate5 / r, 3)

    def _hmc():
        extras["hmc_grad_evals_per_sec"] = round(
            _measure_hmc(north, 256, 16, dtype), 1)

    def _hmc_gp():
        # the GP x gradient seam (round-4 VERDICT #1: this combination
        # was broken by the NaN-grad prior bug and had never been
        # measured) — leapfrog grad evals/sec through the segmented
        # Matern-3/2 scan on the BASELINE-config-4 shape
        gp_model = build_model(
            n_eclipses=5, complex_spot=[False] * 5, use_gp=True,
            n_points=128, bands=("g", "r")).compile()
        extras["hmc_gp_grad_evals_per_sec"] = round(
            _measure_hmc(gp_model, 256, 16, dtype), 1)

    def _nuts():
        traj, depth = _measure_nuts(north, 256, 6, dtype)
        extras["nuts_traj_per_sec"] = round(traj, 1)
        extras["nuts_mean_depth"] = round(depth, 2)

    _try(_gp, gp_evals_per_sec=None)
    _try(_config5, config5_evals_per_sec=None)
    _try(_pt, pt_evals_per_sec=None, pt_cost_vs_fused=None)
    _try(_hmc, hmc_grad_evals_per_sec=None)
    _try(_hmc_gp, hmc_gp_grad_evals_per_sec=None)
    _try(_nuts, nuts_traj_per_sec=None, nuts_mean_depth=None)

    print(json.dumps({
        "metric": ("ln_prob evals/sec/chip, north-star config "
                   "(5-eclipse hierarchical, 2 bands, 1024 walkers, "
                   "128 pts/eclipse)"),
        "value": round(rate5, 1),
        "unit": "evals/s",
        "vs_baseline": round(rate5 / REFERENCE_5ECL_EVALS_PER_SEC, 2),
        "single_eclipse_evals_per_sec": round(rate1, 1),
        "single_eclipse_vs_baseline": round(
            rate1 / REFERENCE_1ECL_EVALS_PER_SEC, 2),
        **extras,
    }))


if __name__ == "__main__":
    main()
