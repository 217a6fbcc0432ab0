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
    }))


if __name__ == "__main__":
    main()
