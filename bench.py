"""Benchmark: posterior (ln-likelihood) evaluations/sec/chip at 1024 walkers.

BASELINE.json metric: "log-likelihood evals/sec/chip at 1024 walkers" for a
single simple eclipse.  The reference publishes no numbers
(BASELINE.json "published": {}); BASELINE.md's estimate for the reference
stack (emcee + compiled LFIT across a multiprocessing Pool) is order
1e2-1e3 aggregate evals/sec on a multicore CPU.  ``vs_baseline`` is
computed against the TOP of that band (1000 evals/sec) so the ratio is
conservative.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np

REFERENCE_EVALS_PER_SEC = 1000.0  # BASELINE.md upper-band estimate


def main():
    import jax
    import jax.numpy as jnp

    from lfit_python_tpu.cli import _enable_compile_cache
    _enable_compile_cache()

    from lfit_python_tpu.examples import build_model
    from lfit_python_tpu.models.likelihood import make_ln_prob

    n_walkers = 1024
    model = build_model(n_eclipses=1, complex_spot=False, n_points=128).compile()
    dtype = jnp.float32
    ln_prob = make_ln_prob(model, dtype=dtype)
    fn = jax.jit(jax.vmap(ln_prob))

    start = np.asarray(model.var_start(), np.float32)
    rng = np.random.default_rng(0)
    pos = jnp.asarray(
        start[None, :] + 0.001 * np.abs(start)[None, :]
        * rng.standard_normal((n_walkers, start.size)), dtype)

    # compile + warmup
    fn(pos).block_until_ready()

    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = fn(pos)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_rep
    evals_per_sec = n_walkers / dt

    print(json.dumps({
        "metric": "ln_prob evals/sec/chip (1 simple eclipse, 1024 walkers, 128 pts)",
        "value": round(evals_per_sec, 1),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_sec / REFERENCE_EVALS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
