"""Stress-accuracy harness for the contact-interval solver.

Compares the f32 solver (XLA path and, on TPU, the Pallas kernel) against
an f64 run of the same algorithm (the established oracle for this repo's
golden tests) over a stress ensemble spanning deep eclipses through
grazes.  Reports contact-phase error percentiles, eclipse-width error,
and eclipsed-flag agreement — the gate for any solver-algorithm change
(e.g. the warm-started edge loop): the AFTER tail must not exceed the
BEFORE tail recorded in ROADMAP.md/BASELINE.md.

Run on CPU (f64 native) for the oracle; the f32 candidate runs on the
default backend.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from lfit_python_tpu.models import components as comp
    from lfit_python_tpu.roche.geometry import l1_potential, xl1

    rng = np.random.default_rng(42)
    W = 512
    N = 256

    # stress ensemble: wide q, inclinations clustered near the grazing
    # boundary for a 0.3 disc radius, elements across the full disc+spot
    # footprint
    q = rng.uniform(0.05, 0.5, W)
    incl = rng.uniform(75.0, 90.0, W)
    r = rng.uniform(0.02, 0.45, (W, N))
    th = rng.uniform(0, 2 * np.pi, (W, N))
    pos = np.stack([r * np.cos(th), r * np.sin(th), np.zeros((W, N))], -1)

    def run(dtype):
        qs = jnp.asarray(q, dtype)
        ins = jnp.asarray(incl, dtype)
        ps = jnp.asarray(pos, dtype)

        def per_walker(qq, ii, pp):
            x1 = xl1(qq)
            pl1 = l1_potential(qq, x1)
            return comp.element_intervals(qq, ii, pp, x1, pl1)

        fn = jax.jit(jax.vmap(per_walker))
        out = fn(qs, ins, ps)
        jax.block_until_ready(out)
        return tuple(np.asarray(o) for o in out)

    t0 = time.perf_counter()
    pin64, pout64, ecl64 = run(jnp.float64)
    print(f"f64 oracle: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    pin32, pout32, ecl32 = run(jnp.float32)
    print(f"f32 run:    {time.perf_counter() - t0:.1f}s")

    agree = ecl32 == ecl64
    both = ecl32 & ecl64
    print(f"flag agreement: {agree.mean():.6f}  "
          f"({(~agree).sum()} of {agree.size} differ)")
    print(f"eclipsed fraction (f64): {ecl64.mean():.4f}")

    err_in = np.abs(pin32[both].astype(np.float64) - pin64[both])
    err_out = np.abs(pout32[both].astype(np.float64) - pout64[both])
    w32 = (pout32 - pin32)[both].astype(np.float64)
    w64 = (pout64 - pin64)[both]
    err_w = np.abs(w32 - w64)

    for name, e in (("phi_in", err_in), ("phi_out", err_out),
                    ("width", err_w)):
        print(f"{name:8s} err: median {np.median(e):.3e}  "
              f"p99 {np.percentile(e, 99):.3e}  "
              f"p99.9 {np.percentile(e, 99.9):.3e}  "
              f"max {e.max():.3e}")


if __name__ == "__main__":
    main()
