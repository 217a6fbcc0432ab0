"""Microbench: donor curve-node evaluation variants at 1024 walkers.

The donor stage of the fused posterior evaluates, per walker, the
(n_quad+1 = 257 phases) x (384 elements) limb-darkened Lambertian sum
(components.donor_curve_nodes).  The shipped implementation uses two
dot_generals with a (W, P, N) intermediate between them; on TPU that
intermediate round-trips HBM (~400 MB at W=1024) even though the inputs
and outputs are tiny.  Variant B below replaces both dots with
componentwise broadcast arithmetic + a jnp.sum reduction, which XLA can
fuse into ONE loop (input fusion into the reduce) with no materialised
(W, P, N) tensor.

Usage: python tools/bench_donor.py [--walkers 1024] [--cpu]
Prints per-variant wall ms and the max |delta| between variants.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--walkers", type=int, default=1024)
    ap.add_argument("--n-quad", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lfit_python_tpu.models.components import (
        donor_grid, earth_vector)
    from lfit_python_tpu.roche.geometry import l1_potential, xl1

    W = args.walkers
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    q = jnp.asarray(0.12 + 0.02 * rng.standard_normal(W), dtype)
    incl = jnp.asarray(86.9 + 0.2 * rng.standard_normal(W), dtype)
    ulimb = 0.9

    def grids(q):
        x1 = xl1(q)
        pl1 = l1_potential(q, x1)
        return donor_grid(q, x1, pl1, n_lat=16, n_lon=24, dtype=dtype)

    grid = jax.jit(jax.vmap(grids))(q)

    th = jnp.linspace(0.0, 0.5, args.n_quad + 1, dtype=dtype)

    def nodes_dot(incl_deg, grid):
        # shipped path: two dot_generals with a (P, N) intermediate
        e = earth_vector(th, incl_deg)                       # (P, 3)
        mu = jnp.dot(e, grid.normals.T,
                     precision=jax.lax.Precision.HIGHEST)    # (P, N)
        mu = jnp.maximum(mu, 0.0)
        intens = 1.0 - ulimb * (1.0 - mu)
        return jnp.dot(mu * intens, grid.areas,
                       precision=jax.lax.Precision.HIGHEST)  # (P,)

    def nodes_fused(incl_deg, grid):
        # componentwise: mu as broadcast FMAs, one fused reduce over N
        e = earth_vector(th, incl_deg)                       # (P, 3)
        nx, ny, nz = (grid.normals[:, 0], grid.normals[:, 1],
                      grid.normals[:, 2])
        mu = (e[:, 0, None] * nx[None, :]
              + e[:, 1, None] * ny[None, :]
              + e[:, 2, None] * nz[None, :])                 # (P, N)
        mu = jnp.maximum(mu, 0.0)
        w = mu * (1.0 - ulimb) + ulimb * mu * mu             # mu * intens
        return jnp.sum(w * grid.areas[None, :], axis=-1)     # (P,)

    f_dot = jax.jit(jax.vmap(nodes_dot))
    f_fused = jax.jit(jax.vmap(nodes_fused))

    def bench(f, reps=30):
        out = f(incl, grid)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(incl, grid)
        out.block_until_ready()
        return (time.perf_counter() - t0) / reps * 1e3, out

    ms_dot, out_dot = bench(f_dot)
    ms_fused, out_fused = bench(f_fused)
    scale = float(jnp.max(jnp.abs(out_dot)))
    delta = float(jnp.max(jnp.abs(out_dot - out_fused))) / scale
    print(f"walkers={W} n_quad={args.n_quad} backend={jax.default_backend()}")
    print(f"dot    : {ms_dot:8.3f} ms")
    print(f"fused  : {ms_fused:8.3f} ms  ({ms_dot / ms_fused:.2f}x)")
    print(f"max rel delta vs dot: {delta:.3e}")


if __name__ == "__main__":
    main()
