"""Micro-benchmark of the contact-interval solver (the framework's hottest
op) and the full posterior on the real chip.  Not part of bench.py; used to
guide the solver redesign (ROADMAP round-2 item 1)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from lfit_python_tpu.models import components as comp
    from lfit_python_tpu.roche.geometry import l1_potential, xl1

    print("devices:", jax.devices())
    dtype = jnp.float32
    W = 1024
    q0, incl0 = 0.15, 84.0

    # element cloud matching the full-resolution disc+spot (24*40 + 32)
    rng = np.random.default_rng(0)
    n_elem = 992
    r = rng.uniform(0.05, 0.45, n_elem)
    th = rng.uniform(0, 2 * np.pi, n_elem)
    pos = np.stack([r * np.cos(th), r * np.sin(th), np.zeros(n_elem)], -1)
    pos = jnp.asarray(pos, dtype)

    qs = jnp.asarray(q0 + 0.001 * rng.standard_normal(W), dtype)
    incls = jnp.asarray(incl0 + 0.05 * rng.standard_normal(W), dtype)

    def per_walker(q, incl):
        x1 = xl1(q)
        pl1 = l1_potential(q, x1)
        phi_in, phi_out, ecl = comp.element_intervals(q, incl, pos, x1, pl1)
        return (jnp.sum(phi_in) + jnp.sum(phi_out)
                + jnp.sum(ecl.astype(dtype)))

    fn = jax.jit(jax.vmap(per_walker))
    out = fn(qs, incls)
    out.block_until_ready()
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(qs, incls)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"contact_interval (XLA):    {W} walkers x {n_elem} elements: "
          f"{dt * 1e3:.2f} ms  ({W / dt:.0f} walkers/s)")

    # --- Pallas kernel ---------------------------------------------------
    from lfit_python_tpu.ops.pallas_contacts import element_intervals_pallas
    from lfit_python_tpu.roche.geometry import findi

    qv = qs
    x1v = jax.jit(jax.vmap(xl1))(qv)
    pl1v = jax.jit(jax.vmap(l1_potential))(qv, x1v)
    posW = jnp.broadcast_to(pos[None], (W,) + pos.shape)

    def run_pallas(q, incl, p, x1, pl1):
        pin, pout, ecl = element_intervals_pallas(
            q, incl, p[..., 0], p[..., 1], x1, pl1)
        return pin.sum() + pout.sum() + ecl.astype(dtype).sum()

    fnp = jax.jit(run_pallas)
    out = fnp(qv, incls, posW, x1v, pl1v)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fnp(qv, incls, posW, x1v, pl1v)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"contact_interval (Pallas): {W} walkers x {n_elem} elements: "
          f"{dt * 1e3:.2f} ms  ({W / dt:.0f} walkers/s)")


if __name__ == "__main__":
    main()
