"""Break down the north-star posterior's per-op cost on the real chip.

Times each stage of the fused posterior separately (1024 walkers):
geometry solves (xl1/findi), stream trajectory, contact intervals, WD
curve, donor grid+flux, GP.  Guides ROADMAP round-2 optimization."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / reps


def jax_block(x):
    import jax
    for leaf in jax.tree_util.tree_leaves(x):
        leaf.block_until_ready()


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)  # so mixed mode can engage

    from lfit_python_tpu.examples import build_model
    from lfit_python_tpu.models import components as comp
    from lfit_python_tpu.models.cv import CVConfig, cv_geometry, cv_total_flux
    from lfit_python_tpu.models.likelihood import make_ln_prob
    from lfit_python_tpu.roche.geometry import findi, l1_potential, xl1
    from lfit_python_tpu.roche.stream import spot_position, stream_trajectory

    print("devices:", jax.devices())
    dtype = jnp.float32
    W = 1024
    rng = np.random.default_rng(0)
    qs = jnp.asarray(0.15 + 0.003 * rng.standard_normal(W), dtype)
    dphis = jnp.asarray(0.04 + 0.0005 * rng.standard_normal(W), dtype)
    incls = jnp.asarray(84.0 + 0.05 * rng.standard_normal(W), dtype)
    rdiscs = jnp.asarray(0.3 + 0.003 * rng.standard_normal(W), dtype)

    # --- stage timings ---------------------------------------------------
    f_xl1 = jax.jit(jax.vmap(lambda q: xl1(q)))
    print(f"xl1:              {timeit(f_xl1, qs) * 1e3:8.2f} ms")

    def geo(q, dphi):
        x1 = xl1(q)
        pl1 = l1_potential(q, x1)
        return findi(q, dphi, x1, pl1)
    f_findi = jax.jit(jax.vmap(geo))
    print(f"xl1+findi:        {timeit(f_findi, qs, dphis) * 1e3:8.2f} ms")

    f_stream = jax.jit(jax.vmap(lambda q, rd: spot_position(q, rd)))
    print(f"stream+impact:    {timeit(f_stream, qs, rdiscs) * 1e3:8.2f} ms")

    cfg = CVConfig()
    n_elem = cfg.n_disc_rad * cfg.n_disc_az + cfg.n_spot
    r = rng.uniform(0.05, 0.45, n_elem)
    th = rng.uniform(0, 2 * np.pi, n_elem)
    pos = jnp.asarray(
        np.stack([r * np.cos(th), r * np.sin(th), np.zeros(n_elem)], -1),
        dtype)

    def contacts(q, incl):
        x1 = xl1(q)
        pl1 = l1_potential(q, x1)
        iv = comp.element_intervals(q, incl, pos, x1, pl1)
        return iv[0].sum() + iv[1].sum()
    f_cont = jax.jit(jax.vmap(contacts))
    print(f"contacts({n_elem:4d}): {timeit(f_cont, qs, incls) * 1e3:8.2f} ms")

    phases = jnp.asarray(np.linspace(-0.1, 0.1, 128), dtype)

    def wd(q, incl):
        x1 = xl1(q)
        pl1 = l1_potential(q, x1)
        return comp.wd_flux(q, incl, phases, 0.01, 0.3, x1, pl1).sum()
    f_wd = jax.jit(jax.vmap(wd))
    print(f"wd_flux(128ph):   {timeit(f_wd, qs, incls) * 1e3:8.2f} ms")

    def donor(q, incl):
        x1 = xl1(q)
        pl1 = l1_potential(q, x1)
        g = comp.donor_grid(q, x1, pl1, cfg.n_donor_lat, cfg.n_donor_lon,
                            dtype)
        return comp.donor_flux(incl, phases, g).sum()
    f_don = jax.jit(jax.vmap(donor))
    print(f"donor(384el):     {timeit(f_don, qs, incls) * 1e3:8.2f} ms")

    # --- full posteriors --------------------------------------------------
    for ne, tag in [(1, "1-eclipse"), (5, "5-eclipse")]:
        model = build_model(
            n_eclipses=ne,
            complex_spot=[False] * ne,
            n_points=128,
            bands=("g",) if ne == 1 else ("g", "r"),
        ).compile()
        start = np.asarray(model.var_start(), np.float32)
        posw = jnp.asarray(
            start[None, :] + 0.001 * np.abs(start)[None, :]
            * rng.standard_normal((W, start.size)), dtype)
        for mixed in (False, True):
            mcfg = CVConfig(mixed_precision=mixed)
            ln_prob = make_ln_prob(model, config=mcfg, dtype=dtype)
            fn = jax.jit(jax.vmap(ln_prob))
            dt = timeit(fn, posw)
            mode = "precise" if mixed else "fast   "
            print(f"posterior {tag} {mode}: {dt * 1e3:8.2f} ms "
                  f"({W / dt:8.0f} evals/s)")


if __name__ == "__main__":
    main()
