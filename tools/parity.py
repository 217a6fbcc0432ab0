"""Numerical-parity measurement: f32 TPU vs f64 CPU oracle (the
BASELINE.json north-star gate is <= 1e-6 relative flux on identical
parameter vectors).

Reports max/median relative error of the total model flux over random
parameter draws, plus per-stage attribution (contact intervals, WD curve,
donor curve) so precision work targets the real source.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    from lfit_python_tpu.models.cv import CVConfig, cv_fluxes
    from lfit_python_tpu.models import components as comp
    from lfit_python_tpu.roche.geometry import (
        contact_interval, findi, l1_potential, xl1)

    cpu = jax.devices("cpu")[0]
    try:
        acc = [d for d in jax.devices() if d.platform != "cpu"][0]
    except IndexError:
        acc = cpu
        print("NOTE: no accelerator; comparing f32 vs f64 on CPU")
    print("oracle:", cpu, " test:", acc)

    cfg = CVConfig(complex_spot=True)
    rng = np.random.default_rng(42)
    n_draw = 32
    phases = np.linspace(-0.1, 0.1, 256)
    base = np.array([0.1, 0.05, 0.08, 0.03, 0.15, 0.04, 0.44, 0.3, 0.011,
                     0.025, 160.0, 0.2, 1.5, 0.0, 1.0, 1.0, 90.0, 0.0])
    jitter = np.abs(base) * 0.1 + 1e-3
    draws = base[None, :] + jitter[None, :] * rng.standard_normal(
        (n_draw, 18))
    draws[:, 4] = np.clip(draws[:, 4], 0.05, 0.5)     # q
    draws[:, 5] = np.clip(draws[:, 5], 0.02, 0.06)    # dphi
    draws[:, 8] = np.clip(draws[:, 8], 0.005, 0.02)   # rwd
    # the gate compares IDENTICAL parameter vectors: use f32-representable
    # draws so parameter rounding does not pollute the computation error
    draws = draws.astype(np.float32).astype(np.float64)

    def total64(pars):
        return cv_fluxes(pars, jnp.asarray(phases, jnp.float64),
                         config=cfg)

    f64 = jax.jit(total64, device=cpu)
    oracles = [f64(jnp.asarray(d, jnp.float64)) for d in draws]

    for mixed in (False, True):
        mcfg = cfg._replace(mixed_precision=mixed)

        def total32(pars):
            return cv_fluxes(pars, jnp.asarray(phases, jnp.float32),
                             config=mcfg)

        f32 = jax.jit(total32, device=acc)
        errs = []
        comp_errs = {"ywd": [], "ydisc": [], "yspot": [], "ysec": []}
        for d, o in zip(draws, oracles):
            t = f32(jnp.asarray(d, jnp.float32))
            scale = float(jnp.max(jnp.abs(o.total)))
            errs.append(np.abs(np.asarray(t.total, np.float64)
                               - np.asarray(o.total)) / scale)
            for name in comp_errs:
                oo = np.asarray(getattr(o, name))
                tt = np.asarray(getattr(t, name), np.float64)
                comp_errs[name].append(np.abs(tt - oo) / scale)
        errs = np.asarray(errs)
        mode = "precise" if mixed else "fast"
        print(f"[{mode}] total flux rel err: max {errs.max():.3e}  "
              f"p99 {np.percentile(errs, 99):.3e}  "
              f"median {np.median(errs):.3e}")
        for name, es in comp_errs.items():
            es = np.asarray(es)
            print(f"  {name:6s}: max {es.max():.3e}  p99 "
                  f"{np.percentile(es, 99):.3e}")

    # contact-interval parity (the graze-flip source)
    q, dphi = 0.15, 0.04
    x1 = xl1(jnp.float64(q))
    pl1 = l1_potential(jnp.float64(q), x1)
    incl = findi(jnp.float64(q), jnp.float64(dphi), x1, pl1)
    pos, _ = comp.disc_elements(0.011, 0.25, 1.5, 24, 40)

    def ivals(dtype, dev):
        f = jax.jit(jax.vmap(
            lambda p: contact_interval(
                jnp.asarray(q, dtype), jnp.asarray(incl, dtype), p,
                jnp.asarray(x1, dtype), jnp.asarray(pl1, dtype))),
            device=dev)
        return f(jnp.asarray(pos, dtype))

    i64 = ivals(jnp.float64, cpu)
    i32 = ivals(jnp.float32, acc)
    for nm, a, b in [("phi_in", i64[0], i32[0]), ("phi_out", i64[1], i32[1])]:
        ecl = np.asarray(i64[2]).astype(bool)
        d = np.abs(np.asarray(a) - np.asarray(b, np.float64))[ecl]
        print(f"  contact {nm}: max {d.max():.3e}  median "
              f"{np.median(d):.3e} (cycles, eclipsed elements)")
    agree = (np.asarray(i64[2]) == np.asarray(i32[2])).mean()
    print(f"  eclipsed-flag agreement: {agree:.4f}")


if __name__ == "__main__":
    main()
