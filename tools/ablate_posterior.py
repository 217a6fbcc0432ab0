"""Marginal stage costs INSIDE the fused north-star posterior.

tools/profile_posterior.py times each stage standalone, but stages fuse
and overlap once embedded, so standalone numbers do not compose into the
posterior's wall time.  This tool measures the posterior with one stage
at a time replaced by a shape-compatible constant (monkeypatched before
trace time, so XLA dead-code-eliminates the ablated stage): the delta vs
the full posterior is that stage's true marginal cost.

Ablations:
  full        the real posterior (reference point)
  no_wd       wd_flux -> ones          (origin shadow-distance sweep)
  no_contacts contact solver -> fixed intervals (Pallas/XLA edge solve)
  no_curve    element_flux_curve -> ones (removes contacts + reduction)
  no_donor    donor_flux -> ones       (keeps donor_grid root-find)
  no_dgrid    donor_grid -> unit grid  (also removes the grid solve)
  geometry    all of the above at once (tree/prior/geometry floor)

--floor additionally dissects that geometry floor (round-5): with wd/
contacts/curve/donor/dgrid all ablated, it removes one floor stage at a
time (stream integration, findi, spot elements, the prior table) so the
residual tree/dispatch cost is visible.

--parts instead measures the PT parts path (ln_prior / ln_like / their
sum vs the fused ln_prob) so a regression in the hoisted-geometry split
is caught by measurement (round-4 VERDICT #6).
"""

import contextlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _walker_block(model, dtype, n_walkers):
    import jax.numpy as jnp

    start = np.asarray(model.var_start(), np.float32)
    rng = np.random.default_rng(0)
    return jnp.asarray(
        start[None, :] + 0.001 * np.abs(start)[None, :]
        * rng.standard_normal((n_walkers, start.size)), dtype)


def _time_batched(scalar_fn, pos, reps=20):
    import jax

    fn = jax.jit(jax.vmap(scalar_fn))
    fn(pos).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(pos)
    out.block_until_ready()
    return (time.perf_counter() - t0) / reps


def _measure(model, dtype, n_walkers=1024, reps=20):
    from lfit_python_tpu.models.likelihood import make_ln_prob

    ln_prob = make_ln_prob(model, dtype=dtype)
    return _time_batched(ln_prob, _walker_block(model, dtype, n_walkers),
                         reps)


def parts_mode(model, dtype, n_walkers=1024):
    """Stage costs of the PT parts path (round-4 VERDICT #6).

    The tempered sampler evaluates (ln_prior, ln_like) separately per
    proposal — likelihood.make_ln_prob_parts hoists the shared core
    geometry into BOTH so the pair costs ~1 fused posterior, not ~2
    (measured 1.29-1.37x; target <= 1.5x).  A regression in that hoist
    shows up here as prior+like drifting toward 2x fused."""
    from lfit_python_tpu.models.likelihood import make_ln_prob_parts

    ln_prior, ln_like, ln_prob = make_ln_prob_parts(model, dtype=dtype)
    pos = _walker_block(model, dtype, n_walkers)
    t_fused = _time_batched(ln_prob, pos)
    t_prior = _time_batched(ln_prior, pos)
    t_like = _time_batched(ln_like, pos)
    print(f"fused ln_prob  {1e3 * t_fused:8.2f} ms")
    print(f"ln_prior       {1e3 * t_prior:8.2f} ms "
          f"({t_prior / t_fused:.2f}x fused)")
    print(f"ln_like        {1e3 * t_like:8.2f} ms "
          f"({t_like / t_fused:.2f}x fused)")
    ratio = (t_prior + t_like) / t_fused
    print(f"parts pair     {1e3 * (t_prior + t_like):8.2f} ms "
          f"({ratio:.2f}x fused; hoist regression if >> 1.5)")
    return ratio


@contextlib.contextmanager
def patched(**which):
    import jax.numpy as jnp

    from lfit_python_tpu.models import components as comp
    from lfit_python_tpu.models import likelihood as lk
    from lfit_python_tpu.ops import pallas_contacts as pc
    from lfit_python_tpu.roche import geometry as geo
    from lfit_python_tpu.roche import stream as strm

    saved = {}

    def put(mod, name, fn):
        saved[(mod, name)] = getattr(mod, name)
        setattr(mod, name, fn)

    if which.get("stream"):
        def fake_impacts(q, rdiscs, xl1_val=None, **k):
            base = jnp.stack([0.3 * jnp.ones_like(rdiscs),
                              0.2 * jnp.ones_like(rdiscs),
                              jnp.zeros_like(rdiscs)], axis=-1)
            return base * (1.0 + 0.0 * q)
        put(strm, "stream_impacts", fake_impacts)
        # likelihood.py imports inside the closures via `from ..roche.
        # stream import stream_impacts`, which re-resolves at trace time
        # through the module dict — the put above covers it.
    if which.get("findi"):
        from lfit_python_tpu.models import cv as cvmod
        fake_findi = lambda q, dphi, x1=None, pl1=None: 85.0 + 0.0 * q
        # likelihood.py and cv.py bind findi as a module global at import
        # (`from ..roche.geometry import findi`), so patch every binding
        put(geo, "findi", fake_findi)
        put(lk, "findi", fake_findi)
        put(cvmod, "findi", fake_findi)
    if which.get("spotel"):
        def fake_spot(q, rdisc, scale, az, exp1, exp2, n_elem=32, **k):
            n = n_elem
            pos = jnp.stack([jnp.full((n,), 0.3, q.dtype),
                             jnp.full((n,), 0.2, q.dtype),
                             jnp.zeros((n,), q.dtype)], axis=-1)
            return pos * (1.0 + 0.0 * rdisc), jnp.full((n,), 1.0 / n,
                                                       q.dtype)
        put(comp, "spot_elements", fake_spot)
    if which.get("prior"):
        put(lk, "ln_prior_table", lambda vals, table: jnp.sum(0.0 * vals))

    if which.get("wd"):
        put(comp, "wd_flux",
            lambda q, incl, phases, *a, **k: jnp.ones_like(phases))
    if which.get("contacts"):
        def fake_op(q, incl, px, py, x1, pl1):
            return (jnp.full_like(px, -0.01), jnp.full_like(px, 0.01),
                    jnp.ones(px.shape, bool))
        put(pc, "contacts_op_diff", fake_op)
        put(comp, "element_intervals",
            lambda q, incl, pos, x1, pl1, **k: (
                jnp.full(pos.shape[:-1], -0.01, pos.dtype),
                jnp.full(pos.shape[:-1], 0.01, pos.dtype),
                jnp.ones(pos.shape[:-1], bool)))
    if which.get("curve"):
        put(comp, "element_flux_curve",
            lambda phases, widths, intervals, weights: jnp.ones_like(phases))
    if which.get("donor"):
        put(comp, "donor_flux",
            lambda incl, phases, grid, ulimb=0.9: jnp.ones_like(phases))
    if which.get("dgrid"):
        def fake_grid(q, x1, pl1, n_lat=16, n_lon=24, dtype=jnp.float64):
            n = n_lat * n_lon
            one = jnp.ones((n, 3), dtype) * (1.0 + 0.0 * q)
            return comp.DonorGrid(one, one, jnp.ones((n,), dtype))
        put(comp, "donor_grid", fake_grid)
    try:
        yield
    finally:
        for (mod, name), fn in saved.items():
            setattr(mod, name, fn)


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", action="store_true",
                    help="measure the PT (ln_prior, ln_like) parts path "
                         "vs the fused posterior instead of the stage "
                         "ablations")
    ap.add_argument("--floor", action="store_true",
                    help="dissect the geometry floor: with every flux "
                         "stage ablated, remove one floor stage at a time")
    args = ap.parse_args()

    jax.config.update("jax_enable_x64", True)

    from lfit_python_tpu.examples import build_model

    print("devices:", jax.devices())
    model = build_model(n_eclipses=5, complex_spot=[False] * 5,
                        n_points=128, bands=("g", "r")).compile()
    dtype = jnp.float32

    if args.parts:
        parts_mode(model, dtype)
        return

    flux_off = {"wd": True, "contacts": True, "curve": True,
                "donor": True, "dgrid": True}
    if args.floor:
        cases = [
            ("geometry", dict(flux_off)),
            ("g-stream", dict(flux_off, stream=True)),
            ("g-findi", dict(flux_off, findi=True)),
            ("g-spotel", dict(flux_off, spotel=True)),
            ("g-prior", dict(flux_off, prior=True)),
            ("g-all", dict(flux_off, stream=True, findi=True,
                           spotel=True, prior=True)),
        ]
    else:
        cases = [
            ("full", {}),
            ("no_wd", {"wd": True}),
            ("no_contacts", {"contacts": True}),
            ("no_curve", {"curve": True, "contacts": True}),
            ("no_donor", {"donor": True}),
            ("no_dgrid", {"donor": True, "dgrid": True}),
            ("geometry", flux_off),
        ]
    base = None
    for name, kw in cases:
        with patched(**kw):
            dt = _measure(model, dtype)
        if base is None:
            base = dt
            delta = ""
        else:
            delta = f"  (marginal {1e3 * (base - dt):6.2f} ms)"
        print(f"{name:12s} {1e3 * dt:8.2f} ms{delta}", flush=True)


if __name__ == "__main__":
    main()
