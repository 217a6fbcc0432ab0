"""ESS/sec comparison of the four samplers on the north-star posterior.

VERDICT round-3 #6: the gradient samplers (HMC/NUTS) are this framework's
marquee capability beyond the non-differentiable reference — quantify
whether they actually beat the stretch move per chip-second on the
flagship configuration, or document where they don't.

Method: each sampler runs warmup/burn-in (discarded, untimed quality-wise
but reported), then a TIMED production phase; effective sample size per
parameter comes from the integrated autocorrelation time (FFT windowed
estimator, utils/chains.autocorr_time — the same number params.json
reports).  The comparison metric is min-over-parameters ESS per second
of production wall-clock on one chip.  Chain counts follow each
sampler's natural operating point (ensemble: 1024 walkers = the
BASELINE.json metric config; HMC/NUTS: 256 chains — gradient chains cost
n_leapfrog/2^depth posterior-gradient evals per draw, so fewer, longer
chains is the honest configuration).

Usage:  python tools/ess_study.py [--steps-scale S]
Prints one JSON line per sampler plus a BASELINE.md-ready markdown table.

--config5 (round-5, VERDICT r4 #2) runs the same comparison on the
BASELINE config-5 posterior (10 eclipses x complex spot x GP, ~60
variable params) — the regime where affine-invariant ensembles are
expected to degrade and the gradient samplers to pay off.  The ensemble
runs its natural 4096-walker operating point (BASELINE.json configs[4]);
HMC runs a TRAJECTORY-LENGTH SEARCH (--leapfrogs, default 4 8 16 32) so
the comparison is against a *tuned* HMC rather than a single pinned
n_leapfrog (round-4 VERDICT weak #4).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _model_and_posterior(config5=False):
    import jax.numpy as jnp

    from lfit_python_tpu.examples import build_model
    from lfit_python_tpu.models.likelihood import make_ln_prob

    if config5:
        # BASELINE config 5: 10 eclipses x complex spot x GP flickering
        # (the same model bench.py's config5 row measures).  ~63 variable
        # params: the high-dimensional regime of VERDICT r4 #2.
        model = build_model(
            n_eclipses=10, complex_spot=True, use_gp=True, n_points=128,
            bands=("g", "r")).compile()
    else:
        model = build_model(
            n_eclipses=5, complex_spot=[False] * 5, n_points=128,
            bands=("g", "r")).compile()
    return model, make_ln_prob(model, dtype=jnp.float32)


def _ess_per_sec(chain, seconds):
    from lfit_python_tpu.utils.chains import autocorr_time

    tau = autocorr_time(chain)
    n_tot = chain.shape[0] * chain.shape[1]
    ess = n_tot / np.maximum(tau, 1.0)
    return {
        "production_s": round(seconds, 2),
        "ess_min": round(float(ess.min()), 1),
        "ess_median": round(float(np.median(ess)), 1),
        "ess_min_per_sec": round(float(ess.min() / seconds), 2),
        "tau_max": round(float(tau.max()), 1),
    }


def run_ensemble(model, ln_prob, n_burn, n_prod, n_walkers=1024):
    import jax
    import jax.numpy as jnp

    from lfit_python_tpu.sampling.ensemble import init_walkers, run_sampler

    start = jnp.asarray(model.var_start(), jnp.float32)
    scatter = jnp.asarray(
        0.001 * np.maximum(np.abs(model.var_start()), 1e-2), jnp.float32)
    state = init_walkers(jax.random.PRNGKey(0), start, scatter, ln_prob,
                         n_walkers)
    t0 = time.perf_counter()
    state, _, _, _ = run_sampler(state, ln_prob, n_burn)   # burn + compile
    warm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, chain, _, acc = run_sampler(state, ln_prob, n_prod)
    dt = time.perf_counter() - t0
    out = {"sampler": "ensemble", "chains": n_walkers,
           "steps": n_prod, "warmup_s": round(warm_s, 2),
           "accept": round(float(np.mean(acc)), 3)}
    out.update(_ess_per_sec(chain, dt))
    return out


def run_gradient(kind, model, ln_prob, n_warm, n_prod, n_chains=256,
                 n_leapfrog=16, max_depth=8, target_accept=None):
    import jax
    import jax.numpy as jnp

    from lfit_python_tpu.sampling.hmc import init_hmc

    start = jnp.asarray(model.var_start(), jnp.float32)
    scatter = jnp.asarray(
        0.001 * np.maximum(np.abs(model.var_start()), 1e-2), jnp.float32)
    state = init_hmc(jax.random.PRNGKey(0), start, scatter, ln_prob,
                     n_chains, step_size=1e-3)
    t0 = time.perf_counter()
    if kind == "hmc":
        from lfit_python_tpu.sampling.hmc import (
            _TARGET_ACCEPT, run_hmc, warmup_hmc)

        # --target-accept < default lets dual averaging settle at a
        # LARGER step size, i.e. a genuinely longer trajectory L*eps —
        # the lever the L-search alone cannot reach (the adapted eps
        # scales ~1/L at fixed target, pinning L*eps constant)
        ta = _TARGET_ACCEPT if target_accept is None else target_accept
        state = warmup_hmc(state, ln_prob, n_warm, n_leapfrog,
                           target_accept=ta)
        jax.block_until_ready(state)
        warm_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, chain, _, acc, div = run_hmc(state, ln_prob, n_prod,
                                            n_leapfrog)
        dt = time.perf_counter() - t0
        extra = {"n_leapfrog": n_leapfrog,
                 "accept": round(float(np.mean(acc)), 3),
                 "divergence_frac": round(float(np.mean(div)), 4),
                 "step_size": float(state.step_size)}
    else:
        from lfit_python_tpu.sampling.nuts import run_nuts, warmup_nuts

        state = warmup_nuts(state, ln_prob, n_warm, max_depth)
        jax.block_until_ready(state)
        warm_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, chain, _, astat, div, depth = run_nuts(state, ln_prob,
                                                      n_prod, max_depth)
        dt = time.perf_counter() - t0
        extra = {"max_depth": max_depth,
                 "mean_depth": round(float(np.mean(depth)), 2),
                 "accept_stat": round(float(np.mean(astat)), 3),
                 "divergence_frac": round(float(np.mean(div)), 4),
                 "step_size": float(state.step_size)}
    out = {"sampler": kind, "chains": n_chains, "steps": n_prod,
           "warmup_s": round(warm_s, 2), **extra}
    out.update(_ess_per_sec(chain, dt))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-scale", type=float, default=1.0,
                    help="scale all step counts (quick smoke: 0.1)")
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["ensemble", "hmc", "nuts"])
    ap.add_argument("--config5", action="store_true",
                    help="run on the BASELINE config-5 posterior "
                         "(10 ecl x complex x GP, ~63 params) instead of "
                         "the 13-param flagship")
    ap.add_argument("--leapfrogs", type=int, nargs="*", default=None,
                    help="HMC trajectory-length search values "
                         "(default: [16] flagship, [4, 8, 16, 32] "
                         "--config5)")
    ap.add_argument("--target-accept", type=float, default=None,
                    help="HMC dual-averaging acceptance target "
                         "(default 0.8); lower = larger adapted step = "
                         "longer trajectory at the same n_leapfrog")
    args = ap.parse_args()
    s = args.steps_scale
    leapfrogs = args.leapfrogs
    if leapfrogs is None:
        leapfrogs = [4, 8, 16, 32] if args.config5 else [16]

    import jax

    # x64-enabled process: XLA compiles a ~30% FASTER executable for the
    # identical f32 posterior (measured in cli.py _fit: 68 vs 91 ms)
    jax.config.update("jax_enable_x64", True)
    from lfit_python_tpu.cli import _enable_compile_cache
    _enable_compile_cache()

    model, ln_prob = _model_and_posterior(args.config5)
    print(json.dumps({"posterior": "config5" if args.config5 else
                      "flagship", "n_var": model.n_var}), flush=True)
    # config-5: the ensemble's natural operating point is 4096 walkers
    # (BASELINE.json configs[4]); higher dimension also means longer
    # autocorrelation times, so the production run is longer to keep the
    # FFT tau estimator in its reliable regime (chain >> tau)
    n_walkers = 4096 if args.config5 else 1024
    ens_prod = int((4000 if args.config5 else 2000) * s)
    rows = []
    if "ensemble" not in args.skip:
        rows.append(run_ensemble(model, ln_prob,
                                 n_burn=int(400 * s), n_prod=ens_prod,
                                 n_walkers=n_walkers))
        print(json.dumps(rows[-1]), flush=True)
    if "hmc" not in args.skip:
        for nl in leapfrogs:
            rows.append(run_gradient("hmc", model, ln_prob,
                                     n_warm=int(300 * s),
                                     n_prod=int(400 * s), n_leapfrog=nl,
                                     target_accept=args.target_accept))
            if args.target_accept is not None:
                rows[-1]["target_accept"] = args.target_accept
            print(json.dumps(rows[-1]), flush=True)
    if "nuts" not in args.skip:
        md = 7 if args.config5 else 8
        rows.append(run_gradient("nuts", model, ln_prob,
                                 n_warm=int((150 if args.config5 else 200)
                                            * s),
                                 n_prod=int((150 if args.config5 else 250)
                                            * s),
                                 max_depth=md))
        print(json.dumps(rows[-1]), flush=True)

    print("\n| sampler | chains | prod steps | prod wall | min ESS | "
          "min ESS/s | notes |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        notes = []
        for k in ("n_leapfrog", "accept", "accept_stat", "mean_depth",
                  "divergence_frac"):
            if k in r:
                notes.append(f"{k}={r[k]}")
        print(f"| {r['sampler']} | {r['chains']} | {r['steps']} | "
              f"{r['production_s']}s | {r['ess_min']} | "
              f"**{r['ess_min_per_sec']}** | {', '.join(notes)} |")


if __name__ == "__main__":
    main()
