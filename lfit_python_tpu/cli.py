"""Command-line driver (L5): the reference's ``mcmcfit.py`` equivalent.

Usage:
    python -m lfit_python_tpu.cli fit mcmc_input.dat [--outdir out] [...]
    python -m lfit_python_tpu.cli wdparams wd_input.dat [...]

Reference call stack (SURVEY.md §3.1): parse input -> build tree -> walker
ball -> burn-in [-> second burn] -> production with incremental chain
writing -> percentile table + plots.  Reproduced here with the on-device
sampler; additions over the reference: first-class checkpoint/resume
(--resume), structured JSONL metrics, and device-mesh sharding (--shard).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache: repeat runs (and resume) skip the
    multi-minute TPU compiles.

    The cache directory is keyed by a fingerprint of the HOST CPU: cached
    XLA:CPU executables are AOT-compiled against the compiling host's
    exact ISA feature set, and this box's sessions land on heterogeneous
    hosts — loading an AOT result built for a different feature set risks
    SIGILL.  A per-host-type directory makes every load ISA-matched; TPU
    executables are host-agnostic and simply re-cache once per host type.
    (NB the loader's "machine feature mismatch ... SIGILL" warning fires
    even for same-host entries: the only mismatched "features" are
    +prefer-no-scatter/+prefer-no-gather, XLA tuning pseudo-features that
    LLVM host detection never reports.  The warning alone is not evidence
    of a cross-host load.)

    Under pytest the cache stays OFF: in-process CLI-fit tests would
    switch it on for the remainder of the suite, and two independent
    full-suite segfaults (faulthandler dumps 2026-08-19) landed inside
    the cache write/compile path of XLA:CPU executables — while CPU
    test compiles are fast enough that the cache buys nothing there.
    """
    import hashlib
    import os
    import platform

    import jax

    if "PYTEST_CURRENT_TEST" in os.environ:
        return
    try:
        flags = ""
        try:
            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.startswith("flags"):
                        flags = line
                        break
        except OSError:
            pass
        tag = hashlib.sha1(
            (platform.machine() + flags).encode()).hexdigest()[:10]
        cache = Path.home() / ".cache" / f"lfit_python_tpu_xla_{tag}"
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def _fit(args):
    import math

    import jax
    import jax.numpy as jnp

    _enable_compile_cache()
    # x64 stays enabled even for the f32 fast path: every array dtype in
    # the framework is explicit, --precise/--x64 need f64 available, and
    # (measured, v5e) XLA compiles a ~30% FASTER executable for the
    # identical f32 posterior under an x64-enabled process (68 vs 91 ms
    # north-star config) — bank the compiler accident
    jax.config.update("jax_enable_x64", True)

    from .models.cv import CVConfig
    from .models.likelihood import make_ln_prob
    from .parallel.mesh import (
        shard_state, sharded_batch_ln_prob, walker_mesh)
    from .sampling.ensemble import init_walkers, run_sampler
    from .utils.chains import ChainWriter, gelman_rubin, summarize
    from .utils.checkpoints import load_checkpoint, save_checkpoint
    from .utils.config import build_model_from_config, parse_input_dat
    from .utils.plotting import corner_plot, plot_eclipse

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    cfg = parse_input_dat(args.input)
    model = build_model_from_config(cfg).compile()
    dtype = jnp.float64 if args.x64 else jnp.float32
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    # element-grid fidelity: 'full' matches the reference's ~1000-element
    # tiling; 'low' is for quick looks and CI
    cvcfg = (CVConfig() if args.resolution == "full"
             else CVConfig(n_disc_rad=5, n_disc_az=8, n_spot=8,
                           n_donor_lat=6, n_donor_lon=8))
    if args.precise:
        cvcfg = cvcfg._replace(mixed_precision=True)
    if args.pallas:
        if args.precise or args.x64:
            # the Mosaic contact kernel is f32-only (models/cv.py gates on
            # f32 + mixed_precision off) — refuse rather than silently
            # running the XLA path the user tried to opt out of
            ap_err = ("--pallas is incompatible with --precise/--x64: the "
                      "Mosaic contact kernel is f32-only; drop one flag")
            print(ap_err, file=sys.stderr)
            return 2
        cvcfg = cvcfg._replace(pallas_contacts=True)
    elif args.no_pallas:
        cvcfg = cvcfg._replace(pallas_contacts=False)
    if args.sampler in ("hmc", "nuts"):
        # gradient samplers differentiate the posterior: the --precise
        # refinement path is primal-only by design, so it is incompatible
        # rather than silently wrong.  The Pallas contact kernel IS
        # differentiable (contacts_op_diff carries IFT tangents), so
        # --pallas and the TPU auto-default both work under jax.grad.
        if args.precise:
            print(f"--sampler {args.sampler} is incompatible with "
                  "--precise (that path is not differentiable); drop one "
                  "flag", file=sys.stderr)
            return 2
        if bool(cfg.get("usePT", False)):
            print(f"--sampler {args.sampler} ignores usePT (no tempered "
                  "ladder); unset usePT or use the default ensemble "
                  "sampler", file=sys.stderr)
            return 2
    ln_prob = make_ln_prob(model, config=cvcfg, dtype=dtype)
    use_pt = bool(cfg.get("usePT", False))

    n_walkers = int(cfg.get("nwalkers", 64))
    n_burn = args.nburn if args.nburn is not None else int(cfg.get("nburn", 100))
    n_prod = args.nprod if args.nprod is not None else int(cfg.get("nprod", 100))
    # one scan length for every stage -> exactly one compiled step program
    # (each distinct chunk length would otherwise compile its own scan)
    ckpt0 = max(args.checkpoint_every, 1)
    chunk = math.gcd(math.gcd(n_burn or ckpt0, n_prod or ckpt0), ckpt0)
    if chunk < 8:
        chunk = 64
    scatter_1 = float(cfg.get("scatter_1", 1e-3))
    scatter_2 = float(cfg.get("scatter_2", scatter_1))
    thin = int(cfg.get("thin", 1))

    start = jnp.asarray(model.var_start(), dtype)
    # per-parameter scatter fractions (reference comp_scat [R-med]); off ->
    # uniform unit fractions, exactly the reference's plain scatter_1 ball
    comp_mult = (jnp.asarray(model.var_scatter(), dtype)
                 if bool(cfg.get("comp_scat", False))
                 else jnp.ones_like(start))
    scatter = scatter_1 * comp_mult * jnp.maximum(jnp.abs(start), 1e-2)
    metrics = (outdir / "metrics.jsonl").open("a")

    def log(stage, step, acc):
        rec = {"t": time.time(), "stage": stage, "step": step,
               "accept": round(float(acc), 4)}
        metrics.write(json.dumps(rec) + "\n")
        metrics.flush()
        if not args.quiet:
            print(f"[{stage}] step {step} accept={acc:.3f}", flush=True)

    if use_pt:
        # parallel-tempered path (reference usePT/ntemps [R-low]):
        # tempering applies to the likelihood only.  Feature parity with
        # the untempered path: sharding, burn metrics, incremental chain
        # writing, checkpoint/resume (VERDICT round-1 item 7).
        from .models.likelihood import make_ln_prob_parts
        from .parallel.mesh import shard_pt_state, sharded_pt_batch_parts
        from .sampling.pt import init_pt, run_pt

        ln_prior_fn, ln_like_fn, _ = make_ln_prob_parts(
            model, config=cvcfg, dtype=dtype)
        n_temps = int(cfg.get("ntemps", 4))
        t0 = time.time()

        resume_from = None
        if args.resume:
            from .utils.checkpoints import latest_checkpoint
            resume_from = latest_checkpoint(outdir)
        if resume_from:
            from .sampling.pt import PTState
            ptstate, _ = load_checkpoint(resume_from)
            if not isinstance(ptstate, PTState):
                print(f"{resume_from} is an untempered (ensemble) "
                      "checkpoint but this input sets usePT; refusing to "
                      "resume across sampler kinds", file=sys.stderr)
                return 2
            print(f"resumed from {resume_from} at step {int(ptstate.step)}")
        else:
            ptstate = init_pt(jax.random.PRNGKey(args.seed), start, scatter,
                              ln_prior_fn, ln_like_fn, n_walkers, n_temps)

        batch_parts = None
        if args.shard:
            mesh = walker_mesh()
            ptstate = shard_pt_state(ptstate, mesh)
            batch_parts = sharded_pt_batch_parts(
                ln_prior_fn, ln_like_fn, mesh)

        if not resume_from and n_burn > 0:
            ptstate, _, _, _, _ = run_pt(
                ptstate, ln_prior_fn, ln_like_fn, n_burn, chunk_size=chunk,
                batch_parts_fn=batch_parts,
                progress=lambda s, a: log("burn", s, a))
            ptstate = ptstate._replace(step=jnp.asarray(0, jnp.int32))

        writer = ChainWriter(outdir / "chain_prod.txt", model.var_names(),
                             append=bool(resume_from))
        ckpt_every = max(args.checkpoint_every, 1)
        done = int(ptstate.step)
        all_chain, all_lp, all_rung_ll = [], [], []
        while done < n_prod:
            n = min(ckpt_every, n_prod - done)
            ptstate, chain, lp, acc, rung_ll = run_pt(
                ptstate, ln_prior_fn, ln_like_fn, n, thin=thin,
                chunk_size=chunk, batch_parts_fn=batch_parts,
                progress=lambda s, a: log("prod", done + s, a))
            writer.append(chain, lp)
            all_chain.append(chain)
            all_lp.append(lp)
            all_rung_ll.append(rung_ll)
            done += n
            save_checkpoint(outdir / f"checkpoint_{done:07d}.npz", ptstate,
                            {"input": str(args.input), "stage": "prod",
                             "kind": "pt"})
        writer.close()
        if resume_from:
            # pre-crash segments live only in the chain file; report over
            # the full run, not just the post-resume tail
            from .utils.chains import read_chain
            chain, lp, _ = read_chain(outdir / "chain_prod.txt")
        else:
            chain = np.concatenate(all_chain) if all_chain else np.empty(
                (0, n_walkers, model.n_var))
            lp = np.concatenate(all_lp) if all_lp else np.empty(
                (0, n_walkers))
        dt = time.time() - t0
        n_evals = (n_burn + n_prod) * n_walkers * n_temps
        print(f"PT ({n_temps} rungs) total {dt:.1f}s, "
              f"~{n_evals / max(dt, 1e-9):.0f} ln-prob evals/s")
        if all_rung_ll:
            # evidence from the ladder (thermodynamic integration) — a
            # byproduct the reference-family PT runs also exposed via
            # emcee's PTSampler [R-med]
            from .sampling.pt import log_evidence
            mean_ll = np.concatenate(all_rung_ll).mean(axis=0)
            ln_z, dln_z = log_evidence(np.asarray(ptstate.betas), mean_ll)
            (outdir / "evidence.json").write_text(json.dumps({
                "ln_evidence": ln_z, "dln_evidence": dln_z,
                "betas": np.asarray(ptstate.betas).tolist(),
                "mean_ln_like_per_rung": mean_ll.tolist(),
                "note": ("thermodynamic integration over the production "
                         "ladder; dln = full vs half-ladder difference"),
            }, indent=1))
            print(f"ln evidence (thermodynamic integration): "
                  f"{ln_z:.3f} +- {dln_z:.3f}")
        _report(model, chain, lp, outdir, args)
        _notify_done(args, cfg, outdir)
        return 0

    if args.sampler in ("hmc", "nuts"):
        # gradient-based paths: no reference counterpart (emcee-only); the
        # IFT-differentiable posterior makes them possible here.  n_burn
        # doubles as the adaptive warmup length (step size + diagonal
        # metric); double_burnin/scatter_2 do not apply.
        from .sampling.hmc import HMCState, init_hmc, run_hmc, warmup_hmc
        from .sampling.nuts import run_nuts, warmup_nuts

        kind = args.sampler
        traj_fn = None
        if args.shard:
            # chain-axis data parallelism over the device mesh: chains
            # never interact, so each device integrates its own block
            # (parallel/mesh.py; SURVEY.md §5.8 — the walker axis is this
            # workload's only parallel axis)
            from .parallel.mesh import (
                shard_hmc_state, sharded_hmc_trajectories,
                sharded_nuts_trajectories, walker_mesh)

            mesh = walker_mesh()
            if kind == "nuts":
                traj_fn = sharded_nuts_trajectories(
                    ln_prob, mesh, max_depth=args.nuts_max_depth)
            else:
                traj_fn = sharded_hmc_trajectories(
                    ln_prob, mesh, n_leapfrog=args.hmc_leapfrog)
        resume_from = None
        if args.resume:
            from .utils.checkpoints import latest_checkpoint
            resume_from = latest_checkpoint(outdir)
        if resume_from:
            state, meta = load_checkpoint(resume_from)
            if not isinstance(state, HMCState):
                print(f"{resume_from} is not an HMC/NUTS checkpoint; "
                      "refusing to resume across sampler kinds",
                      file=sys.stderr)
                return 2
            ck_kind = (meta or {}).get("kind", kind)
            if ck_kind != kind:
                print(f"{resume_from} is a {ck_kind} checkpoint but "
                      f"--sampler is {kind}; refusing to resume across "
                      "sampler kinds", file=sys.stderr)
                return 2
            print(f"resumed from {resume_from} at step {int(state.step)}")
            if args.shard:
                state = shard_hmc_state(state, mesh)
        else:
            state = init_hmc(jax.random.PRNGKey(args.seed), start, scatter,
                             ln_prob, n_walkers)
            if args.shard:
                state = shard_hmc_state(state, mesh)
            t_w = time.time()
            if kind == "nuts":
                state = warmup_nuts(state, ln_prob, n_burn,
                                    max_depth=args.nuts_max_depth,
                                    traj_batch_fn=traj_fn)
            else:
                state = warmup_hmc(state, ln_prob, n_burn,
                                   n_leapfrog=args.hmc_leapfrog,
                                   traj_batch_fn=traj_fn)
            log("warmup", n_burn, 0.0)
            if not args.quiet:
                print(f"warmup {time.time() - t_w:.1f}s: step_size="
                      f"{float(state.step_size):.3e}")

        t0 = time.time()
        writer = ChainWriter(outdir / "chain_prod.txt", model.var_names(),
                             append=bool(resume_from))
        ckpt_every = max(args.checkpoint_every, 1)
        done = int(state.step)
        all_chain, all_lp = [], []
        depth_note = ""
        while done < n_prod:
            n = min(ckpt_every, n_prod - done)
            if kind == "nuts":
                state, chain, chain_lp, acc, div, depth = run_nuts(
                    state, ln_prob, n, max_depth=args.nuts_max_depth,
                    thin=thin, chunk_size=chunk,
                    progress=lambda s, a: log("prod", done + s, a),
                    traj_batch_fn=traj_fn)
                depth_note = f", mean depth {float(np.mean(depth)):.1f}"
            else:
                state, chain, chain_lp, acc, div = run_hmc(
                    state, ln_prob, n, n_leapfrog=args.hmc_leapfrog,
                    thin=thin, chunk_size=chunk,
                    progress=lambda s, a: log("prod", done + s, a),
                    traj_batch_fn=traj_fn)
            writer.append(chain, chain_lp)
            all_chain.append(chain)
            all_lp.append(chain_lp)
            done += n
            if float(np.mean(div)) > 0.02 and not args.quiet:
                print(f"warning: {100 * float(np.mean(div)):.1f}% "
                      "divergent trajectories; results may be biased",
                      file=sys.stderr)
            save_checkpoint(outdir / f"checkpoint_{done:07d}.npz", state,
                            {"input": str(args.input), "stage": "prod",
                             "kind": kind})
        writer.close()
        if resume_from:
            from .utils.chains import read_chain
            chain, lp, _ = read_chain(outdir / "chain_prod.txt")
        else:
            chain = np.concatenate(all_chain) if all_chain else np.empty(
                (0, n_walkers, model.n_var))
            lp = np.concatenate(all_lp) if all_lp else np.empty(
                (0, n_walkers))
        dt = time.time() - t0
        if kind == "nuts":
            print(f"NUTS total {dt:.1f}s, {n_prod} steps x {n_walkers} "
                  f"chains{depth_note}")
        else:
            n_grad_evals = n_prod * n_walkers * args.hmc_leapfrog
            print(f"HMC total {dt:.1f}s, "
                  f"~{n_grad_evals / max(dt, 1e-9):.0f} gradient evals/s")
        _report(model, chain, lp, outdir, args)
        _notify_done(args, cfg, outdir)
        return 0

    resume_from = None
    if args.resume:
        from .utils.checkpoints import latest_checkpoint
        resume_from = latest_checkpoint(outdir)

    if resume_from:
        from .sampling.ensemble import EnsembleState
        state, meta = load_checkpoint(resume_from)
        if not isinstance(state, EnsembleState):
            print(f"{resume_from} is not an ensemble checkpoint (PT or "
                  "HMC run?); refusing to resume across sampler kinds",
                  file=sys.stderr)
            return 2
        print(f"resumed from {resume_from} at step {int(state.step)}")
    else:
        state = init_walkers(
            jax.random.PRNGKey(args.seed), start, scatter, ln_prob,
            n_walkers)

    batch_fn = None
    if args.shard:
        mesh = walker_mesh()
        state = shard_state(state, mesh)
        batch_fn = sharded_batch_ln_prob(ln_prob, mesh)

    profile_cm = None
    if args.profile:
        from .utils.tracing import trace_to
        profile_cm = trace_to(args.profile)
        profile_cm.__enter__()

    t0 = time.time()
    if not resume_from and n_burn > 0:
        state, chain, chain_lp, acc = run_sampler(
            state, ln_prob, n_burn, batch_fn=batch_fn, chunk_size=chunk,
            progress=lambda s, a: log("burn", s, a))
        if bool(cfg.get("double_burnin", False)):
            # re-scatter around the best walker (reference second burn [R])
            best = chain.reshape(-1, model.n_var)[
                np.argmax(chain_lp.reshape(-1))]
            from .sampling.ensemble import init_walkers as _init
            state = _init(
                state.key, jnp.asarray(best, dtype),
                scatter_2 * comp_mult
                * jnp.maximum(jnp.abs(jnp.asarray(best, dtype)), 1e-2),
                ln_prob, n_walkers)
            if args.shard:
                state = shard_state(state, mesh)
            state, chain, chain_lp, acc = run_sampler(
                state, ln_prob, n_burn, batch_fn=batch_fn, chunk_size=chunk,
                progress=lambda s, a: log("burn2", s, a))

    writer = ChainWriter(outdir / "chain_prod.txt", model.var_names(),
                         append=bool(resume_from))
    ckpt_every = max(args.checkpoint_every, 1)
    if not resume_from:
        # production step count starts at zero (the reference resets the
        # sampler after burn-in [R]); checkpoints store production steps
        state = state._replace(step=jnp.asarray(0, jnp.int32))
    done = int(state.step)
    all_chain, all_lp = [], []
    while done < n_prod:
        n = min(ckpt_every, n_prod - done)
        state, chain, chain_lp, acc = run_sampler(
            state, ln_prob, n, thin=thin, batch_fn=batch_fn,
            chunk_size=chunk,
            progress=lambda s, a: log("prod", done + s, a))
        writer.append(chain, chain_lp)
        all_chain.append(chain)
        all_lp.append(chain_lp)
        done += n
        save_checkpoint(outdir / f"checkpoint_{done:07d}.npz", state,
                        {"input": str(args.input), "stage": "prod"})
    writer.close()
    if profile_cm is not None:
        profile_cm.__exit__(None, None, None)

    if resume_from:
        # pre-crash segments live only in the chain file; report over the
        # full run, not just the post-resume tail
        from .utils.chains import read_chain
        chain, lp, _ = read_chain(outdir / "chain_prod.txt")
    else:
        chain = np.concatenate(all_chain) if all_chain else np.empty(
            (0, n_walkers, model.n_var))
        lp = np.concatenate(all_lp) if all_lp else np.empty((0, n_walkers))
    dt = time.time() - t0
    n_evals = (n_burn + n_prod) * n_walkers
    print(f"total {dt:.1f}s, ~{n_evals / max(dt, 1e-9):.0f} ln-prob evals/s")

    _report(model, chain, lp, outdir, args)
    _notify_done(args, cfg, outdir)
    return 0


def _report(model, chain, lp, outdir, args):
    """Percentile table, convergence diagnostics, plots (reference post-fit
    reporting, SURVEY.md §3.1 tail)."""
    import json as _json

    from .utils.chains import (autocorr_time, gelman_rubin, save_arviz,
                               summarize)
    from .utils.plotting import corner_plot, plot_eclipse

    if not len(chain):
        return
    save_arviz(chain, model.var_names(), outdir / "chains", log_prob=lp)
    discard = len(chain) // 4
    table = summarize(chain, model.var_names(), discard=discard)
    kept = chain[discard:]
    if len(kept) >= 8:
        # effective sample size from the integrated autocorrelation time
        # (FFT windowed estimator): n_eff = steps * walkers / tau
        tau = autocorr_time(kept)
        n_tot = kept.shape[0] * kept.shape[1]
        for row, t in zip(table, tau):
            row["ess"] = float(n_tot / max(t, 1.0))
            row["tau"] = float(t)
    with (outdir / "params.json").open("w") as fh:
        _json.dump(table, fh, indent=1)
    print(f"{'parameter':22s} {'median':>12s} {'+err':>10s} {'-err':>10s}")
    for row in table:
        print(f"{row['name']:22s} {row['median']:12.6g} "
              f"{row['upper']:10.3g} {row['lower']:10.3g}")
    rhat = gelman_rubin(chain, discard=discard)
    print("max split-R-hat:", float(np.max(rhat)))
    if len(kept) >= 8:
        print("min effective sample size:",
              round(min(r["ess"] for r in table)))

    best = chain.reshape(-1, model.n_var)[np.argmax(lp.reshape(-1))]
    full_best = model.full_from_var(best)
    if not args.no_plots:
        flat = chain[len(chain) // 4:].reshape(-1, model.n_var)
        names = model.var_names()
        corner_plot(flat, names, outdir / "corner.png")
        # per-node corners (reference per-node thumbPlot [R-med]): one per
        # tree node keeps the big hierarchical fits readable.  Only when
        # the tree actually has multiple nodes with variable params.
        # max_params=19 > the largest possible node (complex + GP eclipse
        # = 15 params), so per-node corners never truncate — every
        # sampled parameter appears in some corner plot even when the
        # global corner of a ~50-param production fit caps at 12.
        groups = model.var_groups()
        if len(groups) > 1:
            for label, idx in groups:
                corner_plot(flat[:, idx], [names[i] for i in idx],
                            outdir / f"corner_{label}.png", max_params=19)
        for k in range(model.n_eclipses):
            if not model.plot_mask[k]:       # reference plot_<i> = 0 [R-med]
                continue
            plot_eclipse(model, full_best, k,
                         path=outdir / f"eclipse_{k}.png")


def _notify_done(args, cfg, outdir):
    """Completion notification (reference optional notifier [R-low])."""
    if not (args.notify_cmd or args.notify_file or cfg.get("notify")):
        return
    from .utils.notify import notify

    notify(
        f"lfit_python_tpu fit finished: {args.input}",
        f"results in {outdir}",
        cmd=args.notify_cmd,
        file=args.notify_file or (outdir / "notifications.jsonl"
                                  if cfg.get("notify") else None),
    )


def _wdparams(args):
    from .post.wdparams import run_wdparams
    return run_wdparams(args)


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="lfit_python_tpu",
        description="TPU-native eclipsing-CV light-curve fitting")
    sub = ap.add_subparsers(dest="cmd", required=True)

    fit = sub.add_parser("fit", help="run an MCMC fit from an input.dat")
    fit.add_argument("input")
    fit.add_argument("--outdir", default="out")
    fit.add_argument("--seed", type=int, default=0)
    fit.add_argument("--nburn", type=int, default=None,
                     help="override input-file nburn")
    fit.add_argument("--nprod", type=int, default=None)
    fit.add_argument("--sampler", choices=("ensemble", "hmc", "nuts"),
                     default="ensemble",
                     help="ensemble = affine-invariant stretch move "
                     "(reference-equivalent); hmc = gradient-based HMC "
                     "with adaptive warmup; nuts = No-U-Turn sampler "
                     "with adaptive trajectory length (no reference "
                     "counterpart for either)")
    fit.add_argument("--hmc-leapfrog", type=int, default=16,
                     help="leapfrog steps per HMC trajectory")
    fit.add_argument("--nuts-max-depth", type=int, default=8,
                     help="max tree doublings per NUTS trajectory "
                          "(worst case 2^depth gradient evals)")
    fit.add_argument("--x64", action="store_true",
                     help="float64 evaluation (CPU oracle mode)")
    fit.add_argument("--precise", action="store_true",
                     help="mixed-precision mode: f32 speed with f64 scalar"
                          " geometry + near-root clearances (meets the"
                          " 1e-6 flux-parity gate, ~1.5-2x slower)")
    fit.add_argument("--pallas", action="store_true",
                     help="force the Pallas/Mosaic contact kernel ON"
                          " (default: auto — ON on TPU, OFF elsewhere)")
    fit.add_argument("--no-pallas", action="store_true",
                     help="force the XLA contact solver even on TPU")
    fit.add_argument("--shard", action="store_true",
                     help="shard walkers over all visible devices")
    fit.add_argument("--resume", action="store_true",
                     help="resume from the latest checkpoint in outdir")
    fit.add_argument("--checkpoint-every", type=int, default=500)
    fit.add_argument("--resolution", choices=("full", "low"),
                     default="full",
                     help="element-grid fidelity (low: quick looks/CI)")
    fit.add_argument("--no-plots", action="store_true")
    fit.add_argument("--quiet", action="store_true")
    fit.add_argument("--profile", default=None, metavar="DIR",
                     help="capture a jax.profiler device trace to DIR")
    fit.add_argument("--notify-cmd", default=None,
                     help="shell command to notify on completion")
    fit.add_argument("--notify-file", default=None,
                     help="append a JSON completion record to this file")
    fit.set_defaults(func=_fit)

    wd = sub.add_parser("wdparams",
                        help="fit WD atmosphere params to fitted fluxes")
    wd.add_argument("input")
    wd.add_argument("--outdir", default="out_wd")
    wd.add_argument("--grid", default=None,
                    help="path to a Bergeron-format DA grid table")
    wd.add_argument("--seed", type=int, default=0)
    wd.add_argument("--nburn", type=int, default=500)
    wd.add_argument("--nprod", type=int, default=1000)
    wd.add_argument("--nwalkers", type=int, default=64)
    wd.set_defaults(func=_wdparams)

    args = ap.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
