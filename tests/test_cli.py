"""CLI end-to-end: the reference workflow `python mcmcfit.py input.dat`
reproduced as `python -m lfit_python_tpu.cli fit input.dat` (SURVEY.md §3.1),
including chain file, checkpoints, resume, params table, and plots."""

import json
from pathlib import Path

import numpy as np
import pytest

# full CLI pipelines: the slow integration tier (>60s each)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def fit_dir(tmp_path_factory):
    from lfit_python_tpu.examples import make_synthetic_lightcurve

    d = tmp_path_factory.mktemp("clifit")
    lc = make_synthetic_lightcurve(n_points=60, noise=0.003, seed=1)
    np.savetxt(d / "ecl0.txt",
               np.column_stack([lc.phase, lc.flux, lc.err]))
    (d / "mcmc_input.dat").write_text("""
nwalkers = 32
nburn = 12
nprod = 16
neclipses = 1
complex = 0
useGP = 0
scatter_1 = 0.0005

file_0 = ecl0.txt
band_0 = g

q_core    = 0.15  uniform 0.03 3.0  1
dphi_core = 0.04  uniform 0.01 0.2  1
rwd_core  = 0.01  uniform 0.0005 0.1 1
wdFlux_g = 0.1  uniform 0 1 1
rsFlux_g = 0.03 uniform 0 1 1
ulimb_g  = 0.3  gauss 0.3 0.05 0
dFlux_0 = 0.05 uniform 0 1 1
sFlux_0 = 0.08 uniform 0 1 1
rdisc_0 = 0.44 uniform 0.2 0.9 1
scale_0 = 0.02 log_uniform 1e-4 0.5 1
az_0    = 160  uniform 50 175 1
fis_0   = 0.2  uniform 0 1 1
dexp_0  = 1.5  uniform 0 3 1
phi0_0  = 0.0  uniform -0.05 0.05 1
""")
    return d


class TestFitCLI:
    def test_full_fit_pipeline(self, fit_dir):
        from lfit_python_tpu.cli import main

        out = fit_dir / "out"
        rc = main(["fit", str(fit_dir / "mcmc_input.dat"),
                   "--outdir", str(out), "--quiet", "--resolution", "low",
                   "--checkpoint-every", "8"])
        assert rc == 0
        # chain file exists, parses, has the right shape
        from lfit_python_tpu.utils.chains import read_chain
        chain, lnp, names = read_chain(out / "chain_prod.txt")
        assert chain.shape == (16, 32, 13)
        assert np.isfinite(lnp).all()
        # params table
        table = json.loads((out / "params.json").read_text())
        got = {r["name"]: r["median"] for r in table}
        assert got["q_core"] == pytest.approx(0.15, abs=0.05)
        # checkpoints + plots
        assert (out / "checkpoint_0000016.npz").exists()
        assert (out / "corner.png").exists()
        # per-node corners: core / band g / eclipse ecl0
        assert (out / "corner_core.png").exists()
        assert (out / "corner_g.png").exists()
        assert (out / "corner_ecl0.png").exists()
        assert (out / "eclipse_0.png").exists()
        assert (out / "metrics.jsonl").stat().st_size > 0

    def test_resume_continues(self, fit_dir):
        from lfit_python_tpu.cli import main

        out = fit_dir / "out"  # has checkpoints from the previous test
        rc = main(["fit", str(fit_dir / "mcmc_input.dat"),
                   "--outdir", str(out), "--quiet", "--resume",
                   "--resolution", "low",
                   "--nprod", "24", "--no-plots",
                   "--checkpoint-every", "8"])
        assert rc == 0
        assert (out / "checkpoint_0000024.npz").exists()
        # resume must APPEND: the 16 pre-resume production steps stay in
        # the chain file alongside the 8 new ones (ADVICE round 2: the
        # writer used to truncate on resume, losing everything pre-crash)
        from lfit_python_tpu.utils.chains import read_chain
        chain, lnp, _ = read_chain(out / "chain_prod.txt")
        assert chain.shape == (24, 32, 13)
        assert np.isfinite(lnp).all()

    def test_resume_kind_mismatch_rejected(self, fit_dir):
        from lfit_python_tpu.cli import main

        out = fit_dir / "out"  # ensemble checkpoints from the tests above
        inp = (fit_dir / "mcmc_input.dat").read_text()
        pt_inp = fit_dir / "mcmc_input_pt_mismatch.dat"
        pt_inp.write_text(inp + "\nusePT = 1\nntemps = 3\n")
        rc = main(["fit", str(pt_inp), "--outdir", str(out), "--quiet",
                   "--resume", "--resolution", "low", "--no-plots"])
        assert rc == 2


class TestHMCCLI:
    def test_hmc_fit_runs(self, fit_dir):
        """--sampler hmc: gradient-based fit end-to-end (warmup + prod +
        chain + checkpoints). No reference counterpart — the capability
        the differentiable posterior adds."""
        from lfit_python_tpu.cli import main

        out = fit_dir / "out_hmc"
        rc = main(["fit", str(fit_dir / "mcmc_input.dat"),
                   "--outdir", str(out), "--quiet", "--sampler", "hmc",
                   "--hmc-leapfrog", "4", "--nburn", "10", "--nprod", "8",
                   "--no-plots", "--resolution", "low",
                   "--checkpoint-every", "4"])
        assert rc == 0
        from lfit_python_tpu.utils.chains import read_chain
        chain, lnp, names = read_chain(out / "chain_prod.txt")
        assert chain.shape == (8, 32, 13)
        assert np.isfinite(lnp).all()
        assert (out / "checkpoint_0000008.npz").exists()
        # checkpoint carries the adapted HMC state
        from lfit_python_tpu.sampling.hmc import HMCState
        from lfit_python_tpu.utils.checkpoints import load_checkpoint
        state, _ = load_checkpoint(out / "checkpoint_0000008.npz")
        assert isinstance(state, HMCState)
        assert float(state.step_size) > 0.0
        assert state.inv_mass.shape == (13,)

    def test_hmc_gp_fit_runs(self, fit_dir):
        """--sampler hmc on a useGP input: the round-4 CONFIRMED-bug
        combination — GP hyperparameter priors are uniform(lo, 0), whose
        p2 = 0 used to NaN the gauss row's VJP and with it every leapfrog
        gradient.  End-to-end: warmup + production with finite chain
        log-probs."""
        from lfit_python_tpu.cli import main

        inp = (fit_dir / "mcmc_input.dat").read_text().replace(
            "useGP = 0", "useGP = 1")
        inp += ("ln_ampin_gp_0 = -8 uniform -20 0 1\n"
                "ln_ampout_gp_0 = -9 uniform -20 0 1\n"
                "ln_tau_gp_0 = -5 uniform -10 0 1\n")
        gp_inp = fit_dir / "mcmc_input_gp.dat"
        gp_inp.write_text(inp)
        out = fit_dir / "out_hmc_gp"
        rc = main(["fit", str(gp_inp), "--outdir", str(out), "--quiet",
                   "--sampler", "hmc", "--hmc-leapfrog", "4",
                   "--nburn", "10", "--nprod", "8", "--no-plots",
                   "--resolution", "low"])
        assert rc == 0
        from lfit_python_tpu.utils.chains import read_chain
        chain, lnp, names = read_chain(out / "chain_prod.txt")
        assert chain.shape == (8, 32, 16)
        assert "ln_tau_gp_ecl0" in names
        assert np.isfinite(lnp).all()

    def test_hmc_resume_kind_guard(self, fit_dir):
        import jax
        import jax.numpy as jnp

        from lfit_python_tpu.cli import main
        from lfit_python_tpu.sampling.ensemble import init_walkers
        from lfit_python_tpu.utils.checkpoints import save_checkpoint

        # a fresh outdir holding an ENSEMBLE checkpoint: --sampler hmc
        # must refuse to resume across sampler kinds
        out = fit_dir / "out_kind_mismatch"
        out.mkdir(exist_ok=True)
        state = init_walkers(jax.random.PRNGKey(0), jnp.zeros(2),
                             jnp.ones(2), lambda x: -jnp.sum(x * x), 8)
        save_checkpoint(out / "checkpoint_0000004.npz", state)
        rc = main(["fit", str(fit_dir / "mcmc_input.dat"),
                   "--outdir", str(out), "--quiet", "--sampler", "hmc",
                   "--resume", "--resolution", "low", "--no-plots"])
        assert rc == 2

    def test_hmc_flag_conflicts(self, fit_dir):
        from lfit_python_tpu.cli import main

        args = ["fit", str(fit_dir / "mcmc_input.dat"), "--outdir",
                str(fit_dir / "x"), "--sampler", "hmc", "--quiet"]
        assert main(args + ["--precise"]) == 2

    def test_hmc_sharded_fit_runs(self, fit_dir):
        """--sampler hmc --shard: chain-axis data parallelism over the
        8-device virtual mesh through the full CLI path (warmup, chunked
        production, checkpoints)."""
        from lfit_python_tpu.cli import main

        out = fit_dir / "out_hmc_shard"
        rc = main(["fit", str(fit_dir / "mcmc_input.dat"),
                   "--outdir", str(out), "--quiet", "--sampler", "hmc",
                   "--hmc-leapfrog", "4", "--nburn", "10", "--nprod", "8",
                   "--no-plots", "--resolution", "low", "--shard",
                   "--checkpoint-every", "8"])
        assert rc == 0
        from lfit_python_tpu.utils.chains import read_chain
        chain, lnp, names = read_chain(out / "chain_prod.txt")
        assert chain.shape == (8, 32, 13)
        assert np.isfinite(lnp).all()


class TestNUTSCLI:
    def test_nuts_fit_runs(self, fit_dir):
        """--sampler nuts: adaptive-trajectory gradient fit end-to-end."""
        from lfit_python_tpu.cli import main

        out = fit_dir / "out_nuts"
        rc = main(["fit", str(fit_dir / "mcmc_input.dat"),
                   "--outdir", str(out), "--quiet", "--sampler", "nuts",
                   "--nuts-max-depth", "3", "--nburn", "10", "--nprod",
                   "8", "--no-plots", "--resolution", "low",
                   "--checkpoint-every", "4"])
        assert rc == 0
        from lfit_python_tpu.utils.chains import read_chain
        chain, lnp, names = read_chain(out / "chain_prod.txt")
        assert chain.shape == (8, 32, 13)
        assert np.isfinite(lnp).all()
        from lfit_python_tpu.sampling.hmc import HMCState
        from lfit_python_tpu.utils.checkpoints import load_checkpoint
        state, meta = load_checkpoint(out / "checkpoint_0000008.npz")
        assert isinstance(state, HMCState)
        assert meta.get("kind") == "nuts"

    def test_nuts_refuses_hmc_checkpoint(self, fit_dir):
        """Same HMCState layout, different kernel: resuming an hmc
        checkpoint under --sampler nuts must be refused by the saved
        ``kind`` field."""
        from lfit_python_tpu.cli import main

        out = fit_dir / "out_hmc"      # produced by test_hmc_fit_runs
        if not (out / "checkpoint_0000008.npz").exists():
            import pytest
            pytest.skip("hmc checkpoint fixture missing")
        rc = main(["fit", str(fit_dir / "mcmc_input.dat"),
                   "--outdir", str(out), "--quiet", "--sampler", "nuts",
                   "--resume", "--resolution", "low", "--no-plots"])
        assert rc == 2


class TestPTCLI:
    def test_pt_fit_runs(self, fit_dir):
        from lfit_python_tpu.cli import main

        # enable PT in a copy of the input
        inp = (fit_dir / "mcmc_input.dat").read_text()
        pt_inp = fit_dir / "mcmc_input_pt.dat"
        pt_inp.write_text(inp + "\nusePT = 1\nntemps = 3\n")
        out = fit_dir / "out_pt"
        rc = main(["fit", str(pt_inp), "--outdir", str(out), "--quiet",
                   "--nburn", "6", "--nprod", "8", "--no-plots",
                   "--resolution", "low",
                   "--notify-file", str(out / "done.jsonl")])
        assert rc == 0
        from lfit_python_tpu.utils.chains import read_chain
        chain, lnp, names = read_chain(out / "chain_prod.txt")
        assert chain.shape == (8, 32, 13)
        assert np.isfinite(lnp).all()
        # notifier fired
        assert (out / "done.jsonl").exists()
        # thermodynamic-integration evidence written from the ladder
        import json
        ev = json.loads((out / "evidence.json").read_text())
        assert np.isfinite(ev["ln_evidence"])
        assert len(ev["mean_ln_like_per_rung"]) == 3
