"""Sampler statistical tests (SURVEY.md §4 "Sampler tests"): recover the
moments of known targets, acceptance-rate bands, init rejection bounds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfit_python_tpu.sampling.ensemble import (
    EnsembleState,
    ensemble_step,
    init_walkers,
    run_sampler,
)


class TestGaussianTarget:
    @pytest.mark.slow
    def test_recovers_moments(self):
        cov = np.array([[2.0, 0.6], [0.6, 0.5]])
        icov = jnp.asarray(np.linalg.inv(cov))
        mean = jnp.asarray([1.0, -2.0])

        def ln_prob(x):
            d = x - mean
            return -0.5 * d @ icov @ d

        key = jax.random.PRNGKey(0)
        state = init_walkers(key, mean, 0.1 * jnp.ones(2), ln_prob, 64)
        # burn
        state, chain, chain_lp, acc = run_sampler(state, ln_prob, 400)
        state, chain, chain_lp, acc = run_sampler(state, ln_prob, 1200)
        flat = chain.reshape(-1, 2)
        got_mean = flat.mean(axis=0)
        got_cov = np.cov(flat.T)
        np.testing.assert_allclose(got_mean, np.asarray(mean), atol=0.08)
        np.testing.assert_allclose(got_cov, cov, rtol=0.15, atol=0.05)
        # healthy stretch-move acceptance on a 2-d Gaussian
        assert 0.3 < acc.mean() < 0.9

    def test_chain_shapes_and_thinning(self):
        def ln_prob(x):
            return -0.5 * jnp.sum(x * x)

        key = jax.random.PRNGKey(1)
        state = init_walkers(key, jnp.zeros(3), jnp.ones(3), ln_prob, 32)
        state, chain, chain_lp, acc = run_sampler(
            state, ln_prob, 100, thin=10, chunk_size=32)
        assert chain.shape == (10, 32, 3)
        assert chain_lp.shape == (10, 32)
        assert acc.shape == (100,)
        assert int(state.step) == 100

    def test_thin_phase_spans_segments(self):
        # the CLI calls run_sampler once per checkpoint segment; thinning
        # must be anchored to the global step counter so kept-sample
        # spacing stays regular across segment boundaries (ADVICE round 2)
        def ln_prob(x):
            return -0.5 * jnp.sum(x * x)

        key = jax.random.PRNGKey(7)
        state = init_walkers(key, jnp.zeros(2), jnp.ones(2), ln_prob, 16)
        state, c1, _, _ = run_sampler(state, ln_prob, 25, thin=10,
                                      chunk_size=8)
        state, c2, _, _ = run_sampler(state, ln_prob, 25, thin=10,
                                      chunk_size=8)
        # global keeps at steps 10,20 | 30,40,50 -> 2 + 3 = 5 = 50/10
        assert len(c1) == 2 and len(c2) == 3
        assert int(state.step) == 50

    def test_on_device_thinning_bitwise(self):
        # thin > 1 runs through the nested keep-last scan (on-device
        # thinning, no full-rate HBM stacking); it must be BITWISE the
        # thin=1 chain sliced, including a misaligned starting phase
        def ln_prob(x):
            return -0.5 * jnp.sum(x * x)

        def run(thin):
            state = init_walkers(
                jax.random.PRNGKey(3), jnp.zeros(2), jnp.ones(2),
                ln_prob, 16)
            # misalign the phase: 5 prelude steps before the thinned run
            state, _, _, _ = run_sampler(state, ln_prob, 5)
            return run_sampler(state, ln_prob, 32, thin=thin,
                               chunk_size=12)

        state1, full, full_lp, acc1 = run(1)
        state3, thinned, thinned_lp, acc3 = run(3)
        # global keeps: steps 6,9,...,36 -> rows 0,3,...,30 of the full
        np.testing.assert_array_equal(thinned, full[0::3])
        np.testing.assert_array_equal(thinned_lp, full_lp[0::3])
        np.testing.assert_array_equal(acc1, acc3)
        np.testing.assert_array_equal(np.asarray(state1.positions),
                                      np.asarray(state3.positions))

    def test_deterministic_given_key(self):
        def ln_prob(x):
            return -0.5 * jnp.sum(x * x)

        outs = []
        for _ in range(2):
            state = init_walkers(
                jax.random.PRNGKey(7), jnp.zeros(2), jnp.ones(2), ln_prob, 16)
            state, chain, _, _ = run_sampler(state, ln_prob, 20)
            outs.append(chain)
        np.testing.assert_array_equal(outs[0], outs[1])


class TestRosenbrock:
    def test_explores_banana(self):
        def ln_prob(x):
            return -(100.0 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2) / 20.0

        key = jax.random.PRNGKey(2)
        state = init_walkers(key, jnp.asarray([1.0, 1.0]),
                             0.2 * jnp.ones(2), ln_prob, 64)
        state, chain, _, acc = run_sampler(state, ln_prob, 2000)
        flat = chain[500:].reshape(-1, 2)
        # the Rosenbrock ridge: x1 spans a wide range, mean near ~1-2
        assert flat[:, 0].std() > 0.5
        assert acc.mean() > 0.15


class TestInitWalkers:
    def test_rejection_respects_support(self):
        # hard wall at x > 0: all walkers must start strictly inside
        def ln_prob(x):
            return jnp.where(jnp.all(x > 0), -0.5 * jnp.sum(x * x), -jnp.inf)

        state = init_walkers(
            jax.random.PRNGKey(3),
            jnp.asarray([0.05, 0.05]),        # near the wall: many redraws
            jnp.asarray([0.1, 0.1]),
            ln_prob, 128)
        assert bool(jnp.all(jnp.isfinite(state.log_prob)))
        assert bool(jnp.all(state.positions > 0))

    def test_walker_spread_matches_scatter(self):
        def ln_prob(x):
            return -0.5 * jnp.sum(x * x)

        scatter = jnp.asarray([0.01, 0.5])
        state = init_walkers(
            jax.random.PRNGKey(4), jnp.zeros(2), scatter, ln_prob, 512)
        stds = np.asarray(state.positions).std(axis=0)
        np.testing.assert_allclose(stds, np.asarray(scatter), rtol=0.2)
