"""Hyperparameter HMC over the MATRIX-FREE LML (round-3 VERDICT next #2):
the sampler's target is the frozen-probe CG+SLQ approximation of the
posterior; at CPU scale its moments must agree with the dense-path
sampler's. On-chip captures live in benchmarks/bench_hmc.py
--engine=iterative + PERF.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugp_tpu.data import synthetic
from cugp_tpu.inference import sampling
from cugp_tpu.ops import kernels as kops


@pytest.fixture(scope="module")
def data():
    X, y, _ = synthetic.sinusoid_1d(n=128, noise_std=0.2, seed=0)
    return (jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
            kops.init_params(d=1, lengthscale=0.8, noise_var=0.1))


def test_iterative_logprob_matches_dense(data):
    """Value AND gradient of the frozen-probe matrix-free log-density vs
    the dense AD path, at several points of the trajectory space. The
    logdet/trace carry O(1/sqrt(probes)) approximation error — tolerance
    scales accordingly; the quadratic term and prior are exact."""
    X, y, init = data
    lp_dense, unravel, q0 = sampling.make_flat_logprob(init, X, y,
                                                       method="xla")
    lp_it, _, q0b = sampling.make_iterative_logprob(
        init, X, y, block=64, tol=1e-7, max_iters=2000, num_probes=64,
        num_steps=48, probe_key=jax.random.key(9))
    np.testing.assert_allclose(np.asarray(q0b), np.asarray(q0))
    rng = np.random.default_rng(0)
    for _ in range(3):
        q = jnp.asarray(np.asarray(q0) + 0.3 * rng.standard_normal(
            q0.shape[0]), jnp.float32)
        vd, gd = lp_dense(q)
        vi, gi = lp_it(q)
        # |logp| is O(n); SLQ error a few percent of the logdet
        assert abs(float(vi) - float(vd)) / X.shape[0] < 0.05
        np.testing.assert_allclose(np.asarray(gi), np.asarray(gd),
                                   rtol=0.25,
                                   atol=0.25 * max(1.0, np.abs(gd).max()))


@pytest.mark.slow
def test_iterative_sampler_posterior_matches_dense(data):
    """Full-chain statistical agreement: HMC over the matrix-free target
    vs HMC over the dense LML — posterior moments within MC + SLQ slack,
    split-R-hat sane. (Budget note: each iterative density eval is 2 CG
    solves + SLQ; chains x draws x leapfrog is kept ~7k evals so the
    test stays in CI range.)"""
    X, y, init = data
    common = dict(num_samples=128, num_chains=3, num_warmup=64,
                  sampler="hmc", key=jax.random.key(1))
    dense = sampling.sample_hyperparams(init, X, y, method="xla", **common)
    it = sampling.sample_hyperparams_iterative(
        init, X, y, block=128, tol=1e-5, max_iters=400, num_probes=24,
        num_steps=24, n_leapfrog=12, probe_key=jax.random.key(9), **common)
    assert 0.5 < float(it["accept_rate"]) <= 1.0
    for k in dense["samples"]:
        sd = np.asarray(dense["samples"][k]).reshape(-1)
        si = np.asarray(it["samples"][k]).reshape(-1)
        assert abs(sd.mean() - si.mean()) < 0.35, k
        assert abs(sd.std() - si.std()) < 0.3, k
    # R-hat over the iterative chains
    flat = np.asarray(it["samples_flat"])
    for j in range(flat.shape[2]):
        rh = float(sampling.potential_scale_reduction(flat[:, :, j]))
        assert rh < 1.3


def test_iterative_sampler_precond_smoke(data):
    """Preconditioned transitions (factors built once at init) still
    sample: short run, finite draws, sane accept rate."""
    X, y, init = data
    out = sampling.sample_hyperparams_iterative(
        init, X, y, num_samples=24, num_chains=2, num_warmup=24,
        sampler="hmc", n_leapfrog=8, block=64, tol=1e-6, max_iters=500,
        num_probes=16, precond_rank=16, precond_where="device",
        key=jax.random.key(2))
    flat = np.asarray(out["samples_flat"])
    assert flat.shape == (24, 2, 3)
    assert np.isfinite(flat).all()
    assert 0.2 < float(out["accept_rate"]) <= 1.0


@pytest.mark.deep
def test_cli_sample_engine_iterative(capsys):
    from cugp_tpu.cli.__main__ import main

    rc = main(["sample", "--data.n=96", "--sample.engine=iterative",
               "--sample.sampler=hmc", "--sample.num_chains=2",
               "--sample.num_samples=16", "--sample.num_warmup=16",
               "--sample.num_probes=8"])
    assert rc == 0
    import json

    out = json.loads(capsys.readouterr().out)
    assert "log_lengthscale" in out["posterior"]
    assert np.isfinite(out["accept_rate"])
