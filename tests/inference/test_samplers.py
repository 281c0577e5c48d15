"""HMC/NUTS statistical validation on analytic targets (SURVEY.md sec 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugp_tpu.inference import hmc as hmc_lib
from cugp_tpu.inference import nuts as nuts_lib
from cugp_tpu.inference import sampling


def _gauss_logprob(mean, cov_inv):
    def logprob(q):
        d = q - mean
        return -0.5 * d @ cov_inv @ d

    return jax.value_and_grad(logprob)


def test_hmc_standard_gaussian():
    dim, chains = 3, 8
    lp = _gauss_logprob(jnp.zeros(dim), jnp.eye(dim))
    q0 = jax.random.normal(jax.random.key(0), (chains, dim))
    out = hmc_lib.run_hmc(q0, jax.random.key(1), lp, n_leapfrog=16,
                          num_warmup=200, num_samples=500, eps0=0.2)
    qs = np.asarray(out["samples_flat"]).reshape(-1, dim)
    assert 0.4 < float(out["accept_rate"]) <= 1.0
    np.testing.assert_allclose(qs.mean(axis=0), 0.0, atol=0.2)
    np.testing.assert_allclose(qs.std(axis=0), 1.0, atol=0.15)


def test_hmc_correlated_gaussian_mass_adaptation():
    """Anisotropic target: mass adaptation must fix the scale mismatch."""
    dim, chains = 2, 8
    scales = jnp.asarray([1.0, 0.05])
    cov_inv = jnp.diag(1.0 / scales**2)
    lp = _gauss_logprob(jnp.zeros(dim), cov_inv)
    q0 = 0.1 * jax.random.normal(jax.random.key(0), (chains, dim))
    out = hmc_lib.run_hmc(q0, jax.random.key(1), lp, n_leapfrog=16,
                          num_warmup=400, num_samples=600, eps0=0.05)
    qs = np.asarray(out["samples_flat"]).reshape(-1, dim)
    np.testing.assert_allclose(qs.std(axis=0), scales, rtol=0.25)
    # inv_mass should reflect the target variances
    np.testing.assert_allclose(np.asarray(out["inv_mass"]),
                               np.asarray(scales) ** 2, rtol=0.6)


def test_nuts_standard_gaussian():
    dim, chains = 3, 8
    lp = _gauss_logprob(jnp.zeros(dim), jnp.eye(dim))
    q0 = jax.random.normal(jax.random.key(2), (chains, dim))
    out = nuts_lib.run_nuts(q0, jax.random.key(3), lp, max_depth=6,
                            num_warmup=200, num_samples=500, eps0=0.2)
    qs = np.asarray(out["samples_flat"]).reshape(-1, dim)
    assert float(out["divergence_rate"]) < 0.05
    np.testing.assert_allclose(qs.mean(axis=0), 0.0, atol=0.2)
    np.testing.assert_allclose(qs.std(axis=0), 1.0, atol=0.15)
    # NUTS on an isotropic Gaussian should not always hit max depth
    assert float(out["mean_leapfrog"]) < 2**6


def test_nuts_correlated_gaussian():
    dim, chains = 2, 8
    rho = 0.9
    cov = jnp.asarray([[1.0, rho], [rho, 1.0]])
    lp = _gauss_logprob(jnp.zeros(dim), jnp.linalg.inv(cov))
    q0 = jax.random.normal(jax.random.key(4), (chains, dim))
    out = nuts_lib.run_nuts(q0, jax.random.key(5), lp, max_depth=7,
                            num_warmup=300, num_samples=600, eps0=0.1)
    qs = np.asarray(out["samples_flat"]).reshape(-1, dim)
    emp_corr = np.corrcoef(qs.T)[0, 1]
    np.testing.assert_allclose(emp_corr, rho, atol=0.1)
    np.testing.assert_allclose(qs.std(axis=0), 1.0, atol=0.2)


@pytest.mark.deep
def test_rhat_and_ess_diagnostics():
    x = np.random.default_rng(0).standard_normal((400, 4))
    rhat = float(sampling.potential_scale_reduction(jnp.asarray(x)))
    assert 0.95 < rhat < 1.1
    ess = float(sampling.effective_sample_size(jnp.asarray(x)))
    assert ess > 400  # iid draws: ess ~ total draws


@pytest.mark.slow
def test_nuts_gp_hyperparams_small():
    """End-to-end: NUTS over GP hyperparams on a tiny dataset."""
    from cugp_tpu.data import synthetic
    from cugp_tpu.ops import kernels as kops

    X, y, _ = synthetic.sinusoid_1d(n=64, noise_std=0.2, seed=0)
    init = kops.init_params(d=1, lengthscale=0.8, noise_var=0.05)
    out = sampling.sample_hyperparams(
        init, jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
        kind="rbf", method="xla", sampler="nuts", num_chains=4,
        num_samples=200, num_warmup=200, max_tree_depth=6,
        key=jax.random.key(7))
    assert float(out["divergence_rate"]) < 0.1
    ls = np.asarray(out["samples"]["log_lengthscale"])[..., 0]
    rhat = float(sampling.potential_scale_reduction(
        jnp.asarray(ls)))
    assert rhat < 1.2
    # lengthscale posterior should be in a sane range for this data
    assert -2.0 < ls.mean() < 1.0


def test_nuts_neals_funnel_loose():
    """U-turn handling on Neal's funnel (SURVEY.md sec 4): v ~ N(0,3)."""
    def logprob(q):
        v, x = q[0], q[1:]
        return (-0.5 * (v / 3.0) ** 2
                - 0.5 * jnp.sum(x * x) * jnp.exp(-v)
                - 0.5 * (q.shape[0] - 1) * v)

    lp = jax.value_and_grad(logprob)
    chains, dim = 8, 3
    q0 = 0.5 * jax.random.normal(jax.random.key(8), (chains, dim))
    out = nuts_lib.run_nuts(q0, jax.random.key(9), lp, max_depth=8,
                            num_warmup=500, num_samples=1000, eps0=0.2,
                            target_accept=0.9)
    vs = np.asarray(out["samples_flat"])[..., 0].reshape(-1)
    # funnel is pathological: loose sanity bounds, not exact moments
    assert abs(vs.mean()) < 1.0
    assert vs.std() > 1.8
    assert float(out["divergence_rate"]) < 0.3


def test_blocked_kernel_single_transition_matches_vmap():
    """One blocked transition (lax.map over vmapped blocks) must equal the
    full-width-vmap transition to fp tolerance: same keys, same kernel.
    (Whole runs may diverge bitwise — HMC is chaotic and XLA reassociates
    reductions differently across layouts — so the per-transition check is
    the sharp one; the statistical check below covers the full run.)"""
    dim, chains = 3, 16
    lp = _gauss_logprob(jnp.zeros(dim), jnp.eye(dim))
    q0 = jax.random.normal(jax.random.key(0), (chains, dim))
    logp0, grad0 = jax.vmap(lambda q: lp(q))(q0)
    state0 = hmc_lib.HMCState(q0, logp0, grad0)
    keys = jax.random.split(jax.random.key(1), chains)
    eps = jnp.asarray(0.2)
    inv_mass = jnp.ones(dim)
    k_full = hmc_lib.make_hmc_kernel(lp, n_leapfrog=8)
    k_blk = hmc_lib.make_hmc_kernel(lp, n_leapfrog=8, chain_block=4)
    s_full, a_full, _ = k_full(state0, keys, eps, inv_mass)
    s_blk, a_blk, _ = k_blk(state0, keys, eps, inv_mass)
    np.testing.assert_allclose(np.asarray(s_full.q), np.asarray(s_blk.q),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_full), np.asarray(a_blk),
                               atol=1e-5)

    nk_full = nuts_lib.make_nuts_kernel(lp, max_depth=5)
    nk_blk = nuts_lib.make_nuts_kernel(lp, max_depth=5, chain_block=8)
    ns_full, na_full, _ = nk_full(state0, keys, eps, inv_mass)
    ns_blk, na_blk, _ = nk_blk(state0, keys, eps, inv_mass)
    np.testing.assert_allclose(np.asarray(ns_full.q), np.asarray(ns_blk.q),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(na_full), np.asarray(na_blk),
                               atol=1e-5)


def test_blocked_chain_run_statistically_correct():
    """Full blocked-layout run still samples the right target with pooled
    adaptation (the single-program config-3 layout, BASELINE.json:9)."""
    dim, chains = 3, 16
    lp = _gauss_logprob(jnp.zeros(dim), jnp.eye(dim))
    q0 = jax.random.normal(jax.random.key(0), (chains, dim))
    out = hmc_lib.run_hmc(q0, jax.random.key(1), lp, n_leapfrog=16,
                          num_warmup=300, num_samples=1200, eps0=0.2,
                          chain_block=4)
    qs = np.asarray(out["samples_flat"]).reshape(-1, dim)
    assert 0.4 < float(out["accept_rate"]) <= 1.0
    np.testing.assert_allclose(qs.mean(axis=0), 0.0, atol=0.2)
    np.testing.assert_allclose(qs.std(axis=0), 1.0, atol=0.15)


def test_blocked_chain_layout_pads_non_divisible():
    """C % chain_block != 0 pads the last block with copies of chain 0;
    every REAL chain's transition must still equal the full-width vmap
    (round-3 VERDICT weak #6: no usability cliff at e.g. 6 chains / block
    4)."""
    dim, chains = 3, 6  # 6 % 4 != 0 -> one padded block
    lp = _gauss_logprob(jnp.zeros(dim), jnp.eye(dim))
    q0 = jax.random.normal(jax.random.key(0), (chains, dim))
    logp0, grad0 = jax.vmap(lambda q: lp(q))(q0)
    state0 = hmc_lib.HMCState(q0, logp0, grad0)
    keys = jax.random.split(jax.random.key(1), chains)
    eps = jnp.asarray(0.2)
    inv_mass = jnp.ones(dim)
    k_full = hmc_lib.make_hmc_kernel(lp, n_leapfrog=8)
    k_blk = hmc_lib.make_hmc_kernel(lp, n_leapfrog=8, chain_block=4)
    s_full, a_full, _ = k_full(state0, keys, eps, inv_mass)
    s_blk, a_blk, _ = k_blk(state0, keys, eps, inv_mass)
    assert s_blk.q.shape == (chains, dim)
    np.testing.assert_allclose(np.asarray(s_full.q), np.asarray(s_blk.q),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_full), np.asarray(a_blk),
                               atol=1e-5)
    # and a short end-to-end run accepts the odd count
    out = hmc_lib.run_hmc(q0, jax.random.key(1), lp, n_leapfrog=4,
                          num_warmup=10, num_samples=10, chain_block=4)
    assert out["samples_flat"].shape == (10, chains, dim)
