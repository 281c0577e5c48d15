"""LMC multi-output GP vs the float64 dense-Kronecker oracle
(round-2 VERDICT missing #6: LMC coregionalization)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugp_tpu.models import lmc
from cugp_tpu.oracle import lmc_np


def _toy(n=64, m=16, d=2, p=3, q=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-2, 2, size=(n, d))
    Xs = rng.uniform(-2, 2, size=(m, d))
    params = lmc.init_lmc_params(d=d, p=p, q=q, lengthscale=1.0,
                                 noise_var=0.05, seed=seed)
    # correlated outputs drawn from the model's own prior (float64)
    B = lmc_np.coregionalization(params)
    from cugp_tpu.oracle import exact_gp_np as gp_np
    Kf = gp_np.kernel_matrix(
        {k: np.asarray(v, np.float64) for k, v in params.items()}, X, X,
        "rbf")
    Kbig = np.kron(B, Kf) + 1e-8 * np.eye(p * n)
    f = np.linalg.cholesky(Kbig) @ rng.standard_normal(p * n)
    Y = f.reshape(p, n).T + 0.2 * rng.standard_normal((n, p))
    return params, X, Y, Xs


def test_lml_matches_dense_kron_oracle():
    params, X, Y, Xs = _toy()
    got = float(lmc.log_marginal_likelihood_lmc(
        params, jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32)))
    want = lmc_np.log_marginal_likelihood(params, X, Y)
    assert abs(got - want) / abs(want) < 1e-4


def test_posterior_matches_dense_kron_oracle():
    params, X, Y, Xs = _toy()
    mean, cov = lmc.posterior_lmc(
        params, jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32),
        jnp.asarray(Xs, jnp.float32), full_output_cov=True)
    mean64, cov64 = lmc_np.posterior(params, X, Y, Xs)
    np.testing.assert_allclose(np.asarray(mean), mean64, atol=1e-3)
    np.testing.assert_allclose(np.asarray(cov), cov64, atol=1e-3)
    # diagonal variant agrees with the full one's diagonal
    _, var = lmc.posterior_lmc(
        params, jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32),
        jnp.asarray(Xs, jnp.float32))
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(jnp.diagonal(
            jnp.asarray(cov), axis1=1, axis2=2)), atol=1e-5)


def test_independent_outputs_reduce_to_shared_kernel_multi():
    """With B = I (A=0, softplus(raw_d)=1), LMC == the independent
    shared-kernel multi-output LML of exact_gp."""
    from cugp_tpu.models import exact_gp

    params, X, Y, _ = _toy(p=2, q=1)
    params = dict(params)
    params["lmc_A"] = jnp.zeros_like(params["lmc_A"])
    # softplus(raw_d) + 1e-6 = 1
    raw = np.log(np.expm1(1.0 - 1e-6))
    params["lmc_raw_d"] = jnp.full_like(params["lmc_raw_d"], raw)
    Xj, Yj = jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32)
    got = float(lmc.log_marginal_likelihood_lmc(params, Xj, Yj))
    want = float(exact_gp.log_marginal_likelihood_multi(params, Xj, Yj))
    assert abs(got - want) / abs(want) < 1e-5


def test_fit_learns_output_correlation():
    """Two strongly correlated outputs: the fitted B must show it."""
    rng = np.random.default_rng(3)
    n, d = 96, 1
    X = rng.uniform(-2, 2, size=(n, d))
    base = np.sin(2.0 * X[:, 0])
    Y = np.stack([base + 0.05 * rng.standard_normal(n),
                  -0.8 * base + 0.05 * rng.standard_normal(n)], axis=1)
    init = lmc.init_lmc_params(d=d, p=2, q=1, lengthscale=1.0,
                               noise_var=0.1, seed=1)
    params, info = lmc.fit(init, jnp.asarray(X, jnp.float32),
                           jnp.asarray(Y, jnp.float32), steps=150,
                           learning_rate=0.05)
    assert np.isfinite(float(info["lml"]))
    B = np.asarray(lmc.coregionalization(params))
    corr = B[0, 1] / np.sqrt(B[0, 0] * B[1, 1])
    assert corr < -0.5  # anti-correlated outputs discovered

    # correlated model beats the independent baseline in LML
    from cugp_tpu.models import exact_gp
    indep = float(exact_gp.log_marginal_likelihood_multi(
        params, jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32)))
    got = float(lmc.log_marginal_likelihood_lmc(
        params, jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32)))
    assert got > indep


def test_lmc_gradients_finite():
    params, X, Y, _ = _toy(n=32, p=2, q=1)
    g = jax.grad(lambda p: -lmc.log_marginal_likelihood_lmc(
        p, jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32)))(params)
    for k, v in g.items():
        assert np.all(np.isfinite(np.asarray(v))), k


def test_multioutput_gp_api():
    from cugp_tpu import MultiOutputGP

    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, (80, 1))
    base = np.sin(2 * X[:, 0])
    Y = np.stack([base, 0.7 * base], 1) + 0.05 * rng.standard_normal((80, 2))
    m = MultiOutputGP(rank=1)
    info = m.fit(X, Y, steps=100)
    assert np.isfinite(float(info["lml"]))
    corr = float(np.asarray(m.output_correlation())[0, 1])
    assert corr > 0.9
    mu, var = m.predict(X[:10])
    assert mu.shape == (10, 2) and var.shape == (10, 2)
    assert np.all(np.asarray(var) >= 0)
    mu2, cov = m.predict(X[:10], full_output_cov=True)
    assert cov.shape == (10, 2, 2)
    with pytest.raises(ValueError, match=r"\(n, p\)"):
        MultiOutputGP().fit(X, Y[:, 0])


# ---- rank-Q LMC with DISTINCT latent kernels (round-3 VERDICT #10) ----

def _toy_q(n=72, m=24, seed=0):
    """Two outputs mixing a PERIODIC latent and an RBF latent with
    different weights; the test points EXTRAPOLATE beyond the training
    range. In-range, a smooth shared kernel can interpolate anything —
    the structural gap between ICM and rank-Q LMC shows where the
    periodic latent must carry its pattern forward and the RBF latent
    must revert to the mean."""
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(-3.0, 1.0, size=(n, 1)), axis=0)  # train range
    Xs = np.linspace(1.3, 3.0, m)[:, None]                    # extrapolate
    f_per = np.sin(2 * np.pi * X[:, 0])            # period-1 latent
    f_rbf = np.tanh(X[:, 0])                       # smooth latent
    fs_per = np.sin(2 * np.pi * Xs[:, 0])
    fs_rbf = np.tanh(Xs[:, 0])
    A = np.array([[1.0, -0.8], [0.3, 0.4]])        # (Q, p) mixing
    Y = np.stack([A[0, a] * f_per + A[1, a] * f_rbf for a in range(2)],
                 axis=1)
    Ys = np.stack([A[0, a] * fs_per + A[1, a] * fs_rbf for a in range(2)],
                  axis=1)
    Y = Y + 0.05 * rng.standard_normal(Y.shape)
    return X, Y, Xs, Ys


def test_lmcq_matches_dense_kron_oracle():
    kinds = ("periodic", "rbf")
    rng = np.random.default_rng(3)
    X = rng.uniform(-2, 2, size=(48, 1))
    Y = rng.standard_normal((48, 2))
    Xs = rng.uniform(-2, 2, size=(12, 1))
    params = lmc.init_lmcq_params(d=1, p=2, kinds=kinds, noise_var=0.05,
                                  seed=1)
    Xj = jnp.asarray(X, jnp.float32)
    Yj = jnp.asarray(Y, jnp.float32)
    got = float(lmc.log_marginal_likelihood_lmcq(params, Xj, Yj, kinds))
    want = lmc_np.log_marginal_likelihood_q(params, X, Y, kinds)
    assert abs(got - want) / abs(want) < 1e-3
    mu, var = lmc.posterior_lmcq(params, Xj, Yj,
                                 jnp.asarray(Xs, jnp.float32), kinds)
    mu64, var64 = lmc_np.posterior_q(params, X, Y, Xs, kinds)
    np.testing.assert_allclose(np.asarray(mu), mu64, atol=1e-3)
    np.testing.assert_allclose(np.asarray(var), var64, atol=1e-3)


@pytest.mark.deep
def test_lmcq_fits_mixed_latents_better_than_icm():
    """The model-zoo headline: two outputs mixing periodic + RBF latent
    processes. ICM shares one kernel across outputs, so it must
    compromise; the rank-Q LMC assigns each latent its own family and
    should dominate on held-out prediction."""
    X, Y, Xs, Ys = _toy_q()
    Xj = jnp.asarray(X, jnp.float32)
    Yj = jnp.asarray(Y, jnp.float32)
    kinds = ("periodic", "rbf")
    p0 = lmc.init_lmcq_params(d=1, p=2, kinds=kinds, lengthscale=0.8,
                              noise_var=0.05, seed=0)
    # seed the periodic latent near the truth (period 1): MAP refines it
    pq, info_q = lmc.fit_lmcq(p0, Xj, Yj, kinds=kinds, steps=250,
                              learning_rate=0.05)
    icm0 = lmc.init_lmc_params(d=1, p=2, q=2, lengthscale=0.8,
                               noise_var=0.05)
    picm, info_icm = lmc.fit(icm0, Xj, Yj, kind="rbf", steps=250,
                             learning_rate=0.05)
    mu_q, _ = lmc.posterior_lmcq(pq, Xj, Yj, jnp.asarray(Xs, jnp.float32),
                                 kinds)
    mu_icm, _ = lmc.posterior_lmc(picm, Xj, Yj,
                                  jnp.asarray(Xs, jnp.float32), kind="rbf")
    rmse_q = float(np.sqrt(np.mean((np.asarray(mu_q) - Ys) ** 2)))
    rmse_icm = float(np.sqrt(np.mean((np.asarray(mu_icm) - Ys) ** 2)))
    assert np.isfinite(info_q["lml"]) and np.isfinite(info_icm["lml"])
    # the periodic latent carries its pattern into the extrapolation
    # region; the shared smooth kernel reverts to the mean
    assert rmse_q < 0.7 * rmse_icm, (rmse_q, rmse_icm)


@pytest.mark.deep
def test_lmcq_iterative_matches_dense():
    """Matrix-free rank-Q LMC (round-4 VERDICT next #8): CG+SLQ on the
    sum-of-Kronecker joint operator matches the dense pn x pn path —
    LML to SLQ MC error, posterior to CG tolerance, segmented schedule
    included."""
    rng = np.random.default_rng(3)
    n, d, p, m = 200, 2, 3, 24
    X = jnp.asarray(rng.uniform(-2, 2, (n, d)), jnp.float32)
    Xs = jnp.asarray(rng.uniform(-2, 2, (m, d)), jnp.float32)
    kinds = ("rbf", "matern32")
    params = lmc.init_lmcq_params(d, p, kinds, noise_var=0.05, seed=1)
    Y = jnp.asarray(rng.standard_normal((n, p)), jnp.float32)

    lml_d = float(lmc.log_marginal_likelihood_lmcq(params, X, Y, kinds))
    lml_i = float(lmc.log_marginal_likelihood_lmcq_iterative(
        params, X, Y, kinds, block=128, tol=1e-7, num_probes=64,
        num_steps=40))
    assert abs(lml_d - lml_i) < 0.005 * abs(lml_d) + 2.0

    mu_d, var_d = lmc.posterior_lmcq(params, X, Y, Xs, kinds)
    mu_i, var_i = lmc.posterior_lmcq_iterative(
        params, X, Y, Xs, kinds, block=128, tol=1e-7, col_batch=10)
    np.testing.assert_allclose(np.asarray(mu_i), np.asarray(mu_d),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(var_i), np.asarray(var_d),
                               atol=5e-3)
    # segmented CG on the joint operator (bounded per-program work)
    mu_s, var_s = lmc.posterior_lmcq_iterative(
        params, X, Y, Xs, kinds, block=128, tol=1e-7, col_batch=10,
        segment_iters=9)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_i),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_i),
                               atol=1e-3)


def test_lmcq_matvec_matches_dense_operator():
    """make_lmcq_matvec == dense joint covariance matvec."""
    rng = np.random.default_rng(4)
    n, d, p = 96, 2, 2
    X = jnp.asarray(rng.uniform(-2, 2, (n, d)), jnp.float32)
    kinds = ("rbf", "rq")
    params = lmc.init_lmcq_params(d, p, kinds, noise_var=0.07, seed=2)
    S = np.asarray(lmc.lmcq_covariance(params, X, X, kinds), np.float64)
    sn2 = float(np.exp(np.asarray(params["log_noise_var"])))
    scale = float(np.max(np.sum(np.asarray(params["lmc_a"]) ** 2, axis=0)))
    S += (sn2 + 1e-6 * scale) * np.eye(p * n)
    v = jnp.asarray(rng.standard_normal((p * n, 3)), jnp.float32)
    mv = lmc.make_lmcq_matvec(params, X, kinds, block=64)
    np.testing.assert_allclose(np.asarray(mv(v)),
                               S @ np.asarray(v, np.float64), rtol=2e-4,
                               atol=2e-4)


def test_multioutput_gpq_facade():
    """MultiOutputGPQ: fit/predict/lml (dense + iterative) + persistence."""
    from cugp_tpu.api import MultiOutputGPQ

    rng = np.random.default_rng(5)
    X = rng.uniform(-2, 2, (120, 2))
    Y = rng.standard_normal((120, 2))
    m = MultiOutputGPQ(kinds=("rbf", "matern32"))
    info = m.fit(X, Y, steps=20, learning_rate=0.1)
    assert np.isfinite(float(info["lml"]))
    mu, var = m.predict(X[:8])
    mu_i, var_i = m.predict_iterative(X[:8], tol=1e-7, block=64,
                                      segment_iters=0)
    np.testing.assert_allclose(np.asarray(mu_i), np.asarray(mu), atol=1e-3)
    np.testing.assert_allclose(np.asarray(var_i), np.asarray(var),
                               atol=1e-3)
    l_d = float(m.log_marginal_likelihood())
    l_i = float(m.log_marginal_likelihood_iterative(block=64,
                                                    num_probes=64))
    assert abs(l_d - l_i) < 0.01 * abs(l_d) + 2.0
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        m.save(d + "/m")
        m2 = MultiOutputGPQ.load(d + "/m")
        mu2, _ = m2.predict(X[:8])
        np.testing.assert_array_equal(np.asarray(mu2), np.asarray(mu))
