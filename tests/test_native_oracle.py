"""Native C++ serial baseline vs the NumPy float64 oracle (C12)."""

import numpy as np
import pytest

from cugp_tpu.oracle import exact_gp_np as oracle
from cugp_tpu.oracle import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="C++ toolchain unavailable")


@pytest.fixture(scope="module")
def data(rng_seed=3):
    rng = np.random.default_rng(rng_seed)
    X = rng.uniform(-2, 2, size=(150, 2))
    y = np.sin(X[:, 0]) + 0.1 * rng.standard_normal(150)
    params = {
        "log_lengthscale": np.log([0.8, 1.2]),
        "log_signal_var": np.log(1.5),
        "log_noise_var": np.log(0.05),
    }
    return X, y, params


@pytest.mark.parametrize("kind", ["rbf", "matern12", "matern32", "matern52"])
def test_covariance_matches(data, kind):
    X, y, params = data
    K_np = oracle.train_covariance(params, X, kind, jitter=1e-6)
    K_cc = native.train_covariance(params, X, kind, jitter=1e-6)
    # matern kernels amplify fp rounding near r=0 through sqrt (the numpy
    # oracle expands the squared distance, the C++ path computes it
    # directly, so they round differently at the 1e-8 level)
    tol = 1e-12 if kind == "rbf" else 1e-7
    np.testing.assert_allclose(K_cc, K_np, rtol=tol, atol=tol)


def test_cholesky_matches(data):
    X, _, params = data
    K = oracle.train_covariance(params, X, "rbf")
    np.testing.assert_allclose(native.cholesky(K), np.linalg.cholesky(K),
                               rtol=1e-10, atol=1e-12)


def test_cholesky_rejects_indefinite():
    a = np.eye(8)
    a[5, 5] = -1.0
    with pytest.raises(np.linalg.LinAlgError):
        native.cholesky(a)


@pytest.mark.parametrize("kind", ["rbf", "matern32"])
def test_lml_matches(data, kind):
    X, y, params = data
    ref = oracle.log_marginal_likelihood(params, X, y, kind)
    val = native.log_marginal_likelihood(params, X, y, kind)
    assert abs(val - ref) < 1e-8


@pytest.mark.parametrize("kind", ["rbf", "matern52"])
def test_parallel_lml_matches(data, kind):
    """OpenMP-threaded baseline (gp_parallel.cpp) == float64 oracle."""
    if not native.parallel_available():
        pytest.skip("no native toolchain for the OpenMP baseline")
    X, y, params = data
    ref = oracle.log_marginal_likelihood(params, X, y, kind)
    val = native.log_marginal_likelihood_parallel(params, X, y, kind)
    assert abs(val - ref) < 1e-8
    assert native.num_threads() >= 1


def test_posterior_matches(data):
    X, y, params = data
    Xs = np.linspace(-2, 2, 33).reshape(-1, 1).repeat(2, axis=1)
    mu_ref, var_ref = oracle.posterior(params, X, y, Xs, "rbf")
    mu, var = native.posterior(params, X, y, Xs, "rbf")
    np.testing.assert_allclose(mu, mu_ref, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(var, var_ref, rtol=1e-8, atol=1e-10)
