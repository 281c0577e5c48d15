"""Shared-kernel multi-output regression == per-output single pipelines."""

import jax.numpy as jnp
import numpy as np
import pytest

from cugp_tpu.models import exact_gp
from cugp_tpu.ops import kernels as kops


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    n, p = 120, 3
    X = rng.uniform(-2, 2, size=(n, 1)).astype(np.float32)
    Y = np.stack([np.sin(2 * X[:, 0]), np.cos(X[:, 0]),
                  0.5 * X[:, 0] ** 2], axis=1).astype(np.float32)
    Y += 0.05 * rng.standard_normal(Y.shape).astype(np.float32)
    params = kops.init_params(d=1, lengthscale=0.8, noise_var=0.01)
    return jnp.asarray(X), jnp.asarray(Y), params


def test_multi_lml_equals_sum_of_singles(data):
    X, Y, params = data
    multi = float(exact_gp.log_marginal_likelihood_multi(
        params, X, Y, method="xla"))
    singles = sum(float(exact_gp.log_marginal_likelihood(
        params, X, Y[:, j], method="xla")) for j in range(Y.shape[1]))
    assert abs(multi - singles) / Y.shape[0] < 1e-3


def test_multi_posterior_equals_singles(data):
    X, Y, params = data
    Xs = jnp.asarray(np.linspace(-2, 2, 33)[:, None], jnp.float32)
    mu, var = exact_gp.posterior_multi(params, X, Y, Xs, method="xla")
    assert mu.shape == (33, Y.shape[1])
    for j in range(Y.shape[1]):
        mu_j, var_j = exact_gp.posterior(params, X, Y[:, j], Xs,
                                         method="xla")
        np.testing.assert_allclose(np.asarray(mu[:, j]), np.asarray(mu_j),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(var), np.asarray(var_j),
                                   rtol=1e-4, atol=1e-4)


def test_multi_lml_differentiable(data):
    import jax

    X, Y, params = data
    g = jax.grad(lambda p: exact_gp.log_marginal_likelihood_multi(
        p, X, Y, method="xla"))(params)
    assert all(bool(jnp.all(jnp.isfinite(v))) for v in jax.tree.leaves(g))
