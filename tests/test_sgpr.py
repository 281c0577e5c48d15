"""SGPR (Titsias collapsed bound) vs exact GP (beyond-reference surface)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugp_tpu.models import exact_gp, sgpr
from cugp_tpu.ops import kernels as kops
from cugp_tpu.data import synthetic


@pytest.fixture(scope="module")
def setup():
    X, y, _ = synthetic.sinusoid_1d(n=400, noise_std=0.2, seed=0)
    Xj = jnp.asarray(X, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)
    params = kops.init_params(d=1, lengthscale=0.8, noise_var=0.05)
    return params, Xj, yj


def test_elbo_equals_lml_when_inducing_is_full(setup):
    """Z = X: the collapsed bound collapses to the exact LML."""
    params, X, y = setup
    lml = float(exact_gp.log_marginal_likelihood(params, X, y, method="xla",
                                                 jitter=1e-6))
    bound = float(sgpr.elbo(params, X, X, y, jitter=1e-6))
    assert abs(bound - lml) / len(y) < 2e-3


def test_elbo_is_lower_bound(setup):
    params, X, y = setup
    lml = float(exact_gp.log_marginal_likelihood(params, X, y, method="xla"))
    rng = np.random.default_rng(1)
    idx = rng.choice(X.shape[0], size=200, replace=False)
    Z_small = X[jnp.asarray(idx[:50])]
    Z_big = X[jnp.asarray(idx)]  # nested superset of Z_small
    bound = float(sgpr.elbo(params, Z_small, X, y))
    bound2 = float(sgpr.elbo(params, Z_big, X, y))
    assert bound <= lml + 1e-3
    assert bound2 <= lml + 1e-3
    # monotone for NESTED inducing sets in exact arithmetic (Titsias);
    # in fp32 the jitter ladder can loosen the larger-m bound slightly,
    # so only a coarse ordering is asserted
    assert bound2 >= bound - 0.5


def test_posterior_matches_exact_with_full_inducing(setup):
    params, X, y = setup
    Xs = jnp.asarray(np.linspace(-3, 3, 60)[:, None], jnp.float32)
    mu_e, var_e = exact_gp.posterior(params, X, y, Xs, method="xla")
    mu_s, var_s = sgpr.posterior(params, X, X, y, Xs)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_e), atol=5e-3)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_e),
                               atol=5e-3)


def test_sparse_posterior_reasonable(setup):
    """m=60 inducing points approximate the full posterior closely here."""
    params, X, y = setup
    Xs = jnp.asarray(np.linspace(-2.5, 2.5, 60)[:, None], jnp.float32)
    mu_e, _ = exact_gp.posterior(params, X, y, Xs, method="xla")
    Z = sgpr.init_inducing(X, 60, seed=2)
    mu_s, var_s = sgpr.posterior(params, Z, X, y, Xs)
    assert np.max(np.abs(np.asarray(mu_s) - np.asarray(mu_e))) < 0.1
    assert np.all(np.asarray(var_s) >= 0)


def test_fit_improves_elbo(setup):
    params, X, y = setup
    p0 = kops.init_params(d=1)  # deliberately bad init
    pf, Z, info = sgpr.fit(p0, X, y, num_inducing=40, steps=200,
                           learning_rate=0.05, optimize_inducing=True,
                           seed=3)
    losses = np.asarray(info["loss"])
    assert losses[-1] < losses[0]
    assert np.isfinite(float(info["elbo"]))
    assert Z.shape == (40, 1)


def test_api_fit_sparse_roundtrip():
    from cugp_tpu.api import GP

    X, y, _ = synthetic.sinusoid_1d(n=300, noise_std=0.2, seed=4)
    gp = GP(kind="rbf", method="xla")
    info = gp.fit_sparse(X, y, num_inducing=30, steps=100, seed=5)
    assert np.isfinite(float(info["elbo"]))
    Xs = np.linspace(-2, 2, 25)[:, None]
    mu, var = gp.predict_sparse(Xs)
    assert mu.shape == (25,) and np.all(np.asarray(var) >= 0)
