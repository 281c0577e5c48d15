"""GP(normalize_y=True): internal target standardization with outputs
(mean/var/cov/LML/samples) mapped back to the original units."""

import numpy as np
import pytest

import jax.numpy as jnp

from cugp_tpu import api
from cugp_tpu.data import synthetic
from cugp_tpu.models import exact_gp
from cugp_tpu.ops import kernels as kops


@pytest.fixture(scope="module")
def shifted():
    X, y, _ = synthetic.sinusoid_1d(n=300, noise_std=0.1, seed=0)
    return X, 250.0 + 40.0 * y  # far from zero-mean/unit-scale


@pytest.mark.deep
def test_fit_predict_in_original_units(shifted):
    X, y = shifted
    gp = api.GP(normalize_y=True)
    gp.fit(X, y, steps=150, learning_rate=0.1)
    mu, var = gp.predict(X)
    rmse = float(np.sqrt(np.mean((np.asarray(mu) - y) ** 2)))
    assert rmse < 0.2 * np.std(y)  # predictions live at the data scale
    assert float(np.min(np.asarray(var))) > 0.0
    # variance must be in squared ORIGINAL units: the prior-variance scale
    # is ~ (40 * signal)^2, so posterior var far from data can be large,
    # but near data it should be ~ noise scale (40*0.1)^2-ish
    assert float(np.median(np.asarray(var))) < (0.3 * 40.0) ** 2


def test_lml_change_of_variables_exact(shifted):
    """Density of the RAW y under the standardized model equals the
    closed-form lml of the equivalently-scaled kernel on centered y."""
    X, y = shifted
    gp = api.GP(normalize_y=True)
    params = kops.init_params(d=1, lengthscale=0.8, signal_var=1.3,
                              noise_var=0.05)
    gp.condition(X, y, params=params)
    lml_api = float(gp.log_marginal_likelihood())
    s, m = gp.y_std, gp.y_mean
    p2 = dict(params)
    p2["log_signal_var"] = params["log_signal_var"] + 2.0 * np.log(s)
    p2["log_noise_var"] = params["log_noise_var"] + 2.0 * np.log(s)
    lml_manual = float(exact_gp.log_marginal_likelihood(
        p2, jnp.asarray(X, jnp.float32),
        jnp.asarray(y - m, jnp.float32), kind="rbf"))
    assert abs(lml_api - lml_manual) < 1e-2 * max(1.0, abs(lml_manual))


@pytest.mark.deep
def test_full_cov_and_samples_scale(shifted):
    X, y = shifted
    gp = api.GP(normalize_y=True)
    gp.fit(X, y, steps=60, learning_rate=0.1)
    Xs = X[:12]
    mu, cov = gp.predict(Xs, full_cov=True)
    mu_d, var_d = gp.predict(Xs)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_d), rtol=1e-5)
    np.testing.assert_allclose(np.diagonal(np.asarray(cov)),
                               np.asarray(var_d), rtol=5e-3, atol=1e-2)
    draws = np.asarray(gp.sample_posterior(Xs, num_samples=64))
    assert abs(float(draws.mean()) - float(np.mean(np.asarray(mu)))) \
        < 3.0 * float(np.std(draws))
    assert draws.mean() > 100.0  # original units, not standardized


def test_iterative_paths_original_units(shifted):
    X, y = shifted
    gp = api.GP(normalize_y=True)
    gp.fit(X, y, steps=60, learning_rate=0.1)
    mu_i, var_i = gp.predict_iterative(X[:16], tol=1e-8)
    mu_d, var_d = gp.predict(X[:16])
    np.testing.assert_allclose(np.asarray(mu_i), np.asarray(mu_d),
                               rtol=1e-3, atol=1e-2)
    lml_i = float(gp.log_marginal_likelihood_iterative())
    lml_d = float(gp.log_marginal_likelihood())
    assert abs(lml_i - lml_d) < 0.05 * abs(lml_d)


def test_save_load_preserves_normalization(shifted, tmp_path):
    X, y = shifted
    gp = api.GP(normalize_y=True)
    gp.fit(X, y, steps=40, learning_rate=0.1)
    mu0, var0 = gp.predict(X[:10])
    gp.save(str(tmp_path / "ck"))
    gp2 = api.GP.load(str(tmp_path / "ck"))
    assert gp2.normalize_y and abs(gp2.y_mean - gp.y_mean) < 1e-6
    mu1, var1 = gp2.predict(X[:10])
    np.testing.assert_array_equal(np.asarray(mu0), np.asarray(mu1))
    np.testing.assert_array_equal(np.asarray(var0), np.asarray(var1))
