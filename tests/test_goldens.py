"""Numerics regression against checked-in float64 oracle goldens.

SURVEY.md section 4: golden LML/posterior/gradient values for a fixed
dataset guard against silent numerical drift in any ops-tier change.
Regenerate with the script in tests/goldens/ provenance (oracle only —
never from the JAX pipeline itself).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cugp_tpu.models import exact_gp

_GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                       "exact_gp_sinusoid256.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(_GOLDEN)


@pytest.fixture(scope="module")
def inputs(golden):
    params = {
        "log_lengthscale": jnp.asarray(golden["log_lengthscale"], jnp.float32),
        "log_signal_var": jnp.asarray(golden["log_signal_var"], jnp.float32),
        "log_noise_var": jnp.asarray(golden["log_noise_var"], jnp.float32),
    }
    return (params, jnp.asarray(golden["X"], jnp.float32),
            jnp.asarray(golden["y"], jnp.float32),
            jnp.asarray(golden["Xs"], jnp.float32))


KINDS = ["rbf", "matern12", "matern32", "matern52", "rq"]


def _with_alpha(params, golden, kind):
    """rq carries the extra log_alpha hyperparameter (same golden file)."""
    if kind != "rq":
        return params
    return dict(params, log_alpha=jnp.asarray(golden["log_alpha"],
                                              jnp.float32))


@pytest.mark.parametrize("kind", KINDS)
def test_lml_golden(golden, inputs, kind):
    params, X, y, _ = inputs
    params = _with_alpha(params, golden, kind)
    val = float(exact_gp.log_marginal_likelihood(params, X, y, kind=kind,
                                                 method="xla"))
    assert abs(val - float(golden[f"lml_{kind}"])) / len(y) < 1e-3


@pytest.mark.parametrize("kind", KINDS)
def test_posterior_golden(golden, inputs, kind):
    params, X, y, Xs = inputs
    params = _with_alpha(params, golden, kind)
    mu, var = exact_gp.posterior(params, X, y, Xs, kind=kind, method="xla")
    np.testing.assert_allclose(np.asarray(mu), golden[f"mu_{kind}"], atol=1e-3)
    np.testing.assert_allclose(np.asarray(var), golden[f"var_{kind}"],
                               atol=1e-3)


@pytest.mark.parametrize("kind", KINDS)
def test_gradient_golden(golden, inputs, kind):
    params, X, y, _ = inputs
    params = _with_alpha(params, golden, kind)
    _, g = exact_gp.lml_value_and_grad(params, X, y, kind=kind, method="xla")
    np.testing.assert_allclose(np.asarray(g["log_lengthscale"]),
                               golden[f"grad_ell_{kind}"], rtol=5e-2,
                               atol=5e-2)
    np.testing.assert_allclose(float(g["log_signal_var"]),
                               float(golden[f"grad_sf_{kind}"]), rtol=5e-2,
                               atol=5e-2)
    np.testing.assert_allclose(float(g["log_noise_var"]),
                               float(golden[f"grad_sn_{kind}"]), rtol=5e-2,
                               atol=5e-2)
    if kind == "rq":
        np.testing.assert_allclose(float(g["log_alpha"]),
                                   float(golden["grad_alpha_rq"]), rtol=5e-2,
                                   atol=5e-2)


def test_analytic_gradients_match_golden_rq(golden, inputs):
    """rq analytic-gradient path (incl. d/dlog_alpha) vs the oracle golden
    — the round-1 NotImplementedError sweep (VERDICT missing #6)."""
    params, X, y, _ = inputs
    params = _with_alpha(params, golden, "rq")
    g = exact_gp.lml_gradients_analytic(params, X, y, kind="rq", method="xla")
    np.testing.assert_allclose(np.asarray(g["log_lengthscale"]),
                               golden["grad_ell_rq"], rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(float(g["log_alpha"]),
                               float(golden["grad_alpha_rq"]), rtol=5e-2,
                               atol=5e-2)
