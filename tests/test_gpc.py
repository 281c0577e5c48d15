"""GP classification (Laplace) vs the float64 oracle + end-to-end fit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugp_tpu.data import synthetic
from cugp_tpu.models import gpc
from cugp_tpu.oracle import gpc_np
from cugp_tpu.ops import kernels as kops


@pytest.fixture(scope="module")
def data():
    X, y = synthetic.two_moons(n=160, noise_std=0.1, seed=0)
    params = kops.init_params(d=2, lengthscale=0.7, signal_var=2.0,
                              noise_var=0.1)  # noise unused by gpc
    return X, y, params


def test_laplace_lml_matches_oracle(data):
    X, y, params = data
    ref = gpc_np.laplace_lml(params, X, y)
    val = float(gpc.laplace_lml(params, jnp.asarray(X), jnp.asarray(y),
                                method="xla"))
    assert abs(val - ref) / len(y) < 1e-3, (val, ref)


def test_predict_proba_matches_oracle(data):
    X, y, params = data
    Xs = np.mgrid[-1.5:2.5:9j, -1.0:1.5:7j].reshape(2, -1).T.astype(
        np.float32)
    p_ref, mu_ref, var_ref = gpc_np.predict_proba(params, X, y, Xs)
    p, mu, var = gpc.predict_proba(params, jnp.asarray(X), jnp.asarray(y),
                                   jnp.asarray(Xs), method="xla")
    np.testing.assert_allclose(np.asarray(p), p_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=5e-3)
    np.testing.assert_allclose(np.asarray(var), var_ref, atol=5e-3)


@pytest.mark.deep
def test_fit_improves_lml_and_classifies(data):
    X, y, _ = data
    init = kops.init_params(d=2, lengthscale=2.0, signal_var=1.0,
                            noise_var=0.1)
    Xj, yj = jnp.asarray(X), jnp.asarray(y)
    lml0 = float(gpc.laplace_lml(init, Xj, yj, method="xla"))
    params, info = gpc.fit(init, Xj, yj, steps=60, learning_rate=0.1,
                           method="xla")
    lml1 = float(info["lml"])
    assert lml1 > lml0
    p, _, _ = gpc.predict_proba(params, Xj, yj, Xj, method="xla")
    acc = float(jnp.mean((np.asarray(p) > 0.5) == (y > 0)))
    assert acc > 0.9, acc


def test_lml_gradient_finite(data):
    X, y, params = data
    g = jax.grad(lambda p: gpc.laplace_lml(
        p, jnp.asarray(X), jnp.asarray(y), method="xla"))(params)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))


@pytest.mark.deep
def test_api_classifier(data):
    from cugp_tpu.api import GPClassifier

    X, y, _ = data
    clf = GPClassifier(kind="rbf")
    clf.fit(X, y, steps=40, learning_rate=0.1)
    p = clf.predict_proba(X)
    acc = float(np.mean((np.asarray(p) > 0.5) == (y > 0)))
    assert acc > 0.85
