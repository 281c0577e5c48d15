"""Leave-one-out cross-validation (GPML section 5.4.2, eqs 5.10-5.13).

Three tiers of evidence:
 1. BRUTE FORCE: the float64 oracle's closed-form LOO equals literally
    refitting the GP posterior on the n-1 remaining points for every i.
 2. JAX vs oracle: fp32 loo_cv matches the float64 closed form.
 3. The pseudo-likelihood is a usable objective: fit(objective="loo")
    improves it and recovers sane noise on the standard sinusoid.
"""

import numpy as np
import pytest

from cugp_tpu import api
from cugp_tpu.data import synthetic
from cugp_tpu.models import exact_gp
from cugp_tpu.oracle import exact_gp_np as oracle


def _data(n=64, seed=0):
    X, y, _ = synthetic.sinusoid_1d(n=n, noise_std=0.1, seed=seed)
    return np.asarray(X, np.float64), np.asarray(y, np.float64)


def _params(d=1):
    return {
        "log_lengthscale": np.full((d,), np.log(0.7)),
        "log_signal_var": np.log(1.3),
        "log_noise_var": np.log(0.05),
    }


def test_oracle_loo_equals_brute_force_refits():
    X, y = _data(n=40)
    p = _params()
    mu, var, logp = oracle.loo_cv(p, X, y)
    n = X.shape[0]
    for i in range(n):
        keep = np.arange(n) != i
        m_i, v_i = oracle.posterior(
            p, X[keep], y[keep], X[i:i + 1], include_noise=True)
        # jitter enters K once for the full fit and once for the refit;
        # its effect on the held-out prediction is O(jitter)
        assert abs(mu[i] - m_i[0]) < 1e-5
        assert abs(var[i] - v_i[0]) < 1e-5
    lp = -0.5 * np.log(var) - (y - mu) ** 2 / (2 * var) - 0.5 * np.log(2 * np.pi)
    np.testing.assert_allclose(logp, lp, rtol=1e-12)


@pytest.mark.parametrize("kind", ["rbf", "matern32", "rq"])
def test_loo_matches_oracle(kind):
    X, y = _data(n=96)
    from cugp_tpu.ops import kernels as kops

    p = kops.default_init(kind, d=1)
    p_np = {k: np.asarray(v, np.float64) for k, v in p.items()}
    mu_o, var_o, logp_o = oracle.loo_cv(p_np, X, y, kind=kind)
    mu, var, logp = exact_gp.loo_cv(
        p, X.astype(np.float32), y.astype(np.float32), kind=kind)
    np.testing.assert_allclose(np.asarray(mu), mu_o, atol=2e-3)
    np.testing.assert_allclose(np.asarray(var), var_o, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(logp), logp_o, atol=5e-3)


def test_fit_objective_loo_improves_pseudo_likelihood():
    X, y = _data(n=128)
    gp = api.GP()
    gp.condition(X, y)
    before = float(gp.loo()["pseudo_likelihood"])
    gp.fit(X, y, steps=150, learning_rate=0.05, objective="loo")
    out = gp.loo()
    after = float(out["pseudo_likelihood"])
    assert after > before
    # learned noise should be near the generating noise_std=0.1 (var 0.01)
    noise = float(np.exp(np.asarray(gp.params["log_noise_var"])))
    assert 1e-3 < noise < 0.15
    assert out["mean"].shape == y.shape and out["var"].shape == y.shape


def test_loo_normalize_y_units():
    X, y = _data(n=64)
    y_scaled = 5.0 * y + 3.0
    p = _params()
    gp_raw = api.GP().condition(X, y)
    gp_s = api.GP(normalize_y=True).condition(X, y_scaled)
    # same internal params on standardized data give mapped-back outputs
    gp_s.params = gp_raw.params
    out = gp_s.loo()
    # predictive means live in the scaled units, near the scaled targets
    assert np.corrcoef(np.asarray(out["mean"]), y_scaled)[0, 1] > 0.9
    assert float(np.mean(np.asarray(out["mean"]))) > 1.0  # shifted by +3
