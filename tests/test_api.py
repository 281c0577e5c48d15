"""API facade: save/load, predict batching, method switches."""

import os

import numpy as np
import pytest

from cugp_tpu.api import GP
from cugp_tpu.data import synthetic


@pytest.fixture(scope="module")
def fitted_gp():
    X, y, _ = synthetic.sinusoid_1d(n=200, noise_std=0.1, seed=0)
    gp = GP(kind="rbf", method="xla")
    gp.fit(X, y, steps=60, learning_rate=0.1)
    return gp


def test_save_load_roundtrip(fitted_gp, tmp_path):
    path = os.path.join(tmp_path, "gp_ckpt")
    fitted_gp.save(path)
    gp2 = GP.load(path)
    assert gp2.kind == fitted_gp.kind
    Xs = np.linspace(-2, 2, 16)[:, None]
    mu1, var1 = fitted_gp.predict(Xs)
    mu2, var2 = gp2.predict(Xs)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var1), np.asarray(var2), atol=1e-6)


def test_save_load_roundtrip_rq(tmp_path):
    """rq params include log_alpha — load must rebuild the probe tree from
    the saved key names (ADVICE round 1, medium)."""
    from cugp_tpu.ops import kernels as kernel_ops

    X, y, _ = synthetic.sinusoid_1d(n=64, noise_std=0.1, seed=1)
    gp = GP(kind="rq", method="xla")
    gp.condition(X, y, params=kernel_ops.init_params(d=1, alpha=2.0))
    path = os.path.join(tmp_path, "gp_rq_ckpt")
    gp.save(path)
    gp2 = GP.load(path)
    assert gp2.kind == "rq"
    assert "log_alpha" in gp2.params
    Xs = np.linspace(-2, 2, 16)[:, None]
    mu1, _ = gp.predict(Xs)
    mu2, _ = gp2.predict(Xs)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), atol=1e-6)


def test_load_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        GP.load(os.path.join(tmp_path, "nope"))


def test_predict_batching_consistent(fitted_gp):
    Xs = np.linspace(-2, 2, 100)[:, None]
    mu_a, var_a = fitted_gp.predict(Xs, batch=4096)
    mu_b, var_b = fitted_gp.predict(Xs, batch=32)
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_a), np.asarray(var_b), atol=1e-5)


def test_condition_with_params(fitted_gp):
    X, y, _ = synthetic.sinusoid_1d(n=64, seed=2)
    gp = GP(kind="rbf", method="xla").condition(X, y, params=fitted_gp.params)
    lml = float(gp.log_marginal_likelihood())
    assert np.isfinite(lml)


def test_cli_fit_checkpoint_resume(tmp_path, capsys):
    from cugp_tpu.cli.__main__ import main

    ckpt = os.path.join(tmp_path, "cli_ckpt")
    rc = main(["fit", "--data.n=100", "--fit.steps=20",
               f"--checkpoint_dir={ckpt}"])
    assert rc == 0
    out1 = capsys.readouterr().out
    assert '"resumed": false' in out1
    rc = main(["fit", "--data.n=100", "--fit.steps=20",
               f"--checkpoint_dir={ckpt}"])
    assert rc == 0
    out2 = capsys.readouterr().out
    assert '"resumed": true' in out2


def test_sample_posterior(fitted_gp):
    import jax

    Xs = np.linspace(-2, 2, 40)[:, None]
    draws = fitted_gp.sample_posterior(Xs, num_samples=64,
                                       key=jax.random.key(3))
    assert draws.shape == (64, 40)
    mu, var = fitted_gp.predict(Xs)
    # statistically sound bounds: mean within 5 MC-standard-errors, var
    # within the chi^2 spread of 64 draws
    sd = np.sqrt(np.asarray(var) + 1e-6)
    err = np.abs(np.asarray(draws).mean(axis=0) - np.asarray(mu))
    assert np.all(err <= 5.0 * sd / np.sqrt(64) + 1e-3), err.max()
    emp_var = np.asarray(draws).var(axis=0)
    ratio = emp_var / (np.asarray(var) + 1e-6)
    assert np.all((ratio > 0.3) & (ratio < 3.0)), (ratio.min(), ratio.max())


def test_gp_validation_errors():
    import pytest

    with pytest.raises(ValueError, match="kernel kind"):
        GP(kind="banana")
    gp = GP(kind="rbf", method="xla")
    with pytest.raises(ValueError, match="X must be"):
        gp.condition(np.zeros(5), np.zeros(5))
    with pytest.raises(ValueError, match="y must be"):
        gp.condition(np.zeros((5, 1)), np.zeros(4))
