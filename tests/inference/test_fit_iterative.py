"""Matrix-free hyperparameter LEARNING (map_opt.fit_iterative) — the
round-3 VERDICT #1 item: the BBMM-style training loop that serves
n beyond the dense Cholesky ceiling. CPU-scale checks here; the n>=100k
on-chip capture lives in benchmarks/bench_fit_iterative.py + PERF.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugp_tpu.data import synthetic
from cugp_tpu.inference import map_opt
from cugp_tpu.ops import kernels as kops


@pytest.fixture(scope="module")
def data():
    X, y, _ = synthetic.sinusoid_1d(n=400, noise_std=0.15, seed=0)
    return jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32)


def test_fit_iterative_tracks_dense_fit(data):
    """Same objective, same optimizer: the matrix-free fit must land near
    the dense Adam fit from the same (deliberately wrong) init. The
    Hutchinson trace gradient is stochastic, so agreement is in log-
    hyperparameter space with MC slack, not bitwise."""
    X, y = data
    init = kops.init_params(d=1, lengthscale=2.5, signal_var=0.3,
                            noise_var=0.5)
    p_dense, _ = map_opt.fit(init, X, y, steps=60, learning_rate=0.1)
    p_it, info = map_opt.fit_iterative(
        init, X, y, steps=60, learning_rate=0.1, block=128, tol=1e-6,
        max_iters=1000, num_probes=32, precond_rank=0,
        key=jax.random.key(0))
    assert np.isfinite(np.asarray(info["loss"])).all()
    for k in p_dense:
        np.testing.assert_allclose(np.asarray(p_it[k]),
                                   np.asarray(p_dense[k]), atol=0.35,
                                   err_msg=k)


def test_fit_iterative_split_matches_fused(data):
    """split_programs=True (three programs per step — the large-n crash
    discipline) computes the same update as the fused program."""
    X, y = data
    init = kops.init_params(d=1, lengthscale=1.5, noise_var=0.3)
    kw = dict(steps=5, learning_rate=0.1, block=128, tol=1e-7,
              max_iters=2000, num_probes=16, precond_rank=16,
              precond_refresh=2, precond_where="device",
              key=jax.random.key(1))
    p_fused, _ = map_opt.fit_iterative(init, X, y, split_programs=False,
                                       **kw)
    p_split, _ = map_opt.fit_iterative(init, X, y, split_programs=True,
                                       **kw)
    for k in p_fused:
        np.testing.assert_allclose(np.asarray(p_split[k]),
                                   np.asarray(p_fused[k]), atol=5e-3,
                                   err_msg=k)


def test_fit_iterative_composite(data):
    """Composite kinds LEARN through the AD estimator (round-3 VERDICT
    next #4): structure-preserving grads, finite loss, moving params."""
    X, y = data
    init = kops.default_init("rbf+linear", d=1)
    params, info = map_opt.fit_iterative(
        init, X, y, kind="rbf+linear", steps=8, learning_rate=0.1,
        block=128, tol=1e-6, max_iters=1000, num_probes=16,
        precond_rank=0, key=jax.random.key(2))
    assert np.isfinite(np.asarray(info["loss"])).all()
    assert jax.tree.structure(params) == jax.tree.structure(init)
    moved = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         params, init)
    assert max(jax.tree.leaves(moved)) > 1e-3


def test_fit_iterative_with_prior(data):
    """log_prior pulls the MAP toward the prior mode (same contract as
    map_opt.fit(log_prior=...))."""
    X, y = data
    init = kops.init_params(d=1, lengthscale=1.0, noise_var=0.2)

    p_free, _ = map_opt.fit_iterative(
        init, X, y, steps=30, learning_rate=0.1, block=128, tol=1e-6,
        max_iters=1000, num_probes=32, precond_rank=0,
        key=jax.random.key(3))

    def tight_prior(p):  # N(0, 0.05^2) on log_lengthscale only
        return jnp.sum(-0.5 * (p["log_lengthscale"] / 0.05) ** 2)

    p_prior, _ = map_opt.fit_iterative(
        init, X, y, steps=30, learning_rate=0.1, block=128, tol=1e-6,
        max_iters=1000, num_probes=32, precond_rank=0,
        key=jax.random.key(3), log_prior=tight_prior)
    assert (abs(float(p_prior["log_lengthscale"][0]))
            < abs(float(p_free["log_lengthscale"][0])))


def test_gp_facade_fit_iterative(data):
    """GP.fit_iterative conditions the facade for prediction."""
    from cugp_tpu.api import GP

    X, y = data
    gp = GP(kind="rbf")
    info = gp.fit_iterative(X, y, steps=10, learning_rate=0.1, block=128,
                            tol=1e-6, max_iters=500, num_probes=16,
                            precond_rank=0, key=jax.random.key(4))
    assert np.isfinite(np.asarray(info["loss"])).all()
    mu, var = gp.predict(X[:16])
    assert np.isfinite(np.asarray(mu)).all()
    # matrix-free predict agrees with the dense posterior post-fit
    mu_it, var_it = gp.predict_iterative(X[:16], tol=1e-7)
    np.testing.assert_allclose(np.asarray(mu_it), np.asarray(mu), atol=2e-3)


def test_cli_fit_engine_iterative(capsys):
    from cugp_tpu.cli.__main__ import main

    rc = main(["fit", "--data.n=256", "--fit.engine=iterative",
               "--fit.steps=8", "--fit.learning_rate=0.1",
               "--fit.precond_rank=0", "--fit.num_probes=8",
               "--fit.block=128"])
    assert rc == 0
    import json

    out = json.loads(capsys.readouterr().out)
    assert np.isfinite(out["lml"])
    assert "log_lengthscale" in out["params"]


def test_fit_iterative_checkpoint_resume(data, tmp_path):
    """Killed-and-resumed matrix-free fit continues mid-trajectory: a run
    stopped at step 6/12 and resumed lands (near) the uninterrupted run —
    identical probe keys per step; only the preconditioner rebuild cadence
    can differ, which moves CG iterates within solver tolerance."""
    import os

    X, y = data
    init = kops.init_params(d=1, lengthscale=1.5, noise_var=0.3)
    kw = dict(steps=12, learning_rate=0.1, block=128, tol=1e-7,
              max_iters=1000, num_probes=16, precond_rank=0,
              key=jax.random.key(5), checkpoint_every=3)
    full_dir = os.path.join(tmp_path, "full")
    p_full, info_full = map_opt.fit_iterative(
        init, X, y, checkpoint_dir=full_dir, **kw)

    part_dir = os.path.join(tmp_path, "part")
    kw6 = dict(kw, steps=6)
    map_opt.fit_iterative(init, X, y, checkpoint_dir=part_dir, **kw6)
    p_res, info_res = map_opt.fit_iterative(
        init, X, y, checkpoint_dir=part_dir, **kw)
    assert info_res["loss"].shape == (12,)
    for k in p_full:
        np.testing.assert_allclose(np.asarray(p_res[k]),
                                   np.asarray(p_full[k]), rtol=1e-4,
                                   atol=1e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(info_res["loss"]),
                               np.asarray(info_full["loss"]), rtol=1e-3,
                               atol=1e-3)


def test_cli_fit_iterative_checkpoint_resume(tmp_path, capsys):
    import os

    from cugp_tpu.cli.__main__ import main

    ckpt = os.path.join(tmp_path, "it_ck")
    args = ["fit", "--data.n=256", "--fit.engine=iterative",
            "--fit.steps=6", "--fit.learning_rate=0.1",
            "--fit.precond_rank=0", "--fit.num_probes=8",
            "--fit.block=128", f"--checkpoint_dir={ckpt}"]
    assert main(args) == 0
    capsys.readouterr()
    assert os.path.exists(os.path.join(ckpt + "_fit_state", "meta.json"))
    # re-run: facade params load as init AND the optimizer state resumes
    assert main(args) == 0
    import json

    out = json.loads(capsys.readouterr().out)
    assert out["resumed"] is True


def test_fit_iterative_segmented_matches_unsegmented(data):
    """segment_iters>0 routes the [y|z] solve through cg_solve_segmented
    (round-4 VERDICT next #1: the 262k schedule in the TRAINING loop);
    with tight CG tolerance the trajectory matches the one-program
    split path."""
    X, y = data
    init = kops.init_params(d=1, lengthscale=1.5, noise_var=0.3)
    kw = dict(steps=10, learning_rate=0.1, block=128, tol=1e-7,
              max_iters=1000, num_probes=8, precond_rank=16,
              precond_refresh=5, warm_start=False,
              key=jax.random.key(1))
    p_one, i_one = map_opt.fit_iterative(init, X, y, split_programs=True,
                                         segment_iters=0, **kw)
    p_seg, i_seg = map_opt.fit_iterative(init, X, y, segment_iters=9, **kw)
    for k in p_one:
        np.testing.assert_allclose(np.asarray(p_seg[k]),
                                   np.asarray(p_one[k]), atol=5e-3,
                                   err_msg=k)
    assert len(i_seg["cg_iters"]) == 10
    assert (i_seg["cg_iters"] % 9 == 0).all()


def test_fit_iterative_frozen_warm_start(data):
    """probe_mode="frozen" + warm_start: same probes every step, previous
    [y|z] solution as x0 — per-step CG iterations drop after the first
    step, and the fit still recovers the data scale."""
    X, y = data
    init = kops.init_params(d=1, lengthscale=1.8, noise_var=0.4)
    kw = dict(steps=12, learning_rate=0.1, block=128, tol=1e-6,
              max_iters=1000, num_probes=8, precond_rank=0,
              split_programs=True, probe_mode="frozen",
              key=jax.random.key(2))
    p, info = map_opt.fit_iterative(init, X, y, warm_start=True, **kw)
    p0, info0 = map_opt.fit_iterative(init, X, y, warm_start=False, **kw)
    warm = np.asarray(info["cg_iters"])
    cold = np.asarray(info0["cg_iters"])
    assert len(warm) == 12
    # x0 carried across steps must cut total CG work vs cold restarts
    # (per-step conditioning still worsens as the noise shrinks, so the
    # comparison is against the cold run, not against step 0)
    assert warm[1:].sum() < cold[1:].sum()
    assert np.isfinite(np.asarray(info["loss"])).all()
    for k in p:  # same surrogate objective -> same optimum neighborhood
        np.testing.assert_allclose(np.asarray(p[k]), np.asarray(p0[k]),
                                   atol=0.05, err_msg=k)


def test_fit_iterative_final_lml(data):
    """final_lml=True: info["lml"] is a real CG+SLQ LML comparable to the
    dense value at the fitted params; info["quad_obj"] keeps the
    per-step objective (round-4 ADVICE #2 / VERDICT weak #3)."""
    from cugp_tpu.models import exact_gp

    X, y = data
    init = kops.init_params(d=1, lengthscale=1.0, noise_var=0.2)
    p, info = map_opt.fit_iterative(
        init, X, y, steps=5, learning_rate=0.05, block=128, tol=1e-7,
        max_iters=1000, num_probes=64, precond_rank=0, final_lml=True,
        key=jax.random.key(3))
    dense = float(exact_gp.log_marginal_likelihood(p, X, y, method="xla"))
    assert np.isfinite(info["lml"])
    # SLQ logdet carries O(1/sqrt(p)) MC error; 64 probes at n=400 keeps
    # it within a few nats
    assert abs(info["lml"] - dense) < 0.02 * abs(dense) + 5.0
    assert np.isfinite(info["quad_obj"])


def test_gp_predict_iterative_segment_knob(data):
    """GP.predict_iterative(segment_iters=k) equals the one-program path
    (round-4 VERDICT next #1's API-integration test)."""
    from cugp_tpu.api import GP

    X, y = data
    gp = GP(kind="rbf")
    gp.condition(X, y)
    Xs = np.linspace(-3, 3, 64)[:, None]
    mu0, var0 = gp.predict_iterative(Xs, segment_iters=0, tol=1e-7)
    mu1, var1 = gp.predict_iterative(Xs, segment_iters=6, tol=1e-7,
                                     col_batch=17)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(var1), np.asarray(var0),
                               atol=1e-3)
    l0 = float(gp.log_marginal_likelihood_iterative(segment_iters=0))
    l1 = float(gp.log_marginal_likelihood_iterative(segment_iters=8))
    assert abs(l0 - l1) < 1.0


def test_cli_fit_iterative_rejects_incompatible_flags(capsys):
    from cugp_tpu.cli.__main__ import main

    import pytest as _pytest

    with _pytest.raises(ValueError, match="incompatible"):
        main(["fit", "--data.n=128", "--fit.engine=iterative",
              "--fit.steps=2", "--fit.optimizer=lbfgs", "--fit.block=128"])
