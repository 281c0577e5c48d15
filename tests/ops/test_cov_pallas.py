"""C1 Pallas covariance builder vs oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cugp_tpu.ops import cov_pallas
from cugp_tpu.oracle import exact_gp_np as oracle

KINDS = ["rbf", "matern32"]


def _p32(p):
    return {k: jnp.asarray(v, jnp.float32) for k, v in p.items()}


@pytest.mark.parametrize("kind", KINDS)
def test_cross_covariance_pallas(kind, rng, default_params):
    X1 = rng.uniform(-2, 2, size=(300, 3))
    X2 = rng.uniform(-2, 2, size=(130, 3))
    p = dict(default_params, log_lengthscale=np.log([0.8, 1.1, 0.6]))
    K_ref = oracle.kernel_matrix(p, X1, X2, kind)
    K = cov_pallas.cross_covariance_pallas(
        _p32(p), jnp.asarray(X1, jnp.float32), jnp.asarray(X2, jnp.float32),
        kind)
    assert K.shape == (300, 130)
    np.testing.assert_allclose(np.asarray(K), K_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kind", KINDS)
def test_train_covariance_pallas(kind, rng, default_params):
    X = rng.uniform(-2, 2, size=(200, 2))
    p = dict(default_params, log_lengthscale=np.log([0.8, 1.1]))
    K_ref = oracle.train_covariance(p, X, kind, jitter=1e-6)
    K = cov_pallas.train_covariance_pallas(
        _p32(p), jnp.asarray(X, jnp.float32), kind, jitter=1e-6)
    np.testing.assert_allclose(np.asarray(K), K_ref, rtol=1e-4, atol=1e-5)


def test_train_covariance_padded_identity_block(rng, default_params):
    """Padded region must be exactly the identity (Cholesky-safe)."""
    X = rng.uniform(-2, 2, size=(100, 1))
    p = dict(default_params, log_lengthscale=np.log([0.8]))
    K = np.asarray(cov_pallas.train_covariance_pallas(
        _p32(p), jnp.asarray(X, jnp.float32), "rbf", jitter=1e-6,
        pad_to=256))
    assert K.shape == (256, 256)
    np.testing.assert_array_equal(K[100:, :100], 0.0)
    np.testing.assert_array_equal(K[:100, 100:], 0.0)
    np.testing.assert_array_equal(K[100:, 100:], np.eye(156))
    # LML path equivalence: chol of padded == chol of unpadded + identity
    # (same fp32 matrix; factor in float64 so LAPACK's size-dependent
    # blocking doesn't introduce fp32 rounding differences)
    L = np.linalg.cholesky(K.astype(np.float64))
    L_ref = np.linalg.cholesky(K[:100, :100].astype(np.float64))
    np.testing.assert_allclose(L[:100, :100], L_ref, rtol=1e-6, atol=1e-7)
    assert abs(np.sum(np.log(np.diag(L))) - np.sum(np.log(np.diag(L_ref)))) < 1e-6
    # and the fp32 K itself matches the float64 oracle covariance
    K_ref = oracle.train_covariance(p, X, "rbf", jitter=1e-6)
    np.testing.assert_allclose(K[:100, :100], K_ref, rtol=1e-4, atol=1e-5)


def test_rq_pallas_matches_oracle(rng, default_params):
    X = rng.uniform(-2, 2, size=(150, 2))
    p = dict(default_params, log_lengthscale=np.log([0.8, 1.1]),
             log_alpha=np.array(np.log(1.5)))
    K_ref = oracle.train_covariance(p, X, "rq", jitter=1e-6)
    K = cov_pallas.train_covariance_pallas(
        _p32(p), jnp.asarray(X, jnp.float32), "rq", jitter=1e-6)
    np.testing.assert_allclose(np.asarray(K), K_ref, rtol=1e-4, atol=1e-5)


def test_pallas_builder_is_differentiable(rng, default_params):
    """jax.grad through the Pallas builder (custom_vjp routes the backward
    through the XLA builder — Pallas kernels have no JVP rule and round 1's
    unwrapped dispatch crashed TPU fit at n>=1024 with method='auto')."""
    import jax
    from cugp_tpu.ops import kernels as kops

    X = jnp.asarray(rng.uniform(-2, 2, size=(256, 2)), jnp.float32)
    p = _p32(dict(default_params, log_lengthscale=np.log([0.8, 1.1])))

    def loss_pallas(p):
        K = kops._train_cov_pallas_ad(p, X, "rbf", 1e-6, None)
        return jnp.sum(K * jnp.cos(K))

    def loss_xla(p):
        K = kops.train_covariance_xla(p, X, "rbf", 1e-6)
        return jnp.sum(K * jnp.cos(K))

    g_p = jax.grad(loss_pallas)(p)
    g_x = jax.grad(loss_xla)(p)
    for k in g_x:
        np.testing.assert_allclose(np.asarray(g_p[k]), np.asarray(g_x[k]),
                                   rtol=1e-3, atol=1e-3)


def test_pallas_cross_builder_is_differentiable(rng, default_params):
    import jax
    from cugp_tpu.ops import kernels as kops

    X1 = jnp.asarray(rng.uniform(-2, 2, size=(256, 2)), jnp.float32)
    X2 = jnp.asarray(rng.uniform(-2, 2, size=(130, 2)), jnp.float32)
    p = _p32(dict(default_params, log_lengthscale=np.log([0.8, 1.1])))

    g_p = jax.grad(lambda p: jnp.sum(
        kops._cross_cov_pallas_ad(p, X1, X2, "rbf", None) ** 2))(p)
    g_x = jax.grad(lambda p: jnp.sum(
        kops.cross_covariance_xla(p, X1, X2, "rbf") ** 2))(p)
    for k in g_x:
        np.testing.assert_allclose(np.asarray(g_p[k]), np.asarray(g_x[k]),
                                   rtol=1e-3, atol=1e-3)


def test_pallas_kernels_match_under_vmap(rng, default_params):
    """Batched (vmapped) Pallas builder/matvec == per-example loop.

    Regression for the round-5 TPU lowering fix: SMEM scalars must be
    (1, 3) so the vmap-batched array (B, 1, 3) blocks legally on Mosaic
    (the 1-D (3,) layout failed to lower inside the vmapped iterative
    sampler — chains vmap over hyperparameters); also certifies the
    kernels' program_id tile indexing survives the prepended batch grid
    dim (diag placement would silently corrupt otherwise).
    """
    import jax
    from cugp_tpu.ops import kernels as kops

    n, d, B = 384, 2, 3
    X = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)
    ps = [kops.init_params(d=d, lengthscale=0.5 + 0.3 * b,
                           signal_var=1.0 + b, noise_var=0.05 * (b + 1))
          for b in range(B)]
    stack = jax.tree.map(lambda *a: jnp.stack(a), *ps)

    f = lambda p: cov_pallas.train_cov_matvec_pallas(p, X, v, kind="rbf")
    mv_loop = jnp.stack([f(p) for p in ps])
    mv_vmap = jax.vmap(f)(stack)
    np.testing.assert_allclose(np.asarray(mv_vmap), np.asarray(mv_loop),
                               rtol=1e-6, atol=1e-6)

    g = lambda p: cov_pallas.train_covariance_pallas(p, X, kind="rbf")
    k_loop = jnp.stack([g(p) for p in ps])
    k_vmap = jax.vmap(g)(stack)
    np.testing.assert_allclose(np.asarray(k_vmap), np.asarray(k_loop),
                               rtol=1e-6, atol=1e-6)
