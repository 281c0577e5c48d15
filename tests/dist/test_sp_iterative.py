"""Distributed matrix-free tier (parallel/sp_iterative): ring matvec +
sharded CG + sharded posterior vs the single-device iterative tier, on
the 8-virtual-device CPU mesh (round-4 beyond-parity surface)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugp_tpu.inference import iterative
from cugp_tpu.ops import kernels as kops
from cugp_tpu.parallel import mesh as mesh_lib
from cugp_tpu.parallel import sp_iterative

pytestmark = pytest.mark.dist


@pytest.fixture(scope="module")
def mesh2d():
    return mesh_lib.make_mesh(8, dp=1)  # ('dp','r','c'): r=4, c=2


def _data(n=512, d=3, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(-2, 2, (n, d)), jnp.float32)
    y = jnp.asarray(rng.standard_normal(n), jnp.float32)
    return X, y


def test_ring_matvec_matches_dense(mesh2d):
    X, y = _data()
    p = kops.init_params(d=3, lengthscale=1.1, noise_var=0.05)
    K = kops.train_covariance_xla(p, X, kind="rbf", jitter=1e-6)
    out = sp_iterative.ring_matvec(p, X, y, mesh2d, kind="rbf", axis="r")
    np.testing.assert_allclose(np.asarray(out), np.asarray(K @ y),
                               rtol=1e-4, atol=1e-4)
    # batched rhs + tuple ring axis (all 8 chips)
    V = jnp.asarray(np.random.default_rng(1).standard_normal((512, 3)),
                    jnp.float32)
    outV = sp_iterative.ring_matvec(p, X, V, mesh2d, kind="rbf",
                                    axis=("r", "c"))
    np.testing.assert_allclose(np.asarray(outV), np.asarray(K @ V),
                               rtol=1e-4, atol=1e-4)


def test_ring_matvec_composite(mesh2d):
    X, y = _data(d=2)
    kind = "periodic*rbf+linear"
    p = kops.default_init(kind, d=2, noise_var=0.05)
    K = kops.train_covariance_xla(p, X, kind=kind, jitter=1e-6)
    out = sp_iterative.ring_matvec(p, X, y, mesh2d, kind=kind, axis="r")
    np.testing.assert_allclose(np.asarray(out), np.asarray(K @ y),
                               rtol=1e-4, atol=1e-4)


def test_sharded_cg_matches_single_device(mesh2d):
    X, y = _data()
    p = kops.init_params(d=3, lengthscale=1.1, noise_var=0.05)
    mv = iterative.make_matvec(p, X, kind="rbf", block=128)
    x_ref, _ = iterative.cg_solve(mv, y, tol=1e-7, max_iters=1000)
    x, it = sp_iterative.cg_solve_sharded(p, X, y, mesh2d, kind="rbf",
                                          axis="r", tol=1e-7,
                                          max_iters=1000)
    assert int(it) < 1000
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=5e-3, atol=5e-3)


def test_sharded_posterior_matches_single_device(mesh2d):
    X, y = _data()
    p = kops.init_params(d=3, lengthscale=1.1, noise_var=0.05)
    Xs = jnp.asarray(np.random.default_rng(2).uniform(-2, 2, (32, 3)),
                     jnp.float32)
    mu_ref, var_ref = iterative.posterior_iterative(
        p, X, y, Xs, kind="rbf", block=128, tol=1e-7)
    mu, var = sp_iterative.posterior_iterative_sharded(
        p, X, y, Xs, mesh2d, kind="rbf", axis="r", tol=1e-7)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               atol=2e-3)


def test_ring_matvec_collectives(mesh2d):
    """HLO census: the ring matvec lowers to collective-permutes (the
    ring) with NO all-gather of X and no all-reduce in the matvec body
    (psum appears only in CG's scalar reductions)."""
    X, y = _data(n=256)
    p = kops.init_params(d=3, lengthscale=1.1, noise_var=0.05)
    fn = jax.jit(lambda X, y: sp_iterative.ring_matvec(
        p, X, y, mesh2d, kind="rbf", axis="r"))
    txt = fn.lower(X, y).compile().as_text()
    assert txt.count("collective-permute") > 0
    body_ar = [l for l in txt.splitlines()
               if "all-reduce" in l and "= " in l and "/gather" not in l]
    assert body_ar == []


def test_sharded_lml_matches_single_device(mesh2d):
    X, y = _data()
    p = kops.init_params(d=3, lengthscale=1.1, noise_var=0.05)
    ref = float(iterative.lml_iterative(
        p, X, y, key=jax.random.key(4), kind="rbf", block=128,
        num_probes=32, num_steps=40))
    got = float(sp_iterative.lml_iterative_sharded(
        p, X, y, mesh2d, key=jax.random.key(4), kind="rbf", axis="r",
        num_probes=32, num_steps=40))
    # both are SLQ estimators (different probe partitions of the same
    # rademacher draw reduce identically; CG solves agree to tolerance)
    assert abs(got - ref) / X.shape[0] < 0.02
