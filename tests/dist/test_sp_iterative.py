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


def test_sharded_preconditioned_cg(mesh2d):
    """Woodbury-preconditioned sharded CG (round-4 VERDICT next #3):
    fewer iterations at stiff hyperparameters, same solution."""
    X, y = _data()
    p = kops.init_params(d=3, lengthscale=1.6, noise_var=1e-3)
    pre = iterative.precond_factors(p, X, rank=64)
    x_plain, it_plain = sp_iterative.cg_solve_sharded(
        p, X, y, mesh2d, axis="r", tol=1e-6, max_iters=2000)
    x_pre, it_pre = sp_iterative.cg_solve_sharded(
        p, X, y, mesh2d, axis="r", tol=1e-6, max_iters=2000, precond=pre)
    assert int(it_pre) < int(it_plain), (int(it_pre), int(it_plain))
    # the system is deliberately stiff (cond ~ n sf2/sn2), so elementwise
    # CG-vs-CG agreement is bounded by cond x tol — compare both to the
    # float64 direct solve with a solution-norm-scaled tolerance
    K = np.asarray(kops.train_covariance_xla(p, X, kind="rbf",
                                             jitter=1e-6), np.float64)
    x_dir = np.linalg.solve(K, np.asarray(y, np.float64))
    scale = np.linalg.norm(x_dir)
    assert (np.linalg.norm(np.asarray(x_pre) - x_dir) / scale < 5e-3)
    assert (np.linalg.norm(np.asarray(x_plain) - x_dir) / scale < 5e-3)


def test_sharded_gradients_match_single_device(mesh2d):
    """hutchinson_grads_sharded == hutchinson_grads_program given the
    same solves/probes (the ring AD sweep is the same estimator)."""
    X, y = _data()
    p = kops.init_params(d=3, lengthscale=1.1, noise_var=0.05)
    key = jax.random.key(3)
    z = jax.random.rademacher(key, (X.shape[0], 8), dtype=jnp.float32)
    mv = iterative.make_matvec(p, X, kind="rbf", block=128)
    sol, _ = iterative.cg_solve(mv, jnp.concatenate([y[:, None], z], 1),
                                tol=1e-7, max_iters=2000)
    alpha, w = sol[:, 0], sol[:, 1:]
    g_ref = iterative.hutchinson_grads_program(p, X, alpha, w, z,
                                               kind="rbf", block=128)
    g_sh = sp_iterative.hutchinson_grads_sharded(p, X, alpha, w, z,
                                                 mesh2d, kind="rbf",
                                                 axis="r")
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_sh[k]),
                                   np.asarray(g_ref[k]), rtol=2e-3,
                                   atol=2e-3, err_msg=k)


def test_sharded_gradients_composite(mesh2d):
    """The sharded AD sweep serves composite kernels (same tile algebra)."""
    X, y = _data(d=2)
    kind = "rbf+linear"
    p = kops.default_init(kind, d=2, noise_var=0.05)
    key = jax.random.key(4)
    z = jax.random.rademacher(key, (X.shape[0], 8), dtype=jnp.float32)
    mv = iterative.make_matvec(p, X, kind=kind, block=128)
    sol, _ = iterative.cg_solve(mv, jnp.concatenate([y[:, None], z], 1),
                                tol=1e-7, max_iters=2000)
    alpha, w = sol[:, 0], sol[:, 1:]
    g_ref = iterative.hutchinson_grads_program(p, X, alpha, w, z,
                                               kind=kind, block=128)
    g_sh = sp_iterative.hutchinson_grads_sharded(p, X, alpha, w, z,
                                                 mesh2d, kind=kind,
                                                 axis="r")
    from jax.flatten_util import ravel_pytree

    r_flat = np.asarray(ravel_pytree(g_ref)[0])
    s_flat = np.asarray(ravel_pytree(g_sh)[0])
    # the two paths assemble gradients from intermediates of magnitude
    # ~||g|| in different reduction orders (128-row blocks vs 64-row
    # shards + psum) — absolute fp32 noise scales with the DOMINANT
    # gradient entry, not each entry's own size
    atol = 1e-4 * np.linalg.norm(r_flat)
    np.testing.assert_allclose(s_flat, r_flat, rtol=2e-3, atol=atol)


@pytest.mark.deep
def test_fit_iterative_sharded_matches_single_device(mesh2d):
    """The distributed training loop (round-4 VERDICT next #3: the ring
    tier LEARNS) matches single-device fit_iterative on the same
    data/key to reduction-order tolerance."""
    from cugp_tpu.inference import map_opt

    X, y = _data(n=256)
    init = kops.init_params(d=3, lengthscale=1.4, noise_var=0.3)
    kw = dict(steps=8, learning_rate=0.1, tol=1e-6, max_iters=1000,
              num_probes=8, precond_rank=0, key=jax.random.key(5))
    p_sh, i_sh = sp_iterative.fit_iterative_sharded(init, X, y, mesh2d,
                                                    axis="r", **kw)
    p_ref, i_ref = map_opt.fit_iterative(init, X, y, block=128,
                                         split_programs=True,
                                         warm_start=False, **kw)
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_sh[k]),
                                   np.asarray(p_ref[k]), atol=2e-3,
                                   err_msg=k)
    assert len(i_sh["cg_iters"]) == 8
    assert np.isfinite(np.asarray(i_sh["loss"])).all()


@pytest.mark.deep
def test_sharded_logprob_matches_iterative(mesh2d):
    """make_sharded_logprob == make_iterative_logprob given identical
    frozen probes: same target value and gradient (round-4 VERDICT next
    #4's correctness core)."""
    from cugp_tpu.inference import sampling

    X, y = _data()
    p0 = kops.init_params(d=3, lengthscale=1.0, noise_var=0.1)
    pk = jax.random.key(11)
    lp_sh, unravel, q0 = sp_iterative.make_sharded_logprob(
        p0, X, y, mesh2d, axis="r", tol=1e-7, max_iters=2000,
        num_probes=8, num_steps=20, probe_key=pk)
    lp_it, _, _ = sampling.make_iterative_logprob(
        p0, X, y, block=128, tol=1e-7, max_iters=2000, num_probes=8,
        num_steps=20, probe_key=pk)
    for dq in (0.0, 0.15, -0.2):
        q = q0 + dq
        v_sh, g_sh = lp_sh(q)
        v_it, g_it = lp_it(q)
        np.testing.assert_allclose(float(v_sh), float(v_it), rtol=1e-3,
                                   atol=0.5)
        np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_it),
                                   rtol=5e-3, atol=5e-3)


@pytest.mark.deep
def test_sample_hyperparams_sharded_moments(mesh2d):
    """Chains over the sharded LML agree with the single-device
    iterative sampler in posterior moments (same probes/config/keys)."""
    from cugp_tpu.inference import sampling

    X, y = _data(n=256)
    p0 = kops.init_params(d=3, lengthscale=1.0, noise_var=0.1)
    pk = jax.random.key(11)
    kw = dict(num_samples=48, num_chains=4, num_warmup=32, sampler="hmc",
              n_leapfrog=8, tol=1e-6, max_iters=1000, num_probes=8,
              num_steps=16, probe_key=pk, key=jax.random.key(9))
    r_sh = sp_iterative.sample_hyperparams_sharded(p0, X, y, mesh2d,
                                                   axis="r", **kw)
    r_it = sampling.sample_hyperparams_iterative(p0, X, y, block=128,
                                                 **kw)
    assert float(r_sh["accept_rate"]) > 0.5
    for k in r_sh["samples"]:
        m_sh = np.asarray(r_sh["samples"][k]).mean(axis=(0, 1))
        m_it = np.asarray(r_it["samples"][k]).mean(axis=(0, 1))
        s_it = np.asarray(r_it["samples"][k]).std() + 1e-3
        np.testing.assert_allclose(m_sh, m_it, atol=3 * s_it,
                                   err_msg=k)
