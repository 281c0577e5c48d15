"""Performance floor tests — marker `perf`, real TPU only (SURVEY.md sec 4).

Conservative floors (half of measured round-1 numbers, PERF.md) so flaky
tunnels don't make CI red; the bench harnesses report the precise values.
"""

import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.perf


@pytest.fixture(scope="module")
def chip_data():
    from cugp_tpu.ops import kernels as kops

    key = jax.random.key(0)
    n, d = 8192, 8
    X = jax.random.uniform(key, (n, d), jnp.float32, -2.0, 2.0)
    params = kops.init_params(d=d, lengthscale=2.0, noise_var=1e-2)
    return params, X, n, d


def test_covariance_build_floor(chip_data):
    from cugp_tpu.ops import kernels as kops
    from cugp_tpu.utils import profiling

    params, X, n, d = chip_data
    cov = jax.jit(lambda p, X: kops.train_covariance(p, X, method="pallas"))
    t = profiling.timed(cov, params, X, iters=2)
    gb_s = n * n * 4 / t / 1e9
    assert gb_s > 30.0, f"covariance build {gb_s:.0f} GB/s below floor"


def test_cholesky_floor(chip_data):
    from cugp_tpu.ops import kernels as kops, cholesky as chol_ops
    from cugp_tpu.utils import profiling

    params, X, n, d = chip_data
    K = jax.jit(lambda p, X: kops.train_covariance(p, X, method="pallas"))(
        params, X)
    chol = jax.jit(lambda K: chol_ops.cholesky(
        K, method="blocked", precision=jax.lax.Precision.HIGH))
    t = profiling.timed(chol, K, iters=2)
    tflops = n**3 / 3 / t / 1e12
    assert tflops > 10.0, f"cholesky {tflops:.1f} TF/s below floor"
    L = chol(K)
    assert bool(jnp.isfinite(jnp.sum(jnp.diagonal(L))))


def test_pallas_cov_beats_xla(chip_data):
    """The native tier must stay the measured winner for C1 (round-2
    bench_ops: 0.35 vs 0.75 ms at 8192) — on-device loop timed."""
    import jax.numpy as jnp
    from cugp_tpu.ops import kernels as kops
    from cugp_tpu.utils import profiling

    params, X, n, d = chip_data

    def mk(cm):
        def step(X_):
            K = kops.train_covariance(params, X_, method=cm)
            return X_ * (1.0 + 0.0 * jnp.mean(K))
        return step

    t_pallas = profiling.timed_loop(mk("pallas"), X, iters=6)
    t_xla = profiling.timed_loop(mk("xla"), X, iters=6)
    assert t_pallas < t_xla, (t_pallas, t_xla)


def test_lml_grad_through_pallas_builder(chip_data):
    """TPU gradients with the auto (Pallas) builder must work and stay
    under a generous wall (round-2 fix: no Pallas JVP rule -> custom_vjp;
    measured 207 ms at 8192)."""
    import jax.numpy as jnp
    from cugp_tpu.models import exact_gp
    from cugp_tpu.utils import profiling

    params, X, n, d = chip_data
    y = jnp.sin(2.0 * X[:, 0])
    vg = jax.jit(jax.value_and_grad(
        lambda p: exact_gp.log_marginal_likelihood(p, X, y, method="auto")))
    t = profiling.timed(vg, params, iters=2)
    v, g = vg(params)
    assert bool(jnp.isfinite(v))
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))
    assert t < 1.0, f"lml grad {t:.2f}s above ceiling"
