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
