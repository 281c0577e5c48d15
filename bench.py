"""Driver benchmark: ONE JSON line with the north-star metric.

Metric (BASELINE.json:2): Cholesky+covariance GFLOP/s/chip at N=32k.
FLOP model (BASELINE.md): Cholesky N^3/3, covariance build 2 N^2 d.
vs_baseline: achieved / (0.70 * measured fp32-HIGHEST GEMM roofline on this
chip) — the reference published no numbers (BASELINE.md), so the operative
baseline is the >=70%-of-roofline target from BASELINE.json:5. A value of
1.0 therefore means "hit the 70% roofline target exactly".
"""

import json
import sys
import time

import numpy as np


def _time(fn, *args, warmup=1, iters=3):
    # fetch-barrier timing: on the axon backend block_until_ready returns
    # before execution completes; only a host fetch truly synchronizes
    from cugp_tpu.utils import profiling

    t = profiling.timed(fn, *args, warmup=warmup, iters=iters)
    return t, fn(*args)


def main():
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    n = 32768 if on_tpu else 1024
    d = 8

    from cugp_tpu.ops import kernels as kops
    from cugp_tpu.ops import cholesky as chol_ops

    # NOTE: all large arrays are generated ON DEVICE (jax.random) — host
    # uploads of O(100MB) buffers stall for minutes over the axon tunnel
    key = jax.random.key(0)
    X = jax.random.uniform(key, (n, d), jnp.float32, -2.0, 2.0)
    params = kops.init_params(d=d, lengthscale=2.0, noise_var=1e-2)

    method = "pallas" if on_tpu else "xla"

    # measured fp32-HIGHEST GEMM roofline (denominator of vs_baseline)
    m = 8192 if on_tpu else 1024
    a = jax.jit(lambda k: jax.random.normal(k, (m, m), jnp.float32))(key)
    gemm = jax.jit(lambda a: jnp.matmul(a, a, precision=jax.lax.Precision.HIGHEST))
    t_gemm, _ = _time(gemm, a)
    gemm_gflops = 2 * m**3 / t_gemm / 1e9

    cov = jax.jit(lambda p, X: kops.train_covariance(p, X, kind="rbf",
                                                     jitter=1e-6,
                                                     method=method))
    t_cov, K = _time(cov, params, X)

    chol = jax.jit(lambda K: chol_ops.cholesky(K, method=method))
    t_chol, L = _time(chol, K)
    assert bool(jnp.isfinite(L[-1, -1])), "cholesky produced non-finite output"

    flops = n**3 / 3 + 2 * n**2 * d
    gflops = flops / (t_cov + t_chol) / 1e9
    target = 0.70 * gemm_gflops
    print(json.dumps({
        "metric": f"cov+chol GFLOP/s/chip @ N={n} (fp32)",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / target, 4),
        "detail": {
            "t_cov_s": round(t_cov, 4),
            "t_chol_s": round(t_chol, 4),
            "gemm_fp32_gflops": round(gemm_gflops, 2),
            "n": n,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
