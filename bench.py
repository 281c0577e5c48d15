"""Driver benchmark: ONE JSON line with the north-star metric.

Metric (BASELINE.json:2): Cholesky+covariance GFLOP/s/chip at N=32k.
FLOP model (BASELINE.md): Cholesky N^3/3, covariance build 2 N^2 d.

Configuration: Pallas fused covariance tiles + the recursive blocked
Cholesky with bf16_3x (Precision.HIGH) trailing updates — gated by an
in-bench accuracy check (block reconstruction residual must stay below
2e-4 relative, ~10x the fp32 path's residual and far inside the 1e-3
posterior-accuracy bar of BASELINE.json:5).

vs_baseline: achieved / (0.70 * measured same-precision GEMM roofline on
this chip). The reference published no numbers (BASELINE.md), so the
operative baseline is the ">=70% of roofline FLOPs" target from
BASELINE.json:5 — vs_baseline = 1.0 means exactly on target, >1 beats it.
"""

import json
import sys


def main():
    import os

    import jax

    if os.environ.get("BENCH_PLATFORM"):
        # the site env pins JAX_PLATFORMS=axon; only jax.config overrides it
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp

    from cugp_tpu.ops import kernels as kops
    from cugp_tpu.ops import cholesky as chol_ops
    from cugp_tpu.utils import profiling

    on_tpu = jax.default_backend() == "tpu"
    n = 32768 if on_tpu else 2048
    d = 8
    HI = jax.lax.Precision.HIGHEST
    prec = jax.lax.Precision.HIGH if on_tpu else HI
    method = "blocked" if on_tpu else "xla"

    key = jax.random.key(0)
    X = jax.random.uniform(key, (n, d), jnp.float32, -2.0, 2.0)
    params = kops.init_params(d=d, lengthscale=2.0, noise_var=1e-2)

    cov = jax.jit(lambda p, X: kops.train_covariance(
        p, X, kind="rbf", jitter=1e-6,
        method="pallas" if on_tpu else "xla"))
    t_cov = profiling.timed(cov, params, X, iters=2)
    K = cov(params, X)

    # accuracy gate on a 4096-row block (bounded memory): ||LL^T - K|| / ||K||
    nb = min(n, 4096)
    resid = jax.jit(lambda L, K: jnp.max(jnp.abs(
        jnp.matmul(L[:nb], L[:nb].mT, precision=HI) - K[:nb, :nb]))
        / jnp.max(jnp.abs(K[:nb, :nb])))

    t_chol = None
    for attempt_prec in (prec, HI):
        chol = jax.jit(lambda K, p=attempt_prec: chol_ops.cholesky(
            K, method=method, precision=p))
        L = chol(K)
        relerr = float(resid(L, K))
        if relerr < 2e-4:
            t_chol = profiling.timed(chol, K, iters=2)
            prec = attempt_prec
            break
    assert t_chol is not None, (
        f"cholesky accuracy gate failed at all precisions: relerr={relerr}")

    # same-precision GEMM roofline (denominator of vs_baseline), measured
    # with the on-device loop timer so the tunnel RTT doesn't deflate it
    m = min(n, 8192)
    a = jax.jit(lambda k: jax.random.normal(k, (m, m), jnp.float32))(key)

    def gemm_step(ab):
        x, y_ = ab
        c = jnp.matmul(x, y_, precision=prec)
        return (x, c * jax.lax.rsqrt(jnp.mean(c * c) + 1e-9))

    t_gemm = profiling.timed_loop(gemm_step, (a, a), iters=6)
    gemm_gflops = 2 * m**3 / t_gemm / 1e9
    del a


    flops = n**3 / 3 + 2 * n**2 * d
    gflops = flops / (t_cov + t_chol) / 1e9
    target = 0.70 * gemm_gflops
    print(json.dumps({
        "metric": f"cov+chol GFLOP/s/chip @ N={n}",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / target, 4),
        "detail": {
            "t_cov_s": round(t_cov, 4),
            "t_chol_s": round(t_chol, 4),
            "chol_tflops": round(n**3 / 3 / t_chol / 1e12, 2),
            "gemm_roofline_gflops": round(gemm_gflops, 2),
            "chol_recon_relerr": relerr,
            "precision": str(prec),
            "n": n,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
