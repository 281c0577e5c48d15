"""Benchmark harness (C14): per-op GFLOP/s vs roofline on one chip.

Usage: python benchmarks/bench_ops.py [--n=16384] [--d=8] [--out=results.json]
Emits a JSON table: covariance build, Cholesky variants, TRSM, LML+grad,
plus the measured same-precision GEMM roofline (the denominator for the
>=70%-of-roofline target, BASELINE.json:5). FLOP models per BASELINE.md.
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp


def main(argv=None):
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:])
                if a.startswith("--"))
    n = int(args.get("--n", 16384 if jax.default_backend() == "tpu" else 1024))
    d = int(args.get("--d", 8))
    iters = int(args.get("--iters", 3))

    from cugp_tpu.ops import kernels as kops, cholesky as chol_ops, trsm
    from cugp_tpu.models import exact_gp
    from cugp_tpu.utils import profiling

    on_tpu = jax.default_backend() == "tpu"
    HI = jax.lax.Precision.HIGHEST
    key = jax.random.key(0)
    X = jax.random.uniform(key, (n, d), jnp.float32, -2.0, 2.0)
    y = jnp.sin(2.0 * X[:, 0]) + 0.1 * jax.random.normal(key, (n,))
    params = kops.init_params(d=d, lengthscale=2.0, noise_var=1e-2)
    results = {"n": n, "d": d, "backend": jax.default_backend()}

    # GEMM roofline at matching precision
    m = min(n, 8192)
    a = jax.random.normal(key, (m, m), jnp.float32)
    t = profiling.timed(
        jax.jit(lambda a: jnp.matmul(a, a, precision=HI)), a, iters=iters)
    results["gemm_fp32_tflops"] = 2 * m**3 / t / 1e12

    cov_method = "pallas" if on_tpu else "xla"
    cov = jax.jit(lambda p, X: kops.train_covariance(p, X, method=cov_method))
    t = profiling.timed(cov, params, X, iters=iters)
    results["cov_build"] = {
        "ms": t * 1e3,
        "gflops": profiling.gflops(profiling.cov_flops(n, n, d), t),
        "gb_s": (n * n * 4) / t / 1e9,
    }
    K = cov(params, X)

    for name in (["xla", "blocked"] if on_tpu else ["xla"]):
        ch = jax.jit(lambda K, name=name: chol_ops.cholesky(K, method=name))
        t = profiling.timed(ch, K, iters=iters)
        results[f"chol_{name}"] = {
            "ms": t * 1e3,
            "tflops": profiling.chol_flops(n) / t / 1e12,
            "roofline_frac": (profiling.chol_flops(n) / t / 1e12)
            / results["gemm_fp32_tflops"],
        }
    L = chol_ops.cholesky(K, method="xla")

    nrhs = 512
    B = jax.random.normal(key, (n, nrhs), jnp.float32)
    ts = jax.jit(lambda L, B: trsm.solve_lx(L, B))
    t = profiling.timed(ts, L, B, iters=iters)
    results["trsm_512rhs"] = {
        "ms": t * 1e3,
        "gflops": profiling.gflops(profiling.trsm_flops(n, nrhs), t),
    }

    vg = jax.jit(jax.value_and_grad(
        lambda p: exact_gp.log_marginal_likelihood(p, X, y, method="auto")))
    t = profiling.timed(vg, params, iters=iters)
    # LML grad = cov + chol + solves + vjp(2 trsm + gemm) ~ 3x chol flops
    results["lml_value_and_grad"] = {"ms": t * 1e3}

    print(json.dumps(results, indent=2, default=float))
    if "--out" in args:
        with open(args["--out"], "w") as f:
            json.dump(results, f, indent=2, default=float)


if __name__ == "__main__":
    main()
