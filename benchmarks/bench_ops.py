"""Benchmark harness (C14): per-op GFLOP/s vs roofline on one chip.

Usage: python benchmarks/bench_ops.py [--n=16384] [--d=8] [--out=results.json]
Emits a JSON table: covariance build (Pallas vs XLA A/B), Cholesky
variants, the Pallas potrf base kernel vs XLA at the recursion base size,
TRSM, LML+grad, plus the measured same-precision GEMM roofline (the
denominator for the >=70%-of-roofline target, BASELINE.json:5). FLOP
models per BASELINE.md. All timings subtract the measured tunnel dispatch
RTT (fetch-barrier timed; see utils/profiling.py).
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
    if "--platform" in args:
        jax.config.update("jax_platforms", args["--platform"])
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

    rtt = profiling.rtt_overhead()
    results["dispatch_rtt_ms"] = rtt * 1e3

    def timed(fn, *a, **kw):
        return max(profiling.timed(fn, *a, iters=iters, **kw) - rtt, 1e-9)

    # GEMM roofline at matching precision
    m = min(n, 8192)
    a = jax.random.normal(key, (m, m), jnp.float32)
    t = timed(jax.jit(lambda a: jnp.matmul(a, a, precision=HI)), a)
    results["gemm_fp32_tflops"] = 2 * m**3 / t / 1e12

    # covariance build: native Pallas tier vs XLA A/B
    cov_methods = ["pallas", "xla"] if on_tpu else ["xla"]
    for cm in cov_methods:
        cov = jax.jit(lambda p, X, cm=cm: kops.train_covariance(
            p, X, method=cm))
        t = timed(cov, params, X)
        results[f"cov_build_{cm}"] = {
            "ms": t * 1e3,
            "gflops": profiling.gflops(profiling.cov_flops(n, n, d), t),
            "gb_s": (n * n * 4) / t / 1e9,
        }
    if on_tpu:
        results["cov_winner"] = min(
            cov_methods, key=lambda cm: results[f"cov_build_{cm}"]["ms"])
    K = jax.jit(lambda p, X: kops.train_covariance(
        p, X, method=cov_methods[0]))(params, X)

    for name in (["xla", "blocked", "pallas"] if on_tpu else ["xla"]):
        ch = jax.jit(lambda K, name=name: chol_ops.cholesky(K, method=name))
        t = timed(ch, K)
        results[f"chol_{name}"] = {
            "ms": t * 1e3,
            "tflops": profiling.chol_flops(n) / t / 1e12,
            "roofline_frac": (profiling.chol_flops(n) / t / 1e12)
            / results["gemm_fp32_tflops"],
        }

    # native-tier potrf base kernel vs XLA at the recursion base size,
    # timed on-device (loop-chained) so the comparison is RTT-free
    if on_tpu:
        from cugp_tpu.ops import chol_pallas

        nb = 1024
        ab = jax.random.normal(key, (nb, nb), jnp.float32)
        ab = jnp.matmul(ab, ab.T, precision=HI) + nb * jnp.eye(nb)

        def mk_step(fn):
            def step(x):
                l = fn(x)
                return jnp.matmul(l, l.T, precision=HI) + 0.0 * l
            return step

        t_p = profiling.timed_loop(mk_step(chol_pallas.potrf), ab, iters=8)
        t_x = profiling.timed_loop(mk_step(jax.lax.linalg.cholesky), ab,
                                   iters=8)
        t_r = profiling.timed_loop(
            lambda x: jnp.matmul(x, jnp.eye(nb, dtype=x.dtype), precision=HI),
            ab, iters=8)
        results["potrf_base_1024"] = {
            "pallas_ms": max(t_p - t_r, 0.0) * 1e3,
            "xla_ms": max(t_x - t_r, 0.0) * 1e3,
            "winner": "pallas" if t_p < t_x else "xla",
        }

    L = chol_ops.cholesky(K, method="xla")
    nrhs = 512
    B = jax.random.normal(key, (n, nrhs), jnp.float32)
    ts = jax.jit(lambda L, B: trsm.solve_lx(L, B))
    t = timed(ts, L, B)
    results["trsm_512rhs"] = {
        "ms": t * 1e3,
        "gflops": profiling.gflops(profiling.trsm_flops(n, nrhs), t),
    }

    vg = jax.jit(jax.value_and_grad(
        lambda p: exact_gp.log_marginal_likelihood(p, X, y, method="auto")))
    t = timed(vg, params)
    # LML grad = cov + chol + solves + vjp(2 trsm + gemm) ~ 3x chol flops
    results["lml_value_and_grad"] = {"ms": t * 1e3}

    print(json.dumps(results, indent=2, default=float))
    if "--out" in args:
        with open(args["--out"], "w") as f:
            json.dump(results, f, indent=2, default=float)


if __name__ == "__main__":
    main()
