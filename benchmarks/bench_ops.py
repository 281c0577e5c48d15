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

    # Sub-100ms ops are unmeasurable through the tunnel with per-call
    # timing (the dispatch RTT is ~5-30 ms and FLUCTUATES), so everything
    # below chains iterations ON DEVICE (lax.scan with a data dependency,
    # profiling.timed_loop) and only fetches once. Each chained step adds
    # one O(N^2) mean-reduce to defeat DCE — identical across variants, so
    # A/B comparisons are fair; absolute numbers include it (~0.3 ms at
    # n=8192).
    results["dispatch_rtt_ms"] = profiling.rtt_overhead() * 1e3

    # GEMM roofline at matching precision (on-device loop, as bench.py)
    m = min(n, 8192)
    a = jax.random.normal(key, (m, m), jnp.float32)

    def gemm_step(ab):
        x, y_ = ab
        c = jnp.matmul(x, y_, precision=HI)
        return (x, c * jax.lax.rsqrt(jnp.mean(c * c) + 1e-9))

    t = profiling.timed_loop(gemm_step, (a, a), iters=max(iters, 6))
    results["gemm_fp32_tflops"] = 2 * m**3 / t / 1e12

    # covariance build: native Pallas tier vs XLA A/B. The chain perturbs
    # X by a K-dependent epsilon so iterations serialize; mean(K) defeats
    # DCE on the XLA path (the Pallas kernel is opaque either way).
    cov_methods = ["pallas", "xla"] if on_tpu else ["xla"]
    for cm in cov_methods:
        def cov_step(X_, cm=cm):
            K = kops.train_covariance(params, X_, method=cm)
            return X_ * (1.0 + 0.0 * jnp.mean(K))

        t = profiling.timed_loop(cov_step, X, iters=max(iters, 6))
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

    # Cholesky variants: chain by rescaling K with a logdet-dependent
    # epsilon (the full factorization feeds every diagonal element)
    for name in (["xla", "blocked", "pallas"] if on_tpu else ["xla"]):
        def chol_step(K_, name=name):
            L = chol_ops.cholesky(K_, method=name)
            eps = 0.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
            return K_ * (1.0 + eps)

        t = profiling.timed_loop(chol_step, K, iters=max(iters, 4))
        results[f"chol_{name}"] = {
            "ms": t * 1e3,
            "tflops": profiling.chol_flops(n) / t / 1e12,
            "roofline_frac": (profiling.chol_flops(n) / t / 1e12)
            / results["gemm_fp32_tflops"],
        }

    # native-tier potrf base kernel vs XLA at the recursion base size
    # (raw chained step time; the l l^T re-symmetrization is identical in
    # both chains, so the A/B is fair)
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

        try:
            t_p = profiling.timed_loop(mk_step(chol_pallas.potrf), ab,
                                       iters=24)
            t_x = profiling.timed_loop(mk_step(jax.lax.linalg.cholesky), ab,
                                       iters=24)
            results["potrf_base_1024"] = {
                "pallas_ms_incl_resym": t_p * 1e3,
                "xla_ms_incl_resym": t_x * 1e3,
                "winner": "pallas" if t_p < t_x else "xla",
            }
        except Exception as e:  # tunnel payload limits etc. — keep going
            results["potrf_base_1024"] = {"error": str(e)[:120]}

    L = chol_ops.cholesky(K, method="xla")
    nrhs = 512
    B = jax.random.normal(key, (n, nrhs), jnp.float32)

    # L rides the carry, NOT a closure: closed-over arrays are serialized
    # into the program payload and the tunnel rejects >buffer-limit bodies
    def trsm_step(lb):
        L_, B_ = lb
        V = trsm.solve_lx(L_, B_)
        return (L_, V * jax.lax.rsqrt(jnp.mean(V * V) + 1e-9))

    t = profiling.timed_loop(trsm_step, (L, B), iters=max(iters, 6))
    results["trsm_512rhs"] = {
        "ms": t * 1e3,
        "gflops": profiling.gflops(profiling.trsm_flops(n, nrhs), t),
    }

    # LML grad is >100 ms at bench sizes: plain fetch-barrier timing is ok
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
