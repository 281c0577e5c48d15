"""Cholesky precision-policy shoot-out (round-3 VERDICT next #6 / weak #1).

Times the blocked recursive Cholesky at N (default 32k) on a REALISTIC
GP covariance (RBF + noise, moderate conditioning) under three MXU
precision policies and reports the accuracy cost of each:

  highest  — 6-pass bf16 (true fp32) everywhere [round-3 BENCH default]
  mixed    — fp32 diagonal path (panels, TRSM, diag-containing SYRK
             quadrants <= 4k) + 3-pass bf16 off-diagonal trailing
             updates (most of the N^3/3 FLOPs at the nominal rate)
  high     — 3-pass bf16 everywhere

Accuracy gates: blockwise reconstruction residual ||L L^T - K||_F /
||K||_F, max |diag(L L^T) - diag(K)|, and the LML computed from each L
vs the HIGHEST-precision LML (the quantity training actually consumes).

Usage: python benchmarks/bench_chol_precision.py [--n=32768] [--iters=3]
       [--platform=cpu]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax
import jax.numpy as jnp
import numpy as np


def _barrier(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def main(argv=None):
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:])
                if a.startswith("--"))
    if "--platform" in args:
        jax.config.update("jax_platforms", args["--platform"])
    on_tpu = jax.default_backend() == "tpu"
    n = int(args.get("--n", 32768 if on_tpu else 2048))
    iters = int(args.get("--iters", 3))

    from cugp_tpu.data import synthetic
    from cugp_tpu.ops import cholesky as chol_ops
    from cugp_tpu.ops import kernels as kops

    X, y, _ = synthetic.multidim_regression(n=n, d=4, noise_std=0.2, seed=0)
    Xj = jnp.asarray(X, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)
    params = kops.init_params(d=4, lengthscale=1.5, noise_var=0.05)

    build = jax.jit(lambda p, X: kops.train_covariance(
        p, X, kind="rbf", method="pallas" if on_tpu else "xla"))
    K = build(params, Xj)
    _barrier(K)

    _HI = jax.lax.Precision.HIGHEST

    @jax.jit
    def recon_err(L, K):
        # residual + diag error, fp32 HIGHEST reconstruction
        R = jnp.matmul(L, L.mT, precision=_HI) - K
        rel = jnp.linalg.norm(R) / jnp.linalg.norm(K)
        dmax = jnp.max(jnp.abs(jnp.diagonal(R)))
        return rel, dmax

    @jax.jit
    def lml_from(L, y):
        from cugp_tpu.ops import trsm as trsm_ops

        alpha = trsm_ops.cho_solve(L, y[:, None], method="xla")[:, 0]
        return (-0.5 * jnp.dot(y, alpha)
                - jnp.sum(jnp.log(jnp.diagonal(L)))
                - 0.5 * n * jnp.log(2.0 * jnp.pi))

    flops = n**3 / 3.0
    out = {"n": n, "backend": jax.default_backend(), "policies": {}}
    lml_ref = None
    for name, prec in (("highest", _HI), ("mixed", "mixed"),
                       ("high", jax.lax.Precision.HIGH)):
        fn = jax.jit(lambda a, prec=prec: chol_ops.cholesky(
            a, method="blocked" if on_tpu else "xla",
            precision=prec if on_tpu else None))
        L = fn(K)
        _barrier(L)  # compile
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            L = fn(K)
            _barrier(L[-1, -1])
            times.append(time.perf_counter() - t0)
        t = min(times)
        rel, dmax = recon_err(L, K)
        lml = float(lml_from(L, yj))
        if lml_ref is None:
            lml_ref = lml
        out["policies"][name] = {
            "wall_s": round(t, 4),
            "gflops": round(flops / t / 1e9, 1),
            "recon_rel_fro": float(rel),
            "recon_diag_max": float(dmax),
            "lml": round(lml, 3),
            "lml_abs_err_vs_highest": round(abs(lml - lml_ref), 4),
            "lml_err_per_point": round(abs(lml - lml_ref) / n, 8),
        }
        print(f"# {name}: {t:.3f}s {flops/t/1e9:.0f} GFLOP/s "
              f"rel={float(rel):.2e} lml_err={abs(lml - lml_ref):.4f}",
              file=sys.stderr, flush=True)
    hi = out["policies"]["highest"]["gflops"]
    mx = out["policies"]["mixed"]["gflops"]
    out["mixed_speedup"] = round(mx / hi, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
