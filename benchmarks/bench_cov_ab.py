"""Controlled A/B of the RBF covariance-builder epilogue (round-4
VERDICT next #6 / weak #1).

Round 4 shipped a fused-exponent epilogue measured at 7.50 ms vs the
round-3 explicit-d2 path's 9.55 ms at N=32k d=8 — but the DRIVER's
bench capture (BENCH_r04) recorded t_cov_s=0.0091, the pre-epilogue
number, while the builder's own runs of the same harness saw 5.5-6.2 ms.
This harness settles it: both epilogues (fused_exp static arg in
ops/cov_pallas) timed in ONE session, strictly interleaved, >=N reps
each, medians + full sample lists reported so tunnel noise is visible
rather than aggregated away.

The timed program replicates bench.py's t_cov measurement exactly
(same builder call, same fetch-barrier timing, same RTT subtraction).

Usage: python benchmarks/bench_cov_ab.py [--n=32768] [--d=8] [--reps=6]
           [--iters=5] [--platform=cpu]
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:])
                if a.startswith("--"))
    if "--platform" in args:
        jax.config.update("jax_platforms", args["--platform"])
    on_tpu = jax.default_backend() == "tpu"
    n = int(args.get("--n", 32768 if on_tpu else 2048))
    d = int(args.get("--d", 8))
    reps = int(args.get("--reps", 6))
    iters = int(args.get("--iters", 5))

    from cugp_tpu.ops import kernels as kops
    from cugp_tpu.utils import profiling

    key = jax.random.key(0)
    X = jax.random.uniform(key, (n, d), jnp.float32, -2.0, 2.0)
    params = kops.init_params(d=d, lengthscale=2.0, noise_var=1e-2)
    cov_method = "pallas" if on_tpu else "xla"
    rtt = profiling.rtt_overhead()

    output = args.get("--output", "full")  # full: bench.py's program
    # (K is the output); checksum: bench_cov_tiles' program (only
    # sum(diag K) leaves the device) — the round-4 sweep's method

    def make_cov():
        # fresh jit per flip: fused_exp is a static arg read at call time
        # (_epilogue()), so each variant compiles once and then both live
        # in the cache — interleaved reps hit compiled code
        if output == "checksum":
            return jax.jit(lambda p_, X_: jnp.sum(jnp.diagonal(
                kops.train_covariance(p_, X_, kind="rbf", jitter=1e-6,
                                      method=cov_method))))
        return jax.jit(lambda p_, X_: kops.train_covariance(
            p_, X_, kind="rbf", jitter=1e-6, method=cov_method))

    samples = {"fused": [], "d2": []}
    order = []
    for rep in range(reps):
        for name, env in (("fused", None), ("d2", "d2")):
            if env:
                os.environ["COV_PALLAS_EPILOGUE"] = env
            else:
                os.environ.pop("COV_PALLAS_EPILOGUE", None)
            t = max(profiling.timed(make_cov(), params, X,
                                    iters=iters) - rtt, 1e-9)
            samples[name].append(round(t * 1e3, 3))
            order.append(f"{name}:{samples[name][-1]}")
            print(f"# rep {rep} {name}: {t * 1e3:.2f} ms",
                  file=sys.stderr, flush=True)
    os.environ.pop("COV_PALLAS_EPILOGUE", None)

    def stats(xs):
        xs = sorted(xs)
        return {"median_ms": xs[len(xs) // 2], "min_ms": xs[0],
                "max_ms": xs[-1],
                "spread_pct": round(100 * (xs[-1] - xs[0]) / xs[0], 1)}

    hbm_bound_ms = 4.0 * n * n / 819e9 * 1e3
    out = {
        "n": n, "d": d, "reps": reps, "iters": iters, "output": output,
        "backend": jax.default_backend(),
        "hbm_write_bound_ms": round(hbm_bound_ms, 2),
        "rtt_ms": round(rtt * 1e3, 2),
        "fused": stats(samples["fused"]),
        "d2": stats(samples["d2"]),
        "samples_fused_ms": samples["fused"],
        "samples_d2_ms": samples["d2"],
        "fused_speedup": round(
            stats(samples["d2"])["median_ms"]
            / stats(samples["fused"])["median_ms"], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
