"""Covariance-builder tile sweep (round-2 VERDICT item #9).

Times the fused Pallas train-covariance builder at N=32k, d=8 across
tile shapes (COV_PALLAS_TILES plumbing in ops/cov_pallas._tiles) and
against the XLA builder, reporting ms and the fraction of the pure
HBM-write bound (4 N^2 bytes / ~819 GB/s on v5e).

Usage: python benchmarks/bench_cov_tiles.py [--n=32768] [--d=8]
           [--tiles=512x512,512x1024,1024x512,1024x1024,256x512]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

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
    tiles = args.get("--tiles",
                     "512x512,512x1024,1024x512,1024x1024,256x512").split(",")
    iters = int(args.get("--iters", 5))

    from cugp_tpu.ops import cov_pallas, kernels as kops
    from cugp_tpu.utils import profiling

    key = jax.random.key(0)
    X = jax.random.uniform(key, (n, d), jnp.float32, -2.0, 2.0)
    params = kops.init_params(d=d, lengthscale=2.0, noise_var=1e-2)
    hbm_bound_ms = 4.0 * n * n / 819e9 * 1e3  # v5e ~819 GB/s
    rtt = profiling.rtt_overhead()

    def time_build():
        # only the checksum leaves the device, so the 4 GB K stays a
        # transient inside each timed call
        fn = jax.jit(lambda p, X: jnp.sum(jnp.diagonal(
            cov_pallas.train_covariance_pallas(p, X, kind="rbf"))))
        t = profiling.timed(fn, params, X, iters=iters) - rtt
        return max(t, 1e-9)

    rows = []
    for t in tiles:
        os.environ["COV_PALLAS_TILES"] = t
        try:
            dt = time_build()
        except Exception as e:  # tile shape may exceed VMEM
            rows.append({"tiles": t, "error": str(e)[:120]})
            continue
        finally:
            os.environ.pop("COV_PALLAS_TILES", None)
        rows.append({"tiles": t, "ms": round(dt * 1e3, 2),
                     "x_hbm_bound": round(dt * 1e3 / hbm_bound_ms, 2)})

    # XLA builder comparison
    xla_fn = jax.jit(lambda p, X: jnp.sum(jnp.diagonal(
        kops.train_covariance(p, X, kind="rbf", method="xla"))))
    t_xla = max(profiling.timed(xla_fn, params, X, iters=iters) - rtt, 1e-9)

    print(json.dumps({
        "n": n, "d": d, "backend": jax.default_backend(),
        "hbm_write_bound_ms": round(hbm_bound_ms, 2),
        "xla_ms": round(t_xla * 1e3, 2),
        "sweep": rows,
    }))


if __name__ == "__main__":
    main()
