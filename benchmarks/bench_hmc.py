"""Benchmark harness (C14): HMC/NUTS posterior samples/s (BASELINE.json:2).

Usage: python benchmarks/bench_hmc.py [--n=2048] [--chains=256] [--samples=64]
Config-3 shape: vmapped chains on one chip (BASELINE.json:9).
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
import time

import jax
import jax.numpy as jnp


def main(argv=None):
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:])
                if a.startswith("--"))
    n = int(args.get("--n", 512))
    chains = int(args.get("--chains", 256))
    samples = int(args.get("--samples", 64))
    warmup = int(args.get("--warmup", 64))
    sampler = args.get("--sampler", "hmc")

    from cugp_tpu.data import synthetic
    from cugp_tpu.ops import kernels as kops
    from cugp_tpu.inference import sampling

    X, y, _ = synthetic.sinusoid_1d(n=n, noise_std=0.1, seed=0)
    Xj = jnp.asarray(X, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)
    init = kops.init_params(d=1, lengthscale=0.8, noise_var=0.05)

    t0 = time.perf_counter()
    out = sampling.sample_hyperparams(
        init, Xj, yj, kind="rbf", method="auto", sampler=sampler,
        num_chains=chains, num_samples=samples, num_warmup=warmup,
        max_tree_depth=6, key=jax.random.key(0))
    accept = float(out["accept_rate"])  # forces completion
    dt = time.perf_counter() - t0

    total_draws = samples * chains
    print(json.dumps({
        "sampler": sampler, "n": n, "chains": chains,
        "samples_per_chain": samples,
        "wall_s": round(dt, 2),
        "posterior_samples_per_s": round(total_draws / dt, 1),
        "accept_rate": round(accept, 3),
    }))


if __name__ == "__main__":
    main()
