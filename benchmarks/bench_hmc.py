"""Benchmark harness (C14): HMC/NUTS posterior samples/s (BASELINE.json:2).

Usage: python benchmarks/bench_hmc.py [--n=2048] [--chains=256] [--samples=64]
Config-3 shape: 256 chains on one chip (BASELINE.json:9).

Chain batching: the tunneled TPU worker in this box crashes when one
sampler program's total work crosses ~4-5k chain-transitions of
Cholesky-grad leapfrog (bisected live, PERF.md "single-program sampler
frontier": 96 chains x 40 transitions ok, 128x40 and 96x112 crash;
--chain_block=16 lifts the single-program envelope from 32 to 96
chains), so larger chain counts are reached by running
batches of --batch chains through the SAME compiled sampler program
sequentially (fresh RNG key per batch). Chains are independent samplers —
adaptation is shared within a batch only — so B sequential batches of 32
are statistically identical to 8 independent 32-chain samplers, and the
reported posterior_samples_per_s is total draws / total wall time. The
first batch's wall time includes compilation; steady-state per-batch time
is reported separately.
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
    if "--platform" in args:
        jax.config.update("jax_platforms", args["--platform"])
    n = int(args.get("--n", 512))
    chains = int(args.get("--chains", 256))
    samples = int(args.get("--samples", 64))
    warmup = int(args.get("--warmup", 64))
    sampler = args.get("--sampler", "hmc")
    on_tpu = jax.default_backend() == "tpu"
    # --chain_block=B: the spec'd single-program layout — ALL chains in one
    # jitted sampler, executed as lax.map over B-wide vmapped blocks with
    # adaptation pooled across every chain (hmc.blocked_chains). Without
    # it, the legacy sequential-batch ladder below.
    chain_block = int(args.get("--chain_block", 0))
    batch = (chains if chain_block else
             int(args.get("--batch", min(chains, 32 if on_tpu else chains))))

    from cugp_tpu.data import synthetic
    from cugp_tpu.ops import kernels as kops
    from cugp_tpu.inference import sampling

    X, y, _ = synthetic.sinusoid_1d(n=n, noise_std=0.1, seed=0)
    Xj = jnp.asarray(X, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)
    init = kops.init_params(d=1, lengthscale=0.8, noise_var=0.05)

    n_batches = -(-chains // batch)
    batch_times, accepts = [], []
    t0 = time.perf_counter()
    for b in range(n_batches):
        tb = time.perf_counter()
        out = sampling.sample_hyperparams(
            init, Xj, yj, kind="rbf", method="auto", sampler=sampler,
            num_chains=batch, num_samples=samples, num_warmup=warmup,
            max_tree_depth=6, key=jax.random.key(1000 + b),
            chain_block=chain_block)
        accepts.append(float(out["accept_rate"]))  # forces completion
        batch_times.append(time.perf_counter() - tb)
    dt = time.perf_counter() - t0

    total_draws = samples * batch * n_batches
    steady = sorted(batch_times)[len(batch_times) // 2] if n_batches > 1 \
        else batch_times[0]
    print(json.dumps({
        "sampler": sampler, "n": n, "chains": batch * n_batches,
        "chain_batch": batch, "n_batches": n_batches,
        "chain_block": chain_block,
        "single_program": bool(chain_block or n_batches == 1),
        "samples_per_chain": samples,
        "wall_s": round(dt, 2),
        "posterior_samples_per_s": round(total_draws / dt, 1),
        "steady_state_samples_per_s": round(samples * batch / steady, 1),
        "first_batch_s": round(batch_times[0], 2),
        "steady_batch_s": round(steady, 2),
        "accept_rate": round(sum(accepts) / len(accepts), 3),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
