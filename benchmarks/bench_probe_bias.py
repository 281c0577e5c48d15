"""Quantify the frozen-probe bias of the iterative sampler (round-4
VERDICT weak #4).

sampling.make_iterative_logprob freezes the SLQ/Hutchinson probes, so
the chains target a FIXED approximation of the hyperparameter posterior
whose logdet/trace terms carry O(1/sqrt(num_probes)) error. The choice
is documented; this experiment MEASURES it: posterior moments from the
dense-LML sampler (the exact target) vs the iterative sampler at
num_probes in {8, 32, 128}, each at two independent probe keys — the
probe-key spread at fixed count shows the bias's random component, the
trend over counts its decay.

Output: per-config posterior mean/std of each log-hyperparameter and
its drift from the dense reference in units of the posterior std
(drift_sigmas < ~0.3 means the bias is small next to genuine posterior
uncertainty at that n).

Usage: python benchmarks/bench_probe_bias.py [--n=1024] [--draws=192]
           [--platform=cpu]
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax
import jax.numpy as jnp
import numpy as np


def _moments(res):
    out = {}
    for k, v in res["samples"].items():
        arr = np.asarray(v).reshape(-1)
        out[k] = (float(arr.mean()), float(arr.std()))
    return out


def main(argv=None):
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:])
                if a.startswith("--"))
    jax.config.update("jax_platforms", args.get("--platform", "cpu"))
    n = int(args.get("--n", 1024))
    draws = int(args.get("--draws", 192))

    from cugp_tpu.data import synthetic
    from cugp_tpu.inference import sampling
    from cugp_tpu.ops import kernels as kops

    X, y, _ = synthetic.sinusoid_1d(n=n, noise_std=0.2, seed=0)
    X, y = jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32)
    init = kops.init_params(d=1, lengthscale=0.8, noise_var=0.05)
    # cost knobs (round-5: the original fixed config — 320 transitions x
    # 32 leapfrog x tol=1e-6 CG x 6 rows — costs HOURS of CPU; size the
    # run to the box)
    warmup = int(args.get("--warmup", 128))
    leapfrog = int(args.get("--leapfrog", 32))
    tol = float(args.get("--tol", 1e-6))
    common = dict(num_samples=draws, num_chains=4, num_warmup=warmup,
                  sampler="hmc", key=jax.random.key(0))

    ref = sampling.sample_hyperparams(init, X, y, **common)
    ref_m = _moments(ref)
    out = {"n": n, "draws": draws, "backend": jax.default_backend(),
           "dense_reference": {k: {"mean": round(m, 4), "std": round(s, 4)}
                               for k, (m, s) in ref_m.items()},
           "accept_dense": round(float(ref["accept_rate"]), 3),
           "rows": []}

    for probes in (8, 32, 128):
        for pk_seed in (7, 77):
            res = sampling.sample_hyperparams_iterative(
                init, X, y, block=256, tol=tol, max_iters=1500,
                num_probes=probes, num_steps=min(40, 8 + probes),
                probe_key=jax.random.key(pk_seed), n_leapfrog=leapfrog,
                eps0=0.1, **common)
            mom = _moments(res)
            drift = {k: round(abs(mom[k][0] - ref_m[k][0])
                              / max(ref_m[k][1], 1e-6), 3)
                     for k in mom}
            row = {"num_probes": probes, "probe_seed": pk_seed,
                   "accept": round(float(res["accept_rate"]), 3),
                   "moments": {k: {"mean": round(m, 4),
                                   "std": round(s, 4)}
                               for k, (m, s) in mom.items()},
                   "drift_sigmas": drift}
            out["rows"].append(row)
            print(f"# probes={probes} seed={pk_seed} drift={drift}",
                  file=sys.stderr, flush=True)

    worst = {p: max(max(r["drift_sigmas"].values())
                    for r in out["rows"] if r["num_probes"] == p)
             for p in (8, 32, 128)}
    out["worst_drift_sigmas_by_probes"] = worst
    print(json.dumps(out))


if __name__ == "__main__":
    main()
