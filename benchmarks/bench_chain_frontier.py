"""Bisect the tunneled-TPU worker-crash frontier for vmapped sampler
programs (round-2 VERDICT item #2).

Each trial runs IN A SUBPROCESS (a crash kills the child, not the
sweep): a W-wide vmapped HMC transition (per-chain Cholesky-grad inside
a short scan) at problem size n. The parent records ok / crash / timeout
per (W, n) and emits the frontier table as JSON.

WARNING: crashing the remote worker can take the tunnel down for long
stretches (see .claude/skills/verify/SKILL.md). Run this deliberately,
once, at the end of a TPU session — not before timing work.

Usage: python benchmarks/bench_chain_frontier.py
           [--widths=8,16,32,64,128,256] [--ns=256,512] [--timeout=420]
           [--stop_after_crash=1]
"""

import json
import os
import subprocess
import sys
import time

_CHILD = r"""
import sys
import jax, jax.numpy as jnp
n, width = int(sys.argv[1]), int(sys.argv[2])
from cugp_tpu.data import synthetic
from cugp_tpu.ops import kernels as kops
from cugp_tpu.inference import sampling, hmc as hmc_lib
X, y, _ = synthetic.sinusoid_1d(n=n, noise_std=0.1, seed=0)
Xj, yj = jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32)
init = kops.init_params(d=1, lengthscale=0.8, noise_var=0.05)
lp, unravel, q0 = sampling.make_flat_logprob(init, Xj, yj)

@jax.jit
def run(q0s, key):
    eps = jnp.full((width,), 0.02)
    def step(carry, k):
        qs, = carry
        def one(q, kk, e):
            (v, g) = lp(q)
            # one leapfrog: the per-chain Cholesky-grad graph
            p = jax.random.normal(kk, q.shape)
            p = p + 0.5 * e * g
            q2 = q + e * p
            v2, g2 = lp(q2)
            return q2, v2
        ks = jax.random.split(k, width)
        qs2, vs = jax.vmap(one)(qs, ks, eps)
        return (qs2,), vs
    (qs,), vs = jax.lax.scan(step, (q0s,), jax.random.split(key, 4))
    return vs

q0s = jnp.tile(q0[None, :], (width, 1))
vs = run(q0s, jax.random.key(0))
import numpy as np
print("CHILD_OK", float(np.asarray(vs)[-1, 0]))
"""


def main(argv=None):
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:])
                if a.startswith("--"))
    widths = [int(w) for w in args.get("--widths",
                                       "8,16,32,64,128,256").split(",")]
    ns = [int(n) for n in args.get("--ns", "256,512").split(",")]
    timeout = float(args.get("--timeout", 420))
    stop_after_crash = bool(int(args.get("--stop_after_crash", 1)))

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    rows = []
    for n in ns:
        crashed = False
        for w in widths:
            if crashed and stop_after_crash:
                rows.append({"n": n, "width": w, "result": "skipped"})
                continue
            t0 = time.time()
            try:
                r = subprocess.run(
                    [sys.executable, "-c", _CHILD, str(n), str(w)],
                    cwd=repo, capture_output=True, text=True,
                    timeout=timeout)
                ok = r.returncode == 0 and "CHILD_OK" in r.stdout
                res = "ok" if ok else "crash"
                if not ok and "UNAVAILABLE" not in r.stderr \
                        and "crashed" not in r.stderr:
                    res = f"error:{r.stderr.strip().splitlines()[-1][:80]}"
            except subprocess.TimeoutExpired:
                res = "timeout"
            rows.append({"n": n, "width": w, "result": res,
                         "seconds": round(time.time() - t0, 1)})
            print(f"# n={n} width={w}: {rows[-1]['result']}",
                  file=sys.stderr, flush=True)
            if res != "ok":
                crashed = True
                # give the tunnel a moment before the next (skipped or
                # smaller-n) trial
                time.sleep(30)
    print(json.dumps({"frontier": rows, "timeout_s": timeout}))


if __name__ == "__main__":
    main()
