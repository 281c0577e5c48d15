"""Regenerate tests/goldens/exact_gp_sinusoid256.npz from the float64
oracle (NEVER from the JAX pipeline — the goldens guard the pipeline).

If the npz already exists, its inputs (X, y, Xs, hyperparameters) are
REUSED so golden values stay stable across regenerations; only the oracle
outputs are recomputed (and new kernel kinds appended).

Run: python tests/goldens/regen.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

from cugp_tpu.oracle import exact_gp_np as oracle

OUT = os.path.join(os.path.dirname(__file__), "exact_gp_sinusoid256.npz")

KINDS = ["rbf", "matern12", "matern32", "matern52", "rq"]


def main():
    if os.path.exists(OUT):
        old = dict(np.load(OUT))
        X, y, Xs = old["X"], old["y"], old["Xs"]
        params = {
            "log_lengthscale": old["log_lengthscale"],
            "log_signal_var": old["log_signal_var"],
            "log_noise_var": old["log_noise_var"],
        }
        log_alpha = old.get("log_alpha", np.log(1.5))
    else:
        from cugp_tpu.data import synthetic

        X, y, _ = synthetic.sinusoid_1d(n=256, noise_std=0.1, seed=0)
        Xs = np.linspace(-3.0, 3.0, 64)[:, None]
        params = {
            "log_lengthscale": np.log([0.8]),
            "log_signal_var": np.log(1.0),
            "log_noise_var": np.log(0.05),
        }
        log_alpha = np.log(1.5)

    out = {"X": X, "y": y, "Xs": Xs, "log_alpha": log_alpha, **params}
    for kind in KINDS:
        p = dict(params)
        if kind == "rq":
            p["log_alpha"] = log_alpha
        out[f"lml_{kind}"] = oracle.log_marginal_likelihood(p, X, y, kind=kind)
        mu, var = oracle.posterior(p, X, y, Xs, kind=kind)
        out[f"mu_{kind}"] = mu
        out[f"var_{kind}"] = var
        g = oracle.lml_gradients(p, X, y, kind=kind)
        out[f"grad_ell_{kind}"] = g["log_lengthscale"]
        out[f"grad_sf_{kind}"] = g["log_signal_var"]
        out[f"grad_sn_{kind}"] = g["log_noise_var"]
        if kind == "rq":
            out["grad_alpha_rq"] = g["log_alpha"]
    np.savez(OUT, **out)
    print(f"wrote {OUT}: {sorted(out)}")


if __name__ == "__main__":
    main()
