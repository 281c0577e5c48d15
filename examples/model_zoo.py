"""Model-family tour: multiclass Laplace GPC, SVGP with a non-Gaussian
likelihood, and correlated multi-output (LMC) regression — the
beyond-parity families on top of exact GP regression (SURVEY.md §8.2).

python examples/model_zoo.py [--platform=cpu]
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

if "--platform=cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from cugp_tpu import api
from cugp_tpu.data import synthetic


def multiclass():
    X, y = synthetic.gaussian_blobs(n=150, num_classes=3, seed=0)
    clf = api.GPClassifier()
    clf.fit(X, y, steps=40, learning_rate=0.1)
    acc = float(np.mean(np.asarray(clf.predict(X)) == y))
    print(f"[multiclass gpc] 3-class train accuracy: {acc:.3f}")


def svgp_poisson():
    X, y, _rate = synthetic.poisson_counts(n=400, seed=0)
    model = api.SVGP(likelihood="poisson")
    model.fit(X, y, num_inducing=32, steps=400, batch=128,
              learning_rate=0.05)
    rate, _rate_var = model.predict(X[:5])
    rate = np.asarray(rate)
    print(f"[svgp poisson] predicted rates head: {np.round(rate, 2)}")


def multi_output():
    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(-2, 2, 120))[:, None].astype(np.float32)
    f = np.sin(2.5 * X[:, 0])
    Y = np.stack([f + 0.05 * rng.standard_normal(120),
                  -0.8 * f + 0.05 * rng.standard_normal(120)],
                 axis=1).astype(np.float32)
    model = api.MultiOutputGP(rank=1)
    model.fit(X, Y, steps=60, learning_rate=0.1)
    corr = np.asarray(model.output_correlation())
    print(f"[lmc] learned output correlation: {corr[0, 1]:+.3f} "
          "(true: strongly negative)")


def loo_model_selection():
    """Pick the kernel family by LOO pseudo-likelihood (GPML 5.4.2) —
    fit each candidate with objective="loo" and compare GP.loo()."""
    X, y, _ = synthetic.sinusoid_1d(n=200, noise_std=0.1, seed=3)
    scores = {}
    for kind in ("rbf", "matern32", "periodic"):
        gp = api.GP(kind=kind)
        gp.fit(X, y, steps=120, learning_rate=0.1, objective="loo")
        scores[kind] = float(gp.loo()["pseudo_likelihood"])
    best = max(scores, key=scores.get)
    print("[loo] pseudo-likelihoods:",
          {k: round(v, 1) for k, v in scores.items()}, "-> best:", best)


def main():
    multiclass()
    svgp_poisson()
    multi_output()
    loo_model_selection()


if __name__ == "__main__":
    main()
