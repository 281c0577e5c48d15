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


def lmc_mixed_latents():
    """True rank-Q LMC (models/lmc.fit_lmcq): two outputs mixing a
    PERIODIC and an RBF latent process — distinct kernels per latent,
    which the shared-kernel ICM model cannot represent."""
    import numpy as np

    from cugp_tpu.models import lmc

    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(-3, 1, (80, 1)), axis=0)
    f_per = np.sin(2 * np.pi * X[:, 0])
    f_rbf = np.tanh(X[:, 0])
    Y = np.stack([f_per + 0.3 * f_rbf, -0.8 * f_per + 0.4 * f_rbf], 1)
    Y = Y + 0.05 * rng.standard_normal(Y.shape)
    import jax.numpy as jnp

    kinds = ("periodic", "rbf")
    p0 = lmc.init_lmcq_params(d=1, p=2, kinds=kinds, lengthscale=0.8,
                              noise_var=0.05)
    params, info = lmc.fit_lmcq(p0, jnp.asarray(X, jnp.float32),
                                jnp.asarray(Y, jnp.float32), kinds=kinds,
                                steps=150, learning_rate=0.05)
    Xs = jnp.asarray(np.linspace(1.3, 3, 32)[:, None], jnp.float32)
    mu, var = lmc.posterior_lmcq(params, jnp.asarray(X, jnp.float32),
                                 jnp.asarray(Y, jnp.float32), Xs, kinds)
    print("[lmc-q] lml=%.1f extrapolated mean range [%.2f, %.2f]"
          % (info["lml"], float(mu.min()), float(mu.max())))


def main():
    multiclass()
    svgp_poisson()
    multi_output()
    loo_model_selection()
    lmc_mixed_latents()


if __name__ == "__main__":
    main()
