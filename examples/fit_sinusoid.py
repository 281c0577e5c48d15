"""Config-1 example: exact GP on the 1D sinusoid (BASELINE.json:7).

python examples/fit_sinusoid.py [--platform=cpu]
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

if "--platform=cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from cugp_tpu import GP
from cugp_tpu.data import synthetic


def main():
    X, y, f_true = synthetic.sinusoid_1d(n=1000, noise_std=0.1, seed=0)
    gp = GP(kind="rbf")
    info = gp.fit(X, y, steps=200, learning_rate=0.05)
    print(f"fitted LML: {float(info['lml']):.2f}")
    print("hyperparams:",
          {k: np.round(np.exp(np.asarray(v)), 4).tolist()
           for k, v in gp.params.items()})

    Xs = np.linspace(-3, 3, 200)[:, None]
    mu, var = gp.predict(Xs)
    mu, sd = np.asarray(mu), np.sqrt(np.asarray(var))
    inside = np.mean(np.abs(np.interp(Xs[:, 0], X[:, 0], f_true) - mu)
                     <= 2 * sd)
    print(f"true function within 2 sigma at {100*inside:.0f}% of test points")


if __name__ == "__main__":
    main()
