"""Config-3 example: NUTS + VI posteriors over kernel hyperparameters.

python examples/hyperparameter_posterior.py [--platform=cpu]
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
from cugp_tpu.inference import sampling


def main():
    X, y, true_params = synthetic.gp_draw(n=256, d=1, lengthscale=0.7,
                                          signal_var=1.5, noise_var=0.05,
                                          seed=0)
    gp = GP(kind="rbf").condition(X, y)

    post = gp.sample_hyperparams(num_chains=8, num_samples=256,
                                 num_warmup=256, sampler="nuts",
                                 max_tree_depth=6)
    print(f"NUTS accept rate: {float(post['accept_rate']):.2f}")
    for k, true_v in [("log_lengthscale", np.log(0.7)),
                      ("log_signal_var", np.log(1.5)),
                      ("log_noise_var", np.log(0.05))]:
        s = np.asarray(post["samples"][k]).reshape(-1)
        rhat = float(sampling.potential_scale_reduction(
            np.asarray(post["samples"][k]).reshape(256, 8)))
        print(f"  {k}: post mean {s.mean():+.3f} +- {s.std():.3f} "
              f"(true {true_v:+.3f}, R-hat {rhat:.3f})")

    vi_res = gp.fit_vi(steps=1500, learning_rate=0.02)
    print("VI posterior means:",
          {k: round(float(np.asarray(v).reshape(-1)[0]), 3)
           for k, v in vi_res["mean"].items()})


if __name__ == "__main__":
    main()
