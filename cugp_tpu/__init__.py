"""cugp_tpu — a TPU-native exact Gaussian-process inference engine.

Built from scratch against the capability surface of the reference CUDA GP
engine (see SURVEY.md / BASELINE.json): dense RBF/Matern covariance
construction (Pallas tiles), blocked MXU-tiled Cholesky, batched triangular
solves, LML gradients, MAP / HMC / NUTS / VI over kernel hyperparameters,
and GSPMD/shard_map distribution (2D block-cyclic Cholesky over ICI).
"""

import os as _os

import jax as _jax

# GP covariances are numerically fragile: on TPU the default matmul precision
# routes fp32 operands through bf16 MXU passes, which perturbs K at the 1e-3
# level and makes Cholesky fail (NaN) as soon as the noise is small. Hot-path
# ops pass precision= explicitly; this default covers remaining library dots.
# Host applications embedding cugp_tpu that do NOT want their process-global
# matmul precision changed can opt out with CUGP_TPU_NO_GLOBAL_PRECISION=1
# (library accuracy then rests on the explicit per-op precision arguments).
if not _os.environ.get("CUGP_TPU_NO_GLOBAL_PRECISION"):
    _jax.config.update("jax_default_matmul_precision", "highest")

from cugp_tpu.api import (GP, GPClassifier, SVGP, MultiOutputGP,
                          MultiOutputGPQ)
from cugp_tpu.ops.kernels import init_params, SUPPORTED_KERNELS

__version__ = "0.2.0"

__all__ = ["GP", "GPClassifier", "SVGP", "MultiOutputGP",
           "MultiOutputGPQ", "init_params",
           "SUPPORTED_KERNELS", "__version__"]
