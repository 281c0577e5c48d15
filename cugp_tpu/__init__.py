"""cugp_tpu — a TPU-native exact Gaussian-process inference engine.

Built from scratch against the capability surface of the reference CUDA GP
engine (see SURVEY.md / BASELINE.json): dense RBF/Matern covariance
construction (Pallas tiles), blocked MXU-tiled Cholesky, batched triangular
solves, LML gradients, MAP / HMC / NUTS / VI over kernel hyperparameters,
and GSPMD/shard_map distribution (2D block-cyclic Cholesky over ICI).
"""

import jax as _jax

# GP covariances are numerically fragile: on TPU the default matmul precision
# routes fp32 operands through bf16 MXU passes, which perturbs K at the 1e-3
# level and makes Cholesky fail (NaN) as soon as the noise is small. All dots
# in this library therefore run at fp32 ("highest") precision by default;
# kernels that can tolerate bf16 opt out explicitly. (SURVEY.md section 3.5,
# dtype policy.)
_jax.config.update("jax_default_matmul_precision", "highest")

from cugp_tpu.api import GP
from cugp_tpu.ops.kernels import init_params, SUPPORTED_KERNELS

__version__ = "0.1.0"

__all__ = ["GP", "init_params", "SUPPORTED_KERNELS", "__version__"]
