"""Covariance (kernel-matrix) construction — component C1 (SURVEY.md section 2).

The reference builds its dense N x N covariance with CUDA kernels over pairwise
distances (BASELINE.json:5, "dense covariance-matrix construction (RBF/Matern
kernels)"). The TPU-native equivalent here has two paths:

- ``method="xla"``: plain jnp — XLA fuses the distance expansion into an MXU
  GEMM for the cross term plus VPU elementwise kernel evaluation. Used for
  small problems, CPU tests, and as the reference for the Pallas path.
- ``method="pallas"``: a fused Pallas tile builder (see ``cov_pallas.py``):
  each (block_m x block_n) tile computes scaled distances + the kernel
  function entirely in VMEM and writes one K tile, with the noise term fused
  onto the diagonal. Never materializes the distance matrix in HBM.

Hyperparameters are a dict of log-space values:
  ``log_lengthscale`` (d,), ``log_signal_var`` (), ``log_noise_var`` ().
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

SUPPORTED_KERNELS = ("rbf", "matern12", "matern32", "matern52")

_SQRT3 = math.sqrt(3.0)
_SQRT5 = math.sqrt(5.0)

# Minimum squared distance used before sqrt for Matern kernels: keeps the
# gradient of sqrt finite at r=0 (the true derivative contribution there is
# handled by masking the diagonal in the analytic-gradient path; for AD the
# epsilon bounds the error well below fp32 resolution of the kernel value).
_R2_EPS = 1e-12


def kernel_fn(d2, kind):
    """Kernel value as a function of scaled squared distance (unit amplitude)."""
    if kind == "rbf":
        return jnp.exp(-0.5 * d2)
    r = jnp.sqrt(jnp.maximum(d2, _R2_EPS))
    if kind == "matern12":
        return jnp.exp(-r)
    if kind == "matern32":
        s = _SQRT3 * r
        return (1.0 + s) * jnp.exp(-s)
    if kind == "matern52":
        s = _SQRT5 * r
        return (1.0 + s + (s * s) / 3.0) * jnp.exp(-s)
    raise ValueError(f"unknown kernel kind: {kind}")


def scaled_sqdist(X1, X2, lengthscale):
    """Pairwise squared distance after per-dim scaling; cross term rides the MXU."""
    X1 = X1 / lengthscale
    X2 = X2 / lengthscale
    n1 = jnp.sum(X1 * X1, axis=-1)[:, None]
    n2 = jnp.sum(X2 * X2, axis=-1)[None, :]
    cross = jnp.dot(X1, X2.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(n1 + n2 - 2.0 * cross, 0.0)


@partial(jax.jit, static_argnames=("kind",))
def cross_covariance_xla(params, X1, X2, kind="rbf"):
    """K(X1, X2) without noise — XLA path."""
    ell = jnp.exp(params["log_lengthscale"])
    sf2 = jnp.exp(params["log_signal_var"])
    d2 = scaled_sqdist(X1, X2, ell)
    return sf2 * kernel_fn(d2, kind)


@partial(jax.jit, static_argnames=("kind", "jitter"))
def train_covariance_xla(params, X, kind="rbf", jitter=1e-6):
    """K(X, X) + (noise_var + jitter*signal_var) I — XLA path."""
    K = cross_covariance_xla(params, X, X, kind)
    sn2 = jnp.exp(params["log_noise_var"])
    sf2 = jnp.exp(params["log_signal_var"])
    n = K.shape[0]
    return K + (sn2 + jitter * sf2) * jnp.eye(n, dtype=K.dtype)


def cross_covariance(params, X1, X2, kind="rbf", method="auto"):
    """K(X1, X2) without noise. method: 'auto' | 'xla' | 'pallas'."""
    if method == "auto":
        method = "pallas" if _use_pallas(X1.shape[0], X2.shape[0]) else "xla"
    if method == "pallas":
        from cugp_tpu.ops import cov_pallas

        return cov_pallas.cross_covariance_pallas(params, X1, X2, kind)
    return cross_covariance_xla(params, X1, X2, kind)


def train_covariance(params, X, kind="rbf", jitter=1e-6, method="auto"):
    """K(X, X) + noise/jitter diagonal. method: 'auto' | 'xla' | 'pallas'."""
    if method == "auto":
        method = "pallas" if _use_pallas(X.shape[0], X.shape[0]) else "xla"
    if method == "pallas":
        from cugp_tpu.ops import cov_pallas

        return cov_pallas.train_covariance_pallas(params, X, kind, jitter)
    return train_covariance_xla(params, X, kind, jitter)


def _use_pallas(n1, n2):
    """Pallas tiles pay off for large K on TPU; small/CPU goes through XLA."""
    if jax.default_backend() != "tpu":
        return False
    return n1 >= 1024 and n2 >= 1024


def init_params(d=1, lengthscale=1.0, signal_var=1.0, noise_var=0.1, dtype=jnp.float32):
    """Convenience constructor for the log-space hyperparameter dict."""
    return {
        "log_lengthscale": jnp.full((d,), math.log(lengthscale), dtype=dtype),
        "log_signal_var": jnp.asarray(math.log(signal_var), dtype=dtype),
        "log_noise_var": jnp.asarray(math.log(noise_var), dtype=dtype),
    }
