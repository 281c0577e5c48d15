"""Distributed Cholesky over the chip mesh — component C3 primary path.

TPU-native design for BASELINE.json:11 (N=100k distributed factorization):
a chunked right-looking sweep whose shapes are all static (the Python loop
over chunks unrolls at trace time), so XLA/GSPMD partitions every TRSM and
SYRK across the ('r','c') grid and emits ICI collectives itself:

  for each diagonal chunk s (size B_c, e.g. 8192):
    1. L_ss   = chol(K[s,s])            -- replicated single-chip factor
                                           (B_c^3/3 FLOPs, negligible)
    2. P      = K[s+1:, s] L_ss^{-T}    -- distributed TRSM (row-sharded)
    3. K[s+1:, s+1:] -= P P^T           -- distributed SYRK (2D-sharded,
                                           the dominant FLOPs, on the MXU)

Each trailing submatrix is re-constrained to P('r','c'), so GSPMD rebalances
the shrinking trailing block across the full grid every step — the same
load-balancing effect 2D block-cyclic layouts achieve, expressed the XLA
way. The manual shard_map block-cyclic implementation (ppermute panel
broadcasts) lives in ``block_cyclic.py``; this one is the performance path.

Waste analysis: diagonal chunks are factored redundantly (replicated), an
overhead of 6/S^2 relative to N^3/3 for S chunks — under 1% for N=100k with
B_c=8k. Everything else is exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cugp_tpu.ops import cholesky as chol_ops
from cugp_tpu.ops import trsm as trsm_ops

_HI = jax.lax.Precision.HIGHEST


from cugp_tpu.parallel.mesh import wsc as _wsc


def distributed_cholesky(K, mesh, chunk=8192, method="auto"):
    """Lower Cholesky factor of 2D-sharded K. Call under jit.

    K: (n, n) symmetric PD, n a multiple of 256 (pad upstream with the
    identity-block scheme from cov_pallas). chunk: diagonal chunk size.
    """
    n = K.shape[-1]
    chunk = min(chunk, n)
    row_spec = P(("dp", "r")) if "dp" in mesh.axis_names else P("r")
    spec2d = P(row_spec[0], "c")

    K = _wsc(K, mesh, spec2d)
    out_cols = []
    trailing = K
    offset = 0
    while offset < n:
        b = min(chunk, n - offset)
        a_ss = trailing[:b, :b]
        # replicated small factorization: cheaper than coordinating a
        # distributed panel at this size
        a_ss = _wsc(a_ss, mesh, P())
        l_ss = chol_ops.cholesky(a_ss, method=method)
        if offset + b < n:
            a_ps = _wsc(trailing[b:, :b], mesh, P(row_spec[0], None))
            panel = trsm_ops.solve_xlt(l_ss, a_ps)
            panel = _wsc(panel, mesh, P(row_spec[0], None))
            a_tt = trailing[b:, b:]
            upd = jnp.matmul(panel, panel.mT, precision=_HI)
            trailing = _wsc(a_tt - upd, mesh, spec2d)
            col = jnp.concatenate([l_ss, panel], axis=0)
        else:
            trailing = None
            col = l_ss
        # column block of the final L: zeros above the diagonal chunk
        col_full = jnp.concatenate(
            [jnp.zeros((offset, b), K.dtype), col], axis=0)
        out_cols.append(_wsc(col_full, mesh, P(row_spec[0], None)))
        offset += b

    L = jnp.concatenate(out_cols, axis=1)
    return _wsc(L, mesh, spec2d)


def distributed_lml(params, X, y, mesh, kind="rbf", jitter=1e-6, chunk=8192,
                    cov_method="xla"):
    """LML with 2D-sharded covariance + chunked distributed Cholesky.

    The TRSM solves against y ride the replicated L column chunks (vector
    RHS is cheap); the O(N^2)/O(N^3) work is sharded.
    """
    from cugp_tpu.ops import kernels as kernel_ops
    from cugp_tpu.models import exact_gp

    row_spec = P(("dp", "r")) if "dp" in mesh.axis_names else P("r")
    spec2d = P(row_spec[0], "c")
    X = _wsc(X, mesh, P(row_spec[0], None))
    y = _wsc(y, mesh, row_spec)
    K = kernel_ops.train_covariance(params, X, kind=kind, jitter=jitter,
                                    method=cov_method)
    K = _wsc(K, mesh, spec2d)
    L = distributed_cholesky(K, mesh, chunk=chunk)
    z = trsm_ops.solve_lx(L, y)
    alpha = trsm_ops.solve_ltx(L, z)
    n = y.shape[0]
    logdet_half = jnp.sum(jnp.log(jnp.diagonal(L)))
    return (-0.5 * jnp.sum(y * alpha) - logdet_half
            - 0.5 * n * exact_gp.LOG2PI)
