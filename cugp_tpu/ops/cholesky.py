"""Cholesky factorization — component C2 (SURVEY.md section 2).

The reference uses a custom "cuSOLVER-style" CUDA Cholesky (BASELINE.json:5).
The TPU-native design here is a *recursive blocked right-looking* factorization:

    A = [[A11, .  ],          L11 = chol(A11)
         [A21, A22]]   ==>    L21 = A21 L11^{-T}          (blocked TRSM, MXU)
                              L22 = chol(A22 - L21 L21^T) (SYRK update, MXU)

The recursion is unrolled at trace time (N is static under jit), so every
GEMM/TRSM in the program has a static, MXU-aligned shape and XLA schedules
them back-to-back on the systolic array. The base case is a Pallas blocked
potrf kernel that factorizes a diagonal block entirely in VMEM
(``chol_pallas.py``). All matmuls on the critical path run with
``precision=HIGHEST`` — fp32 accuracy on the MXU — because Cholesky of badly
conditioned covariances is destroyed by bf16 passthrough.

``method="xla"`` falls back to ``jax.lax.linalg.cholesky``.

The custom VJP implements the standard Cholesky reverse-mode rule
(differentiating the factorization, not the recursion), so gradients cost two
triangular solves + one GEMM instead of unrolled-recursion AD.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from cugp_tpu.ops import trsm as trsm_ops

from cugp_tpu.ops.blocking import BASE as _BASE, HI as _HI
from cugp_tpu.ops.blocking import split_point as _split_point


def _base_potrf(a, method):
    # rebuild the (possibly garbage) upper triangle from the lower one —
    # callers may hand us SYRK-lower results (see _syrk_lower)
    lower = jnp.tril(a)
    a = lower + jnp.triu(lower.mT, 1)
    if method == "pallas":
        from cugp_tpu.ops import chol_pallas

        return chol_pallas.potrf(a)
    return lax.linalg.cholesky(a)


# Below this size a trailing update is one full gemm; above, the SYRK
# recursion skips the upper-triangular quadrant (saves ~1/3 of GEMM FLOPs
# at the top levels, where almost all the time is).
_SYRK_FULL = 4096

# "mixed" policy: quadrants containing the diagonal keep full-fp32
# (HIGHEST) updates at or below this size; strictly-off-diagonal update
# GEMMs run at HIGH (bf16_3x — same fp32 accumulator, 3 bf16 input
# passes instead of 6, ~the MXU's nominal rate). Error analysis: the
# Cholesky recursion is only sensitive where pivots are FORMED (the
# diagonal path); off-diagonal trailing blocks enter later pivots
# through a second GEMM that re-rounds anyway. Round-3 VERDICT weak #1 /
# next #6 experiment.
_MIXED_DIAG = 4096
_HIGH = jax.lax.Precision.HIGH


def _syrk_lower(a, p, precision, offdiag_precision=None):
    """a - p p^T computed only on (block) lower triangle; upper is garbage.

    The classic SYRK saving expressed recursively with static shapes: the
    strictly-upper quadrant of each level is returned untouched (callers —
    the Cholesky recursion and the base potrf — only read the lower
    triangle, see _base_potrf's symmetrization).

    offdiag_precision: optional lower precision for the strictly-off-
    diagonal quadrants (the "mixed" policy); diagonal-containing
    quadrants recurse at `precision` until <= _MIXED_DIAG.
    """
    n = a.shape[-1]
    off = offdiag_precision
    if n <= (_SYRK_FULL if off is None else _MIXED_DIAG):
        return a - jnp.matmul(p, p.mT, precision=precision)
    m = _split_point(n)
    a11 = _syrk_lower(a[..., :m, :m], p[..., :m, :], precision, off)
    a21 = a[..., m:, :m] - jnp.matmul(p[..., m:, :], p[..., :m, :].mT,
                                      precision=precision if off is None
                                      else off)
    a22 = _syrk_lower(a[..., m:, m:], p[..., m:, :], precision, off)
    top = jnp.concatenate([a11, a[..., :m, m:]], axis=-1)
    bot = jnp.concatenate([a21, a22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _chol_recursive(a, method, precision, offdiag_precision=None):
    n = a.shape[-1]
    if n <= _BASE:
        return _base_potrf(a, method)
    m = _split_point(n)
    a11 = a[..., :m, :m]
    a21 = a[..., m:, :m]
    a22 = a[..., m:, m:]
    l11 = _chol_recursive(a11, method, precision, offdiag_precision)
    # L21 = A21 L11^{-T}  (solve X L11^T = A21)
    l21 = trsm_ops.solve_xlt(l11, a21, method=method, precision=precision)
    s = _syrk_lower(a22, l21, precision, offdiag_precision)
    l22 = _chol_recursive(s, method, precision, offdiag_precision)
    zeros = jnp.zeros(a.shape[:-2] + (m, n - m), dtype=a.dtype)
    top = jnp.concatenate([l11, zeros], axis=-1)
    bot = jnp.concatenate([l21, l22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _cholesky_impl(a, method, precision):
    # recursive + SYRK-lower won the measured shoot-out at n=32k (HIGH
    # precision): recursive 406ms -> 319ms with SYRK-lower; a left-looking
    # panel sweep (exact n^3/3 GEMM FLOPs on paper) measured 487ms because
    # XLA does not alias the per-panel 4GB buffer updates in place. See
    # PERF.md for the full table.
    if precision == "mixed":
        return _chol_recursive(a, method, _HI, offdiag_precision=_HIGH)
    if precision == "mixed_fast":
        # diagonal path at 3-pass bf16 (the production default that the
        # 2e-4 residual gate already accepts), strictly-off-diagonal
        # trailing updates at 1-pass bf16 (the MXU's full rate) — the
        # aggressive end of the round-4 precision frontier; gate on the
        # reconstruction residual before trusting it
        return _chol_recursive(a, method, _HIGH,
                               offdiag_precision=jax.lax.Precision.DEFAULT)
    return _chol_recursive(a, method, precision)


def _cholesky_fwd(a, method, precision):
    l = _cholesky_impl(a, method, precision)
    return l, l


def _cholesky_bwd(method, precision, l, l_bar):
    """Standard Cholesky reverse rule (Murray 2016, eq. 8-10).

    A_bar = 1/2 L^{-T} (P + P^T) L^{-1},  P = Phi(L^T L_bar),
    with Phi taking the lower triangle and halving the diagonal.
    """
    n = l.shape[-1]
    p = jnp.matmul(l.mT, l_bar, precision=_HI)
    # batched-safe diagonal embedding (diagflat would flatten batch dims)
    diag_p = jnp.diagonal(p, axis1=-2, axis2=-1)
    p = jnp.tril(p) - 0.5 * diag_p[..., None, :] * jnp.eye(n, dtype=p.dtype)
    # S = L^{-T} (P + P^T) L^{-1}: two full n x n triangular solves — on
    # the gradient critical path of every fit/HMC step. XLA's native
    # triangular_solve is ~3x slower than the blocked recursion here
    # (bench_ops round 2: the solves dominated lml_value_and_grad), so
    # route both through the MXU-GEMM recursion; the right-side solve
    # X L = tmp is expressed as (L^T X^T = tmp^T)^T.
    sym = p + p.mT
    tmp = trsm_ops.solve_ltx(l, sym, method="xla", precision=_HI)
    s = trsm_ops.solve_ltx(l, tmp.mT, method="xla", precision=_HI).mT
    # s is symmetric by construction; 0.25*(s+s^T) = 0.5*s (Murray eq. 8)
    # with the average keeping it exactly symmetric in floating point
    a_bar = 0.25 * (s + s.mT)
    return (a_bar,)


_cholesky_impl.defvjp(_cholesky_fwd, _cholesky_bwd)


def cholesky(a, method="auto", precision=None):
    """Lower-triangular Cholesky factor of a symmetric PD matrix.

    method: 'auto' (recursive-blocked on TPU for large N, XLA otherwise),
            'xla', 'blocked' (recursive + XLA base), 'pallas' (recursive +
            Pallas base-case potrf).
    precision: matmul precision for the trailing updates (default HIGHEST =
    true fp32; HIGH = bf16_3x is ~1.3x faster and acceptable for
    well-conditioned covariances — validate against the oracle first).
    "mixed": HIGHEST on the diagonal path (panels, TRSM, diagonal-
    containing SYRK quadrants <= 4k) + HIGH on strictly-off-diagonal
    trailing updates — most of the N^3/3 FLOPs at the 3-pass rate while
    pivots are still formed in full fp32 (gate on the reconstruction
    residual; see benchmarks/bench_chol_precision.py).
    """
    n = a.shape[-1]
    precision = _HI if precision is None else precision
    if method == "auto":
        if jax.default_backend() == "tpu" and n > _BASE:
            method = "blocked"
        else:
            method = "xla"
    if method == "xla":
        return lax.linalg.cholesky(a)
    if method == "blocked":
        return _cholesky_impl(a, "xla", precision)
    if method == "pallas":
        return _cholesky_impl(a, "pallas", precision)
    raise ValueError(f"unknown cholesky method: {method}")
