"""Pallas blocked TRSM — the native diagonal-block solve of C4.

TPU-native replacement for the reference's cuBLAS-style triangular solves
(BASELINE.json:5, "batched triangular solves"). Solves L X = B or L^T X = B
for a diagonal block L (n <= 1024, multiple of 128) against many right-hand
sides: the grid tiles the RHS columns; within each grid step the kernel
inverts the 128x128 diagonal tiles of L (masked VPU forward substitution,
see chol_pallas.py) and performs the blocked substitution with MXU GEMMs.
Right-side solves (X L^T = B) are forwarded through a transposition in the
wrapper. The recursive blocked TRSM in ``trsm.py`` calls this as its base
case.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cugp_tpu.ops.chol_pallas import _trtri_tile

_T = 128
_BN = 256  # RHS columns per grid step


def _dotf(a, b, dims):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _trsm_kernel(l_ref, b_ref, out_ref, *, nb, transpose):
    """Solve (L or L^T) X = B for one (n, BN) RHS tile."""
    order = range(nb - 1, -1, -1) if transpose else range(nb)
    for p in order:  # static unroll, nb <= 8
        lo, hi = p * _T, (p + 1) * _T
        ld = l_ref[lo:hi, lo:hi]
        linv = _trtri_tile(ld)
        rhs = b_ref[lo:hi, :]
        if transpose:
            # back substitution: rhs -= L[hi:, lo:hi]^T @ X[hi:]
            if p < nb - 1:
                strip = l_ref[hi:, lo:hi]  # (n-hi, T)
                rhs = rhs - _dotf(strip, out_ref[hi:, :], ((0,), (0,)))
            xp = _dotf(linv, rhs, ((0,), (0,)))  # linv^T @ rhs
        else:
            # forward substitution: rhs -= L[lo:hi, :lo] @ X[:lo]
            if p > 0:
                strip = l_ref[lo:hi, :lo]  # (T, lo)
                rhs = rhs - _dotf(strip, out_ref[:lo, :], ((1,), (0,)))
            xp = _dotf(linv, rhs, ((1,), (0,)))
        out_ref[lo:hi, :] = xp


@functools.partial(jax.jit, static_argnames=("transpose", "interpret"))
def _trsm_call(l, b, transpose, interpret):
    n, k = b.shape
    nb = n // _T
    bk = min(_BN, k)
    kern = functools.partial(_trsm_kernel, nb=nb, transpose=transpose)
    return pl.pallas_call(
        kern,
        grid=(k // bk,),
        in_specs=[
            pl.BlockSpec((n, n), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, bk), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, bk), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=n * n * k, bytes_accessed=4 * (n * n + 2 * n * k),
            transcendentals=0,
        ),
        interpret=interpret,
    )(l, b)


def _round_up(a, m):
    return -(-a // m) * m


def trsm(l, b, left=True, transpose=False, interpret=None):
    """Triangular solve with lower-triangular L.

    left=True:  solve  L X = B (transpose=False) or L^T X = B (True).
    left=False: solve  X L = B (transpose=False) or X L^T = B (True).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not left:
        # X op(L) = B  <=>  op(L)^T X^T = B^T
        xt = trsm(l, b.mT if b.ndim > 1 else b, left=True,
                  transpose=not transpose, interpret=interpret)
        return xt.mT if xt.ndim > 1 else xt

    vec = b.ndim == l.ndim - 1
    if vec:
        b = b[..., None]
    n = l.shape[-1]
    k = b.shape[-1]
    npad = _round_up(n, _T)
    # rhs padded to the 128-lane minimum; the grid tiles by min(_BN, kpad)
    # so a single-vector solve doesn't pay for 256 zero columns
    kpad = _round_up(k, 128)
    if npad != n:
        # pad L with an identity block so padded solves are exact
        eye = jnp.eye(npad - n, dtype=l.dtype)
        l = jnp.pad(l, ((0, npad - n), (0, npad - n)))
        l = l.at[n:, n:].set(eye)
        b = jnp.pad(b, ((0, npad - n), (0, 0)))
    if kpad != k:
        b = jnp.pad(b, ((0, 0), (0, kpad - k)))
    x = _trsm_call(l.astype(jnp.float32), b.astype(jnp.float32), transpose,
                   interpret)
    x = x[:n, :k]
    return x[..., 0] if vec else x
