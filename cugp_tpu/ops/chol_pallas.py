"""Pallas blocked potrf — the native diagonal-block kernel of C2.

TPU-native replacement for the reference's custom CUDA Cholesky kernels
(BASELINE.json:5, "cuSOLVER-style Cholesky -> blocked Pallas/XLA
factorization"). Factorizes one diagonal block (up to 1024 x 1024) entirely
in VMEM with an in-kernel blocked right-looking algorithm:

  for each 128-wide panel p:
    1. unblocked potrf of the (128,128) diagonal tile        (VPU, masked ops)
    2. triangular inverse of that tile                       (VPU, masked ops)
    3. panel below the tile: strip @ inv(tile)^T             (MXU)
    4. trailing update: A -= panel @ panel^T                 (MXU)

The column-wise micro-potrf/trtri use full-tile masked vector ops built from
``broadcasted_iota`` (no dynamic lane indexing), the standard Pallas idiom.
The surrounding recursive blocked factorization in ``cholesky.py`` calls this
as its base case, so every super-1024 matmul is a static-shape MXU GEMM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 128  # in-kernel panel width (MXU native tile)


def _potrf_tile(a):
    """Unblocked Cholesky of a (T, T) tile via masked full-tile column ops."""
    t = a.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)

    def body(j, a):
        colmask = cols == j
        cj = jnp.sum(jnp.where(colmask, a, 0.0), axis=1, keepdims=True)  # (t,1)
        d = jnp.sum(jnp.where((rows == j) & colmask, a, 0.0))
        inv = jax.lax.rsqrt(d)
        lj = jnp.where(rows1 >= j, cj * inv, 0.0)  # (t,1) column j of L
        outer = lj * lj.T
        a = jnp.where(cols > j, a - outer, a)
        a = jnp.where(colmask, lj, a)
        return a

    a = jax.lax.fori_loop(0, t, body, a)
    return jnp.where(rows >= cols, a, 0.0)


def _trtri_tile(l):
    """Inverse of a lower-triangular (T, T) tile by forward substitution."""
    t = l.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    x = jnp.eye(t, dtype=l.dtype)

    def body(i, x):
        # row i of L, entries k < i only: (1, t)
        li = jnp.sum(jnp.where(rows == i, l, 0.0), axis=0, keepdims=True)
        li_strict = jnp.where(cols[:1, :] < i, li, 0.0)
        d = jnp.sum(jnp.where((rows == i) & (cols == i), l, 0.0))
        contrib = jax.lax.dot_general(
            li_strict, x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (1, t)
        ei = jnp.where((rows == i) & (cols == i), 1.0, 0.0)
        ei_row = jnp.sum(ei, axis=0, keepdims=True)
        xi = (ei_row - contrib) / d
        x = jnp.where(rows == i, xi, x)
        return x

    x = jax.lax.fori_loop(0, t, body, x)
    return jnp.where(rows >= cols, x, 0.0)


_MP = 8  # micro-panel width (one fp32 sublane tile)


def _dotf(a, b_, dims):
    return jax.lax.dot_general(
        a, b_, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _potrf_kernel(a_ref, out_ref, pv_ref, lj_ref, *, nb):
    """Blocked potrf of a (nb*T, nb*T) block held in VMEM.

    Round-2 design (VERDICT round 1, next-round #3 — the round-1 version
    ran two 128-iteration fori_loops per panel of full-tile masked VPU ops
    plus an explicit triangular inverse, 0.62 ms at 1024 vs XLA's 0.13):
    every index is STATIC (python-unrolled), the factorization works on
    8-wide micro-panels of the full (b, 128) panel strip — each column
    step touches only a (b, 8) slice and a (b, 1) column — there is no
    trtri and no separate strip TRSM (sub-diagonal rows factor in the same
    column steps), and trailing updates are rank-8 MXU dots per micro-panel
    plus one rank-128 MXU dot per panel over the remaining columns only.
    """
    b = nb * _T
    # Computed in UPPER-factor form (A = U^T U, panels are ROW strips of
    # U) so every dynamic start lands on the SUBLANE dim: Mosaic (jax 0.9)
    # SIGABRTs on dynamic lane-dim ref slices but handles sublane fine.
    # One (b, b) transpose at the end returns the lower factor L = U^T.
    out_ref[:] = a_ref[:]
    cols_1b = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    rows_t1 = jax.lax.broadcasted_iota(jnp.int32, (_T, 1), 0)
    rows_mp = jax.lax.broadcasted_iota(jnp.int32, (_MP, 1), 0)

    for p in range(nb):  # static; nb <= 8
        plo, phi = p * _T, (p + 1) * _T
        pv_ref[:] = out_ref[plo:phi, :]  # (T, b) panel row-strip scratch

        def micro(m, carry, plo=plo):
            # factor the 8-row micro-panel at panel rows [8m, 8m+8):
            # 8 unrolled row steps on the (8, b) strip, then ONE rank-8
            # MXU update of the remaining panel rows. m is traced (the 16
            # micro-panels run under fori_loop — a fully static unroll
            # compiles for minutes); dynamic starts go through sublane
            # ref indexing (pl.ds).
            mlo = m * _MP
            s = pv_ref[pl.ds(mlo, _MP), :]  # (8, b)
            for u in range(_MP):
                j = plo + mlo + u  # global column of this row's diagonal
                cu = s[u:u + 1, :]                       # (1, b)
                d = jnp.sum(jnp.where(cols_1b == j, cu, 0.0))
                inv = jax.lax.rsqrt(d)
                uj = jnp.where(cols_1b >= j, cu * inv, 0.0)  # row j of U
                lj_ref[:] = uj.T
                uj8 = lj_ref[pl.ds(plo + mlo, _MP), :]    # (8, 1)
                outer = uj8 * uj                          # (8, b) rank-1
                s = jnp.where(rows_mp > u, s - outer,
                              jnp.where(rows_mp == u, uj, s))
            # rank-8 update of ALL panel rows (masked to rows >= mhi):
            # upd[k, :] = sum_j s[j, plo+k] * s[j, :]
            s_cols = s[:, plo:phi]  # (8, T) — static cols (p is static)
            upd = _dotf(s_cols, s, ((0,), (0,)))  # (T, b) MXU, K=8
            pv_ref[:] = pv_ref[:] - jnp.where(rows_t1 >= mlo + _MP, upd, 0.0)
            pv_ref[pl.ds(mlo, _MP), :] = s
            return carry

        jax.lax.fori_loop(0, _T // _MP, micro, 0)
        pv = pv_ref[:]
        out_ref[plo:phi, :] = pv
        # panel trailing update on the remaining rows only (MXU):
        # A[k, i] -= sum_j U[j, k] U[j, i]  for k >= phi
        if phi < b:
            pv_cols = pv[:, phi:]  # (T, b - phi) cols of trailing rows
            out_ref[phi:, :] = out_ref[phi:, :] - _dotf(
                pv_cols, pv, ((0,), (0,)))

    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    out_ref[:] = jnp.where(rows >= cols, out_ref[:].T, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _potrf_call(a, interpret):
    n = a.shape[-1]
    nb = n // _T
    kern = functools.partial(_potrf_kernel, nb=nb)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_T, n), jnp.float32),   # panel row strip
            pltpu.VMEM((n, 1), jnp.float32),    # column for dyn row reads
        ],
        cost_estimate=pl.CostEstimate(
            flops=n * n * n, bytes_accessed=8 * n * n, transcendentals=n,
        ),
        interpret=interpret,
    )(a)


def potrf(a, interpret=None):
    """Cholesky of a single PD block; n must be a multiple of 128, n<=1024.

    Batched inputs are vmapped over leading dims.
    """
    n = a.shape[-1]
    if n % _T != 0:
        raise ValueError(f"potrf block size must be a multiple of {_T}, got {n}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = functools.partial(_potrf_call, interpret=interpret)
    if a.ndim == 2:
        return fn(a.astype(jnp.float32))
    flat = a.reshape((-1,) + a.shape[-2:]).astype(jnp.float32)
    out = jax.vmap(fn)(flat)
    return out.reshape(a.shape)
