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


def _potrf_kernel(a_ref, out_ref, *, nb):
    """Blocked potrf of a (nb*T, nb*T) block held in VMEM."""
    b = nb * _T
    out_ref[:] = a_ref[:]
    rows_b = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)

    for p in range(nb):  # static unroll; nb <= 8
        lo, hi = p * _T, (p + 1) * _T
        diag = out_ref[lo:hi, lo:hi]
        ld = _potrf_tile(diag)
        linv = _trtri_tile(ld)
        strip = out_ref[:, lo:hi]  # (b, T)
        x = jax.lax.dot_general(
            strip, linv, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # strip @ linv^T
        below = rows_b >= hi
        x = jnp.where(below, x, 0.0)
        # assemble the strip: zeros above, ld on the diagonal tile, x below
        ld_emb = jnp.pad(ld, ((lo, b - hi), (0, 0)))
        out_ref[:, lo:hi] = ld_emb + x
        # trailing update: nonzero only for rows/cols >= hi, so the full
        # rank-T MXU update is safe against already-written panels
        upd = jax.lax.dot_general(
            x, x, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_ref[:] = out_ref[:] - upd

    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    out_ref[:] = jnp.where(rows >= cols, out_ref[:], 0.0)


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
