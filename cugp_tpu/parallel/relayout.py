"""Explicit layout transitions (Ulysses analog) — C10, SURVEY.md section 2.1.

The GP engine's two production layouts for the dense N x N matrix are

  row-sharded  P(('r','c'), None) — rows split over ALL chips, full column
               width local: the covariance-build layout (ring/SP tier,
               each chip fills its row block of K, ring.py), and
  2D           P('r','c')         — the factorization layout (Cholesky
               trailing updates tile over the ('r','c') grid).

The transition between them is the GP analog of DeepSpeed-Ulysses'
sequence<->head all-to-all: within each mesh row r, every chip splits its
row block column-wise into C chunks and exchanges them with its row peers
in ONE ``all_to_all`` along 'c' (the transpose-free resharding; traffic
per chip = its local bytes, no replication). Round 1 left this implicit in
GSPMD resharding with no tests (VERDICT round 1, missing #4); this module
is the explicit, scheduled version.

Row-block index convention: row-sharded uses the row-major device order of
the ('r','c') grid — chip (r, c) holds global rows
[(r*C + c) * n/(R*C), ...) — so the all_to_all concatenation along 'c'
reassembles exactly the contiguous n/R row band of mesh row r.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map


def _row_to_2d_body(a_loc):
    # a_loc: (n/(R*C), n) -> split cols into C chunks, exchange along 'c',
    # concat received chunks along rows -> (n/R, n/C)
    return jax.lax.all_to_all(a_loc, "c", split_axis=1, concat_axis=0,
                              tiled=True)


def _2d_to_row_body(a_loc):
    # a_loc: (n/R, n/C) -> split rows into C chunks, exchange along 'c',
    # concat received chunks along cols -> (n/(R*C), n)
    return jax.lax.all_to_all(a_loc, "c", split_axis=0, concat_axis=1,
                              tiled=True)


def row_to_2d(A, mesh):
    """Reshard A from row-sharded P(('r','c'), None) to 2D P('r','c').

    One all_to_all along 'c' per chip; rows and columns must be divisible
    by R*C and C respectively.
    """
    R, C = mesh.shape["r"], mesh.shape["c"]
    n0, n1 = A.shape
    if n0 % (R * C) or n1 % C:
        raise ValueError(
            f"shape {A.shape} not divisible by (R*C={R*C}, C={C})")
    fn = shard_map(_row_to_2d_body, mesh=mesh,
                   in_specs=P(("r", "c"), None), out_specs=P("r", "c"))
    return fn(A)


def two_d_to_row(A, mesh):
    """Inverse of row_to_2d: P('r','c') back to P(('r','c'), None)."""
    R, C = mesh.shape["r"], mesh.shape["c"]
    n0, n1 = A.shape
    if n0 % (R * C) or n1 % C:
        raise ValueError(
            f"shape {A.shape} not divisible by (R*C={R*C}, C={C})")
    fn = shard_map(_2d_to_row_body, mesh=mesh,
                   in_specs=P("r", "c"), out_specs=P(("r", "c"), None))
    return fn(A)
