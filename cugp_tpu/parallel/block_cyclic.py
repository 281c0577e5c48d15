"""2D block-cyclic distributed Cholesky via shard_map — component C3.

The explicitly-scheduled ScaLAPACK-style factorization demanded by
BASELINE.json:5/11 ("2D block-cyclic distributed Cholesky over ICI"):
block (i, j) of the matrix lives on chip (i mod R, j mod C) of the ('r','c')
mesh; each panel step factors the diagonal block on its owner, broadcasts
the panel along the mesh axes (psum/all_gather ride ICI), and every chip
applies its local trailing SYRK update on the MXU.

Layout: the wrapper applies the block-cyclic row/column permutation so that
shard_map's contiguous P('r','c') sharding realizes the cyclic ownership;
the inverse permutation restores natural order afterwards.

This is the spec/reference-shaped path, kept simple and correct (full-size
masked updates each step). The performance path for large N is the chunked
GSPMD sweep in ``distributed_chol.py`` — see its docstring for why that
formulation is the better fit for XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax import shard_map

from cugp_tpu.ops import cholesky as chol_ops
from cugp_tpu.ops import trsm as trsm_ops

_HI = jax.lax.Precision.HIGHEST


def cyclic_permutation(nb, R, block):
    """Row permutation (as an index array) realizing block-cyclic order."""
    order = [i for p in range(R) for i in range(p, nb, R)]
    idx = np.concatenate(
        [np.arange(i * block, (i + 1) * block) for i in order])
    return jnp.asarray(idx)


def _inverse_perm(idx):
    inv = jnp.zeros_like(idx)
    return inv.at[idx].set(jnp.arange(idx.shape[0]))


def _factor_local(A_loc, *, nb, R, C, block, nbr, nbc):
    """shard_map body: block-cyclic right-looking factorization."""
    my_r = jax.lax.axis_index("r")
    my_c = jax.lax.axis_index("c")
    rows = nbr * block

    # global block index of each local row / local column
    t_row = jnp.arange(rows) // block
    g_row = t_row * R + my_r  # (rows,) global block-row of local rows
    t_col = jnp.arange(nbc * block) // block
    g_col = t_col * C + my_c  # global block-col of local cols

    def body(k, A_loc):
        r_k = k % R
        c_k = k % C
        kb_r = k // R
        kb_c = k // C

        # --- panel column strip to every chip of each mesh row (ICI psum) ---
        strip = jax.lax.dynamic_slice(A_loc, (0, kb_c * block), (rows, block))
        strip = jnp.where(my_c == c_k, strip, 0.0)
        strip = jax.lax.psum(strip, "c")  # rows i = my_r (mod R), col block k

        # --- diagonal block to everyone (ICI psum along 'r') ---
        diag = jax.lax.dynamic_slice(strip, (kb_r * block, 0), (block, block))
        diag = jnp.where(my_r == r_k, diag, 0.0)
        diag = jax.lax.psum(diag, "r")
        l_kk = chol_ops.cholesky(diag, method="xla")

        # --- local panel: L_ik = A_ik L_kk^{-T} for my block rows i > k ---
        panel = trsm_ops.solve_xlt(l_kk, strip)
        panel = jnp.where((g_row > k)[:, None], panel, 0.0)

        # write the factored column back on the owning chips
        l_kk_emb = jnp.zeros_like(strip)
        l_kk_emb = jax.lax.dynamic_update_slice(l_kk_emb, l_kk,
                                                (kb_r * block, 0))
        l_kk_emb = jnp.where(my_r == r_k, l_kk_emb, 0.0)
        strip_new = panel + l_kk_emb
        A_loc = jnp.where(
            my_c == c_k,
            jax.lax.dynamic_update_slice(A_loc, strip_new, (0, kb_c * block)),
            A_loc,
        )

        # --- transpose-panel for my local columns (ICI all_gather) ---
        panel_all = jax.lax.all_gather(panel, "r")  # (R, rows, block)

        def col_block(t):
            j = t * C + my_c          # global block-col owned locally
            src_r = j % R             # chip row holding block row j
            src_t = (j // R) * block  # local row offset there
            return jax.lax.dynamic_slice(
                panel_all, (src_r, src_t, 0), (1, block, block))[0]

        q = jax.vmap(col_block)(jnp.arange(nbc))  # (nbc, block, block)
        q = q.reshape(nbc * block, block)         # rows = L_jk for my cols j
        q = jnp.where((g_col > k)[:, None], q, 0.0)

        # --- trailing update on the MXU (masked full-size SYRK) ---
        A_loc = A_loc - jnp.matmul(panel, q.mT, precision=_HI)
        return A_loc

    A_loc = jax.lax.fori_loop(0, nb, body, A_loc)
    # zero the strict upper triangle (global block coordinates)
    lower = g_row[:, None] * block + (jnp.arange(rows) % block)[:, None] >= \
        g_col[None, :] * block + (jnp.arange(nbc * block) % block)[None, :]
    return jnp.where(lower, A_loc, 0.0)


def block_cyclic_cholesky(K, mesh, block=128):
    """Lower Cholesky of K via the shard_map block-cyclic algorithm.

    K: (n, n) with n divisible by block*R and block*C for the ('r','c')
    mesh. Returns L in natural (unpermuted) order, sharded P('r','c').
    """
    n = K.shape[-1]
    R, C = mesh.shape["r"], mesh.shape["c"]
    if n % (block * R) or n % (block * C):
        raise ValueError(
            f"n={n} must be divisible by block*R={block*R} and "
            f"block*C={block*C}")
    nb = n // block
    nbr, nbc = nb // R, nb // C

    row_perm = cyclic_permutation(nb, R, block)
    col_perm = cyclic_permutation(nb, C, block)
    Kp = K[row_perm][:, col_perm]

    fn = shard_map(
        partial(_factor_local, nb=nb, R=R, C=C, block=block, nbr=nbr, nbc=nbc),
        mesh=mesh,
        in_specs=P("r", "c"),
        out_specs=P("r", "c"),
    )
    Lp = fn(Kp)
    return Lp[_inverse_perm(row_perm)][:, _inverse_perm(col_perm)]
