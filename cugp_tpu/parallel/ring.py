"""Ring-ppermute covariance build — the SP/ring tier of C1/C10.

Sequence-parallel covariance construction (SURVEY.md section 2.1, "ring
pattern"): the N training points are the "sequence"; X is row-sharded over
the mesh axis and shards rotate around the ICI ring with ``ppermute``, so
each chip fills its row-block of K one column-block per step without ever
holding the full X — the ring-attention analog for the O(N^2) pairwise
kernel computation. No N x N intermediate and no all-gather of X.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from cugp_tpu.ops import kernels as kernel_ops
from cugp_tpu.ops.kernels import kernel_fn, extra_scalar, periodic_rbf_view


def _ring_body(x_loc, *, kind, axis, sf2_c, diag_add_c, alpha_c):
    """shard_map body: build my (n_loc, N) row-block of K."""
    me = jax.lax.axis_index(axis)
    R = jax.lax.axis_size(axis)
    n_loc = x_loc.shape[0]
    n = n_loc * R

    perm = [(i, (i + 1) % R) for i in range(R)]
    row_off = me * n_loc
    rows_idx = row_off + jnp.arange(n_loc)[:, None]

    def step(s, carry):
        k_loc, x_rot = carry
        src = (me - s) % R  # origin shard of what we currently hold
        cross = jnp.dot(x_loc, x_rot.T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        if kind == "linear":
            blk = sf2_c * cross + alpha_c  # alpha slot = bias variance
        else:
            s1 = jnp.sum(x_loc * x_loc, axis=-1, keepdims=True)
            s2 = jnp.sum(x_rot * x_rot, axis=-1, keepdims=True).T
            d2 = jnp.maximum(s1 + s2 - 2.0 * cross, 0.0)
            blk = sf2_c * kernel_fn(d2, kind, alpha_c)
        col_off = src * n_loc
        cols_idx = col_off + jnp.arange(n_loc)[None, :]
        blk = blk + jnp.where(rows_idx == cols_idx, diag_add_c, 0.0)
        k_loc = jax.lax.dynamic_update_slice(k_loc, blk, (0, col_off))
        x_rot = jax.lax.ppermute(x_rot, axis, perm)
        return (k_loc, x_rot)

    k_loc = jnp.zeros((n_loc, n), jnp.float32)
    # mark the carry as device-varying over the ring axis up front: the
    # first ppermute/axis_index use makes the outputs varying, and scan
    # carries must have matching varying-axis types on both sides
    axes = axis if isinstance(axis, tuple) else (axis,)
    k_loc = jax.lax.pcast(k_loc, axes, to="varying")
    k_loc, _ = jax.lax.fori_loop(0, R, step, (k_loc, x_loc))
    return k_loc


def ring_train_covariance(params, X, mesh, kind="rbf", jitter=1e-6,
                          axis="r"):
    """K(X,X) + noise diag, built by ring rotation; K returned row-sharded.

    X: (n, d) with n divisible by the size of mesh axis `axis` (a name or
    a tuple of names — e.g. ("r", "c") rings over all chips row-major).
    """
    kernel_ops.require_base_kind(kind, "ring_train_covariance")
    if kind == "periodic":
        # cos/sin embedding is pointwise per row, so it commutes with the
        # row sharding; the ring then builds the equivalent rbf covariance.
        params, X = periodic_rbf_view(params, X)
        kind = "rbf"
    ell = jnp.exp(params["log_lengthscale"]).astype(jnp.float32)
    sf2 = jnp.exp(params["log_signal_var"]).astype(jnp.float32)
    sn2 = jnp.exp(params["log_noise_var"]).astype(jnp.float32)
    alpha = extra_scalar(params, kind)
    xs = (X / ell).astype(jnp.float32)

    # scalars enter the body as 0-d residuals via closure-free operands:
    # shard_map requires explicit specs, so fold them into a tiny array
    def body(x_loc, scal):
        return _ring_body(x_loc, kind=kind, axis=axis,
                          sf2_c=scal[0], diag_add_c=scal[1], alpha_c=scal[2])

    scal = jnp.stack([sf2, sn2 + jitter * sf2, alpha])
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(axis, None),
    )
    return fn(xs, scal)
