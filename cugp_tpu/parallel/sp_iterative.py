"""Distributed MATRIX-FREE inference — ring matvec + sharded CG (round-4
beyond-parity surface; the SP/ring analog of the iterative tier).

The single-chip matrix-free tier (inference/iterative) lifted exact-GP
inference to n=131k on one chip; this module shards the SAME schedule
over a mesh axis: X, y, and every CG vector are row-sharded, the kernel
matvec rotates shards around the ICI ring with ``ppermute`` (each step
builds one (n_loc, n_loc) tile in registers/VMEM and contracts it
immediately — K never exists, not even tile-rows of it in HBM), and CG's
scalar reductions ride ``psum``. Per-chip memory is O(n_loc * (d + r)),
so capacity scales linearly with the ring size on top of the
single-chip 131k envelope.

Composite kernels are first-class via the same flatten_terms/factor_view
tile algebra the ring covariance builder uses (parallel/ring.py).

Everything here runs inside ONE shard_map program per solve; tested on
the 8-virtual-device CPU mesh against the single-device iterative tier
(tests/dist/test_sp_iterative.py) and exercised by dryrun_multichip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from cugp_tpu.ops import kernels as kernel_ops


def _views_scal(params, X, kind, jitter):
    """Per-factor scaled views + packed scalars (ring.py's recipe)."""
    sn2 = jnp.exp(params["log_noise_var"]).astype(jnp.float32)
    sf2 = kernel_ops.signal_scale(params).astype(jnp.float32)
    views, bases, extras, amps, term_sizes = [], [], [], [], []
    for amp, factors in kernel_ops.flatten_terms(params, kind):
        amps.append(jnp.asarray(amp, jnp.float32))
        term_sizes.append(len(factors))
        for base, fp in factors:
            xs, b2, extra = kernel_ops.factor_view(fp, X, base)
            views.append(xs)
            bases.append(b2)
            extras.append(jnp.asarray(extra, jnp.float32))
    scal = jnp.stack(amps + [sn2 + jitter * sf2] + extras)
    return tuple(views), tuple(bases), tuple(term_sizes), scal


def _tile(x_views, rot_views, scal, bases, term_sizes):
    """Composite kernel tile between local rows and rotated cols."""
    T = len(term_sizes)
    blk = None
    f = 0
    for t, nf in enumerate(term_sizes):
        term = None
        for _ in range(nf):
            kf = kernel_ops.tile_eval(x_views[f], rot_views[f], bases[f],
                                      scal[T + 1 + f])
            term = kf if term is None else term * kf
            f += 1
        term = scal[t] * term
        blk = term if blk is None else blk + term
    return blk


def _make_ring_matvec(x_views, scal, bases, term_sizes, axis):
    """v_loc (n_loc, r) -> ((K + diag I) v)_loc inside a shard_map body."""
    R = jax.lax.axis_size(axis)
    T = len(term_sizes)
    diag_add = scal[T]
    perm = [(i, (i + 1) % R) for i in range(R)]

    def matvec(v_loc):
        # zeros_like(v_loc) inherits v_loc's device-varying type, so no
        # pcast is needed (unlike ring.py's invariant-fresh carry)
        u0 = jnp.zeros_like(v_loc)

        def step(s, carry):
            u, rot_views, v_rot = carry
            blk = _tile(x_views, rot_views, scal, bases, term_sizes)
            u = u + jnp.matmul(blk, v_rot,
                               precision=jax.lax.Precision.HIGHEST)
            rot_views = tuple(jax.lax.ppermute(xv, axis, perm)
                              for xv in rot_views)
            v_rot = jax.lax.ppermute(v_rot, axis, perm)
            return (u, rot_views, v_rot)

        u, _, _ = jax.lax.fori_loop(0, R, step, (u0, x_views, v_loc))
        return u + diag_add * v_loc

    return matvec


def _pdot(a, b, axis):
    """Global per-column dot product of row-sharded (n_loc, r) arrays."""
    return jax.lax.psum(jnp.sum(a * b, axis=0), axis)


def _cg_sharded(matvec, b_loc, axis, tol, max_iters):
    """CG with psum-reduced scalars; b_loc (n_loc, r) row-sharded."""
    bnorm = jnp.maximum(jnp.sqrt(_pdot(b_loc, b_loc, axis)), 1e-30)
    x = jnp.zeros_like(b_loc)
    r = b_loc
    p = b_loc
    rs = _pdot(r, r, axis)

    def cond(c):
        x, r, p, rs, it = c
        rel = jnp.sqrt(_pdot(r, r, axis)) / bnorm
        return (it < max_iters) & jnp.any(rel > tol)

    def body(c):
        x, r, p, rs, it = c
        ap = matvec(p)
        denom = _pdot(p, ap, axis)
        alpha = rs / jnp.where(denom == 0, 1.0, denom)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * ap
        rs_new = _pdot(r, r, axis)
        beta = rs_new / jnp.where(rs == 0, 1.0, rs)
        p = r + beta[None, :] * p
        return (x, r, p, rs_new, it + 1)

    x, r, p, rs, it = jax.lax.while_loop(
        cond, body, (x, r, p, rs, jnp.asarray(0, jnp.int32)))
    return x, it


def ring_matvec(params, X, v, mesh, kind="rbf", jitter=1e-6, axis="r"):
    """(K(X,X) + (noise + jitter sf2) I) v over a row-sharded ring.

    X (n, d), v (n,) or (n, r); n divisible by the axis size. Returns the
    product row-sharded the same way (fetch gathers it).
    """
    kernel_ops.validate_kind(kind)
    vec = v.ndim == 1
    v2 = (v[:, None] if vec else v).astype(jnp.float32)
    views, bases, term_sizes, scal = _views_scal(params, X, kind, jitter)

    def body(x_views, v_loc, scal):
        mv = _make_ring_matvec(x_views, scal, bases, term_sizes, axis)
        return mv(v_loc)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(tuple(P(axis, None) for _ in views), P(axis, None), P()),
        out_specs=P(axis, None))
    out = fn(views, v2, scal)
    return out[:, 0] if vec else out


def cg_solve_sharded(params, X, b, mesh, kind="rbf", jitter=1e-6,
                     axis="r", tol=1e-6, max_iters=500):
    """Distributed CG solve of (K + noise I) x = b; K never formed.

    ONE shard_map program: ring matvecs + psum scalar reductions.
    Returns (x row-sharded, iterations)."""
    kernel_ops.validate_kind(kind)
    vec = b.ndim == 1
    b2 = (b[:, None] if vec else b).astype(jnp.float32)
    views, bases, term_sizes, scal = _views_scal(params, X, kind, jitter)

    def body(x_views, b_loc, scal):
        mv = _make_ring_matvec(x_views, scal, bases, term_sizes, axis)
        return _cg_sharded(mv, b_loc, axis, tol, max_iters)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(tuple(P(axis, None) for _ in views), P(axis, None), P()),
        out_specs=(P(axis, None), P()))
    x, it = fn(views, b2, scal)
    return (x[:, 0] if vec else x), it


def posterior_iterative_sharded(params, X, y, Xs, mesh, kind="rbf",
                                jitter=1e-6, axis="r", tol=1e-6,
                                max_iters=500, include_noise=False):
    """Matrix-free posterior mean + diag variance over the ring.

    X/y row-sharded; Xs (m, d) replicated (test points are small).
    mean = psum_j K(Xs, X_j) alpha_j with alpha from distributed CG;
    variance via the batched distributed solve on the cross-covariance
    columns. One shard_map program; K never formed anywhere.
    """
    kernel_ops.validate_kind(kind)
    y2 = y[:, None].astype(jnp.float32)
    views, bases, term_sizes, scal = _views_scal(params, X, kind, jitter)
    # views of the TEST inputs in each factor's evaluation space share
    # the factor scaling, so cross tiles reuse _tile with rot=Xs-views
    sviews = []
    for _amp, factors in kernel_ops.flatten_terms(params, kind):
        for base, fp in factors:
            xss, _b2, _e = kernel_ops.factor_view(fp, Xs, base)
            sviews.append(xss)
    sviews = tuple(sviews)
    kss = kernel_ops.kernel_diag(params, Xs, kind)
    sn2 = jnp.exp(params["log_noise_var"])

    def body(x_views, s_views, y_loc, scal):
        mv = _make_ring_matvec(x_views, scal, bases, term_sizes, axis)
        alpha, _ = _cg_sharded(mv, y_loc, axis, tol, max_iters)
        ks_loc = _tile(x_views, s_views, scal, bases, term_sizes)  # (nl, m)
        mu = jax.lax.psum(
            jnp.matmul(ks_loc.mT, alpha,
                       precision=jax.lax.Precision.HIGHEST)[:, 0], axis)
        w, _ = _cg_sharded(mv, ks_loc, axis, tol, max_iters)
        qvar = jax.lax.psum(jnp.sum(ks_loc * w, axis=0), axis)
        return mu, qvar

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(tuple(P(axis, None) for _ in views),
                  tuple(P() for _ in sviews), P(axis, None), P()),
        out_specs=(P(), P()))
    mu, qvar = fn(views, sviews, y2, scal)
    var = kss - qvar
    if include_noise:
        var = var + sn2
    return mu, jnp.maximum(var, 0.0)


def lml_iterative_sharded(params, X, y, mesh, key=None, kind="rbf",
                          jitter=1e-6, axis="r", tol=1e-5, max_iters=500,
                          num_probes=16, num_steps=32):
    """Matrix-free LML over the ring: distributed CG for the quadratic
    term + batched Lanczos SLQ with psum-reduced inner products for the
    logdet. One shard_map program; per-chip memory O(n_loc * probes).

    The multi-chip extension of inference/iterative.lml_iterative: the
    same estimator, with every n-vector row-sharded and every scalar
    reduction a psum — capacity for the n axis scales with the ring.
    """
    import math

    kernel_ops.validate_kind(kind)
    if key is None:
        key = jax.random.key(0)
    n = X.shape[0]
    z = jax.random.rademacher(key, (n, num_probes), dtype=jnp.float32)
    y2 = y[:, None].astype(jnp.float32)
    views, bases, term_sizes, scal = _views_scal(params, X, kind, jitter)

    def body(x_views, y_loc, z_loc, scal):
        mv = _make_ring_matvec(x_views, scal, bases, term_sizes, axis)
        alpha, _ = _cg_sharded(mv, y_loc, axis, tol, max_iters)
        quad = _pdot(y_loc, alpha, axis)[0]

        # batched Lanczos with global (psum) inner products
        nrm = jnp.sqrt(_pdot(z_loc, z_loc, axis))
        q0 = z_loc / nrm[None, :]

        def step(carry, _):
            q_prev, q, beta_prev = carry
            v = mv(q) - beta_prev[None, :] * q_prev
            a = _pdot(q, v, axis)
            v = v - a[None, :] * q
            b = jnp.sqrt(_pdot(v, v, axis))
            q_next = v / jnp.where(b == 0, 1.0, b)[None, :]
            return (q, q_next, b), (a, b)

        (_, _, _), (alphas, betas) = jax.lax.scan(
            step, (jnp.zeros_like(q0), q0,
                   jnp.zeros((num_probes,), jnp.float32)), None,
            length=num_steps)
        betas = betas[:-1]

        def quad_form(a, b):  # replicated tiny eigendecomposition
            t = jnp.diag(a) + jnp.diag(b, 1) + jnp.diag(b, -1)
            evals, evecs = jnp.linalg.eigh(t)
            evals = jnp.maximum(evals, 1e-30)
            w = evecs[0, :] ** 2
            return jnp.sum(w * jnp.log(evals)) * float(n)

        logdet = jnp.mean(jax.vmap(quad_form, in_axes=(1, 1))(alphas, betas))
        return -0.5 * quad - 0.5 * logdet - 0.5 * n * math.log(2 * math.pi)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(tuple(P(axis, None) for _ in views), P(axis, None),
                  P(axis, None), P()),
        out_specs=P())
    return fn(views, y2, z, scal)
