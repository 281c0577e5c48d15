"""LMC / intrinsic-coregionalization multi-output GP — beyond-parity model
family (round-2 VERDICT missing #6: "multi-output is shared-kernel only").

Model: p outputs with joint prior covariance  B (x) K(X,X) + sn2 I_{pn},
where B = A A^T + diag(d) is a learnable low-rank-plus-diagonal p x p
coregionalization matrix (rank q <= p) and K is any base/composite kernel
from the ops tier. Outputs are CORRELATED — unlike
exact_gp.log_marginal_likelihood_multi, which treats them as independent
draws of one kernel (B = I).

TPU shape: the pn x pn matrix is never formed. With the eigendecomposition
B = V diag(lam) V^T and isotropic noise,

    B (x) K + sn2 I = (V (x) I) (diag(lam) (x) K + sn2 I) (V^T (x) I),

so rotating the outputs Y' = Y V decouples the problem into p independent
single-output GPs with covariances lam_j K + sn2 I — one vmapped batch of
p Choleskys of the SAME n x n kernel matrix (one covariance build, MXU
batched factorizations), exactly the compiler-friendly static-shape
pattern the rest of the engine uses. Everything is differentiable: eigh's
VJP is well-defined for the distinct eigenvalues a trained A A^T + diag(d)
has generically.

Cross-check: tests/test_lmc.py builds the dense pn x pn matrix in float64
(oracle/lmc_np.py) and compares LML/posterior exactly.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from cugp_tpu.models import exact_gp
from cugp_tpu.ops import cholesky as chol_ops
from cugp_tpu.ops import kernels as kernel_ops
from cugp_tpu.ops import trsm as trsm_ops

_HI = jax.lax.Precision.HIGHEST
LOG2PI = math.log(2.0 * math.pi)


def init_lmc_params(d, p, q=1, lengthscale=1.0, signal_var=1.0,
                    noise_var=0.1, seed=0):
    """Kernel params + coregionalization factors.

    A: (p, q) mixing factors, d_diag: (p,) softplus-parameterized output
    diagonal. B = A A^T + softplus(raw_d) I-wise diagonal.
    """
    params = kernel_ops.init_params(d=d, lengthscale=lengthscale,
                                    signal_var=signal_var,
                                    noise_var=noise_var)
    key = jax.random.key(seed)
    # small asymmetric init: distinct generic eigenvalues for eigh's VJP
    params["lmc_A"] = 0.5 * jax.random.normal(key, (p, q), jnp.float32)
    params["lmc_raw_d"] = jnp.full((p,), -1.0, jnp.float32)
    return params


def coregionalization(params):
    """B = A A^T + diag(softplus(raw_d)) — SPD by construction."""
    A = params["lmc_A"]
    d = jax.nn.softplus(params["lmc_raw_d"]) + 1e-6
    return jnp.matmul(A, A.mT, precision=_HI) + jnp.diag(d)


def _rotated_factorizations(params, X, kind, jitter, method):
    """Shared setup: eig(B), one K build, p vmapped Choleskys.

    Returns (lam (p,), V (p,p), Ls (p,n,n)) with Ls[j] = chol(lam_j Kf
    + sn2 I + jitter-scaled identity); Kf is the NOISE-FREE kernel.
    """
    B = coregionalization(params)
    lam, V = jnp.linalg.eigh(B)
    lam = jnp.maximum(lam, 1e-8)
    # NOISE-FREE kernel matrix (train_covariance would fold sn2 in)
    Kf = kernel_ops.cross_covariance(params, X, X, kind=kind, method=method)
    sf2 = kernel_ops.signal_scale(params)
    sn2 = jnp.exp(params["log_noise_var"])
    n = X.shape[0]
    eye = jnp.eye(n, dtype=Kf.dtype)

    def chol_one(lam_j):
        Kj = lam_j * Kf + (sn2 + jitter * sf2 * lam_j) * eye
        return chol_ops.cholesky(Kj, method="xla")

    Ls = jax.vmap(chol_one)(lam)
    return lam, V, Ls


@partial(jax.jit, static_argnames=("kind", "jitter", "method"))
def log_marginal_likelihood_lmc(params, X, Y, kind="rbf", jitter=1e-6,
                                method="auto"):
    """Exact LML of the LMC model, O(p n^3) via the rotation identity.

    log N(vec(Y) | 0, B (x) K + sn2 I)
      = sum_j [ -1/2 y'_j^T (lam_j K + sn2 I)^{-1} y'_j
                - log det^(1/2) - n/2 log 2pi ],   Y' = Y V.
    """
    lam, V, Ls = _rotated_factorizations(params, X, kind, jitter, method)
    Yr = jnp.matmul(Y, V, precision=_HI)  # (n, p)

    def per_output(L_j, y_j):
        alpha = trsm_ops.cho_solve(L_j, y_j[:, None], method="xla")[:, 0]
        return (-0.5 * jnp.dot(y_j, alpha)
                - jnp.sum(jnp.log(jnp.diagonal(L_j))))

    terms = jax.vmap(per_output)(Ls, Yr.T)
    n, p = Y.shape
    return jnp.sum(terms) - 0.5 * n * p * LOG2PI


@partial(jax.jit, static_argnames=("kind", "jitter", "method",
                                   "include_noise", "full_output_cov"))
def posterior_lmc(params, X, Y, Xs, kind="rbf", jitter=1e-6, method="auto",
                  include_noise=False, full_output_cov=False):
    """Posterior mean and variance of all p outputs at Xs.

    Rotated space: mean'_j = lam_j Ks^T (lam_j K + sn2 I)^{-1} y'_j,
    var'_j = lam_j kss - lam_j^2 || L_j^{-1} Ks ||^2 (independent across
    j). Back-rotation: mu = mu' V^T; per-point output covariance
    Sigma(x) = V diag(var'(x)) V^T — returned in full when
    full_output_cov=True ((m, p, p)), else its diagonal ((m, p)).
    """
    lam, V, Ls = _rotated_factorizations(params, X, kind, jitter, method)
    Yr = jnp.matmul(Y, V, precision=_HI)
    Ks = kernel_ops.cross_covariance(params, X, Xs, kind=kind,
                                     method=method)  # (n, m) noise-free
    kss = kernel_ops.kernel_diag(params, Xs, kind)   # (m,)

    def per_output(L_j, y_j, lam_j):
        alpha = trsm_ops.cho_solve(L_j, y_j[:, None], method="xla")[:, 0]
        mu = lam_j * jnp.matmul(Ks.mT, alpha[:, None], precision=_HI)[:, 0]
        v = trsm_ops.solve_lx(L_j, Ks)  # (n, m)
        var = lam_j * kss - lam_j**2 * jnp.sum(v * v, axis=0)
        return mu, jnp.maximum(var, 0.0)

    mus, vars_ = jax.vmap(per_output)(Ls, Yr.T, lam)  # (p, m) each
    mean = jnp.matmul(mus.T, V.mT, precision=_HI)     # (m, p)
    sn2 = jnp.exp(params["log_noise_var"])
    if full_output_cov:
        # Sigma(x) = V diag(var'(x)) V^T, (m, p, p)
        cov = jnp.einsum("ab,mb,cb->mac", V, vars_.T, V, precision=_HI)
        if include_noise:
            cov = cov + sn2 * jnp.eye(V.shape[0])[None]
        return mean, cov
    var = jnp.einsum("ab,mb->ma", V**2, vars_.T, precision=_HI)
    if include_noise:
        var = var + sn2
    return mean, var


def fit(init_params, X, Y, *, kind="rbf", jitter=1e-6, method="auto",
        steps=200, learning_rate=0.05):
    """MAP fit of kernel + coregionalization params (jitted lax.scan Adam).

    lmc_A / lmc_raw_d ride the same flat param pytree as the kernel
    hyperparameters; map_opt's box clamp only touches the known log-space
    keys, so the coregionalization factors are unconstrained (B stays SPD
    by construction).
    """
    import optax

    from cugp_tpu.inference import map_opt

    tx = optax.apply_if_finite(optax.adam(learning_rate), 100)

    @jax.jit
    def run(params, X, Y):
        state = tx.init(params)

        def step(carry, _):
            p, s = carry
            val, g = jax.value_and_grad(
                lambda p: -log_marginal_likelihood_lmc(
                    p, X, Y, kind=kind, jitter=jitter, method=method))(p)
            updates, s = tx.update(g, s, p)
            p = map_opt._clamp(optax.apply_updates(p, updates))
            return (p, s), val

        (params, _), losses = jax.lax.scan(step, (params, state), None,
                                           length=steps)
        return params, losses

    params, losses = run(init_params, X, Y)
    return params, {"loss": losses, "lml": -losses[-1]}


# ---- True LMC: sum_q B_q (x) K_q with DISTINCT latent kernels --------
# (round-3 VERDICT next #10). The ICM model above shares ONE kernel
# across outputs, so its single-eigh rotation trick applies; with
# distinct per-latent kernels (e.g. one periodic + one RBF latent
# process) no common rotation diagonalizes every term, and exact
# inference factors the joint pn x pn covariance directly. For the
# small output counts LMC is used with (p = 2..8), pn stays within the
# dense Cholesky tier, and the blocked MXU factorization is the right
# tool. Rank-1 coregionalization per latent (B_q = a_q a_q^T, the
# semiparametric-latent-factor form); latent kernels carry UNIT
# amplitude — a_q holds the scale, killing the amplitude redundancy.


def init_lmcq_params(d, p, kinds, lengthscale=1.0, noise_var=0.1, seed=0):
    """Params for the rank-Q LMC: one unit-amplitude kernel param dict
    per latent (kinds[q] sets its family) + mixing vectors a_q.

    Returns {"log_noise_var", "lmc_a": (Q, p), "latents": [fp_q, ...]}
    where each fp_q has log_lengthscale (+ family extras), NO
    log_signal_var / log_noise_var.
    """
    latents = []
    for q, kind in enumerate(kinds):
        fp = kernel_ops.default_init(kind, d=d, lengthscale=lengthscale)
        fp.pop("log_signal_var", None)
        fp.pop("log_noise_var", None)
        latents.append(fp)
    key = jax.random.key(seed)
    # distinct non-degenerate init so latents specialize during fitting
    a0 = 1.0 + 0.3 * jax.random.normal(key, (len(kinds), p), jnp.float32)
    return {
        "log_noise_var": jnp.asarray(math.log(noise_var), jnp.float32),
        "lmc_a": a0,
        "latents": latents,
    }


def _latent_unit_params(fp):
    out = dict(fp)
    out["log_signal_var"] = jnp.zeros((), jnp.float32)
    return out


def lmcq_covariance(params, X1, X2, kinds):
    """(p*n1, p*n2) joint cross-covariance sum_q (a_q a_q^T) (x) K_q,
    output-major vec layout (row a*n1 + i <-> output a, input i).
    Each latent's n1 x n2 tile rides the MXU builders once; the p x p
    mixing expands it by einsum — no pn x pn intermediate per latent.
    """
    n1, n2 = X1.shape[0], X2.shape[0]
    p = params["lmc_a"].shape[1]
    Ks = [kernel_ops.cross_covariance(
        _latent_unit_params(fp), X1, X2, kind=kind, method="xla")
        for fp, kind in zip(params["latents"], kinds)]
    Kq = jnp.stack(Ks)                       # (Q, n1, n2)
    A = params["lmc_a"]                      # (Q, p)
    S = jnp.einsum("qa,qb,qij->aibj", A, A, Kq, precision=_HI)
    return S.reshape(p * n1, p * n2)


def _lmcq_chol(params, X, kinds, jitter):
    n = X.shape[0]
    p = params["lmc_a"].shape[1]
    S = lmcq_covariance(params, X, X, kinds)
    sn2 = jnp.exp(params["log_noise_var"])
    # jitter scales with the total prior variance (sum_q a_qa^2)
    scale = jnp.max(jnp.sum(params["lmc_a"] ** 2, axis=0))
    S = S + (sn2 + jitter * scale) * jnp.eye(p * n, dtype=S.dtype)
    return chol_ops.cholesky(S, method="xla")


@partial(jax.jit, static_argnames=("kinds", "jitter"))
def log_marginal_likelihood_lmcq(params, X, Y, kinds, jitter=1e-6):
    """Exact LML of the rank-Q LMC: log N(vec(Y^T) | 0, Sigma)."""
    n, p = Y.shape
    L = _lmcq_chol(params, X, kinds, jitter)
    yv = Y.T.reshape(-1)  # output-major
    alpha = trsm_ops.cho_solve(L, yv[:, None], method="xla")[:, 0]
    return (-0.5 * jnp.dot(yv, alpha)
            - jnp.sum(jnp.log(jnp.diagonal(L)))
            - 0.5 * n * p * LOG2PI)


@partial(jax.jit, static_argnames=("kinds", "jitter", "include_noise"))
def posterior_lmcq(params, X, Y, Xs, kinds, jitter=1e-6,
                   include_noise=False):
    """Posterior mean (m, p) and per-output variance (m, p) at Xs."""
    n, p = Y.shape
    m = Xs.shape[0]
    L = _lmcq_chol(params, X, kinds, jitter)
    yv = Y.T.reshape(-1)
    alpha = trsm_ops.cho_solve(L, yv[:, None], method="xla")[:, 0]
    Kcross = lmcq_covariance(params, X, Xs, kinds)      # (pn, pm)
    mu = (Kcross.mT @ alpha).reshape(p, m).T            # (m, p)
    # prior variance of output a at xs: sum_q a_qa^2 k_q(xs, xs)
    diags = jnp.stack([kernel_ops.kernel_diag(
        _latent_unit_params(fp), Xs, kind)
        for fp, kind in zip(params["latents"], kinds)])  # (Q, m)
    prior = jnp.einsum("qa,qm->ma", params["lmc_a"] ** 2, diags)
    v = trsm_ops.solve_lx(L, Kcross)                    # (pn, pm)
    var = prior - jnp.sum(v * v, axis=0).reshape(p, m).T
    if include_noise:
        var = var + jnp.exp(params["log_noise_var"])
    return mu, jnp.maximum(var, 0.0)


def fit_lmcq(init_params, X, Y, *, kinds, jitter=1e-6, steps=200,
             learning_rate=0.05):
    """MAP fit of the rank-Q LMC (jitted lax.scan Adam, same shape as
    fit() above; lmc_a unconstrained, log-space leaves box-clamped)."""
    import optax

    from cugp_tpu.inference import map_opt

    tx = optax.apply_if_finite(optax.adam(learning_rate), 100)

    @jax.jit
    def run(params, X, Y):
        state = tx.init(params)

        def step(carry, _):
            p_, s = carry
            val, g = jax.value_and_grad(
                lambda pp: -log_marginal_likelihood_lmcq(
                    pp, X, Y, kinds, jitter=jitter))(p_)
            updates, s = tx.update(g, s, p_)
            p_ = map_opt._clamp(optax.apply_updates(p_, updates))
            return (p_, s), val

        (params, _), losses = jax.lax.scan(step, (params, state), None,
                                           length=steps)
        return params, losses

    params, losses = run(init_params, X, Y)
    return params, {"loss": losses, "lml": -losses[-1]}


# ---- Matrix-free rank-Q LMC (round-4 VERDICT next #8) -----------------
# _lmcq_chol materializes the full pn x pn joint covariance — at p=2 the
# dense tier dies past n ~ 45k on one chip. But the joint operator
#   Sigma = sum_q (a_q a_q^T) (x) K_q + sn2 I
# has a matvec that is just Q blocked KERNEL matvecs on mixed vectors:
#   (Sigma v)[a,:] = sum_q a_q[a] * K_q (sum_b a_q[b] v[b,:]) + sn2 v[a,:]
# so CG + SLQ lift the rank-Q model to the same n the single-output
# iterative tier reaches — multi-output no longer skips the large-n
# story. Layout matches _lmcq_chol: output-major vec (row a*n + i).


def make_lmcq_matvec(params, X, kinds, jitter=1e-6, block=4096):
    """v (pn,) or (pn, r) -> Sigma v without forming Sigma.

    Each latent contributes one blocked kernel matvec
    (inference.iterative.make_matvec on the unit-amplitude latent params
    with the noise channel zeroed); the p x p mixing is two einsums.
    """
    from cugp_tpu.inference import iterative

    A = params["lmc_a"]                     # (Q, p)
    Q, p = A.shape
    n = X.shape[0]
    sn2 = jnp.exp(params["log_noise_var"])
    scale = jnp.max(jnp.sum(A ** 2, axis=0))
    diag_add = sn2 + jitter * scale
    mvs = []
    for fp, kind in zip(params["latents"], kinds):
        lp = _latent_unit_params(fp)
        # noise-free latent operator: the -60 log-noise makes make_matvec's
        # diag_add ~ 1e-26 (exactly-zero would need a separate code path;
        # this is below fp32 resolution of any covariance entry)
        lp["log_noise_var"] = jnp.asarray(-60.0, jnp.float32)
        mvs.append(iterative.make_matvec(lp, X, kind=kind, jitter=0.0,
                                         block=block, method="xla"))

    def matvec(v):
        vec = v.ndim == 1
        v2 = v[:, None] if vec else v               # (pn, r)
        r = v2.shape[1]
        V = v2.reshape(p, n, r)
        out = diag_add * V
        for q in range(Q):
            w = jnp.einsum("a,anr->nr", A[q], V, precision=_HI)
            u = mvs[q](w)                           # (n, r)
            out = out + A[q][:, None, None] * u[None, :, :]
        out = out.reshape(p * n, r)
        return out[:, 0] if vec else out

    return matvec


@partial(jax.jit, static_argnames=("kinds", "jitter", "block", "tol",
                                   "max_iters", "num_probes", "num_steps"))
def log_marginal_likelihood_lmcq_iterative(
        params, X, Y, kinds, key=None, jitter=1e-6, block=4096, tol=1e-5,
        max_iters=1000, num_probes=16, num_steps=32):
    """Matrix-free LML of the rank-Q LMC: CG on the joint operator for
    the quadratic term + SLQ for the logdet — Sigma (pn x pn) never
    formed. Matches log_marginal_likelihood_lmcq (dense) at small n to
    SLQ MC error; the path above the dense pn ceiling."""
    from cugp_tpu.inference import iterative

    if key is None:
        key = jax.random.key(0)
    n, p = Y.shape
    mv = make_lmcq_matvec(params, X, kinds, jitter=jitter, block=block)
    yv = Y.T.reshape(-1)
    alpha, _ = iterative.cg_solve(mv, yv, tol=tol, max_iters=max_iters)
    logdet = iterative.slq_logdet(mv, p * n, key, num_probes=num_probes,
                                  num_steps=num_steps)
    return (-0.5 * jnp.dot(yv, alpha) - 0.5 * logdet
            - 0.5 * n * p * LOG2PI)


def posterior_lmcq_iterative(params, X, Y, Xs, kinds, jitter=1e-6,
                             block=4096, tol=1e-6, max_iters=1000,
                             include_noise=False, col_batch=256,
                             segment_iters=0, verbose=False):
    """Matrix-free posterior of the rank-Q LMC — mean (m, p) and
    per-output variance (m, p), Sigma never formed.

    Test points stream in `col_batch` chunks; per chunk the p*mc cross
    columns C[(a,i),(b,s)] = sum_q a_q[a] a_q[b] K_q[i, s] are assembled
    from Q (n, mc) latent tiles and solved with batched CG on the joint
    operator. segment_iters > 0 bounds CG iterations per device program
    (the cg_segment schedule on the lmcq operator) for the tunneled
    chip's envelope. Matches posterior_lmcq (dense) at small n.
    """
    import numpy as np

    from cugp_tpu.inference import iterative

    A = params["lmc_a"]
    Q, p = A.shape
    n = X.shape[0]
    m = Xs.shape[0]
    mv = make_lmcq_matvec(params, X, kinds, jitter=jitter, block=block)
    yv = Y.T.reshape(-1)
    if segment_iters:
        alpha, _it, _rel = _lmcq_cg_segmented(
            params, X, yv[:, None], kinds, jitter=jitter, block=block,
            tol=tol, iters_per_program=segment_iters, max_iters=max_iters,
            verbose=verbose)
        alpha = alpha[:, 0]
    else:
        alpha, _ = iterative.cg_solve(mv, yv, tol=tol, max_iters=max_iters)
    Va = alpha.reshape(p, n)

    # prior variance of output b at xs: sum_q a_qb^2 k_q(xs, xs)
    diags = jnp.stack([kernel_ops.kernel_diag(
        _latent_unit_params(fp), Xs, kind) * jnp.ones(m)
        for fp, kind in zip(params["latents"], kinds)])     # (Q, m)
    prior = jnp.einsum("qb,qm->mb", A ** 2, diags)          # (m, p)

    sn2 = float(np.exp(np.asarray(params["log_noise_var"])))
    mu = np.zeros((m, p), np.float32)
    qvar = np.zeros((m, p), np.float32)
    for j0 in range(0, m, col_batch):
        Xs_c = Xs[j0:j0 + col_batch]
        mc = Xs_c.shape[0]
        Kq_c = jnp.stack([kernel_ops.cross_covariance(
            _latent_unit_params(fp), X, Xs_c, kind=kind, method="xla")
            for fp, kind in zip(params["latents"], kinds)])  # (Q, n, mc)
        # mean: mu[b,s] = sum_q a_qb (K_q(X,Xs)^T (a_q . alpha))[s]
        wq = jnp.einsum("qa,an->qn", A, Va, precision=_HI)   # (Q, n)
        tq = jnp.einsum("qnm,qn->qm", Kq_c, wq, precision=_HI)
        mu[j0:j0 + mc] = np.asarray(
            jnp.einsum("qb,qm->mb", A, tq, precision=_HI))
        # cross columns C (pn, p*mc), output-major on both sides
        C = jnp.einsum("qa,qb,qnm->anbm", A, A, Kq_c,
                       precision=_HI).reshape(p * n, p * mc)
        if segment_iters:
            it_pp = max(1, (segment_iters * 16) // max(16, p * mc))
            W, _it, _rel = _lmcq_cg_segmented(
                params, X, C, kinds, jitter=jitter, block=block, tol=tol,
                iters_per_program=it_pp, max_iters=max_iters,
                verbose=verbose)
        else:
            W, _ = iterative.cg_solve(mv, C, tol=tol, max_iters=max_iters)
        qv = jnp.sum(C * W, axis=0).reshape(p, mc)           # (p, mc)
        qvar[j0:j0 + mc] = np.asarray(qv.T)
    var = np.asarray(prior) - qvar
    if include_noise:
        var = var + sn2
    return jnp.asarray(mu), jnp.asarray(np.maximum(var, 0.0))


@partial(jax.jit, static_argnames=("kinds", "jitter", "block",
                                   "num_iters"))
def _lmcq_cg_segment_program(params, X, b2, state, kinds, jitter=1e-6,
                             block=4096, num_iters=16):
    """One resumable CG segment on the lmcq joint operator."""
    from cugp_tpu.inference import iterative

    mv = make_lmcq_matvec(params, X, kinds, jitter=jitter, block=block)
    if state is None:
        state = iterative.cg_init(b2)
    return iterative.cg_segment(mv, state, num_iters)


def _lmcq_cg_segmented(params, X, b2, kinds, jitter=1e-6, block=4096,
                       tol=1e-5, iters_per_program=16, max_iters=1024,
                       verbose=False):
    """Host-segmented CG on the joint operator (cg_solve_segmented's
    schedule for the lmcq matvec): bounded per-program work at any pn."""
    import sys

    import numpy as np

    bnorms = np.maximum(np.asarray(jnp.linalg.norm(b2, axis=0)), 1e-30)
    state = None
    total = 0
    rel = np.asarray([np.inf])
    while total < max_iters:
        state = _lmcq_cg_segment_program(
            params, X, b2, state, kinds, jitter=jitter, block=block,
            num_iters=iters_per_program)
        total += iters_per_program
        rel = np.asarray(jnp.linalg.norm(state.r, axis=0)) / bnorms
        if verbose:
            print(f"#   lmcq_cg: it={total} max_rel={rel.max():.3e}",
                  file=sys.stderr, flush=True)
        if float(rel.max()) <= tol:
            break
    return state.x, total, float(rel.max())
