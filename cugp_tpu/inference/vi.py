"""Variational inference over kernel hyperparameters — component C11.

New surface relative to the reference (BASELINE.json:5, "plus NUTS/HMC and
VI over kernel hyperparameters"). Gaussian q(theta) in log-space — mean-field
or full-rank (Cholesky-parameterized) — trained by maximizing the
reparameterized ELBO with a jitted ``lax.scan`` Adam loop:

  ELBO = E_q[ LML(theta) + log prior(theta) ] + H[q].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from cugp_tpu.inference import hmc as hmc_lib
from cugp_tpu.models import exact_gp


def _entropy_meanfield(log_scale):
    d = log_scale.shape[0]
    return jnp.sum(log_scale) + 0.5 * d * (1.0 + jnp.log(2.0 * jnp.pi))


def _entropy_fullrank(chol_flat, dim):
    # chol_flat holds the lower triangle; diagonal stored as log
    diag = chol_flat[:dim]
    return jnp.sum(diag) + 0.5 * dim * (1.0 + jnp.log(2.0 * jnp.pi))


def _sample_meanfield(vp, key, num_mc, dim):
    eps = jax.random.normal(key, (num_mc, dim))
    return vp["mean"][None, :] + jnp.exp(vp["log_scale"])[None, :] * eps


def _sample_fullrank(vp, key, num_mc, dim):
    eps = jax.random.normal(key, (num_mc, dim))
    L = _chol_from_flat(vp["chol"], dim)
    return vp["mean"][None, :] + eps @ L.T


def _chol_from_flat(flat, dim):
    """Lower-triangular factor: log-diag in flat[:dim], strict rows after."""
    L = jnp.zeros((dim, dim))
    idx = jnp.tril_indices(dim, k=-1)
    L = L.at[idx].set(flat[dim:])
    L = L + jnp.diag(jnp.exp(flat[:dim]))
    return L


@partial(jax.jit, static_argnames=("logprob", "steps", "num_mc", "rank",
                                   "learning_rate", "dim"))
def _fit_scan(vp0, key, logprob, steps, num_mc, rank, learning_rate, dim):
    tx = optax.apply_if_finite(optax.adam(learning_rate), 1000)
    opt_state = tx.init(vp0)

    sample = _sample_meanfield if rank == "meanfield" else _sample_fullrank
    entropy = ((lambda vp: _entropy_meanfield(vp["log_scale"]))
               if rank == "meanfield"
               else (lambda vp: _entropy_fullrank(vp["chol"], dim)))

    def neg_elbo(vp, key):
        qs = sample(vp, key, num_mc, dim)
        lps = jax.vmap(logprob)(qs)
        return -(jnp.mean(lps) + entropy(vp))

    def step(carry, key):
        vp, s = carry
        loss, grads = jax.value_and_grad(neg_elbo)(vp, key)
        updates, s = tx.update(grads, s, vp)
        vp = optax.apply_updates(vp, updates)
        return (vp, s), -loss

    (vp, _), elbos = jax.lax.scan(step, (vp0, opt_state),
                                  jax.random.split(key, steps))
    return vp, elbos


def fit(init_params, X, y, *, kind="rbf", jitter=1e-6, method="auto",
        steps=2000, learning_rate=0.01, rank="meanfield", num_mc=8,
        key=None, log_prior=hmc_lib.default_log_prior):
    """Fit q(theta). Returns dict with mean/scale pytrees, elbo trace, and a
    sampler ``draw(key, n)`` for posterior draws in param-dict space."""
    if key is None:
        key = jax.random.key(0)
    q0, unravel = ravel_pytree(init_params)
    dim = q0.shape[0]

    def logprob(q):
        lml = exact_gp.log_marginal_likelihood(
            unravel(q), X, y, kind=kind, jitter=jitter, method=method)
        return lml + log_prior(q)

    if rank == "meanfield":
        vp0 = {"mean": q0, "log_scale": jnp.full((dim,), -2.0)}
    elif rank == "fullrank":
        flat0 = jnp.concatenate([
            jnp.full((dim,), -2.0),                       # log-diag
            jnp.zeros((dim * (dim - 1) // 2,)),           # strict lower
        ])
        vp0 = {"mean": q0, "chol": flat0}
    else:
        raise ValueError(f"unknown rank: {rank}")

    vp, elbos = _fit_scan(vp0, key, logprob, steps, num_mc, rank,
                          learning_rate, dim)

    def draw(key, n=1):
        sample = _sample_meanfield if rank == "meanfield" else _sample_fullrank
        qs = sample(vp, key, n, dim)
        return jax.vmap(unravel)(qs)

    out = {
        "vp": vp,
        "elbo": elbos,
        "mean": unravel(vp["mean"]),
        "draw": draw,
        "unravel": unravel,
    }
    if rank == "meanfield":
        out["scale"] = unravel(jnp.exp(vp["log_scale"]))
    else:
        out["chol"] = _chol_from_flat(vp["chol"], dim)
    return out
