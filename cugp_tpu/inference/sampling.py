"""Facade over HMC/NUTS for hyperparameter posteriors (api.GP entry point).

Flattens the log-space param dict to a vector, builds the posterior
log-density (LML + prior), dispatches to hmc/nuts, and unflattens samples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from cugp_tpu.inference import hmc as hmc_lib
from cugp_tpu.inference import nuts as nuts_lib
from cugp_tpu.models import exact_gp


# The samplers take logprob_and_grad as a STATIC jit argument, so handing
# them a fresh closure per call recompiles the whole (multi-minute) sampler
# program. This bounded cache returns the SAME closure object for repeated
# calls with the same data arrays and config; entries hold strong refs to
# X/y so the id() keys stay valid while cached.
_LOGPROB_CACHE = {}
_LOGPROB_CACHE_MAX = 8


def make_flat_logprob(init_params, X, y, kind="rbf", jitter=1e-6,
                      method="auto", log_prior=hmc_lib.default_log_prior,
                      lml_fn=None):
    """Returns (logprob_and_grad over flat q, unravel, q0_flat).

    lml_fn: optional override taking the params DICT — e.g. a
    GSPMD-sharded LML (parallel.distributed_chol.distributed_lml) for the
    large-N configs where each likelihood evaluation is itself distributed.
    """
    q0, unravel = ravel_pytree(init_params)
    param_struct = jax.tree.structure(init_params)

    cache_key = (id(X), id(y), kind, jitter, method, id(log_prior),
                 id(lml_fn) if lml_fn is not None else None, param_struct,
                 tuple(jax.tree.map(lambda a: a.shape, init_params).values()
                       if isinstance(init_params, dict) else ()))
    hit = _LOGPROB_CACHE.get(cache_key)
    if hit is not None:
        lp, unrav_cached, _refs = hit
        return lp, unrav_cached, q0

    if lml_fn is None:
        def flat_lml(q):
            return exact_gp.log_marginal_likelihood(
                unravel(q), X, y, kind=kind, jitter=jitter, method=method)
    else:
        def flat_lml(q):
            return lml_fn(unravel(q))

    lp = hmc_lib.make_logprob(flat_lml, log_prior)
    if len(_LOGPROB_CACHE) >= _LOGPROB_CACHE_MAX:
        _LOGPROB_CACHE.pop(next(iter(_LOGPROB_CACHE)))
    _LOGPROB_CACHE[cache_key] = (lp, unravel, (X, y, log_prior, lml_fn))
    return lp, unravel, q0


def init_chains(q0, key, n_chains, scale=0.2):
    """Overdispersed chain initializations around q0."""
    noise = scale * jax.random.normal(key, (n_chains, q0.shape[0]))
    return q0[None, :] + noise


def sample_hyperparams(init_params, X, y, *, kind="rbf", jitter=1e-6,
                       method="auto", num_samples=512, num_chains=8,
                       num_warmup=256, sampler="nuts", key=None,
                       max_tree_depth=8, eps0=0.1, target_accept=0.8,
                       log_prior=hmc_lib.default_log_prior):
    """NUTS/HMC posterior over kernel hyperparameters.

    Returns dict with "samples": pytree of (num_samples, n_chains, ...)
    arrays in log-space, plus sampler diagnostics.
    """
    if key is None:
        key = jax.random.key(0)
    key_init, key_run = jax.random.split(key)
    logprob_and_grad, unravel, q0 = make_flat_logprob(
        init_params, X, y, kind=kind, jitter=jitter, method=method,
        log_prior=log_prior)
    qs0 = init_chains(q0, key_init, num_chains)

    if sampler == "nuts":
        out = nuts_lib.run_nuts(
            qs0, key_run, logprob_and_grad, max_depth=max_tree_depth,
            num_warmup=num_warmup, num_samples=num_samples, eps0=eps0,
            target_accept=target_accept)
    elif sampler == "hmc":
        out = hmc_lib.run_hmc(
            qs0, key_run, logprob_and_grad, n_leapfrog=32,
            num_warmup=num_warmup, num_samples=num_samples, eps0=eps0,
            target_accept=target_accept)
    else:
        raise ValueError(f"unknown sampler: {sampler}")

    flat = out.pop("samples_flat")  # (S, C, dim)
    samples = jax.vmap(jax.vmap(unravel))(flat)
    out["samples"] = samples
    return out


def potential_scale_reduction(x):
    """Split-R-hat over (num_samples, n_chains) scalar draws."""
    x = jnp.asarray(x)
    s, c = x.shape
    half = s // 2
    x = jnp.concatenate([x[:half], x[half:2 * half]], axis=1)  # (half, 2c)
    n, m = x.shape
    chain_means = x.mean(axis=0)
    chain_vars = x.var(axis=0, ddof=1)
    w = chain_vars.mean()
    b = n * chain_means.var(ddof=1)
    var_est = (n - 1) / n * w + b / n
    return jnp.sqrt(var_est / w)


def effective_sample_size(x, max_lag=100):
    """Crude ESS via initial positive-sequence autocorrelation sum."""
    x = jnp.asarray(x)
    s, c = x.shape
    xc = x - x.mean(axis=0, keepdims=True)
    var = jnp.mean(xc * xc, axis=0) + 1e-12

    def rho(lag):
        return jnp.mean(xc[:-lag] * xc[lag:], axis=0) / var

    lags = [rho(l) for l in range(1, min(max_lag, s - 1))]
    rhos = jnp.stack(lags)  # (L, c)
    # truncate at first negative autocorrelation (per chain)
    pos = jnp.cumprod(rhos > 0, axis=0).astype(rhos.dtype)
    tau = 1.0 + 2.0 * jnp.sum(rhos * pos, axis=0)
    return jnp.sum(s / jnp.maximum(tau, 1.0))
