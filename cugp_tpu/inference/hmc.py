"""Hamiltonian Monte Carlo over kernel hyperparameters — component C8.

New surface relative to the reference (BASELINE.json:5, "NUTS/HMC ...
vmapped per chip ... psum collectives"; BASELINE.json:9, "256 vmapped
chains"). Design:

- The target is the hyperparameter posterior: log p(theta | X, y) =
  LML(theta) + log prior(theta); every leapfrog step pays a full
  covariance-build + Cholesky (SURVEY.md section 3.3 — this is the honest
  cost model for exact GPs).
- Chains are a leading vmap axis; everything is jittable (lax.scan over
  draws, lax.fori_loop over leapfrog steps) so the whole sampler is one XLA
  program. Under the distributed tier the chain axis is sharded over 'dp'
  and adaptation statistics are reduced with psum (parallel/gspmd.py).
- Warmup: dual-averaging step size (Nesterov/Hoffman-Gelman) shared across
  chains (mean acceptance), plus diagonal mass-matrix (Welford) adaptation.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


class DualAveragingState(NamedTuple):
    log_eps: jnp.ndarray
    log_eps_avg: jnp.ndarray
    h_avg: jnp.ndarray
    mu: jnp.ndarray
    t: jnp.ndarray


def da_init(eps0):
    return DualAveragingState(
        log_eps=jnp.log(eps0),
        log_eps_avg=jnp.log(eps0),
        h_avg=jnp.zeros(()),
        mu=jnp.log(10.0 * eps0),
        t=jnp.zeros(()),
    )


def da_update(state, accept_prob, target=0.8, gamma=0.05, t0=10.0, kappa=0.75):
    t = state.t + 1.0
    h_avg = (1.0 - 1.0 / (t + t0)) * state.h_avg + (target - accept_prob) / (t + t0)
    log_eps = state.mu - jnp.sqrt(t) / gamma * h_avg
    w = t ** (-kappa)
    log_eps_avg = w * log_eps + (1.0 - w) * state.log_eps_avg
    return DualAveragingState(log_eps, log_eps_avg, h_avg, state.mu, t)


class WelfordState(NamedTuple):
    mean: jnp.ndarray
    m2: jnp.ndarray
    count: jnp.ndarray


def welford_init(dim):
    return WelfordState(jnp.zeros(dim), jnp.zeros(dim), jnp.zeros(()))


def welford_update(state, x):
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(mean, m2, count)


def welford_variance(state, regularize=True):
    var = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    if regularize:
        # Stan-style shrinkage towards unit scale
        n = state.count
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var


def leapfrog(q, p, grad, eps, inv_mass, logprob_and_grad, n_steps):
    """n_steps of leapfrog; logprob_and_grad returns (logp, dlogp/dq)."""

    def step(carry, _):
        q, p, grad = carry
        p = p + 0.5 * eps * grad  # grad of logp (ascend)
        q = q + eps * inv_mass * p
        logp, grad = logprob_and_grad(q)
        p = p + 0.5 * eps * grad
        return (q, p, grad), logp

    (q, p, grad), logps = jax.lax.scan(step, (q, p, grad), None,
                                       length=n_steps)
    return q, p, grad, logps[-1]


def _kinetic(p, inv_mass):
    return 0.5 * jnp.sum(p * p * inv_mass)


class HMCState(NamedTuple):
    q: jnp.ndarray
    logp: jnp.ndarray
    grad: jnp.ndarray


def hmc_kernel(state, key, eps, inv_mass, logprob_and_grad, n_leapfrog):
    """One Metropolis-corrected HMC transition for a single chain."""
    key_mom, key_acc = jax.random.split(key)
    p0 = jax.random.normal(key_mom, state.q.shape) / jnp.sqrt(inv_mass)
    q1, p1, grad1, logp1 = leapfrog(state.q, p0, state.grad, eps, inv_mass,
                                    logprob_and_grad, n_leapfrog)
    h0 = -state.logp + _kinetic(p0, inv_mass)
    h1 = -logp1 + _kinetic(p1, inv_mass)
    delta = h0 - h1
    delta = jnp.where(jnp.isfinite(delta), delta, -jnp.inf)
    accept_prob = jnp.minimum(1.0, jnp.exp(delta))
    accept = jax.random.uniform(key_acc) < accept_prob
    new = HMCState(
        q=jnp.where(accept, q1, state.q),
        logp=jnp.where(accept, logp1, state.logp),
        grad=jnp.where(accept, grad1, state.grad),
    )
    return new, accept_prob


def default_log_prior(q):
    """Weak N(0, 3^2) prior on each log-hyperparameter (proper posterior)."""
    return jnp.sum(-0.5 * (q / 3.0) ** 2)


def make_logprob(lml_fn, log_prior=default_log_prior):
    """logprob_and_grad over the flat parameter vector."""

    def logprob(q):
        return lml_fn(q) + log_prior(q)

    return jax.value_and_grad(logprob)


@partial(jax.jit, static_argnames=("logprob_and_grad", "n_leapfrog",
                                   "num_warmup", "num_samples", "psum_axis"))
def run_hmc(q0, key, logprob_and_grad, n_leapfrog=32, num_warmup=256,
            num_samples=512, eps0=0.1, target_accept=0.8, psum_axis=None):
    """Vmapped-chain HMC with shared step-size/mass adaptation.

    q0: (n_chains, dim) initial positions. Returns dict with samples
    (num_samples, n_chains, dim), accept_rate, eps, inv_mass.

    psum_axis: optional mapped axis name — when run under shard_map, chain
    statistics (mean acceptance, mass moments) are all-reduced over it so
    adaptation is identical across chips (BASELINE.json:5).
    """
    n_chains, dim = q0.shape

    def chain_mean(x):
        m = jnp.mean(x, axis=0)
        if psum_axis is not None:
            m = jax.lax.pmean(m, psum_axis)
        return m

    logp0, grad0 = jax.vmap(lambda q: logprob_and_grad(q))(q0)
    state0 = HMCState(q0, logp0, grad0)

    kernel = partial(hmc_kernel, logprob_and_grad=logprob_and_grad,
                     n_leapfrog=n_leapfrog)

    # ---- warmup: dual averaging + Welford mass (second half) ----
    da0 = da_init(jnp.asarray(eps0))
    wf0 = welford_init(dim)
    inv_mass0 = jnp.ones(dim)

    def warmup_step(carry, key):
        state, da, wf, inv_mass = carry
        eps = jnp.exp(da.log_eps)
        keys = jax.random.split(key, n_chains)
        state, aprobs = jax.vmap(
            lambda s, k: kernel(s, k, eps=eps, inv_mass=inv_mass)
        )(state, keys)
        da = da_update(da, chain_mean(aprobs), target=target_accept)
        wf = welford_update(wf, chain_mean(state.q))
        return (state, da, wf, inv_mass), aprobs

    half = num_warmup // 2
    key, k1, k2, k3 = jax.random.split(key, 4)
    (state1, da1, _, _), _ = jax.lax.scan(
        warmup_step, (state0, da0, wf0, inv_mass0),
        jax.random.split(k1, half))
    # second half: adapt mass from per-chain positions
    def warmup2_step(carry, key):
        state, da, wf, inv_mass = carry
        eps = jnp.exp(da.log_eps)
        keys = jax.random.split(key, n_chains)
        state, aprobs = jax.vmap(
            lambda s, k: kernel(s, k, eps=eps, inv_mass=inv_mass)
        )(state, keys)
        da = da_update(da, chain_mean(aprobs), target=target_accept)
        # accumulate moments over chains and time
        wf = welford_update(wf, chain_mean(state.q))
        return (state, da, wf, inv_mass), aprobs

    (state2, da2, wf2, _), _ = jax.lax.scan(
        warmup2_step, (state1, da1, welford_init(dim), inv_mass0),
        jax.random.split(k2, num_warmup - half))
    inv_mass = welford_variance(wf2)
    eps = jnp.exp(da2.log_eps_avg)

    # ---- sampling ----
    def sample_step(state, key):
        keys = jax.random.split(key, n_chains)
        state, aprobs = jax.vmap(
            lambda s, k: kernel(s, k, eps=eps, inv_mass=inv_mass)
        )(state, keys)
        return state, (state.q, aprobs)

    _, (qs, aprobs) = jax.lax.scan(sample_step, state2,
                                   jax.random.split(k3, num_samples))
    return {
        "samples_flat": qs,  # (num_samples, n_chains, dim)
        "accept_rate": jnp.mean(aprobs),
        "eps": eps,
        "inv_mass": inv_mass,
    }
