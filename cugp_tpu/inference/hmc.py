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


class MomentState(NamedTuple):
    """Raw-moment accumulator for diagonal mass estimation.

    Raw sums (not Welford) so that cross-chip reduction is a plain psum:
    every chip accumulates its local chains' sums and the variance is read
    from the psum-ed totals (BASELINE.json:5, psum-reduced adaptation).
    """

    count: jnp.ndarray
    s1: jnp.ndarray
    s2: jnp.ndarray


def moments_init(dim):
    return MomentState(jnp.zeros(()), jnp.zeros(dim), jnp.zeros(dim))


def moments_update(state, xs, psum_axis=None):
    """Accumulate a (n_chains, dim) batch of positions."""
    b = jnp.asarray(xs.shape[0], xs.dtype)
    s1 = jnp.sum(xs, axis=0)
    s2 = jnp.sum(xs * xs, axis=0)
    if psum_axis is not None:
        b = jax.lax.psum(b, psum_axis)
        s1 = jax.lax.psum(s1, psum_axis)
        s2 = jax.lax.psum(s2, psum_axis)
    return MomentState(state.count + b, state.s1 + s1, state.s2 + s2)


def moments_variance(state, regularize=True):
    n = jnp.maximum(state.count, 2.0)
    mean = state.s1 / n
    var = jnp.maximum(state.s2 / n - mean * mean, 1e-10) * (n / (n - 1.0))
    if regularize:
        # Stan-style shrinkage towards unit scale
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


def warmup_adapt(state0, keys3, kernel, num_warmup, eps0, target_accept,
                 psum_axis=None):
    """3-phase Stan-style warmup. Returns (state, eps, inv_mass).

    keys3: tuple of three PRNG keys, one per phase.

    Phases (Stan-style windowing):
      I   (25% of warmup): dual-averaging eps under identity mass
      II  (50%): eps continues; position moments accumulated for the mass
      III (25%): mass fixed from phase II; eps RE-adapted under the new
          metric (a step size tuned for the old metric is wrong for the new
          one — this is why single-pass adaptation overshoots acceptance)
    Cross-chip: all chain statistics go through pmean/psum over psum_axis.
    """
    n_chains, dim = state0.q.shape

    def chain_mean(x):
        m = jnp.mean(x, axis=0)
        if psum_axis is not None:
            m = jax.lax.pmean(m, psum_axis)
        return m

    def warmup_phase(state, da, key, steps, inv_mass, collect):
        def step(carry, key):
            state, da, mom = carry
            eps = jnp.exp(da.log_eps)
            keys = jax.random.split(key, n_chains)
            state, aprobs, _ = kernel(state, keys, eps, inv_mass)
            da = da_update(da, chain_mean(aprobs), target=target_accept)
            if collect:
                mom = moments_update(mom, state.q, psum_axis)
            return (state, da, mom), None

        (state, da, mom), _ = jax.lax.scan(
            step, (state, da, moments_init(dim)),
            jax.random.split(key, steps))
        return state, da, mom

    w1 = max(num_warmup // 4, 1)
    w3 = max(num_warmup // 4, 1)
    w2 = max(num_warmup - w1 - w3, 1)
    k1, k2, k3 = keys3
    ones = jnp.ones(dim)

    state, da, _ = warmup_phase(state0, da_init(jnp.asarray(eps0)), k1, w1,
                                ones, collect=False)
    state, da, mom = warmup_phase(state, da, k2, w2, ones, collect=True)
    inv_mass = moments_variance(mom)
    # re-init dual averaging around the current step size, new metric
    eps_mid = jnp.exp(da.log_eps_avg)
    state, da, _ = warmup_phase(state, da_init(eps_mid), k3, w3, inv_mass,
                                collect=False)
    eps = jnp.exp(da.log_eps_avg)
    return state, eps, inv_mass


def retune_eps(state, key, kernel, eps0, inv_mass, num_steps=16,
               target_accept=0.8, psum_axis=None):
    """Cheap eps-only re-tune under a CARRIED mass matrix.

    The carried-adaptation ladder (bench_hmc --share_adapt) reuses one
    batch's pooled (eps, inv_mass) for every later batch; round 4
    measured the generalized accept at 0.686 vs the 0.8 target (VERDICT
    weak #7). The mass matrix transfers well — the step size is the
    brittle half — so `num_steps` dual-averaging transitions re-center
    eps for the new batch's positions while keeping inv_mass. Cost:
    num_steps extra transitions per batch (~num_steps/num_draws
    overhead). Returns (state, eps).
    """
    n_chains = state.q.shape[0]

    def chain_mean(x):
        m = jnp.mean(x, axis=0)
        if psum_axis is not None:
            m = jax.lax.pmean(m, psum_axis)
        return m

    def step(carry, key):
        state, da = carry
        eps = jnp.exp(da.log_eps)
        keys = jax.random.split(key, n_chains)
        state, aprobs, _ = kernel(state, keys, eps, inv_mass)
        da = da_update(da, chain_mean(aprobs), target=target_accept)
        return (state, da), None

    (state, da), _ = jax.lax.scan(
        step, (state, da_init(jnp.asarray(eps0))),
        jax.random.split(key, num_steps))
    return state, jnp.exp(da.log_eps_avg)


def sample_segment(state, key, kernel, eps, inv_mass, num_draws):
    """num_draws post-warmup transitions; returns (state, qs, aprobs, aux).

    The unit of the checkpoint/resume driver (sampling.py): fixed eps and
    inv_mass, so segments compose exactly — running two segments of K is
    the same Markov chain as one of 2K given the same key sequence.
    """
    n_chains = state.q.shape[0]

    def sample_step(state, key):
        keys = jax.random.split(key, n_chains)
        state, aprobs, aux = kernel(state, keys, eps, inv_mass)
        return state, (state.q, aprobs, aux)

    state, (qs, aprobs, aux) = jax.lax.scan(
        sample_step, state, jax.random.split(key, num_draws))
    return state, qs, aprobs, aux


def adaptive_run(state0, key, kernel, num_warmup, num_samples, eps0,
                 target_accept, psum_axis=None):
    """Shared 3-phase adaptive driver for vmapped-chain HMC/NUTS.

    kernel(state, keys, eps, inv_mass) -> (state, accept_probs, aux) where
    state/aux carry a leading chain axis and accept_probs is (n_chains,).
    warmup_adapt does the adaptation; sample_segment draws.
    """
    key, k1, k2, k3, k4 = jax.random.split(key, 5)
    state, eps, inv_mass = warmup_adapt(state0, (k1, k2, k3), kernel,
                                        num_warmup, eps0, target_accept,
                                        psum_axis)
    state, qs, aprobs, aux = sample_segment(state, k4, kernel, eps, inv_mass,
                                            num_samples)
    return {
        "samples_flat": qs,  # (num_samples, n_chains, dim)
        "accept_rate": jnp.mean(aprobs),
        "eps": eps,
        "inv_mass": inv_mass,
        "aux": aux,
        "final_state": state,
    }


def blocked_chains(fn, chain_block):
    """Lift per-chain fn(state_i, key_i) to (C,) chains: lax.map over
    blocks of `chain_block` vmapped chains.

    The spec'd config-3 layout is ONE program carrying 256 chains
    (BASELINE.json:9); a 256-wide vmap of Cholesky-grad scans crashes the
    tunneled TPU worker (round-1/2 finding; round-3 bisection in PERF.md
    refines it — the ceiling is ~4-5k chain-transitions per program, and
    this blocking lifts the proven single-program envelope from 32 to 96
    chains on the real chip), so this executes the same 256
    chains as a sequential lax.map over 256/chain_block blocks INSIDE one
    jitted program — one compile, one program, all chains' statistics
    available to shared adaptation (warmup_adapt pools the full (C,)
    acceptance/moment vectors regardless of blocking). chain_block=0
    means plain full-width vmap. A single transition matches the
    full-width vmap to fp tolerance; over many steps the layouts may
    diverge bitwise (XLA reassociates reductions differently and HMC is
    chaotic) while remaining draws from the identical Markov kernel.

    Non-divisible chain counts are handled by padding the last block
    with copies of chain 0 (their outputs are sliced off before
    returning, so no padded chain ever reaches adaptation statistics).
    """
    def run(state, keys):
        C = keys.shape[0]
        if not chain_block or C <= chain_block:
            return jax.vmap(fn)(state, keys)
        pad = (-C) % chain_block
        if pad:
            def padc(x):
                return jnp.concatenate(
                    [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])], 0)

            state = jax.tree.map(padc, state)
            keys = padc(keys)
        nb = (C + pad) // chain_block

        def resh(x):
            return x.reshape((nb, chain_block) + x.shape[1:])

        def unresh(x):
            return x.reshape((C + pad,) + x.shape[2:])[:C]

        out = jax.lax.map(
            lambda args: jax.vmap(fn)(*args),
            (jax.tree.map(resh, state), resh(keys)))
        return jax.tree.map(unresh, out)

    return run


def make_hmc_kernel(logprob_and_grad, n_leapfrog=32, chain_block=0):
    """Vmapped-chain HMC transition kernel for adaptive_run/sample_segment.

    chain_block > 0: chains execute as lax.map over chain_block-wide
    vmapped blocks inside the same program (see blocked_chains).
    """

    def kernel(state, keys, eps, inv_mass):
        run = blocked_chains(
            lambda s, k: hmc_kernel(s, k, eps, inv_mass, logprob_and_grad,
                                    n_leapfrog), chain_block)
        state, aprobs = run(state, keys)
        return state, aprobs, aprobs

    return kernel


@partial(jax.jit, static_argnames=("logprob_and_grad", "n_leapfrog",
                                   "num_warmup", "num_samples", "psum_axis",
                                   "chain_block"))
def run_hmc(q0, key, logprob_and_grad, n_leapfrog=32, num_warmup=256,
            num_samples=512, eps0=0.1, target_accept=0.8, psum_axis=None,
            chain_block=0):
    """Vmapped-chain HMC with shared step-size/mass adaptation.

    q0: (n_chains, dim) initial positions. Returns dict with samples
    (num_samples, n_chains, dim), accept_rate, eps, inv_mass.

    psum_axis: optional mapped axis name — when run under shard_map, chain
    statistics (mean acceptance, mass moments) are all-reduced over it so
    adaptation is identical across chips (BASELINE.json:5).
    chain_block: >0 executes chains as lax.map over chain_block-wide
    vmapped blocks inside this one program (blocked_chains) — the spec'd
    single-program 256-chain layout without a 256-wide vmap; adaptation
    pools ALL chains either way.
    """
    logp0, grad0 = blocked_chains(
        lambda q, _k: logprob_and_grad(q), chain_block)(
            q0, jax.random.split(jax.random.key(0), q0.shape[0]))
    state0 = HMCState(q0, logp0, grad0)
    kernel = make_hmc_kernel(logprob_and_grad, n_leapfrog, chain_block)
    out = adaptive_run(state0, key, kernel, num_warmup, num_samples, eps0,
                       target_accept, psum_axis)
    out.pop("aux")
    out.pop("final_state")
    return out
