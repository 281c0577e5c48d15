"""No-U-Turn Sampler (iterative, jittable) — component C8 (SURVEY.md sec 2).

Multinomial NUTS with iterative tree building (Phan & Pradhan style): the
recursive tree of the original algorithm is replaced by a fixed-bound
``fori_loop`` over leaves with an O(max_depth) checkpoint stack for U-turn
checks, so the whole sampler lives inside jit/vmap/shard_map with static
shapes (SURVEY.md section 7, hard part 4: memory is O(depth), not
O(2^depth)).

U-turn bookkeeping: leaves are visited left-to-right within each doubling.
A balanced subtree spanning leaves [s, i] must be checked when its last leaf
i arrives. Writing each even leaf's state into stack slot ctz(leaf_index)
guarantees the start state of every such span is still resident when the
check fires (spans starting at s are nested, and the next index with the
same ctz appears only after the largest span from s has closed).

Chains vmap over the leading axis exactly as in hmc.py; step-size warmup via
dual averaging with cross-chain (and, under shard_map, cross-chip psum)
averaging of acceptance statistics (BASELINE.json:5).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cugp_tpu.inference import hmc as hmc_lib


def _ctz(i):
    """Count trailing zeros of positive int32 (popcount((i & -i) - 1))."""
    lsb = jnp.bitwise_and(i, -i)
    return jax.lax.population_count(lsb - 1)


class _TreeState(NamedTuple):
    # current integration endpoint (the "running leaf")
    q: jnp.ndarray
    p: jnp.ndarray
    grad: jnp.ndarray
    logp: jnp.ndarray
    # progressive-multinomial proposal for the new subtree
    prop_q: jnp.ndarray
    prop_logp: jnp.ndarray
    prop_grad: jnp.ndarray
    log_weight: jnp.ndarray      # logsumexp of -energy over subtree leaves
    # U-turn checkpoint stack: (max_depth+1, dim) starts of open spans
    ckpt_q: jnp.ndarray
    ckpt_p: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray      # sum of per-leaf accept probs (for DA)
    n_leaves: jnp.ndarray


def _uturn(q_minus, p_minus, q_plus, p_plus, inv_mass):
    dq = q_plus - q_minus
    return (jnp.dot(dq, inv_mass * p_minus) < 0.0) | (
        jnp.dot(dq, inv_mass * p_plus) < 0.0)


def _leapfrog_one(q, p, grad, eps, inv_mass, logprob_and_grad):
    p = p + 0.5 * eps * grad
    q = q + eps * inv_mass * p
    logp, grad = logprob_and_grad(q)
    p = p + 0.5 * eps * grad
    return q, p, grad, logp


def _build_subtree(depth, z, key, eps, direction, inv_mass, h0, *,
                   logprob_and_grad, max_depth):
    """Integrate 2^depth leaves in `direction`; progressive multinomial.

    depth may be a TRACED int (fori_loop supports dynamic bounds), so one
    subtree body serves every doubling — no lax.switch over per-depth
    variants, which keeps the HLO small (one leapfrog body total).

    z: (q, p, grad, logp) starting endpoint (already a tree endpoint; the
    first new leaf is one leapfrog step away).
    Returns a _TreeState for the subtree (endpoint, proposal, weight, flags).
    """
    q0, p0, grad0, logp0 = z
    dim = q0.shape[0]
    n_leaves = jnp.asarray(1, jnp.int32) << depth

    init = _TreeState(
        q=q0, p=p0, grad=grad0, logp=logp0,
        prop_q=q0, prop_logp=logp0, prop_grad=grad0,
        log_weight=-jnp.inf,
        ckpt_q=jnp.zeros((max_depth + 1, dim)),
        ckpt_p=jnp.zeros((max_depth + 1, dim)),
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        sum_accept=jnp.zeros(()),
        n_leaves=jnp.asarray(0, jnp.int32),
    )

    def leaf_step(i, carry):
        st, key = carry
        key, k_sel = jax.random.split(key)
        q, p, grad, logp = _leapfrog_one(
            st.q, st.p, st.grad, direction * eps, inv_mass, logprob_and_grad)
        energy = -logp + 0.5 * jnp.sum(p * p * inv_mass)
        log_w = -energy
        log_w = jnp.where(jnp.isfinite(log_w), log_w, -jnp.inf)
        diverging = (energy - h0) > 1000.0
        # per-leaf accept prob (Stan's averaged Metropolis statistic)
        accept = jnp.minimum(1.0, jnp.exp(h0 - energy))
        accept = jnp.where(jnp.isfinite(energy), accept, 0.0)

        # progressive multinomial within the subtree
        new_total = jnp.logaddexp(st.log_weight, log_w)
        take = jnp.log(jax.random.uniform(k_sel)) < (log_w - new_total)
        prop_q = jnp.where(take, q, st.prop_q)
        prop_logp = jnp.where(take, logp, st.prop_logp)
        prop_grad = jnp.where(take, grad, st.prop_grad)

        # checkpoint stack: store even leaves at slot ctz(i)
        slot = jnp.where(i == 0, max_depth, _ctz(jnp.maximum(i, 1)))
        is_start = (i % 2) == 0
        ckpt_q = jnp.where(
            is_start,
            st.ckpt_q.at[slot].set(q), st.ckpt_q)
        ckpt_p = jnp.where(
            is_start,
            st.ckpt_p.at[slot].set(p), st.ckpt_p)

        # U-turn checks for every balanced span ending at leaf i:
        # spans of size 2^m for m = 1..(trailing ones of i)
        def check_span(m, turning):
            span = jnp.asarray(1, jnp.int32) << m
            applies = ((i + 1) % span) == 0
            s = i + 1 - span
            slot_s = jnp.where(s == 0, max_depth, _ctz(jnp.maximum(s, 1)))
            qs = ckpt_q[slot_s]
            ps = ckpt_p[slot_s]
            # orientation: in direction=-1 the later leaf is the "minus" end
            t = jnp.where(
                direction > 0,
                _uturn(qs, ps, q, p, inv_mass),
                _uturn(q, p, qs, ps, inv_mass),
            )
            return turning | (applies & t)

        turning = jax.lax.fori_loop(1, max_depth + 1, check_span, st.turning)

        new_st = _TreeState(
            q=q, p=p, grad=grad, logp=logp,
            prop_q=prop_q, prop_logp=prop_logp, prop_grad=prop_grad,
            log_weight=new_total,
            ckpt_q=ckpt_q, ckpt_p=ckpt_p,
            turning=turning,
            diverging=st.diverging | diverging,
            sum_accept=st.sum_accept + accept,
            n_leaves=st.n_leaves + 1,
        )
        # freeze the state once turning/diverging (extra leaves are wasted
        # lockstep work, unavoidable under vmap)
        stop = st.turning | st.diverging
        merged = jax.tree.map(
            lambda old, new: jnp.where(stop, old, new), st, new_st)
        return (merged, key)

    (st, _), = (jax.lax.fori_loop(0, n_leaves, leaf_step, (init, key)),)
    return st


class NUTSInfo(NamedTuple):
    accept_prob: jnp.ndarray
    diverging: jnp.ndarray
    depth: jnp.ndarray
    n_leapfrog: jnp.ndarray


def nuts_kernel(state, key, eps, inv_mass, logprob_and_grad, max_depth=8):
    """One NUTS transition for a single chain (use under vmap)."""
    dim = state.q.shape[0]
    key_mom, key_dir, key_merge = jax.random.split(key, 3)
    p0 = jax.random.normal(key_mom, (dim,)) / jnp.sqrt(inv_mass)
    h0 = -state.logp + 0.5 * jnp.sum(p0 * p0 * inv_mass)

    class Carry(NamedTuple):
        q_minus: jnp.ndarray
        p_minus: jnp.ndarray
        grad_minus: jnp.ndarray
        logp_minus: jnp.ndarray
        q_plus: jnp.ndarray
        p_plus: jnp.ndarray
        grad_plus: jnp.ndarray
        logp_plus: jnp.ndarray
        prop_q: jnp.ndarray
        prop_logp: jnp.ndarray
        prop_grad: jnp.ndarray
        log_weight: jnp.ndarray
        depth: jnp.ndarray
        turning: jnp.ndarray
        diverging: jnp.ndarray
        sum_accept: jnp.ndarray
        n_leapfrog: jnp.ndarray
        key: jnp.ndarray

    c0 = Carry(
        q_minus=state.q, p_minus=p0, grad_minus=state.grad,
        logp_minus=state.logp,
        q_plus=state.q, p_plus=p0, grad_plus=state.grad,
        logp_plus=state.logp,
        prop_q=state.q, prop_logp=state.logp, prop_grad=state.grad,
        log_weight=-h0,
        depth=jnp.asarray(0, jnp.int32),
        turning=jnp.asarray(False), diverging=jnp.asarray(False),
        sum_accept=jnp.zeros(()), n_leapfrog=jnp.asarray(0, jnp.int32),
        key=key_merge,
    )

    def cond(c):
        return (c.depth < max_depth) & ~c.turning & ~c.diverging

    def body(c):
        key, k_dir, k_sub, k_merge = jax.random.split(c.key, 4)
        go_right = jax.random.uniform(k_dir) < 0.5
        direction = jnp.where(go_right, 1.0, -1.0)
        z = (
            jnp.where(go_right, c.q_plus, c.q_minus),
            jnp.where(go_right, c.p_plus, c.p_minus),
            jnp.where(go_right, c.grad_plus, c.grad_minus),
            jnp.where(go_right, c.logp_plus, c.logp_minus),
        )
        st = _build_subtree(
            jnp.minimum(c.depth, max_depth - 1), z, k_sub, eps, direction,
            inv_mass, h0, logprob_and_grad=logprob_and_grad,
            max_depth=max_depth,
        )

        # biased progressive sampling between old tree and new subtree
        accept_new = (jnp.log(jax.random.uniform(k_merge))
                      < (st.log_weight - c.log_weight))
        usable = ~(st.turning | st.diverging)
        take = accept_new & usable
        prop_q = jnp.where(take, st.prop_q, c.prop_q)
        prop_logp = jnp.where(take, st.prop_logp, c.prop_logp)
        prop_grad = jnp.where(take, st.prop_grad, c.prop_grad)
        log_weight = jnp.logaddexp(c.log_weight,
                                   jnp.where(usable, st.log_weight, -jnp.inf))

        q_minus = jnp.where(go_right, c.q_minus, st.q)
        p_minus = jnp.where(go_right, c.p_minus, st.p)
        grad_minus = jnp.where(go_right, c.grad_minus, st.grad)
        logp_minus = jnp.where(go_right, c.logp_minus, st.logp)
        q_plus = jnp.where(go_right, st.q, c.q_plus)
        p_plus = jnp.where(go_right, st.p, c.p_plus)
        grad_plus = jnp.where(go_right, st.grad, c.grad_plus)
        logp_plus = jnp.where(go_right, st.logp, c.logp_plus)

        # whole-tree U-turn check after the doubling
        turning_tree = _uturn(q_minus, p_minus, q_plus, p_plus, inv_mass)

        return Carry(
            q_minus=q_minus, p_minus=p_minus, grad_minus=grad_minus,
            logp_minus=logp_minus,
            q_plus=q_plus, p_plus=p_plus, grad_plus=grad_plus,
            logp_plus=logp_plus,
            prop_q=prop_q, prop_logp=prop_logp, prop_grad=prop_grad,
            log_weight=log_weight,
            depth=c.depth + 1,
            turning=st.turning | turning_tree,
            diverging=st.diverging,
            sum_accept=c.sum_accept + st.sum_accept,
            n_leapfrog=c.n_leapfrog + st.n_leaves,
            key=key,
        )

    c = jax.lax.while_loop(cond, body, c0)

    new_state = hmc_lib.HMCState(q=c.prop_q, logp=c.prop_logp, grad=c.prop_grad)
    accept_prob = c.sum_accept / jnp.maximum(c.n_leapfrog.astype(jnp.float32),
                                             1.0)
    info = NUTSInfo(accept_prob=accept_prob, diverging=c.diverging,
                    depth=c.depth, n_leapfrog=c.n_leapfrog)
    return new_state, info


def make_nuts_kernel(logprob_and_grad, max_depth=8, chain_block=0):
    """Vmapped-chain NUTS transition kernel for adaptive_run/sample_segment.

    chain_block > 0: chains execute as lax.map over chain_block-wide
    vmapped blocks inside the same program (hmc.blocked_chains).
    """

    def kernel(state, keys, eps, inv_mass):
        run = hmc_lib.blocked_chains(
            lambda s, k: nuts_kernel(s, k, eps, inv_mass, logprob_and_grad,
                                     max_depth), chain_block)
        state, info = run(state, keys)
        return state, info.accept_prob, (info.diverging, info.n_leapfrog)

    return kernel


@partial(jax.jit, static_argnames=("logprob_and_grad", "max_depth",
                                   "num_warmup", "num_samples", "psum_axis",
                                   "chain_block"))
def run_nuts(q0, key, logprob_and_grad, max_depth=8, num_warmup=256,
             num_samples=512, eps0=0.1, target_accept=0.8, psum_axis=None,
             chain_block=0):
    """Vmapped-chain NUTS with the shared 3-phase adaptive driver."""
    logp0, grad0 = hmc_lib.blocked_chains(
        lambda q, _k: logprob_and_grad(q), chain_block)(
            q0, jax.random.split(jax.random.key(0), q0.shape[0]))
    state0 = hmc_lib.HMCState(q0, logp0, grad0)
    kernel = make_nuts_kernel(logprob_and_grad, max_depth, chain_block)
    out = hmc_lib.adaptive_run(state0, key, kernel, num_warmup, num_samples,
                               eps0, target_accept, psum_axis)
    divs, nlf = out.pop("aux")
    out.pop("final_state")
    out["divergence_rate"] = jnp.mean(divs.astype(jnp.float32))
    out["mean_leapfrog"] = jnp.mean(nlf.astype(jnp.float32))
    return out
