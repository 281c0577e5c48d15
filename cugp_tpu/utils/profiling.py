"""Tracing/profiling helpers (SURVEY.md section 5, aux subsystems).

The reference prints CUDA-event wall-clock timings from its driver; the
TPU-native equivalents here: xprof trace capture (jax.profiler), compiled
cost analysis per op, and a small wall-clock timer with FLOP models for the
benchmark harness (BASELINE.json:2 metric definitions).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def xprof_trace(logdir):
    """Capture an xprof trace of the enclosed block (view with tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *args):
    """XLA's own FLOP/byte estimates for jit(fn)(*args)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0]
    return costs


def _fetch_barrier(out):
    """Force device completion by fetching one scalar per output leaf.

    On the axon (tunneled TPU) backend ``block_until_ready`` returns before
    execution finishes; only a host fetch is a true barrier. Fetching a
    single element keeps the transfer negligible.
    """
    for leaf in jax.tree.leaves(out):
        arr = leaf
        while getattr(arr, "ndim", 0) > 0:
            arr = arr[(0,) * arr.ndim]
            break
        float(jax.device_get(arr.ravel()[0] if getattr(arr, "ndim", 0) else arr))


def rtt_overhead(iters=5):
    """Measured per-call dispatch+fetch round-trip latency (seconds)."""
    x = jnp.zeros(())
    f = jax.jit(lambda x: x + 1.0)
    _fetch_barrier(f(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        _fetch_barrier(f(x))
    return (time.perf_counter() - t0) / iters


def timed_loop(step_fn, init, iters=8, warmup=True):
    """Per-iteration seconds of step_fn chained on-device iters times.

    Removes the ~30ms tunnel RTT from measurements of sub-RTT ops: the loop
    runs inside one jit (lax.scan with a data dependency through the carry)
    and only the final carry is fetched. step_fn must return something of
    the same structure as its input.
    """

    @jax.jit
    def run(x):
        def body(c, _):
            return step_fn(c), None

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c

    if warmup:
        _fetch_barrier(run(init))
    t0 = time.perf_counter()
    _fetch_barrier(run(init))
    total = time.perf_counter() - t0
    return max(total - rtt_overhead(iters=2), 1e-9) / iters


def timed(fn, *args, warmup=1, iters=5):
    """Median wall-clock seconds of fn(*args), fetch-barrier synced."""
    for _ in range(warmup):
        _fetch_barrier(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _fetch_barrier(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]



# FLOP models (BASELINE.md): the accounting used by every benchmark
def chol_flops(n):
    return n**3 / 3.0


def cov_flops(n1, n2, d):
    return 2.0 * n1 * n2 * d


def trsm_flops(n, n_rhs):
    return float(n) * n * n_rhs


def gflops(flops, seconds):
    return flops / seconds / 1e9
