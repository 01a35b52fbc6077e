"""Honest device timing through the tunneled (axon) TPU runtime.

Two measurement hazards of this runtime, established empirically:

  1. `jax.block_until_ready` does NOT reliably wait for device execution
     through the relay — loops "timed" with it report dispatch cost (~30 us)
     instead of device time. Only an actual value fetch (`float(...)`,
     `np.asarray(...)`) synchronizes.
  2. A D2H fetch costs ~30 ms round trip, orders of magnitude above most
     kernels — so the fetch must be amortized over many chained
     applications, never per-iteration.

`time_chained` therefore builds a serial dependency chain inside ONE jitted
executable (lax.scan), runs `iters` dispatches of it back-to-back, and
synchronizes ONCE by fetching a scalar derived from the final output. The
per-application time is total / (iters * chain), with the single ~30 ms
fetch amortized to noise.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def hard_sync(x) -> float:
    """Actually wait for (and fetch) a scalar derived from x.

    Unlike block_until_ready, this is a real synchronization point through
    the relay: the value cannot be produced without finishing the work.
    """
    leaves = jax.tree_util.tree_leaves(x)
    total = sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)
    return float(total)


def time_chained(
    fn: Callable,
    feedback: Callable,
    args: tuple,
    *,
    chain: int = 20,
    iters: int = 5,
    warmup: int = 2,
) -> float:
    """Per-application wall time of `fn(*args)` with serial chaining.

    `feedback(out, args) -> args` threads the output back into the next
    application's inputs (a true data dependency, so neither XLA nor the
    runtime can overlap or elide iterations). Returns seconds per single
    application of fn.
    """

    def body(c_args, _):
        out = fn(*c_args)
        return feedback(out, c_args), out

    def run(*a):
        final_args, last = jax.lax.scan(body, a, None, length=chain)
        return last

    g = jax.jit(run)
    out = g(*args)
    for _ in range(warmup):
        out = g(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    hard_sync(out)
    return (time.perf_counter() - t0) / (iters * chain)


def time_step_chained(step, state, step_args: tuple, *, iters: int = 30) -> float:
    """Per-call time of a train-step-like `step(state, *args) -> (state, ...)`.

    The state threading is the serial dependency; one hard_sync at the end.
    """
    out = step(state, *step_args)
    state = out[0]
    hard_sync(out[1] if len(out) > 1 else state)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(state, *step_args)
        state = out[0]
    hard_sync(out[1] if len(out) > 1 else state)
    return (time.perf_counter() - t0) / iters
