"""Accurate device timing.

Under remote-tunneled TPU backends, jax.block_until_ready can return before
device execution completes, so naive dispatch timing reads ~0. The reliable
pattern: chain `iters` shape-preserving steps inside ONE jitted lax.scan
(true data dependencies force sequential execution) and fetch a scalar
reduction to the host — the wall time then brackets real device time.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def time_chained(step_fn: Callable, x0, iters: int = 10, repeats: int = 2,
                 args: tuple = ()) -> float:
    """Seconds per iteration of shape-preserving step_fn (device time).

    Loop-invariant operands (e.g. a large weight pytree) must go in `args`,
    NOT a Python closure: closed-over arrays are baked as XLA constants and
    multi-GB random literals blow compile time past 30 min. `args` entries
    are passed to step_fn after the carry and traced as runtime arguments.
    """

    @jax.jit
    def run(x, *a):
        def body(carry, _):
            return step_fn(carry, *a), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(
            jax.tree_util.tree_reduce(
                lambda acc, b: acc + jnp.sum(b.astype(jnp.float32)),
                out, jnp.float32(0)))

    float(run(x0, *args))  # compile + first run
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        v = float(run(x0, *args))
        best = min(best, time.perf_counter() - t0)
    assert v == v, "timed computation produced NaN"
    return best / iters


def time_once(fn: Callable, *args, repeats: int = 3) -> float:
    """Seconds for one execution of jitted fn(*args) (scalar-reduced)."""

    @jax.jit
    def run(*a):
        out = fn(*a)
        return jax.tree_util.tree_reduce(
            lambda acc, b: acc + jnp.sum(b.astype(jnp.float32)),
            out, jnp.float32(0))

    float(run(*args))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best
