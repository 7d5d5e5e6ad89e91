"""Trustworthy device timing on hostile transports.

Methodology (derived empirically; see PERF_NOTES.md): each program execution
carries a large fixed RPC/IO cost, per-dispatch wall-clock is meaningless,
and ``block_until_ready`` has proven unreliable as a completion fence on the
tunneled backend. So:

* iterate **on device** inside one jitted ``fori_loop`` whose carry is the
  previous iteration's *normalised output* — full-rank, full-magnitude
  feedback that XLA cannot strength-reduce, round away in bf16, or pipeline
  across iterations;
* fence completion with a **scalar value fetch** (the only operation that
  provably waits);
* measure at **two iteration counts** and difference, cancelling the fixed
  per-execution cost exactly.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable


def make_loop(step_fn: Callable, normalize: bool = True):
    """Wrap ``step_fn(operand, carry) -> carry`` into a jitted two-point
    measurable loop ``loop(operand, init, inner)``."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(2,))
    def loop(operand, init, inner):
        def body(_, carry):
            out = step_fn(operand, carry)
            if normalize:
                out = out * (
                    1.0 / jnp.maximum(jnp.max(jnp.abs(out)), 1e-30)
                )
            return out
        return jax.lax.fori_loop(0, inner, body, init)

    return loop


def fence(out) -> float:
    """Completion fence: fetch one scalar derived from the result."""
    import jax.numpy as jnp

    flat = jnp.ravel(out[0] if isinstance(out, (tuple, list)) else out)
    return float(flat[:1].sum())


def measure_loop(loop, operand, init, *, i1: int = 500, i2: int = 4500,
                 reps: int = 2) -> float:
    """Seconds per iteration of ``loop(operand, init, inner)`` via two-point
    differencing with fetch fencing. Compiles/warms both variants first."""
    fence(loop(operand, init, i1))
    fence(loop(operand, init, i2))
    t = {}
    for inner in (i1, i2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fence(loop(operand, init, inner))
            best = min(best, time.perf_counter() - t0)
        t[inner] = best
    return max(t[i2] - t[i1], 1e-12) / (i2 - i1)
