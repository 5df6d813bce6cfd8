"""Profiling hooks (SURVEY.md §5 tracing/profiling row).

The reference only wall-clocks with time.time() (DIP.py:55,85,161,214 etc.).
Here: ``maybe_trace`` wraps hot loops in ``jax.profiler.trace`` emitting
TensorBoard/Perfetto traces when a directory is given (CLI ``--profile_dir``),
and ``Stopwatch`` provides honest step timing on backends where
block_until_ready is unreliable (scalar-materialization fence).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None):
    if trace_dir:
        import jax

        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield


def device_fence(x) -> float:
    """Force execution of everything x depends on; returns the scalar sum."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


class Stopwatch:
    def __init__(self):
        self.t0 = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        return dt
