"""Profiling hooks: jax.profiler traces + simple wall-clock timers.

Usage:
  with trace("/tmp/ssnt_trace"):      # view in Perfetto/TensorBoard
      run_step()
  with timer() as t: run_step()
  print(t.elapsed)
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class timer(contextlib.AbstractContextManager):
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)
