"""Tracing / profiling / metrics hooks.

The reference has no tracing or profiling subsystem — only verbose iteration
tables (SURVEY.md section 5.1; reference system.py:858-879).  This module is
the TPU-native replacement:

* ``trace(logdir)`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible XPlane trace (op-level timeline incl. FFT kernels
  and collectives).
* ``annotate(name)`` — ``TraceAnnotation`` scope so host-side phases (density
  opt outer steps, geometry steps) show up on the trace timeline.
* ``StepTimer`` — lightweight wall-clock metrics with device
  synchronization, for steps/sec style reporting without a full trace.
"""

import contextlib
import time

import jax

__all__ = ["trace", "annotate", "StepTimer"]


@contextlib.contextmanager
def trace(logdir, create_perfetto_link=False):
    """Profile everything in the block to ``logdir`` (TensorBoard format)."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named scope that appears on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step metrics with proper device synchronization.

    >>> timer = StepTimer()
    >>> for _ in range(10):
    ...     state = step(state)
    ...     timer.tick(state)     # blocks on the step's outputs
    >>> timer.summary()           # {'steps': 10, 'mean_s': ..., ...}
    """

    def __init__(self):
        self.times = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()
        return self

    def tick(self, *sync_on):
        if sync_on:
            jax.block_until_ready(sync_on)
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    def summary(self):
        if not self.times:
            return {"steps": 0}
        n = len(self.times)
        total = sum(self.times)
        return {
            "steps": n,
            "total_s": total,
            "mean_s": total / n,
            "min_s": min(self.times),
            "max_s": max(self.times),
            "steps_per_s": n / total if total > 0 else float("inf"),
        }
