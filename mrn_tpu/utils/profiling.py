"""Tracing / profiling hooks — the observability subsystem the reference
lacks (SURVEY.md §5: only ad-hoc wall-clock infer_time).

- ``trace(logdir)``: context manager around jax.profiler.trace, producing
  TensorBoard-viewable device traces.
- ``StepMeter``: steps/sec + images/sec accounting for the training hot loop.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "StepMeter"]


@contextlib.contextmanager
def trace(logdir: str = "./profile"):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0
        self._images = 0

    def tick(self, batch_size: int):
        self._steps += 1
        self._images += batch_size

    def report(self) -> str:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return (f"{self._steps / dt:0.2f} steps/s, "
                f"{self._images / dt:0.1f} imgs/s")
