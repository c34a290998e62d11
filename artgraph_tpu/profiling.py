"""Tracing / profiling utilities (SURVEY.md §5: the reference has none —
visibility there is tqdm bars + prints; this is the TPU-native replacement
proving the throughput targets).

  * `trace(logdir)` — context manager around jax.profiler.trace; view with
    TensorBoard or xprof.
  * `annotate(name)` — named region inside a trace.
  * `StepTimer` — wall-clock images/sec meter with warmup skip. NOTE: on
    tunneled platforms (axon) jax.block_until_ready does not synchronize;
    callers must force a host read of a step output before .stop() for
    accurate timing (see bench.py).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates (examples, seconds) across steps; reports images/sec."""

    def __init__(self, warmup_steps: int = 1):
        self.warmup_steps = warmup_steps
        self._steps = 0
        self._examples = 0.0
        self._seconds = 0.0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, examples: float) -> None:
        dt = time.perf_counter() - self._t0
        self._steps += 1
        if self._steps > self.warmup_steps:
            self._examples += examples
            self._seconds += dt

    @property
    def images_per_sec(self) -> float:
        return self._examples / self._seconds if self._seconds else 0.0
