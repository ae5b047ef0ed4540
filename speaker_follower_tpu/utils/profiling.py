"""Tracing/profiling utilities.

The reference instruments the C++ sim with wall-clock Timers
(include/Benchmark.hpp:8-23, src/lib/Benchmark.cpp) and uses ad-hoc
tic/toc in the precompute script (scripts/timer.py).  TPU-native
equivalents: a Timer with the same start/stop/reset/averaging surface, a
steps/sec meter for training loops, and a jax.profiler trace context for
XLA-level analysis.

Timing caveat baked in: over a tunneled PJRT backend,
``jax.block_until_ready`` can return before execution completes — honest
device timing must fetch results to host (``device_fetch``).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


class Timer:
    """start/stop accumulator (reference Benchmark.hpp semantics:
    Start/Stop/Reset, accumulated milliseconds, run count)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._total = 0.0
        self._count = 0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self._total += time.perf_counter() - self._t0
            self._count += 1
            self._t0 = None

    def milliseconds(self):
        return self._total * 1e3

    def average_ms(self):
        return self._total * 1e3 / max(self._count, 1)

    @contextlib.contextmanager
    def timing(self):
        self.start()
        try:
            yield self
        finally:
            self.stop()


class StepMeter:
    """steps/sec + items/sec with a sliding window, for training loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []

    def tick(self, items: int = 1):
        self._times.append((time.perf_counter(), items))
        if len(self._times) > self.window:
            self._times.pop(0)

    def steps_per_sec(self):
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1][0] - self._times[0][0]
        return (len(self._times) - 1) / dt if dt > 0 else 0.0

    def items_per_sec(self):
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1][0] - self._times[0][0]
        items = sum(n for _, n in self._times[1:])
        return items / dt if dt > 0 else 0.0


def device_fetch(tree):
    """Fetch every array in a pytree to host — the only honest sync point
    over a tunneled backend."""
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """jax.profiler trace context; inspect with tensorboard/xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
