"""Profiling and throughput observability.

The reference has no tracer integration (ad-hoc timeit only; SURVEY.md
section 5). Here: a context manager around `jax.profiler` emitting a
TensorBoard-compatible device trace, plus a lightweight throughput meter used
by the training loop for the images/sec/chip headline metric.
"""

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Capture a device trace into `logdir` (no-op when logdir is falsy)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"Wrote profiler trace to {logdir}")


class ThroughputMeter:
    """Images/sec/chip with warmup skipping (compile steps excluded)."""

    def __init__(self, warmup_steps: int = 1):
        self.warmup_steps = warmup_steps
        self.reset()

    def reset(self):
        self._seen_steps = 0
        self._images = 0
        self._t0 = None

    def step(self, batchsize: int):
        self._seen_steps += 1
        if self._seen_steps == self.warmup_steps:
            self._t0 = time.perf_counter()
            self._images = 0
        elif self._seen_steps > self.warmup_steps:
            self._images += batchsize

    @property
    def images_per_sec(self) -> float:
        # An epoch short enough that warmup swallowed every dispatch (e.g.
        # smoke runs with steps_per_epoch <= warmup * steps_per_dispatch) has
        # no measured window yet — report 0, not nan, so log lines stay sane.
        if self._t0 is None or self._images == 0:
            return 0.0
        dt = time.perf_counter() - self._t0
        return self._images / dt

    def per_chip(self) -> float:
        return self.images_per_sec / max(1, jax.device_count())
