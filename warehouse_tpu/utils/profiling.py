"""Tracing/profiling (SURVEY.md §5.1).

Capability parity with `ray timeline` + RLlib sampler_perf stats:
``trace()`` wraps ``jax.profiler`` (Perfetto/TensorBoard, XLA-op and
collective level), ``annotate()`` marks act/learn phases inside traces,
and ``StepsPerSecond`` is the host-side wall-clock throughput meter.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace of the enclosed block into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named range that shows up inside profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepsPerSecond:
    """Wall-clock env-steps/s meter with exponential smoothing."""

    def __init__(self, alpha: float = 0.3) -> None:
        self._alpha = alpha
        self._t = None
        self.rate = 0.0

    def update(self, steps: int) -> float:
        now = time.perf_counter()
        if self._t is not None:
            inst = steps / (now - self._t)
            self.rate = (
                inst if self.rate == 0.0
                else self._alpha * inst + (1 - self._alpha) * self.rate
            )
        self._t = now
        return self.rate


def readback_floor(rounds: int = 4) -> float:
    """The null-jit + scalar-readback floor in seconds (min of
    ``rounds`` timed calls after a warmup).

    THE load-bearing calibration primitive on this machine's tunneled
    chip (docs/RESULTS.md measurement rules): every cross-round-
    comparable number subtracts this floor, so the protocol must be
    defined ONCE — bench.py and every benchmarks/ab_* probe use this
    helper."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _null():
        return jnp.float32(0.0)

    float(_null())
    floors = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(_null())
        floors.append(time.perf_counter() - t0)
    return min(floors)
