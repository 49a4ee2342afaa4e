"""Profiling and tracing utilities.

The reference has no profiler (SURVEY.md #5: only Composer SpeedMonitor timing); this
adds the TPU-native story: jax.profiler trace dumps viewable in XProf/TensorBoard, plus
a fetch-synchronized step timer that is reliable through remote device relays (where
``block_until_ready`` may return before execution completes - measure with a scalar
value fetch, see bench.py).
"""

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: str, *, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a jax.profiler trace around a code block:

        with profile_trace('/tmp/trace'):
            state, metrics = step(state, batch, rng)
            float(metrics['loss'])

    Open with: tensorboard --logdir /tmp/trace  (or xprof).
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with a true execution barrier (scalar value fetch)."""

    def __init__(self):
        self._t0: Optional[float] = None
        self.times: list = []

    def start(self) -> None:
        self._t0 = time.time()

    def stop(self, scalar) -> float:
        """Pass any device scalar from the timed computation; fetching its VALUE is the
        only reliable barrier through the device relay."""
        float(scalar)
        dt = time.time() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
