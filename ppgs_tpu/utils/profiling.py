"""Tracing and per-step timing.

The reference has no profiler hooks (SURVEY.md §5); here jax.profiler traces
and a step timer are first-class so hot paths can be inspected with
TensorBoard's trace viewer or Perfetto.
"""

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir='/tmp/ppgs_tpu_trace'):
    """Capture a jax.profiler trace around a code block.

    View with: tensorboard --logdir <log_dir>  (or xprof/Perfetto).
    """
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with warmup-aware summaries."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._start = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._start)

    def summary(self):
        steady = self.times[self.warmup:] or self.times
        return {
            'steps': len(self.times),
            'mean_s': sum(steady) / max(len(steady), 1),
            'min_s': min(steady, default=0.0),
            'max_s': max(steady, default=0.0),
        }


def annotate(name):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
