"""Device-level tracing (aux subsystem; SURVEY §5 "tracing/profiling").

The reference only has host wall-clock timers (utils/timer.py). On TPU
the interesting picture is the XLA timeline: `trace(...)` wraps
jax.profiler and writes a TensorBoard-loadable trace; `annotate(...)`
names a region so matcher phases show up in the timeline.
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str = "profile", host_tracer_level: int = 2):
    """Capture a jax.profiler trace of the enclosed block.

    View with: tensorboard --logdir <log_dir> (Profile tab)."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir),
                             create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline (use as context manager)."""
    return jax.profiler.TraceAnnotation(name)
