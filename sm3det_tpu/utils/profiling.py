"""Tracing / profiling (SURVEY.md §5 aux subsystems).

The reference wraps ``torch.profiler`` with TensorBoard export
(``mmcv/runner/hooks/profiler.py:13-184``) and times iterations with
``IterTimerHook``. TPU equivalents:

- ``profile_trace``: context manager around ``jax.profiler`` writing an
  XPlane trace viewable in TensorBoard/XProf.
- ``annotate``: named trace regions (``jax.profiler.TraceAnnotation``).
- the train loop (train/loop.py) already records data_time/step_time per
  window (IterTimerHook parity).
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace for the enclosed steps."""
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (no-op cost when not tracing)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats():
    """Per-device memory stats when the backend exposes them."""
    import jax
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
