"""Tracing / profiling utilities.

The reference has only wall-clock timers (SURVEY.md §5: train.py:203-213,
296-299). The TPU-native toolkit adds:

* :class:`StepTimer` — the reference's per-mini-epoch wall-clock timers, with
  device synchronization so timings mean device time, not dispatch time;
* :func:`trace` — a ``jax.profiler`` trace context writing TensorBoard-format
  xplane dumps (viewable with ``tensorboard --logdir``);
* :func:`annotate` — named trace regions (``jax.profiler.TraceAnnotation``);
* :func:`device_memory_stats` — the counterpart of the reference's GPU-memory
  helper (train.py:102-106).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StepTimer:
    """Accumulating wall-clock timer with block-until-ready semantics."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync: Optional[object] = None):
        t0 = time.time()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.totals[name] = self.totals.get(name, 0.0) + time.time() - t0
        self.counts[name] = self.counts.get(name, 0) + 1

    def mean(self, name: str) -> float:
        return self.totals.get(name, 0.0) / max(self.counts.get(name, 0), 1)

    def report(self) -> Dict[str, float]:
        return {name: self.mean(name) for name in self.totals}

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace("/tmp/trace"): run()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> Dict[str, float]:
    """Per-device memory usage in MB (where the backend reports it)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use_mb": stats.get("bytes_in_use", 0) / 1024 ** 2,
        "peak_bytes_in_use_mb": stats.get("peak_bytes_in_use", 0) / 1024 ** 2,
        "bytes_limit_mb": stats.get("bytes_limit", 0) / 1024 ** 2,
    }
