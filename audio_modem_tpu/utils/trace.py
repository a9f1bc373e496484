"""Tracing / profiling helpers (SURVEY §5 tracing gap-fill).

The reference's only observability is a timestamped DOM log
(app.js:1176-1185). Here:

* ``device_trace(logdir)`` — context manager around ``jax.profiler.trace``
  producing TensorBoard/XProf traces of device execution.
* ``StageTimer`` — lightweight wall-clock stage accounting for host-side
  pipelines (detect/refine/demod breakdowns, Msamples/s counters).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device profile into ``logdir`` (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall time + item counts per named stage.

    with timer.stage("demod", samples=n):
        ...
    """

    def __init__(self) -> None:
        self.seconds: dict[str, float] = defaultdict(float)
        self.cpu_seconds: dict[str, float] = defaultdict(float)
        self.items: dict[str, int] = defaultdict(int)
        self.calls: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, samples: int = 0):
        t0 = time.perf_counter()
        c0 = time.process_time()
        try:
            yield
        finally:
            self.seconds[name] += time.perf_counter() - t0
            # wall >> cpu for a stage means it BLOCKS (IO / GIL wait / device
            # sync), not computes — the attribution that matters behind this
            # image's tunnel, where a stray blocking fetch costs ~28 ms
            self.cpu_seconds[name] += time.process_time() - c0
            self.items[name] += samples
            self.calls[name] += 1

    def report(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, sec in self.seconds.items():
            n = self.items[name]
            out[name] = {
                "seconds": round(sec, 6),
                "cpu_seconds": round(self.cpu_seconds[name], 6),
                "calls": self.calls[name],
                "samples": n,
                "msamples_per_sec": round(n / sec / 1e6, 3) if sec > 0 and n else 0.0,
            }
        return out
