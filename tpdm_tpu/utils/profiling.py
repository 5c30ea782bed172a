"""Profiling hooks: jax.profiler traces and blocking step timers.

The reference has no tracing at all (SURVEY §5: DeepSpeed
wall_clock_breakdown off, only an episodes/sec counter); here profiling is
first-class: wrap any region in `trace(...)` to get a TensorBoard-loadable
trace, or use StepTimer for cheap wall-clock accounting with device sync.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timer that blocks on device results before reading time.

    Note: on the tunneled single-chip setup, block_until_ready may return
    early; pass `sync_array=True` to force a host readback of one element.
    """

    def __init__(self, sync_read: bool = True):
        self.sync_read = sync_read
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.time()

    def stop(self, result=None) -> float:
        if result is not None:
            leaves = jax.tree.leaves(result)
            if leaves:
                if self.sync_read:
                    import numpy as np

                    np.asarray(leaves[0]).ravel()[:1]
                else:
                    jax.block_until_ready(leaves[0])
        dt = time.time() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
