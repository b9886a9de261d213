"""Tracing / profiling hooks.

The reference's only observability is time.time() prints
(reference: scripts/preprocess_data.py:109-117, scripts/train1.py:26-41;
SURVEY.md §5). Here: a jax.profiler trace context that dumps a TensorBoard-
loadable trace, named step annotations, and a device-synchronized timer for
honest wall-clock numbers (jax dispatch is async; timing without
block_until_ready measures dispatch, not compute).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Profile the enclosed region into `log_dir` (no-op if None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class DeviceTimer:
    """Wall-clock timer that synchronizes on device results.

    >>> t = DeviceTimer()
    >>> out = step(...)
    >>> dt = t.stop(out)   # blocks on `out`, returns seconds
    """

    def __init__(self) -> None:
        self.start()

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, *sync_on: Any) -> float:
        for x in sync_on:
            jax.block_until_ready(x)
        return time.perf_counter() - self._t0


def memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
