"""Profiling and step-timing instrumentation (new capability over the
reference, which has none — SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import json
import os
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Lightweight rolling throughput meter; optionally journals to JSONL."""

    def __init__(self, window: int = 50, log_path: str | None = None):
        self.window = window
        self.times = []
        self._last = None
        self._f = open(log_path, "a") if log_path else None

    def tick(self, n_items: int = 1, sync=None):
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        now = time.perf_counter()
        if self._last is not None:
            self.times.append((now - self._last, n_items))
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    @property
    def items_per_sec(self) -> float:
        if not self.times:
            return 0.0
        dt = sum(t for t, _ in self.times)
        n = sum(n for _, n in self.times)
        return n / dt if dt > 0 else 0.0

    def log(self, step: int, **extra):
        if self._f is None:
            return
        self._f.write(json.dumps({"step": step,
                                  "items_per_sec": self.items_per_sec,
                                  **extra}) + "\n")
        self._f.flush()


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
